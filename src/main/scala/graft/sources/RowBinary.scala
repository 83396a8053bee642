package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** RowBinary source/sink — the reference's native client wire/file format
  * (src/Formats/registerFormats.cpp RowBinary,
  * Processors/Formats/Impl/BinaryRowInputFormat.cpp): rows concatenated
  * with no framing, each column in order as little-endian fixed-size
  * numerics or LEB128-varint-length-prefixed UTF-8 strings. Files written
  * here are genuine RowBinary byte streams (one `part-*.bin` per
  * partition, raw bytes — no container), so the reference's
  * `FORMAT RowBinary` reader would consume them directly for the
  * supported flat primitive schemas: Int64/Int32/Float64/UInt8-bool/
  * String/binary. */
object RowBinary {

  def writeVarint(out: java.io.OutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeLe(out: java.io.OutputStream, v: Long, bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  def encodeRow(out: java.io.OutputStream, row: Row, schema: StructType): Unit = {
    var i = 0
    while (i < schema.length) {
      if (row.isNullAt(i)) throw new IllegalArgumentException(
        s"RowBinary has no null representation (reference BinaryRowOutputFormat " +
          s"writes non-Nullable columns only): column '${schema.fields(i).name}' is null")
      schema.fields(i).dataType match {
        case LongType => writeLe(out, row.getLong(i), 8)
        case IntegerType => writeLe(out, row.getInt(i).toLong, 4)
        case DoubleType =>
          writeLe(out, java.lang.Double.doubleToLongBits(row.getDouble(i)), 8)
        case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
        case StringType =>
          val b = row.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          writeVarint(out, b.length.toLong); out.write(b)
        case BinaryType =>
          val b = row.getAs[Array[Byte]](i)
          writeVarint(out, b.length.toLong); out.write(b)
        case other => throw new IllegalArgumentException(
          s"RowBinary supports flat primitive schemas; got $other")
      }
      i += 1
    }
  }

  private final class ByteReader(val in: java.io.DataInputStream) {
    def readVarint(): Long = {
      var shift = 0; var out = 0L; var b = 0
      do {
        b = in.read()
        if (b < 0) throw new java.io.EOFException()
        out |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      out
    }
    def readLe(bytes: Int): Long = {
      var out = 0L; var i = 0
      while (i < bytes) {
        val b = in.read()
        if (b < 0) throw new java.io.EOFException()
        out |= (b & 0xffL) << (8 * i); i += 1
      }
      out
    }
    def readFully(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); in.readFully(b); b
    }
  }

  /** Decode a whole stream of concatenated rows (RowBinary has no row
    * framing — the schema IS the frame). */
  def decodeStream(in: java.io.InputStream, schema: StructType): Iterator[Row] = {
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(in))
    val r = new ByteReader(new java.io.DataInputStream(pb))
    new Iterator[Row] {
      def hasNext: Boolean = {
        val b = pb.read()
        if (b < 0) false else { pb.unread(b); true }
      }
      def next(): Row = {
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          vals(i) = schema.fields(i).dataType match {
            case LongType => r.readLe(8)
            case IntegerType => r.readLe(4).toInt
            case DoubleType => java.lang.Double.longBitsToDouble(r.readLe(8))
            case BooleanType => r.readLe(1) != 0L
            case StringType => new String(r.readFully(r.readVarint().toInt),
              java.nio.charset.StandardCharsets.UTF_8)
            case BinaryType => r.readFully(r.readVarint().toInt)
            case other => throw new IllegalArgumentException(s"unsupported $other")
          }
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
  }

  /** Write genuine RowBinary files (raw byte streams, one per
    * partition) under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val spark = df.sparkSession
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(path), hconf.value)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.bin"), true)
      try it.foreach(row => encodeRow(out, row, schema))
      finally out.close()
      Iterator.single(pid)
    }.count()
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(path + "/part-*.bin")
      .flatMap { case (_, pds) => decodeStream(pds.open(), schema) }
    spark.createDataFrame(rows, schema)
  }
}
