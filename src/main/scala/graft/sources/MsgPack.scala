package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** MessagePack source/sink (reference: MsgPack input/output format,
  * src/Formats/registerFormats.cpp + ProcessorsImpl/MsgPackRowInputFormat
  * — msgpack-c there). The wire format is implemented directly from the
  * public MessagePack specification (github.com/msgpack/msgpack/blob/
  * master/spec.md): each row is one fixarray/array16 of values; ints use
  * the shortest of fixint/int8/16/32/64, doubles float64 (0xcb), strings
  * fixstr/str8/16/32 with UTF-8 payload, booleans 0xc2/0xc3, null 0xc0,
  * binary bin8/16/32. Rows concatenate with no extra framing (MessagePack
  * values are self-delimiting); files ride one raw `part-*.msgpack`
  * stream per partition, consumable by any msgpack decoder. */
object MsgPack {

  // ------------------------------------------------------------- encoding

  private def writeBe(out: java.io.OutputStream, v: Long, bytes: Int): Unit = {
    var i = bytes - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  /** Smallest encoding per the spec's recommendation: uint family for
    * non-negative values, int family for negatives. */
  def writeInt(out: java.io.OutputStream, v: Long): Unit = {
    if (v >= 0) {
      if (v <= 127) out.write(v.toInt) // positive fixint
      else if (v <= 0xffL) { out.write(0xcc); writeBe(out, v, 1) }
      else if (v <= 0xffffL) { out.write(0xcd); writeBe(out, v, 2) }
      else if (v <= 0xffffffffL) { out.write(0xce); writeBe(out, v, 4) }
      else { out.write(0xd3); writeBe(out, v, 8) }
    } else {
      if (v >= -32) out.write((v & 0xff).toInt) // negative fixint
      else if (v >= Byte.MinValue) { out.write(0xd0); writeBe(out, v, 1) }
      else if (v >= Short.MinValue) { out.write(0xd1); writeBe(out, v, 2) }
      else if (v >= Int.MinValue) { out.write(0xd2); writeBe(out, v, 4) }
      else { out.write(0xd3); writeBe(out, v, 8) }
    }
  }

  def writeDouble(out: java.io.OutputStream, v: Double): Unit = {
    out.write(0xcb); writeBe(out, java.lang.Double.doubleToLongBits(v), 8)
  }

  def writeString(out: java.io.OutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (b.length <= 31) out.write(0xa0 | b.length)
    else if (b.length <= 0xff) { out.write(0xd9); writeBe(out, b.length.toLong, 1) }
    else if (b.length <= 0xffff) { out.write(0xda); writeBe(out, b.length.toLong, 2) }
    else { out.write(0xdb); writeBe(out, b.length.toLong, 4) }
    out.write(b)
  }

  def writeBinary(out: java.io.OutputStream, b: Array[Byte]): Unit = {
    if (b.length <= 0xff) { out.write(0xc4); writeBe(out, b.length.toLong, 1) }
    else if (b.length <= 0xffff) { out.write(0xc5); writeBe(out, b.length.toLong, 2) }
    else { out.write(0xc6); writeBe(out, b.length.toLong, 4) }
    out.write(b)
  }

  def encodeRow(out: java.io.OutputStream, row: Row, schema: StructType): Unit = {
    val n = schema.length
    if (n <= 15) out.write(0x90 | n)
    else { out.write(0xdc); writeBe(out, n.toLong, 2) }
    var i = 0
    while (i < n) {
      if (row.isNullAt(i)) out.write(0xc0)
      else schema.fields(i).dataType match {
        case LongType => writeInt(out, row.getLong(i))
        case IntegerType => writeInt(out, row.getInt(i).toLong)
        case DoubleType => writeDouble(out, row.getDouble(i))
        case BooleanType => out.write(if (row.getBoolean(i)) 0xc3 else 0xc2)
        case StringType => writeString(out, row.getString(i))
        case BinaryType => writeBinary(out, row.getAs[Array[Byte]](i))
        case other => throw new IllegalArgumentException(
          s"MsgPack supports flat primitive schemas; got $other")
      }
      i += 1
    }
  }

  // ------------------------------------------------------------- decoding

  private final class Reader(in: java.io.DataInputStream) {
    def readByte(): Int = {
      val b = in.read()
      if (b < 0) throw new java.io.EOFException()
      b
    }
    def readBe(bytes: Int): Long = {
      var out = 0L; var i = 0
      while (i < bytes) { out = (out << 8) | (readByte() & 0xffL); i += 1 }
      out
    }
    def readFully(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); in.readFully(b); b
    }
    /** Decode one MessagePack value to (Long | Double | Boolean | String |
      * Array[Byte] | null). */
    def readValue(): Any = {
      val t = readByte()
      if (t <= 0x7f) t.toLong // positive fixint
      else if (t >= 0xe0) (t - 256).toLong // negative fixint
      else if ((t & 0xe0) == 0xa0) new String(readFully(t & 0x1f),
        java.nio.charset.StandardCharsets.UTF_8)
      else t match {
        case 0xc0 => null
        case 0xc2 => false
        case 0xc3 => true
        case 0xc4 => readFully(readBe(1).toInt)
        case 0xc5 => readFully(readBe(2).toInt)
        case 0xc6 => readFully(readBe(4).toInt)
        case 0xca => java.lang.Float.intBitsToFloat(readBe(4).toInt).toDouble
        case 0xcb => java.lang.Double.longBitsToDouble(readBe(8))
        case 0xcc => readBe(1)
        case 0xcd => readBe(2)
        case 0xce => readBe(4)
        case 0xcf => readBe(8) // uint64 (caller's range responsibility)
        case 0xd0 => readBe(1).toByte.toLong
        case 0xd1 => readBe(2).toShort.toLong
        case 0xd2 => readBe(4).toInt.toLong
        case 0xd3 => readBe(8)
        case 0xd9 => new String(readFully(readBe(1).toInt),
          java.nio.charset.StandardCharsets.UTF_8)
        case 0xda => new String(readFully(readBe(2).toInt),
          java.nio.charset.StandardCharsets.UTF_8)
        case 0xdb => new String(readFully(readBe(4).toInt),
          java.nio.charset.StandardCharsets.UTF_8)
        case other => throw new IllegalArgumentException(
          f"unsupported msgpack type 0x$other%02x")
      }
    }
    def readArrayHeader(): Int = {
      val t = readByte()
      if ((t & 0xf0) == 0x90) t & 0x0f
      else if (t == 0xdc) readBe(2).toInt
      else if (t == 0xdd) readBe(4).toInt
      else throw new IllegalArgumentException(f"expected array, got 0x$t%02x")
    }
  }

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, DoubleType) => d
    case (b: Boolean, BooleanType) => b
    case (s: String, StringType) => s
    case (b: Array[Byte], BinaryType) => b
    case (x, t) => throw new IllegalArgumentException(s"cannot read $x as $t")
  }

  def decodeStream(in: java.io.InputStream, schema: StructType): Iterator[Row] = {
    val pb = new java.io.PushbackInputStream(new java.io.BufferedInputStream(in))
    val r = new Reader(new java.io.DataInputStream(pb))
    new Iterator[Row] {
      def hasNext: Boolean = {
        val b = pb.read()
        if (b < 0) false else { pb.unread(b); true }
      }
      def next(): Row = {
        val n = r.readArrayHeader()
        require(n == schema.length, s"row arity $n != schema ${schema.length}")
        Row.fromSeq(schema.fields.toIndexedSeq.map(f => coerce(r.readValue(), f.dataType)))
      }
    }
  }

  // ------------------------------------------------------------- source/sink

  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(path), hconf.value)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.msgpack"), true)
      try it.foreach(row => encodeRow(out, row, schema))
      finally out.close()
      Iterator.single(pid)
    }.count()
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(path + "/part-*.msgpack")
      .flatMap { case (_, pds) => decodeStream(pds.open(), schema) }
    spark.createDataFrame(rows, schema)
  }
}
