package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Proto3 wire-format codec for flat messages (reference: Protobuf
  * input/output format, src/Formats/registerFormats.cpp +
  * ProtobufRowInputFormat.cpp). protobuf-java is not on this classpath,
  * so the wire format is implemented directly from the public proto3
  * encoding spec (protobuf.dev/programming-guides/encoding): varints,
  * zigzag, fixed64 doubles, length-delimited strings/bytes. Field number
  * = position in the schema + 1; wire type from the Spark type:
  * long/int/bool -> varint (0), double -> I64 (1), string/binary -> LEN
  * (2). Missing/default values are omitted on encode (proto3 semantics)
  * and decode to the proto3 DEFAULT — "" for strings, 0 for numerics,
  * empty bytes for binary. This is lossy for nulls: a null value written
  * through this sink round-trips to the type's default, exactly as proto3
  * scalar fields do (there is no field presence here). Schemas that must
  * distinguish null from default should not use this format.
  *
  * Integer fields use the ZIGZAG varint flavour — i.e. proto3 `sint64`/
  * `sint32`, the efficient-negative encoding — not plain `int64`; the
  * public-spec vectors in DataSourcesSpec pin exactly that.
  *
  * Length-delimited framing (each message prefixed by its varint length)
  * makes a byte stream of concatenated rows self-describing enough for a
  * split-free round trip — the same framing the reference's
  * ProtobufList/length-delimited mode uses. On disk the per-partition
  * streams ride in SequenceFile<NullWritable, BytesWritable> containers
  * (raw wire bytes in the values — no Java serialization). */
object ProtoWire {

  // ------------------------------------------------------------- primitives

  def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var out = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        out |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      out
    }
    def readFixed64(): Long = {
      var out = 0L; var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      out
    }
    def readBytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
  }

  // ---------------------------------------------------------- row codec

  /** Encode one Row as a proto3 message (no length prefix). */
  def encodeRow(row: Row, schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val field = i + 1
        schema.fields(i).dataType match {
          case LongType =>
            val v = row.getLong(i)
            if (v != 0L) { writeVarint(out, (field << 3) | 0); writeVarint(out, zigzag(v)) }
          case IntegerType =>
            val v = row.getInt(i)
            if (v != 0) { writeVarint(out, (field << 3) | 0); writeVarint(out, zigzag(v.toLong)) }
          case BooleanType =>
            if (row.getBoolean(i)) { writeVarint(out, (field << 3) | 0); writeVarint(out, 1L) }
          case DoubleType =>
            val v = row.getDouble(i)
            if (v != 0.0) {
              writeVarint(out, (field << 3) | 1)
              val bits = java.lang.Double.doubleToLongBits(v)
              var j = 0
              while (j < 8) { out.write(((bits >>> (8 * j)) & 0xff).toInt); j += 1 }
            }
          case StringType =>
            val b = row.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            if (b.nonEmpty) { writeVarint(out, (field << 3) | 2); writeVarint(out, b.length.toLong); out.write(b) }
          case BinaryType =>
            val b = row.getAs[Array[Byte]](i)
            if (b.nonEmpty) { writeVarint(out, (field << 3) | 2); writeVarint(out, b.length.toLong); out.write(b) }
          case other => throw new IllegalArgumentException(
            s"ProtoWire supports flat primitive schemas; got $other")
        }
      }
      i += 1
    }
    out.toByteArray
  }

  /** Decode one proto3 message into a Row (absent fields -> proto3
    * defaults: 0 / false / "" — except nullable strings read as "" stay
    * ""; unknown fields are skipped per spec). */
  def decodeRow(buf: Array[Byte], from: Int, to: Int, schema: StructType): Row = {
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      vals(i) = schema.fields(i).dataType match {
        case LongType => 0L
        case IntegerType => 0
        case BooleanType => false
        case DoubleType => 0.0
        case StringType => ""
        case BinaryType => Array.emptyByteArray
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
      i += 1
    }
    val r = new Reader(buf, from, to)
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx = field - 1
      if (idx >= 0 && idx < schema.length) {
        (wire, schema.fields(idx).dataType) match {
          case (0, LongType) => vals(idx) = unzigzag(r.readVarint())
          case (0, IntegerType) => vals(idx) = unzigzag(r.readVarint()).toInt
          case (0, BooleanType) => vals(idx) = r.readVarint() != 0L
          case (1, DoubleType) => vals(idx) = java.lang.Double.longBitsToDouble(r.readFixed64())
          case (2, StringType) =>
            vals(idx) = new String(r.readBytes(r.readVarint().toInt),
              java.nio.charset.StandardCharsets.UTF_8)
          case (2, BinaryType) => vals(idx) = r.readBytes(r.readVarint().toInt)
          case (w, dt) => throw new IllegalArgumentException(
            s"wire type $w does not match $dt for field $field")
        }
      } else {
        // unknown field: skip per wire type
        wire match {
          case 0 => r.readVarint()
          case 1 => r.readFixed64()
          case 2 => r.readBytes(r.readVarint().toInt)
          case w => throw new IllegalArgumentException(s"unsupported wire type $w")
        }
      }
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** One length-delimited byte blob for a whole partition of rows. */
  def encodeStream(rows: Iterator[Row], schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    rows.foreach { row =>
      val msg = encodeRow(row, schema)
      writeVarint(out, msg.length.toLong)
      out.write(msg)
    }
    out.toByteArray
  }

  def decodeStream(buf: Array[Byte], schema: StructType): Iterator[Row] = {
    val r = new Reader(buf, 0, buf.length)
    new Iterator[Row] {
      def hasNext: Boolean = r.hasMore
      def next(): Row = {
        val len = r.readVarint().toInt
        val row = decodeRow(buf, r.pos, r.pos + len, schema)
        r.pos += len
        row
      }
    }
  }

  /** DataFrame -> one length-delimited proto stream per partition, in
    * SequenceFile containers (raw wire bytes, no Java serialization). */
  def write(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.io.{BytesWritable, NullWritable}
    val schema = df.schema
    df.rdd.mapPartitions { it =>
      Iterator.single((NullWritable.get, new BytesWritable(ProtoWire.encodeStream(it, schema))))
    }.saveAsNewAPIHadoopFile(path, classOf[NullWritable], classOf[BytesWritable],
      classOf[org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat[
        NullWritable, BytesWritable]])
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.hadoop.io.{BytesWritable, NullWritable}
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat[
          NullWritable, BytesWritable]],
        classOf[NullWritable], classOf[BytesWritable])
      .flatMap { case (_, bw) => ProtoWire.decodeStream(bw.copyBytes(), schema) }
    spark.createDataFrame(rows, schema)
  }
}
