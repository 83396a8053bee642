package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** NumPy `.npy` v1.0 container source/sink (reference
  * src/Processors/Formats/Impl/NpyRowInputFormat.cpp /
  * NpyOutputFormat.cpp, registered in registerFormats.cpp; byte layout
  * from the public NEP-28 / numpy.lib.format spec: magic `\x93NUMPY`,
  * version 1.0, little-endian u16 header length, Python-dict header
  * `{'descr': '<f4', 'fortran_order': False, 'shape': (n, d), }` padded
  * with spaces to a 64-byte boundary ending in `\n`, then raw
  * little-endian data).
  *
  * The natural embeddings-exchange format for an ML data pipeline: a
  * DataFrame of (id BIGINT, vec ARRAY<FLOAT>) writes as one
  * self-contained float32 matrix `part-N.npy` per partition plus an
  * int64 id vector `part-N.ids.npy` — the same part-file model parquet
  * uses, so a 100-TB corpus streams through executors without any
  * driver materialization, and every part is directly `np.load`-able. */
object NpyIO {

  private val Magic: Array[Byte] = Array(0x93.toByte) ++ "NUMPY".getBytes

  private def header(descr: String, shape: Seq[Long]): Array[Byte] = {
    val shapeStr = shape.mkString("(", ", ", if (shape.length == 1) ",)" else ")")
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    val base = Magic.length + 2 + 2 + dict.length + 1 // +1 for '\n'
    val pad = (64 - base % 64) % 64
    val full = dict + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream
    out.write(Magic)
    out.write(1); out.write(0) // version 1.0
    out.write(full.length & 0xff); out.write((full.length >> 8) & 0xff)
    out.write(full.getBytes)
    out.toByteArray
  }

  private def writeFile(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Write (idCol BIGINT, vecCol ARRAY<FLOAT|DOUBLE>) as per-partition
    * float32 `.npy` matrices + int64 id vectors. All rows in a partition
    * must share the vector dimension (checked). */
  def write(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import org.apache.spark.sql.functions.{col, transform}
    val slim = df.select(col(idCol).cast("long"),
      transform(col(vecCol), _.cast("float")))
    slim.rdd.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      if (rows.nonEmpty) {
        val ids = rows.map(_.getLong(0))
        val vecs = rows.map(_.getSeq[Float](1).toArray)
        val d = vecs.head.length
        require(vecs.forall(_.length == d),
          s"NpyIO: ragged vectors in partition $pid (expected dim $d)")
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create(path), hconf.value)
        val mat = java.nio.ByteBuffer.allocate(vecs.length * d * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vecs.foreach(v => v.foreach(mat.putFloat))
        writeFile(fs, new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.npy"),
          header("<f4", Seq(vecs.length.toLong, d.toLong)) ++ mat.array())
        val idb = java.nio.ByteBuffer.allocate(ids.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        ids.foreach(idb.putLong)
        writeFile(fs, new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.ids.npy"),
          header("<i8", Seq(ids.length.toLong)) ++ idb.array())
      }
      Iterator.single(pid)
    }.count()
  }

  private[sources] def parseHeader(b: Array[Byte]): (String, Seq[Long], Int) = {
    require(b.length > 10 && b.take(6).sameElements(Magic), "not an NPY file")
    require(b(6) == 1, s"unsupported NPY version ${b(6)}.${b(7)}")
    val hlen = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    val dict = new String(b, 10, hlen)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(dict)
      .getOrElse(throw new IllegalArgumentException(s"no descr in $dict")).group(1)
    require("'fortran_order':\\s*False".r.findFirstIn(dict).isDefined,
      "fortran_order=True not supported")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(dict)
      .getOrElse(throw new IllegalArgumentException(s"no shape in $dict")).group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    (descr, shape, 10 + hlen)
  }

  /** Read a directory written by [[write]] back to (id BIGINT,
    * vec ARRAY<FLOAT>): each executor task decodes one matrix+ids pair. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(path + "/part-*.npy")
      .filter(!_._1.endsWith(".ids.npy"))
      .flatMap { case (name, pds) =>
        val matBytes = pds.toArray()
        val (descr, shape, off) = parseHeader(matBytes)
        require(descr == "<f4" && shape.length == 2, s"$name: want <f4 matrix, got $descr $shape")
        val idsPath = name.stripSuffix(".npy") + ".ids.npy"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create(idsPath), new org.apache.hadoop.conf.Configuration())
        val idStream = fs.open(new org.apache.hadoop.fs.Path(idsPath))
        val idBytes =
          try {
            val bos = new java.io.ByteArrayOutputStream
            val buf = new Array[Byte](65536)
            var n = idStream.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = idStream.read(buf) }
            bos.toByteArray
          } finally idStream.close()
        val (idDescr, idShape, idOff) = parseHeader(idBytes)
        require(idDescr == "<i8" && idShape.length == 1, s"$idsPath: want <i8 vector")
        val Seq(nRows, d) = shape.map(_.toInt): @unchecked
        require(idShape.head == nRows, s"$name: ids/rows mismatch")
        val mat = java.nio.ByteBuffer.wrap(matBytes, off, nRows * d * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val idb = java.nio.ByteBuffer.wrap(idBytes, idOff, nRows * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until nRows).iterator.map { _ =>
          val v = new Array[Float](d)
          var j = 0
          while (j < d) { v(j) = mat.getFloat(); j += 1 }
          Row(idb.getLong(), v.toSeq)
        }
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false))))
  }
}
