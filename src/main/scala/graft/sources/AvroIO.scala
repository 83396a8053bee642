package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink (reference: Avro input/output format,
  * src/Formats/registerFormats.cpp + Processors/Formats/Impl/
  * AvroRowInputFormat.cpp). The spark-avro connector module is not on
  * this classpath, but the Avro core + avro-mapred jars are — so the
  * round trip goes through Hadoop's AvroKeyInput/OutputFormat with a
  * per-partition Row<->GenericRecord bridge. Files on disk are standard
  * Avro object container files (deflate-less default codec), readable by
  * any Avro tool. Flat schemas with the primitive Spark types are
  * supported — the same surface the dialect's format tests exercise. */
object AvroIO {

  /** Avro schema JSON for a flat StructType (nullable -> union[null, T]). */
  def avroSchemaJson(schema: StructType, name: String = "row"): String = {
    def prim(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"AvroIO supports flat primitive schemas; got $other")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(",")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Write a flat DataFrame as Avro container files under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema)
    val names = df.schema.fieldNames
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec: GenericRecord = new GenericData.Record(schema)
        var i = 0
        while (i < names.length) {
          rec.put(names(i), row.get(i) match {
            case s: String => new org.apache.avro.util.Utf8(s)
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other
          })
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get)
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read Avro container files under `path` into a DataFrame with the
    * given flat schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .mapPartitions { it =>
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq(names.indices.map { i =>
            val v = rec.get(names(i))
            (v, types(i)) match {
              case (null, _) => null
              case (u: org.apache.avro.util.Utf8, StringType) => u.toString
              case (s: CharSequence, StringType) => s.toString
              case (b: java.nio.ByteBuffer, BinaryType) =>
                val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
              case (x, _) => x
            }
          })
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
