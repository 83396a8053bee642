package graft.tools

import graft.SparkEntry
import graft.core.Tables
import java.nio.file.{Files, Paths}

/** Regenerates the golden .reference files for queries that have no
  * DuckDB oracle (mirrors the reference's NNNNN_name.sql/.reference
  * pairs — /root/reference/tests/clickhouse-test:1241). Canonical form:
  * columns sorted by name, floats at 10 significant digits, rows in
  * query order, TSV. */
object DumpGoldens {
  val goldenQueries = Seq("q_dedup_simhash", "q_sim_ann_lsh", "q_fingerprint",
    "q_ipv6_codec", "q_fn_geohash", "q_geo_cells", "q_lttb", "q_text_stem",
    "q_fn_sparse_grams", "q_sim_ann_nsw")

  def canon(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted
    df.collect().map { r =>
      cols.map { c =>
        r.get(r.fieldIndex(c)) match {
          case null => "\\N"
          case d: Double => f"$d%.10g"
          case x => x.toString
        }
      }.mkString("\t")
    }.mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("src/test/resources/goldens")
    Files.createDirectories(Paths.get(outDir))
    val spark = Tables.session("local[4]", 4)
    goldenQueries.foreach { name =>
      val txt = canon(SparkEntry.queries(name)(spark, sfDir))
      Files.writeString(Paths.get(s"$outDir/$name.reference"), txt)
      println(s"wrote $outDir/$name.reference (${txt.count(_ == '\n') + 1} rows)")
    }
    spark.stop()
  }
}
