package graft.tools
import org.apache.spark.sql.SparkSession
object GapProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder.master("local[2]").config("spark.sql.shuffle.partitions",2).config("spark.ui.enabled",false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t(name: String, q: String): Unit =
      try { val r = graft.sqlfront.ChSql.sql(s, "/root/testdata/sf0.001", q).collect(); println(s"OK   $name -> ${r.length} rows, cols ${r.headOption.map(_.length).getOrElse(0)}") }
      catch { case e: Exception => println(s"FAIL $name :: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(110)}") }
    try {
      t("view-fn", "SELECT count() AS n FROM view(SELECT n_nationkey FROM nation WHERE n_nationkey < 5)")
      t("numbers-2arg", "SELECT count() AS n FROM numbers(10, 20)")
      t("numbers-1arg", "SELECT count() AS n FROM numbers(7)")
      t("colon-cast", "SELECT '5'::Int64 + 1 AS x")
      t("except-regex", "SELECT * EXCEPT ('n_c.*') FROM nation LIMIT 1")
      t("order-by-all", "SELECT n_regionkey, n_name FROM nation ORDER BY ALL LIMIT 3")
      t("group-by-all", "SELECT n_regionkey, count() AS n FROM nation GROUP BY ALL")
      t("except-apply-chain", "SELECT * EXCEPT (n_name) APPLY (max) FROM nation")
      t("is-not-distinct", "SELECT count() AS n FROM nation WHERE n_regionkey IS NOT DISTINCT FROM 2")
      t("agg-state-merge", "SELECT uniqMerge(u) AS x FROM (SELECT n_regionkey, uniqState(n_nationkey) AS u FROM nation GROUP BY n_regionkey)")
    } finally s.stop()
  }
}
