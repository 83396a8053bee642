package graft.tools

import org.apache.spark.sql.functions._

/** Unbounded scale probes for the operator families whose REGISTERED
  * queries are key-filtered for oracle purposes (and therefore flat by
  * construction at any SF): the PromQL grid path, the hierarchical
  * dictionary tower, the embedded-geobase region kernels, and the GROUPS
  * frame sweep. Each probe drives the same code path over the FULL
  * fixture so the sf0.1 -> sf1 ratio measures the real data-dependent
  * cost. Usage:
  *   sbt "runMain graft.tools.ScaleSweep <sfDir>"
  * Run once per dir as the sole JVM; compare medians across dirs.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.session("local[32]", 32)
    def T(t: String) = graft.core.Tables.t(spark, dir, t)

    // checksum-collect materialization: count() lets Catalyst prune the
    // probed expressions away, so every body must COLLECT a value that
    // depends on them (verify-skill gotcha).
    def time(name: String)(body: => Any): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[scalesweep] $name%-28s median ${med}%.3f s  (chk ${ts.head._2})")
    }

    // 1. PromQL grid family over the FULL events table: series keyed by
    // (event_type, user_id % 101), grid of 100 points over the event_id
    // span — input points scale with the table, grid size stays fixed.
    time("grid_full_events") {
      val e = T("events").select(col("event_type"),
        pmod(col("user_id"), lit(101)).as("shard"),
        pmod(col("event_id"), lit(100000)).as("ts"), col("value"))
      val keys = Seq("event_type", "shard")
      val rate = graft.ops.TimeGrid.extrapolatedToGrid(
        e, keys, col("ts"), col("value"), 0, 100000, 1000, 2000, isRate = true, "ra")
      val irate = graft.ops.TimeGrid.instantToGrid(
        e, keys, col("ts"), col("value"), 0, 100000, 1000, 2000, isRate = true, "ir")
      rate.join(irate, keys :+ "grid_ts")
        .agg(sum(col("ra") + col("ir"))).collect()(0).get(0)
    }

    // 2. Hierarchical dictionary tower over the FULL customer table: the
    // fact side scales 10x while the broadcast dictionary stays 25 rows.
    graft.sqlfront.ChSql.sql(spark, dir,
      """CREATE DICTIONARY sweep_dict (n_nationkey UInt64, n_regionkey UInt64 HIERARCHICAL)
        |PRIMARY KEY n_nationkey
        |SOURCE(CLICKHOUSE(TABLE 'nation')) LAYOUT(HASHED()) LIFETIME(0)""".stripMargin)
    time("dict_hier_full_customer") {
      graft.sqlfront.ChSql.sql(spark, dir,
        """SELECT sum(length(arrayStringConcat(CAST(dictGetHierarchy('sweep_dict', c_custkey % 25) AS ARRAY<STRING>), ','))) AS s,
          |  sum(CAST(dictIsIn('sweep_dict', c_custkey % 25, 1) AS BIGINT)) AS i
          |FROM customer""".stripMargin).collect()(0).get(0)
    }

    // 3. Embedded-geobase region kernels driven from the FULL customer
    // table (map-side broadcast lookups; cost must scale with fact rows).
    time("regions_full_customer") {
      graft.sqlfront.ChSql.sql(spark, dir,
        """SELECT count(DISTINCT regionToName(c_custkey % 15)) AS n,
          |  sum(regionToPopulation(c_custkey % 15)) AS p,
          |  sum(CAST(regionIn(c_custkey % 15, 2) AS BIGINT)) AS r
          |FROM customer""".stripMargin).collect()(0).get(0)
    }

    // 4. GROUPS-frame emulation over the FULL events table: dense_rank +
    // five RANGE specs per user (the sweep's plan shape at real width).
    time("groups_frame_full_events") {
      import org.apache.spark.sql.expressions.Window
      val base = T("events").select(col("user_id").as("u"),
        date_trunc("day", col("ts")).cast("date").as("k"),
        floor(col("value")).cast("long").as("v"))
      val withDr = base.withColumn("__dr",
        dense_rank().over(Window.partitionBy(col("u")).orderBy(col("k"))))
      val specs = Seq((-1L, 1L), (-2L, 0L), (0L, 2L), (Long.MinValue, 0L), (-3L, 3L))
      val out = specs.zipWithIndex.foldLeft(withDr) { case (acc, ((lo, hi), i)) =>
        val w = Window.partitionBy(col("u")).orderBy(col("__dr")).rangeBetween(lo, hi)
        acc.withColumn(s"o$i", sum(col("v")).over(w))
      }
      out.agg(sum(col("o0") + col("o1") + col("o2") + col("o3") + col("o4")))
        .collect()(0).get(0)
    }

    // 5. SummingMergeTree FINAL with 2 Nested map groups over the FULL
    // lineitem fixture (the r13 engine-merge path, reachable from any
    // dialect CREATE): per map group the merge is explode -> per-(key,
    // mapkey) sum -> per-key sorted re-collect, joined back to the base
    // sums — probe that it stays linear in rows (groups fixed at 10007).
    graft.sqlfront.ChSql.sql(spark, dir,
      """CREATE TABLE sweep_summing (k UInt64, v UInt64,
        |`qMap.k` Array(UInt32), `qMap.v` Array(UInt64),
        |`pMap.k` Array(UInt32), `pMap.v` Array(UInt64))
        |ENGINE = SummingMergeTree ORDER BY k""".stripMargin)
    T("lineitem").selectExpr(
      "l_orderkey % 10007 AS k",
      "CAST(l_quantity AS BIGINT) AS v",
      "array(CAST(l_linenumber % 7 AS INT), CAST(l_linenumber % 5 + 7 AS INT)) AS qk",
      "array(CAST(l_partkey % 97 AS BIGINT), CAST(l_suppkey % 89 AS BIGINT)) AS qv",
      "array(CAST(l_linenumber % 3 AS INT), CAST(l_linenumber % 11 + 3 AS INT)) AS pk",
      "array(CAST(l_extendedprice AS BIGINT), CAST(l_discount * 100 AS BIGINT)) AS pv")
      .createOrReplaceTempView("sweep_summing_src")
    graft.sqlfront.ChSql.sql(spark, dir,
      "INSERT INTO sweep_summing SELECT * FROM sweep_summing_src")
    time("summing_nested_final") {
      graft.sqlfront.ChSql.sql(spark, dir,
        """SELECT sum(k) AS sk, sum(v) AS sv,
          |sum(arraySum(`qMap.v`)) AS sq, sum(arraySum(`pMap.v`)) AS sp
          |FROM sweep_summing FINAL""".stripMargin).collect()(0).get(0)
    }

    // 6. Codec family linearity: dHash over synthesized PNGs at two
    // sizes in ONE run (the registered codec rows are key-bounded, so
    // this is their scale evidence — pure per-row executor CPU, no
    // shuffle; the ratio should track the size ratio).
    for (n <- Seq(20000L, 100000L)) {
      time(s"dhash_${n / 1000}k_images") {
        import spark.implicits._
        spark.range(n).as[Long].mapPartitions(_.map { k =>
          val pix = Array.tabulate(8, 9)((y, x) => 64 + ((k + x * 7 + y * 13) % 128).toInt)
          graft.llm.Multimodal.imageDHash64(
            graft.llm.Multimodal.encodeGrayPng(pix)).getOrElse(0L) & 0xffffL
        }).agg(sum(col("value"))).collect()(0).get(0)
      }
    }

    spark.stop()
  }
}
