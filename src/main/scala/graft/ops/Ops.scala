package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Named relational operators the reference exposes beyond ANSI SQL,
  * re-expressed as DataFrame transforms (SURVEY.md §2.3/2.6).
  *
  * All helpers are pure plan rewrites — they add no shuffles beyond what
  * the semantics require, and Catalyst still sees a declarative plan it
  * can push filters/pruning through.
  */
object Ops {

  /** LIMIT n BY cols — top-n rows per group (reference:
    * src/Processors/Transforms/LimitByTransform.cpp). One shuffle on the
    * partition keys; at scale this is the standard window top-n pattern
    * (no driver-side work).
    *
    * `order` must be deterministic (include a unique tie-breaker). */
  def limitBy(df: DataFrame, by: Seq[Column], order: Seq[Column], n: Int,
              rnCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(by: _*).orderBy(order: _*)
    df.withColumn(rnCol, row_number().over(w)).filter(col(rnCol) <= n)
  }

  /** DISTINCT ON (cols) — first row per key group (reference parses
    * DISTINCT ON as LIMIT 1 BY: src/Parsers/ParserSelectQuery.cpp:470). */
  def distinctOn(df: DataFrame, on: Seq[Column], order: Seq[Column]): DataFrame =
    limitBy(df, on, order, 1).drop("rn")

  /** LIMIT n WITH TIES (reference: src/Processors/LimitTransform.h:27) —
    * keep all rows tied with the n-th on `order`.
    *
    * Scale-safe formulation (no global window): a row survives iff its
    * order-key tuple appears among the first n rows' tuples — every tuple
    * strictly before the n-th is fully inside the top n, and the n-th
    * tuple itself is present there. `orderBy().limit(n)` is a
    * TakeOrderedAndProject (per-partition top-n, driver merge of n rows),
    * and the ≤n distinct tuples broadcast into a semi-join, so the full
    * input is never moved to one task.
    *
    * `order` gives the sort (may carry .desc); `keys` the same expressions
    * bare, used for the tie-equality test. */
  def limitWithTies(df: DataFrame, order: Seq[Column], keys: Seq[Column], n: Int): DataFrame = {
    val top = df.orderBy(order: _*).limit(n)
      .select(keys.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }: _*)
      .distinct()
    val cond = keys.zipWithIndex.map { case (c, i) => c <=> col(s"__k$i") }.reduce(_ && _)
    df.join(broadcast(top), cond, "left_semi")
  }

  /** ANY JOIN — first/any match per left row, no row multiplication
    * (reference: src/Core/Joins.h:47-48). The right side is deduplicated
    * on the join key first (deterministically via `rightOrder` — BARE
    * ascending columns forming a total order within each key), then a
    * plain equi-join runs — Catalyst may still broadcast the deduped side.
    *
    * Dedup = min_by over a struct keyed by the order columns (struct
    * ordering is lexicographic), a map-side-combinable aggregate: one
    * exchange carrying <=1 row per (key, map partition). The previous
    * row_number window paid two sorts + a window exec for the same
    * result (r18 plan audit). */
  def anyJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
              rightOrder: Seq[Column], joinType: String = "inner"): DataFrame = {
    val payload = right.columns.filterNot(keys.contains)
    val dedup = right.groupBy(keys.map(right(_)): _*)
      .agg(min_by(struct(payload.map(right(_)): _*),
        struct(rightOrder: _*)).as("__first"))
      .select(keys.map(col) ++ payload.map(c => col(s"__first.`$c`").as(c)): _*)
    left.join(dedup, keys, joinType)
  }

  /** ASOF JOIN — for each left row, the nearest right row by inequality on
    * the last (time) key within equal `by` keys (reference:
    * src/Core/Joins.h:44-53,78; HashJoin.h:61).
    *
    * Implemented as range-join + window top-1: equi-join on `by`, filter by
    * the asof inequality, keep the closest right match per left row.
    * The equi-join shuffles both sides on `by` once; the window reuses that
    * partitioning. Direction: "backward" (right.ts <= left.ts, take max) or
    * "forward" (right.ts >= left.ts, take min).
    *
    * `leftId` must be a unique key of `left` (used to re-group matches). */
  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String],
               leftOn: Column, rightOn: Column,
               direction: String = "backward"): DataFrame = {
    // Union-sort formulation: tag both sides, sort by (by, ts, side) so a
    // window `last(right payload, ignoreNulls)` carries the nearest right
    // row onto each left row. One shuffle on `by`, O(n) intermediate — no
    // join-then-filter row multiplication when per-key history is dense
    // (the old left-join + top-1 materialized EVERY earlier right row per
    // left row first).
    //
    // Determinism contract (unchanged): right must be unique per
    // (by, rightOn); ties among right rows at equal ts are otherwise
    // carried arbitrarily.
    //
    // Output = all left columns ++ right columns minus `by` (right's key
    // cols would duplicate left's; matched ts arrives via rightOn's col).
    val rPayload = right.columns.filterNot(by.contains)
    val rStruct = struct(rPayload.map(right(_)): _*)
    val lStruct = struct(left.columns.map(left(_)): _*)
    val rType = right.select(rStruct.as("s")).schema.head.dataType
    val lType = left.select(lStruct.as("s")).schema.head.dataType
    val l = left.select(
      by.map(k => left(k).as(s"__by_$k")) ++ Seq(
        leftOn.as("__t"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r = right.select(
      by.map(k => right(k).as(s"__by_$k")) ++ Seq(
        rightOn.as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)
    val u = l.unionByName(r)
    val ord =
      if (direction == "backward") Seq(col("__t").asc, col("__side").asc)
      else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy(by.map(k => col(s"__by_$k")): _*)
      .orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        rPayload.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** PASTE JOIN — positional (row-number) join, no key (reference:
    * src/Core/Joins.h:20, PasteJoinTransform.cpp). Caller supplies the
    * ordering that defines "position" on each side; at scale this is two
    * window row_numbers + an equi-join on the index. */
  def pasteJoin(left: DataFrame, right: DataFrame,
                leftOrder: Seq[Column], rightOrder: Seq[Column]): DataFrame = {
    val l = withGlobalIndex(left, leftOrder, "__idx")
    val r = withGlobalIndex(right, rightOrder, "__idx")
    l.join(r, "__idx").drop("__idx")
  }

  /** 1-based contiguous global index in `order` without a global window —
    * the zipWithIndex pattern in DataFrame terms: range-partition + local
    * sort, per-partition base via monotonically_increasing_id (pid<<33 +
    * local offset, so `mid - min(mid)` is the local row number), then a
    * tiny per-partition count table turned into cumulative offsets with an
    * O(P²) theta-join (P = #partitions, so trivially small) and broadcast
    * back. Every stage is parallel; no task ever sees the whole input.
    *
    * `order` must be a total order (include a unique tie-breaker) for the
    * index to be deterministic. */
  private def withGlobalIndex(df: DataFrame, order: Seq[Column], idxName: String): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val counts = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__base"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"), col("a.__base").as("__base"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    sorted.join(broadcast(offsets), "__pid")
      .withColumn(idxName, col("__mid") - col("__base") + col("__off") + 1)
      .drop("__pid", "__mid", "__base", "__off")
  }

  /** Scale-safe global running total of `value` in `order`, EXCLUSIVE of
    * the current row — sum() OVER (ORDER BY order ROWS UNBOUNDED
    * PRECEDING TO 1 PRECEDING) without the single-partition window:
    * range-partition on `order`, cumulate locally, then add per-partition
    * prefix offsets computed on the tiny (#partitions-row) count table
    * via an O(P²) theta-join and broadcast back.
    *
    * `order` values must be distinct per row (rows tied on `order` could
    * otherwise split across range-partition boundaries and see different
    * prefixes). */
  def runningTotalExclusive(df: DataFrame, order: Column, value: Column,
                            out: String): DataFrame = {
    val parted = df.repartitionByRange(order).withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("__pid")).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("__loc", sum(value).over(wLoc))
    val tots = parted.groupBy(col("__pid")).agg(sum(value).as("__tot"))
    val offs = tots.as("a")
      .join(tots.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid")).agg(sum(col("b.__tot")).as("__off"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn(out, coalesce(col("__loc"), lit(0)) + coalesce(col("__off"), lit(0)))
      .drop("__pid", "__loc", "__off")
  }

  /** Scale-safe KEYED running total: sum(value) OVER (PARTITION BY keys
    * ORDER BY order) without putting each whole group through one task.
    * With few heavy groups (the common OLAP case) a plain keyed window
    * serializes ~n/|keys| rows per task; here rows range-partition on
    * (keys, order) so every core gets a slice, local cumsums run per
    * (keys, partition), and the cross-partition offsets come from a tiny
    * (#keys × #partitions)-row table via an O(P²) theta-join broadcast
    * back (same two-phase shape as runningTotalExclusive).
    *
    * (keys, order) must be unique per row — ties could split across a
    * range boundary and see different prefixes. `inclusive` selects
    * ROWS UNBOUNDED PRECEDING..CURRENT ROW vs ..1 PRECEDING.
    *
    * Pass `bucket` (any cheap expression MONOTONE in `order`, e.g.
    * floor(order/1000) for a known value range) to slice groups without
    * repartitionByRange — range partitioning runs a sampling job that
    * recomputes the whole upstream plan, which `bucket` avoids. */
  def keyedRunningTotal(df: DataFrame, keys: Seq[Column], order: Column,
                        value: Column, out: String,
                        inclusive: Boolean = true,
                        bucket: Option[Column] = None): DataFrame = {
    val parted = bucket match {
      case Some(b) => df.withColumn("__pid", b.cast("long"))
      case None => df.repartitionByRange(keys :+ order: _*)
        .withColumn("__pid", spark_partition_id())
    }
    val hi = if (inclusive) 0L else -1L
    val wLoc = Window.partitionBy(keys :+ col("__pid"): _*).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, hi)
    val local = parted.withColumn("__loc", sum(value).over(wLoc))
    val keyNames = keys.indices.map(i => s"__k$i")
    val tots = parted.groupBy(keys.zip(keyNames).map { case (k, n) => k.as(n) } :+
        col("__pid").as("__pid2"): _*)
      .agg(sum(value).as("__tot"))
    val offs = tots.as("a")
      .join(tots.as("b"),
        keyNames.map(n => col(s"a.$n") <=> col(s"b.$n"))
          .reduce(_ && _) && col("b.__pid2") < col("a.__pid2"), "left")
      .groupBy(keyNames.map(n => col(s"a.$n")) :+ col("a.__pid2").as("__pid"): _*)
      .agg(sum(col("b.__tot")).as("__off"))
    val joinCond = keys.zip(keyNames).map { case (k, n) => k <=> col(n) }
      .reduce(_ && _) && col("__pid") === col("__pid_o")
    local.join(broadcast(offs.withColumnRenamed("__pid", "__pid_o")), joinCond)
      .withColumn(out, coalesce(col("__loc"), lit(0)) + coalesce(col("__off"), lit(0)))
      .drop("__pid" :: "__pid_o" :: "__loc" :: "__off" :: keyNames.toList: _*)
  }

  /** dictGet (reference FunctionsExternalDictionaries.h / Dictionaries):
    * enrich `df` with attribute columns looked up from a dimension table
    * by key — implemented as a broadcast left join, the Spark-native
    * dictionary: the dimension ships to every executor once, the fact
    * table never shuffles. */
  def dictGet(df: DataFrame, dict: DataFrame, dfKey: Column, dictKey: Column,
              attrs: (Column, String)*): DataFrame = {
    val dim = broadcast(dict.select((dictKey.as("__dk") +: attrs.map {
      case (c, name) => c.as(name) }): _*))
    df.join(dim, dfKey === col("__dk"), "left").drop("__dk")
  }

  /** GROUPS window frame (reference WindowDescription.h:30-44 — frame
    * unit GROUPS, which Spark lacks): emulated exactly by ranking peer
    * groups with dense_rank and running a RANGE frame over that rank.
    * Rows with equal order keys share a dense_rank, so the RANGE
    * [-nPreceding, nFollowing] over ranks spans whole peer groups —
    * precisely GROUPS BETWEEN n PRECEDING AND m FOLLOWING.
    *
    * Returns df + `out` column = agg over the groups frame. */
  def groupsFrameAgg(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                     nPreceding: Int, nFollowing: Int,
                     agg: Column => Column, valueCol: Column, out: String): DataFrame = {
    val rankW = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val frameW = Window.partitionBy(partitionBy: _*).orderBy(col("__dr"))
      .rangeBetween(-nPreceding.toLong, nFollowing.toLong)
    df.withColumn("__dr", dense_rank().over(rankW))
      .withColumn(out, agg(valueCol).over(frameW))
      .drop("__dr")
  }

  /** runningConcurrency(begin, end) (reference
    * src/Functions/runningConcurrency.cpp): rows sorted by `begin`
    * within each key; the result for a row is the number of intervals
    * open at its begin (ends <= begin are closed first — end exclusive).
    *
    * Scale shape: one union of begin/end event streams + one keyed
    * window sort — concurrency(i) = begins-so-far - ends-so-far, with
    * end events ordered before begin events at equal timestamps. No
    * global sort, no self-join; `tieBreak` makes begin-ties
    * deterministic (the reference relies on block order there). */
  def runningConcurrency(df: DataFrame, keys: Seq[String], begin: Column,
                         end: Column, tieBreak: Column, out: String): DataFrame = {
    val base = df.withColumn("__rc_b", begin).withColumn("__rc_e", end)
    val begins = base
      .withColumn("__rc_t", col("__rc_b"))
      .withColumn("__rc_is_end", lit(0))
      .withColumn("__rc_tie", tieBreak)
    val ends = base
      .withColumn("__rc_t", col("__rc_e"))
      .withColumn("__rc_is_end", lit(1))
      .withColumn("__rc_tie", lit(null).cast(begins.schema("__rc_tie").dataType))
    val union = begins.unionByName(ends)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__rc_t").asc, col("__rc_is_end").desc, col("__rc_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    union
      .withColumn(out,
        (sum(lit(1) - col("__rc_is_end")).over(w) - sum(col("__rc_is_end")).over(w))
          .cast("long"))
      .filter(col("__rc_is_end") === 0)
      .drop("__rc_t", "__rc_is_end", "__rc_tie", "__rc_b", "__rc_e")
  }

  /** WITH TOTALS (reference: src/Processors/Transforms/TotalsHavingTransform.cpp):
    * grouped aggregate unioned with the grand-total row, group keys nulled.
    * `agg` maps a grouped/global frame to aggregated columns. */
  def withTotals(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val grouped = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val total0 = df.groupBy().agg(aggs.head, aggs.tail: _*)
    val total = total0.select(
      keys.map(k => lit(null).cast(grouped.schema(k).dataType).as(k)) ++
        total0.columns.map(col): _*)
    grouped.unionByName(total)
  }
}
