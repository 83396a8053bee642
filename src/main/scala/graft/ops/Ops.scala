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
    * keep all rows tied with the n-th on `order`. */
  def limitWithTies(df: DataFrame, order: Seq[Column], n: Int): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn("__rk", rank().over(w)).filter(col("__rk") <= n).drop("__rk")
  }

  /** ANY JOIN — first/any match per left row, no row multiplication
    * (reference: src/Core/Joins.h:47-48). The right side is deduplicated
    * on the join key first (deterministically via `rightOrder`), then a
    * plain equi-join runs — Catalyst may still broadcast the deduped side. */
  def anyJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
              rightOrder: Seq[Column], joinType: String = "inner"): DataFrame = {
    val w = Window.partitionBy(keys.map(right(_)): _*).orderBy(rightOrder: _*)
    val dedup = right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
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
               leftOn: Column, rightOn: Column, leftId: Column,
               direction: String = "backward"): DataFrame = {
    val cond = if (direction == "backward") rightOn <= leftOn else rightOn >= leftOn
    val ord = if (direction == "backward") rightOn.desc else rightOn.asc
    val joined = left.join(right, by.map(k => left(k) === right(k)).reduce(_ && _) && cond, "left")
    val w = Window.partitionBy(leftId).orderBy(ord)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** PASTE JOIN — positional (row-number) join, no key (reference:
    * src/Core/Joins.h:20, PasteJoinTransform.cpp). Caller supplies the
    * ordering that defines "position" on each side; at scale this is two
    * window row_numbers + an equi-join on the index. */
  def pasteJoin(left: DataFrame, right: DataFrame,
                leftOrder: Seq[Column], rightOrder: Seq[Column]): DataFrame = {
    val l = left.withColumn("__idx", row_number().over(Window.orderBy(leftOrder: _*)))
    val r = right.withColumn("__idx", row_number().over(Window.orderBy(rightOrder: _*)))
    l.join(r, "__idx").drop("__idx")
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
