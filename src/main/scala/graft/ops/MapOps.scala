package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Map-transform functions the reference exposes beyond Spark's builtins
  * (reference: src/Functions/map.cpp — mapApply/mapUpdate/
  * mapPopulateSeries). All are pure Column expressions built from
  * Spark's higher-order map/array functions, so they stay inside
  * whole-stage codegen and need no UDFs.
  */
object MapOps {

  /** mapApply((k, v) -> (k', v'), m): rebuild a map by transforming each
    * entry. Expressed as map_entries → transform → map_from_entries. */
  def mapApply(m: Column, f: (Column, Column) => (Column, Column)): Column =
    map_from_entries(transform(map_entries(m), e => {
      val (k2, v2) = f(e.getField("key"), e.getField("value"))
      struct(k2.as("key"), v2.as("value"))
    }))

  /** mapUpdate(m1, m2): m1 with m2's entries inserted, m2 winning on key
    * collision (the reference's update-with-override semantics). */
  def mapUpdate(m1: Column, m2: Column): Column =
    map_concat(map_filter(m1, (k, _) => !map_contains_key(m2, k)), m2)

  /** mapPopulateSeries(m[, max]): for integer-keyed maps, fill every key
    * from min(keys) to `max` (default max(keys)) stepping by 1, missing
    * values defaulting to 0. */
  def mapPopulateSeries(m: Column, maxKey: Option[Column] = None): Column = {
    val hi = maxKey.getOrElse(array_max(map_keys(m)))
    map_from_entries(transform(
      sequence(array_min(map_keys(m)), hi),
      k => struct(k.as("key"),
        coalesce(element_at(m, k), lit(0L)).as("value"))))
  }
}
