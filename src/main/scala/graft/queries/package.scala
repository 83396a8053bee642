package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** A named query: (session, fixture dir) => result DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic output: order by every output column, nulls first —
    * matches the oracle protocol in FIXTURES.md §2 (full-column ORDER BY,
    * NULLS FIRST to align Spark's asc default with an explicit DuckDB
    * NULLS FIRST). */
  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first): _*)

  /** Emit the matching DuckDB ORDER BY clause for `cols`. */
  def orderBySql(cols: String*): String =
    "ORDER BY " + cols.map(c => s"$c NULLS FIRST").mkString(", ")
}
