package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse arithmetic semantics where they differ from ANSI SQL
  * (SURVEY.md §7.3 hard part 1; reference src/Functions/divide.cpp:
  * floating division by zero yields ±Inf / NaN, never an error).
  *
  * Engine stance: standard SQL queries keep Spark's ANSI behavior
  * (explicit error on x/0 — Spark 4 default); CH-compatible pipelines opt
  * into these helpers (and the ChSql dialect maps `divide()` here).
  * CaseWhen evaluates lazily per row, so the ANSI division never fires
  * when the divisor is zero. */
object ChMath {
  private val inf = lit(Double.PositiveInfinity)
  private val nan = lit(Double.NaN)

  /** divide(a, b) with CH float semantics: a/0 -> ±Inf, 0/0 -> NaN. */
  def chDiv(a: Column, b: Column): Column = {
    val ad = a.cast("double"); val bd = b.cast("double")
    when(bd === 0.0,
      when(ad > 0.0, inf).when(ad < 0.0, -inf).otherwise(nan))
      .otherwise(ad / bd)
  }

  /** modulo with CH semantics (sign follows dividend, as in C/Spark);
    * x % 0 -> NaN for floats rather than an error. */
  def chMod(a: Column, b: Column): Column = {
    val ad = a.cast("double"); val bd = b.cast("double")
    when(bd === 0.0, nan).otherwise(ad % bd)
  }
}
