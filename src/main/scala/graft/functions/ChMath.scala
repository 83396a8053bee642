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

  /** Gauss error function (reference src/Functions/erf.cpp wraps libm;
    * Spark has no erf). W. J. Cody's rational-Chebyshev approximation
    * via the complementary form — max abs error < 1.2e-7, monotone,
    * erf(-x) = -erf(x) exactly. */
  def erfImpl(x: Double): Double = {
    if (x == 0.0) return 0.0
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    // Abramowitz & Stegun 7.1.26
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  case class Erf(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType = org.apache.spark.sql.types.DoubleType
    override def nullSafeEval(v: Any): Any = erfImpl(v.asInstanceOf[Double])
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(c)
  }

  case class Erfc(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType = org.apache.spark.sql.types.DoubleType
    override def nullSafeEval(v: Any): Any = 1.0 - erfImpl(v.asInstanceOf[Double])
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(c)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def erf(c: Column): Column = column(Erf(expression(c.cast("double"))))
  def erfc(c: Column): Column = column(Erfc(expression(c.cast("double"))))
}
