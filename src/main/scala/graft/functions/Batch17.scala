package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-9 batch 17: A/B-test sample sizing (reference
  * src/Functions/minSampleSize.cpp), normalized Gini
  * (src/Functions/array/arrayNormalizedGini.cpp), RFC 7386 JSON merge
  * patch (src/Functions/jsonMergePatch.cpp), raw RFC 3492 punycode
  * (src/Functions/punycode.cpp). */
object Batch17 {

  // ---- standard normal quantile, from first principles ----
  // erf by Taylor series for |x| <= 3 (converges to double precision
  // there), erfc by the Lentz continued fraction for x > 3; quantile by
  // bisection + Newton to ~1e-15 — matches boost::math::quantile within
  // rounding for the (mde/power/alpha) domain the reference accepts.

  private val SqrtPi = math.sqrt(math.Pi)

  private def erfTaylor(x: Double): Double = {
    // erf(x) = 2/sqrt(pi) * sum_{n>=0} (-1)^n x^(2n+1) / (n! (2n+1))
    var term = x
    var sum = x
    var n = 1
    while (math.abs(term) > 1e-18 * math.abs(sum) && n < 200) {
      term = -term * x * x / n
      sum += term / (2 * n + 1)
      n += 1
    }
    2.0 / SqrtPi * sum
  }

  private def erfcCf(x: Double): Double = {
    // erfc(x) = exp(-x^2)/sqrt(pi) * 1/K,
    // K = x + (1/2)/(x + 1/(x + (3/2)/(x + 2/(x + ...))))  [a_j = j/2, b_j = x]
    // evaluated by modified Lentz (x > 3 => fast convergence)
    var f = x
    var c = x + 1e30 // ~inf start per Lentz
    var d = 0.0
    var j = 1
    var converged = false
    while (j < 300 && !converged) {
      val a = j / 2.0
      d = x + a * d
      if (d == 0) d = 1e-300
      d = 1 / d
      c = x + a / c
      if (c == 0) c = 1e-300
      val delta = c * d
      f *= delta
      if (math.abs(delta - 1) < 1e-17) converged = true
      j += 1
    }
    math.exp(-x * x) / SqrtPi / f
  }

  /** Phi(x): standard normal CDF to ~double precision. */
  def normCdf(x: Double): Double = {
    val z = x / math.sqrt(2.0)
    if (z >= 0) {
      if (z <= 3.0) 0.5 * (1.0 + erfTaylor(z)) else 1.0 - 0.5 * erfcCf(z)
    } else {
      if (z >= -3.0) 0.5 * (1.0 + erfTaylor(z)) else 0.5 * erfcCf(-z)
    }
  }

  /** Phi^-1(p): bisection to 1e-9 then Newton polish to ~1e-15. */
  def normQuantile(p: Double): Double = {
    if (p.isNaN || p <= 0.0 || p >= 1.0) return Double.NaN
    var lo = -8.5
    var hi = 8.5
    while (hi - lo > 1e-9) {
      val mid = 0.5 * (lo + hi)
      if (normCdf(mid) < p) lo = mid else hi = mid
    }
    var x = 0.5 * (lo + hi)
    var i = 0
    while (i < 4) { // Newton: x -= (Phi(x)-p)/phi(x)
      val pdf = math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.Pi)
      if (pdf > 1e-300) x -= (normCdf(x) - p) / pdf
      i += 1
    }
    x
  }

  private def between01(x: Double): Boolean = x > 0.0 && x < 1.0

  /** (min_sample_size, detect_lower, detect_upper) — ContinuousImpl. */
  def minSampleSizeContinuous(baseline: Double, sigma: Double, mde: Double,
                              power: Double, alpha: Double): (Double, Double, Double) = {
    if (!java.lang.Double.isFinite(baseline) || !java.lang.Double.isFinite(sigma) ||
        !between01(mde) || !between01(power) || !between01(alpha))
      return (Double.NaN, Double.NaN, Double.NaN)
    val delta = baseline * mde
    val z = normQuantile(1.0 - alpha / 2.0) + normQuantile(power)
    val n = 2.0 * sigma * sigma * z * z / (delta * delta)
    (n, baseline - delta, baseline + delta)
  }

  /** (min_sample_size, detect_lower, detect_upper) — ConversionImpl. */
  def minSampleSizeConversion(p1: Double, mde: Double, power: Double,
                              alpha: Double): (Double, Double, Double) = {
    if (!java.lang.Double.isFinite(p1) || !between01(mde) || !between01(power) ||
        !between01(alpha))
      return (Double.NaN, Double.NaN, Double.NaN)
    val q1 = 1.0 - p1
    val p2 = p1 + mde
    val q2 = 1.0 - p2
    val pBar = (p1 + p2) / 2.0
    val qBar = 1.0 - pBar
    val num = normQuantile(1.0 - alpha / 2.0) * math.sqrt(2.0 * pBar * qBar) +
      normQuantile(power) * math.sqrt(p1 * q1 + p2 * q2)
    (num * num / (mde * mde), p1 - mde, p1 + mde)
  }

  /** (gini_predicted, gini_labels, gini_normalized) —
    * arrayNormalizedGini.cpp calculateNormalizedGini (ascending sort of
    * labels by prediction; ties resolved stably here — the reference's
    * pdqsort is unstable, identical on distinct predictions). */
  def normalizedGini(pred: Array[Double], label: Array[Double]): (Double, Double, Double) = {
    val n = pred.length
    val idx = (0 until n).sortBy(pred)(Ordering.Double.TotalOrdering).toArray
    val total = label.sum
    var cum = 0.0
    var accPred = 0.0
    var i = 0
    while (i < n) {
      cum += label(idx(i)) / total
      accPred += cum
      i += 1
    }
    val sorted = label.sorted
    cum = 0.0
    var accLtv = 0.0
    i = 0
    while (i < n) {
      cum += sorted(i) / total
      accLtv += cum
      i += 1
    }
    val randomGain = 0.5 * (n + 1)
    val giniPred = (randomGain - accPred) / n
    val giniLabels = (randomGain - accLtv) / n
    (giniPred, giniLabels, giniPred / giniLabels)
  }

  // ---- RFC 7386 JSON merge patch (jackson from Spark's classpath) ----

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def jsonMergePatch(target: String, patch: String): String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.ObjectNode
    def merge(t: JsonNode, p: JsonNode): JsonNode =
      if (!p.isObject) p
      else {
        val out: ObjectNode =
          if (t != null && t.isObject) t.deepCopy[ObjectNode]()
          else mapper.createObjectNode()
        val it = p.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNull) { out.remove(e.getKey); () }
          else { out.set[JsonNode](e.getKey, merge(out.get(e.getKey), e.getValue)); () }
        }
        out
      }
    mapper.writeValueAsString(merge(mapper.readTree(target), mapper.readTree(patch)))
  }

  // ---- RFC 3492 punycode (raw; the reference's punycodeEncode/Decode) ----

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, first: Boolean): Int = {
    var delta = if (first) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) { delta /= Base - TMin; k += Base }
    k + (Base - TMin + 1) * delta / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def digitVal(c: Char): Int = c match {
    case c if c >= 'a' && c <= 'z' => c - 'a'
    case c if c >= 'A' && c <= 'Z' => c - 'A'
    case c if c >= '0' && c <= '9' => c - '0' + 26
    case _ => throw new IllegalArgumentException(s"bad punycode digit $c")
  }

  def punycodeEncode(s: String): String = {
    val input = s.codePoints().toArray
    val sb = new StringBuilder
    input.foreach(cp => if (cp < 128) sb.append(cp.toChar))
    val basicLen = sb.length
    if (basicLen > 0 && basicLen < input.length) sb.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    var handled = basicLen
    var first = true
    while (handled < input.length) {
      val m = input.filter(_ >= n).min
      delta += (m - n) * (handled + 1)
      n = m
      for (cp <- input) {
        if (cp < n) delta += 1
        else if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) { sb.append(digitChar(q)); done = true }
            else {
              sb.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          bias = adapt(delta, handled + 1, first)
          first = false
          delta = 0
          handled += 1
        }
      }
      delta += 1
      n += 1
    }
    sb.toString
  }

  def punycodeDecode(s: String): String = {
    // RFC 3492 §3.1: the basic string is everything before the LAST
    // delimiter — which may be at index 0 ("-abc" = empty basic part), so
    // the split test is >= 0, not > 0. §6.2's overflow checks are
    // mandatory: without them malformed digit strings wrap Int and decode
    // to garbage instead of failing (tryPunycodeDecode relies on the
    // IllegalArgumentException to return NULL).
    val MaxInt = Int.MaxValue
    val lastDash = s.lastIndexOf('-')
    val output = new java.util.ArrayList[Integer]()
    val basicEnd = if (lastDash >= 0) lastDash else 0
    for (i <- 0 until basicEnd) {
      val c = s.charAt(i)
      if (c >= 128) throw new IllegalArgumentException("non-basic code point")
      output.add(c.toInt)
    }
    var in = if (lastDash >= 0) lastDash + 1 else 0
    var n = InitialN
    var i = 0
    var bias = InitialBias
    var first = true
    while (in < s.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (in >= s.length) throw new IllegalArgumentException("truncated punycode")
        val digit = digitVal(s.charAt(in))
        in += 1
        if (digit > (MaxInt - i) / w) throw new IllegalArgumentException("punycode overflow")
        i += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          if (w > MaxInt / (Base - t)) throw new IllegalArgumentException("punycode overflow")
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(i - oldi, output.size + 1, first)
      first = false
      if (i / (output.size + 1) > MaxInt - n) throw new IllegalArgumentException("punycode overflow")
      n += i / (output.size + 1)
      i %= output.size + 1
      if (!Character.isValidCodePoint(n)) throw new IllegalArgumentException(s"invalid code point $n")
      output.add(i, n)
      i += 1
    }
    val sb = new StringBuilder
    output.forEach(cp => sb.appendAll(Character.toChars(cp)))
    sb.toString
  }
}

/** minSampleSizeContinuous/Conversion -> struct(_1,_2,_3) doubles. */
case class ChMinSampleSize(children: Seq[Expression], continuous: Boolean)
    extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("_1", DoubleType), StructField("_2", DoubleType), StructField("_3", DoubleType)))
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val d = vs.map {
      case x: Double => x
      case x: Float => x.toDouble
      case x: Long => x.toDouble
      case x: Int => x.toDouble
      case x: java.math.BigDecimal => x.doubleValue()
      case x: org.apache.spark.sql.types.Decimal => x.toDouble
    }
    val (a, b, c) =
      if (continuous) Batch17.minSampleSizeContinuous(d(0), d(1), d(2), d(3), d(4))
      else Batch17.minSampleSizeConversion(d(0), d(1), d(2), d(3))
    InternalRow(a, b, c)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ChMinSampleSize =
    copy(children = cs)
}

/** arrayNormalizedGini(pred, label) -> struct(_1,_2,_3) doubles. */
case class ChNormalizedGini(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("_1", DoubleType), StructField("_2", DoubleType), StructField("_3", DoubleType)))
  override def nullSafeEval(l: Any, r: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(a: Any): Array[Double] = {
      val ad = a.asInstanceOf[ArrayData]
      val out = new Array[Double](ad.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = ad.get(i, DoubleType) match {
          case d: java.lang.Double => d
          case other => other.toString.toDouble
        }
        i += 1
      }
      out
    }
    val (a, b, c) = Batch17.normalizedGini(arr(l), arr(r))
    InternalRow(a, b, c)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChNormalizedGini =
    copy(left = l, right = r)
}

/** jsonMergePatch(a, b, ...) left-fold (RFC 7386). */
case class ChJsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(l: Any, r: Any): Any =
    UTF8String.fromString(Batch17.jsonMergePatch(l.toString, r.toString))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChJsonMergePatch =
    copy(left = l, right = r)
}

case class PunycodeEncode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Batch17.punycodeEncode(input.toString))
  override protected def withNewChildInternal(c: Expression): PunycodeEncode = copy(child = c)
}

/** nullOnError=true is tryPunycodeDecode; false throws like the reference. */
case class PunycodeDecode(child: Expression, nullOnError: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    try UTF8String.fromString(Batch17.punycodeDecode(input.toString))
    catch { case _: IllegalArgumentException if nullOnError => null }
  override protected def withNewChildInternal(c: Expression): PunycodeDecode = copy(child = c)
}
