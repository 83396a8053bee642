package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-distribution statistics + single-occurrence regex replace
  * (reference src/Functions/stringBytesUniq.cpp, stringBytesEntropy.cpp,
  * replaceRegexpOne via ReplaceRegexpImpl<ReplaceRegexpTraits::Replace::
  * First>). Per-row map-side kernels, static calls inside codegen. */
object StringStats {

  /** Count of distinct byte values in the string (reference
    * stringBytesUniq: a 256-slot presence table). */
  def bytesUniq(s: UTF8String): Long = {
    val b = s.getBytes
    val seen = new Array[Boolean](256)
    var n = 0L
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      if (!seen(v)) { seen(v) = true; n += 1 }
      i += 1
    }
    n
  }

  /** Shannon entropy (bits) of the byte-value distribution (reference
    * stringBytesEntropy.cpp: -sum p*log2 p over byte frequencies). */
  def bytesEntropy(s: UTF8String): Double = {
    val b = s.getBytes
    if (b.length == 0) return 0.0
    val freq = new Array[Int](256)
    var i = 0
    while (i < b.length) { freq(b(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    val n = b.length.toDouble
    i = 0
    while (i < 256) {
      if (freq(i) > 0) {
        val p = freq(i) / n
        h -= p * (Math.log(p) / Math.log(2.0))
      }
      i += 1
    }
    h
  }

  /** Replace only the FIRST regex match (Java semantics; $1-style group
    * refs — the dialect layer converts the reference's \\1 form). */
  def replaceRegexpOne(s: UTF8String, re: UTF8String, rep: UTF8String): UTF8String =
    UTF8String.fromString(
      java.util.regex.Pattern.compile(re.toString).matcher(s.toString)
        .replaceFirst(rep.toString))
}

case class StringBytesUniq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    StringStats.bytesUniq(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StringStats.bytesUniq($a);")
  override protected def withNewChildInternal(newChild: Expression): StringBytesUniq =
    copy(child = newChild)
}

case class StringBytesEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    StringStats.bytesEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StringStats.bytesEntropy($a);")
  override protected def withNewChildInternal(newChild: Expression): StringBytesEntropy =
    copy(child = newChild)
}

case class ChReplaceRegexpOne(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any, re: Any, rep: Any): Any =
    StringStats.replaceRegexpOne(s.asInstanceOf[UTF8String],
      re.asInstanceOf[UTF8String], rep.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.StringStats.replaceRegexpOne($a, $b, $c);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ChReplaceRegexpOne =
    copy(first = f, second = s, third = t)
}
