package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sparkbar(width[, min_x, max_x])(x, y) rendering (reference
  * src/AggregateFunctions/AggregateFunctionSparkbar.cpp render()):
  *  - y summed per distinct x; points outside a specified [min_x, max_x]
  *    are dropped
  *  - bucket = floor(width / (max_x-min_x+1) * (x-min_x)) clamped to
  *    width-1; bucket value = integer-division mean of its distinct-x sums
  *  - y_max over positive buckets; empty output when none
  *  - level = y*7/y_max + 1 (integer division), 0 for y<=0 / empty
  *  - chars: 0 -> ' ', 1..8 -> U+2581..U+2588; min_x >= max_x -> '█'
  *
  * children = (collected array of struct(x, y BIGINT) [, from, to]);
  * x may be a Date (Int days), DateTime (Long micros) or any numeric —
  * evaluated on the already-aggregated array so the aggregation itself
  * stays a native codegen'd collect_list.
  */
case class ChSparkbar(width: Int, yBound: Long, children: Seq[Expression])
    extends Expression with CodegenFallback {
  // reference AggregateFunctionSparkbar factory: width in [2, 1024]
  if (width < 2 || width > 1024)
    throw new IllegalArgumentException(
      s"BAD_ARGUMENTS: sparkbar width must be in [2, 1024], got $width")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  private def arrChild = children.head

  private lazy val (xType, yType) = arrChild.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      // the reference accepts only UNSIGNED or Date/DateTime x (02016:
      // toInt32 x is ILLEGAL_TYPE_OF_ARGUMENT); in this engine's type
      // mapping signed Int8/16/32 arrive as BYTE/SHORT/INT while the
      // unsigned grid lands on the next wider type
      fields(0).dataType match {
        case ByteType | ShortType | IntegerType =>
          throw new IllegalArgumentException(
            "ILLEGAL_TYPE_OF_ARGUMENT: sparkbar x must be unsigned integer or Date/DateTime")
        case _ => ()
      }
      (fields(0).dataType, fields(1).dataType)
    case other => throw new IllegalArgumentException(
      s"ch_sparkbar expects array<struct<x,y>>, got $other")
  }

  private def numToDouble(v: Any): Double = v match {
    case i: Int => i.toDouble           // Date / Int
    case l: Long => l.toDouble          // Timestamp micros / Long
    case n: Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"sparkbar x: $other")
  }

  private def yToLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: Number => n.longValue()
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case other => throw new IllegalArgumentException(s"sparkbar y: $other")
  }

  private val bars = Array(" ", "▁", "▂", "▃", "▄",
    "▅", "▆", "▇", "█")

  override def eval(input: InternalRow): Any = {
    val arr = arrChild.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return UTF8String.fromString("")
    // y summed per distinct x (the reference's points map)
    val points = scala.collection.mutable.LinkedHashMap.empty[Double, Long]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val x = numToDouble(row.get(0, xType))
          val y = yToLong(row.get(1, yType))
          points(x) = points.getOrElse(x, 0L) + y
        }
      }
      i += 1
    }
    if (points.isEmpty) return UTF8String.fromString("")
    val specified = children.length >= 3
    val fromX = if (specified) numToDouble(children(1).eval(input)) else points.keys.min
    val toX = if (specified) numToDouble(children(2).eval(input)) else points.keys.max
    if (specified) {
      if (fromX < 0 || toX < 0) // range params must match the unsigned X
        throw new IllegalArgumentException(
          "ILLEGAL_TYPE_OF_ARGUMENT: sparkbar range must be non-negative")
      // reference constructor: begin_x >= end_x is BAD_ARGUMENTS; the
      // single-'█' path applies only to the INFERRED-range case below
      if (fromX >= toX)
        throw new IllegalArgumentException(
          "BAD_ARGUMENTS: sparkbar min_x must be less than max_x")
    }
    if (fromX >= toX) return UTF8String.fromString(bars(8))
    val delta = toX - fromX + 1
    val hist = new Array[Long](width)
    val cnt = new Array[Long](width)
    for ((x, y) <- points if x >= fromX && x <= toX) {
      val idx = math.min((width.toDouble / delta * (x - fromX)).toLong, width - 1L).toInt
      hist(idx) += y
      // zero-y points widen min/max and feed the sum but do NOT count
      // toward the bucket average (pinned on 02016: a {y=0, y=1} bucket
      // renders ▁ = avg over ONE point, while a lone y=0 point is ' ')
      if (y != 0L) cnt(idx) += 1
    }
    // INTEGER averaging and scaling (pinned against 02016's expected
    // bytes: sparkbar(5) renders a {2,3}-bucket as ▂ = 5 div 2 = 2,
    // where float averaging 2.5 would give ▃)
    var k = 0
    while (k < width) { if (cnt(k) > 0) hist(k) = hist(k) / cnt(k); k += 1 }
    var yMax = 0L
    k = 0
    while (k < width) { if (hist(k) > yMax) yMax = hist(k); k += 1 }
    if (yMax <= 0) return UTF8String.fromString("")
    // the reference scales with Y-typed integer arithmetic: scaled =
    // y*7 in Y; if that overflows Y, fall back to y / (yMax/7) + 1
    // (both divisions integer). Y's width (yBound) is resolved by the
    // dialect from the DECLARED CH type of the y argument — the Spark
    // type alone can't distinguish UInt8 from Int32 (both may arrive
    // as IntegerType).
    val sb = new StringBuilder
    k = 0
    while (k < width) {
      val lvl =
        if (hist(k) <= 0) 0
        else if (hist(k) > (yBound / 7)) // y*7 overflows Y
          math.min((hist(k) / (yMax / 7) + 1).toInt, 8)
        else math.min((hist(k) * 7 / yMax + 1).toInt, 8)
      sb.append(bars(lvl))
      k += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChSparkbar =
    copy(children = newChildren)
}
