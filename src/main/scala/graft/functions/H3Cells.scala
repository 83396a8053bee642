package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 34: the index-arithmetic subset of the H3 family
  * (reference src/Functions/h3*.cpp over contrib/h3; the H3 cell-index
  * bit layout is the public Uber H3 spec).
  *
  * Layout (64 bits): [63]=0, [62:59]=mode (cell=1), [58:56]=0,
  * [55:52]=resolution, [51:45]=base cell (0..121), then fifteen 3-bit
  * digits for res 1..15 at bits (45-3i)..(47-3i); digits past the
  * resolution are 7. Pentagon base cells and every constant here are
  * validated against the reference's own stateless test outputs
  * (tests/queries/0_stateless/01070_h3_*.reference,
  * 02212_h3_get_{res0,pentagon}_indexes.reference — see H3Spec).
  *
  * The geographic projection half of the family (geoToH3, h3ToGeo,
  * kRing, h3Distance, …) needs the icosahedral face tables of the H3
  * library, which this environment does not vendor — that remains the
  * declared gap (SURVEY §2.8 geo); the S2 cell family (S2Cells.scala)
  * carries the exact geo↔cell path. */
object H3 {
  final val Mode: Long = 1L << 59
  final val DigitsAllSeven: Long = (1L << 45) - 1

  /** Pentagon base cells — decoded from the reference's
    * 02212_h3_get_pentagon_indexes.reference res-0 row. */
  final val PentagonBases: Array[Int] =
    Array(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)
  private val pentagonSet = PentagonBases.toSet

  def resolution(h: Long): Int = ((h >>> 52) & 0xF).toInt
  def baseCell(h: Long): Int = ((h >>> 45) & 0x7F).toInt
  def digit(h: Long, i: Int): Int = ((h >>> (45 - 3 * i)) & 0x7).toInt

  def leadingNonZeroDigit(h: Long): Int = {
    val res = resolution(h)
    var i = 1
    while (i <= res) {
      val d = digit(h, i)
      if (d != 0) return d
      i += 1
    }
    0
  }

  def isValid(h: Long): Boolean = {
    if ((h >>> 63) != 0) return false
    if (((h >>> 59) & 0xF) != 1) return false // mode
    if (((h >>> 56) & 0x7) != 0) return false // reserved
    val bc = baseCell(h)
    if (bc >= 122) return false
    val res = resolution(h)
    var i = 1
    while (i <= res) {
      if (digit(h, i) == 7) return false
      i += 1
    }
    i = res + 1
    while (i <= 15) {
      if (digit(h, i) != 7) return false
      i += 1
    }
    if (pentagonSet(bc) && leadingNonZeroDigit(h) == 1) return false
    true
  }

  def isPentagon(h: Long): Boolean =
    ((h >>> 59) & 0xF) == 1 && pentagonSet(baseCell(h)) &&
      leadingNonZeroDigit(h) == 0

  def toParent(h: Long, parentRes: Int): Long = {
    val res = resolution(h)
    if (parentRes < 0 || parentRes > res) return 0L
    if (parentRes == res) return h
    val withRes = (h & ~(0xFL << 52)) | (parentRes.toLong << 52)
    // digits parentRes+1 .. 15 -> 7 (those past the old res already are)
    withRes | ((1L << (45 - 3 * parentRes)) - 1)
  }

  def toCenterChild(h: Long, childRes: Int): Long = {
    val res = resolution(h)
    if (childRes < res || childRes > 15) return 0L
    if (childRes == res) return h
    var out = (h & ~(0xFL << 52)) | (childRes.toLong << 52)
    // digits res+1 .. childRes -> 0, the rest stay 7
    var i = res + 1
    while (i <= childRes) {
      out &= ~(0x7L << (45 - 3 * i))
      i += 1
    }
    out
  }

  /** All children at childRes; pentagon cells skip the K-axis (1)
    * subtree at their leading position (deleted subsequence). DFS in
    * digit order, which is ascending id order. */
  def toChildren(h: Long, childRes: Int): Array[Long] = {
    val res = resolution(h)
    if (childRes < res) return Array.empty
    require(childRes - res <= 7 && childRes <= 15,
      s"h3ToChildren: child resolution $childRes out of bounds for resolution $res")
    if (childRes == res) return Array(h)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def rec(cell: Long, r: Int): Unit =
      if (r == childRes) out += cell
      else {
        val child0 = toCenterChild(cell, r + 1)
        val pent = isPentagon(cell)
        var d = 0
        while (d <= 6) {
          if (!(pent && d == 1))
            rec(child0 | (d.toLong << (45 - 3 * (r + 1))), r + 1)
          d += 1
        }
      }
    rec(h, res)
    out.toArray
  }

  def numHexagons(res: Int): Long = {
    require(res >= 0 && res <= 15, s"h3NumHexagons: resolution $res out of range")
    2L + 120L * math.pow(7, res).toLong
  }

  // ---- directed (unidirectional) edges: mode 2, direction at bits
  // 56-58, origin cell in the low 56 bits (02292_h3_unidirectional_
  // funcs.reference pins: origin extraction does NOT validate the
  // origin; isValid does) ----

  def edgeOrigin(h: Long): Long =
    if (((h >>> 59) & 0xF) != 2) 0L
    else (h & ((1L << 56) - 1)) | Mode

  def edgeIsValid(h: Long): Boolean = {
    if (((h >>> 59) & 0xF) != 2) return false
    val dir = ((h >>> 56) & 0x7).toInt
    if (dir < 1 || dir > 6) return false
    val origin = edgeOrigin(h)
    if (!isValid(origin)) return false
    !(isPentagon(origin) && dir == 1) // the deleted K-axis edge
  }

  /** The six directed edges of a cell (slot 0 is H3_NULL for the
    * deleted K-axis edge of pentagons, like the H3 library). The
    * reference applies the bit layout without validating the input
    * (edgesFromHexagon of a malformed id still yields ids — pinned). */
  def edgesFromHexagon(h: Long): Array[Long] = {
    val low = h & ((1L << 56) - 1)
    val pent = isPentagon(low | Mode)
    (1 to 6).map { d =>
      if (pent && d == 1) 0L
      else (2L << 59) | (d.toLong << 56) | low
    }.toArray
  }

  def res0Indexes: Array[Long] =
    Array.tabulate(122)(b => Mode | (b.toLong << 45) | DigitsAllSeven)

  def pentagonIndexes(res: Int): Array[Long] = {
    require(res >= 0 && res <= 15, s"h3GetPentagonIndexes: resolution $res out of range")
    PentagonBases.map { b =>
      var h = Mode | (res.toLong << 52) | (b.toLong << 45) | DigitsAllSeven
      var i = 1
      while (i <= res) { h &= ~(0x7L << (45 - 3 * i)); i += 1 }
      h
    }
  }
}

private object H3Expr {
  def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: java.math.BigDecimal => d.longValueExact()
    case other => other.toString.toLong
  }
  def toInt(v: Any): Int = toLong(v).toInt
}

/** One-argument H3 index probes; `kind` selects the operation. */
case class H3Unary(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = kind match {
    case "resolution" | "baseCell" => IntegerType
    case "isValid" | "isPentagon" | "isResClassIII" | "edgeIsValid" => BooleanType
    case "toString" => StringType
    case "stringTo" | "numHexagons" | "edgeOrigin" => LongType
    case "pentagonIndexes" | "edgesFromHexagon" =>
      ArrayType(LongType, containsNull = false)
    case other => throw new IllegalArgumentException(s"h3 $other")
  }
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any = kind match {
    case "resolution" => H3.resolution(H3Expr.toLong(v))
    case "baseCell" => H3.baseCell(H3Expr.toLong(v))
    case "isValid" => H3.isValid(H3Expr.toLong(v))
    case "isPentagon" => H3.isPentagon(H3Expr.toLong(v))
    case "isResClassIII" => H3.resolution(H3Expr.toLong(v)) % 2 == 1
    case "toString" => UTF8String.fromString(
      java.lang.Long.toHexString(H3Expr.toLong(v)))
    case "stringTo" =>
      try java.lang.Long.parseUnsignedLong(v.toString, 16)
      catch { case _: NumberFormatException => 0L }
    case "numHexagons" => H3.numHexagons(H3Expr.toInt(v))
    case "pentagonIndexes" =>
      new GenericArrayData(H3.pentagonIndexes(H3Expr.toInt(v)).map(x => x: Any))
    case "edgeOrigin" => H3.edgeOrigin(H3Expr.toLong(v))
    case "edgeIsValid" => H3.edgeIsValid(H3Expr.toLong(v))
    case "edgesFromHexagon" =>
      new GenericArrayData(H3.edgesFromHexagon(H3Expr.toLong(v)).map(x => x: Any))
  }
  override protected def withNewChildInternal(c: Expression): H3Unary =
    copy(child = c)
}

/** h3ToParent / h3ToCenterChild / h3ToChildren (index, resolution). */
case class H3WithRes(left: Expression, right: Expression, kind: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = kind match {
    case "toChildren" => ArrayType(LongType, containsNull = false)
    case _ => LongType
  }
  override def nullSafeEval(h0: Any, r0: Any): Any = {
    val h = H3Expr.toLong(h0)
    val r = H3Expr.toInt(r0)
    kind match {
      case "toParent" => H3.toParent(h, r)
      case "toCenterChild" => H3.toCenterChild(h, r)
      case "toChildren" =>
        new GenericArrayData(H3.toChildren(h, r).map(x => x: Any))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): H3WithRes =
    copy(left = l, right = r)
}

/** h3GetRes0Indexes() — all 122 resolution-0 cells. */
case class H3Res0Indexes() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    new GenericArrayData(H3.res0Indexes.map(x => x: Any))
}
