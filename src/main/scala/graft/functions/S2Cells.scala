package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** S2 cell ids — the REAL 64-bit id space (reference
  * src/Functions/geoToS2.cpp, s2ToGeo.cpp, s2GetNeighbors.cpp,
  * s2CellsIntersect.cpp, s2Cap*.cpp, s2Rect*.cpp, which delegate to the
  * s2geometry library; the scheme is fully public: Hilbert curve over
  * the quadratic-projected cube, 3 face bits + 60 position bits +
  * trailing 1).
  *
  * A leaf cell id (level 30) is built as:
  *   lat/lng -> unit XYZ -> face (largest |axis|) + (u,v) ->
  *   quadratic (s,t) = 0.5*sqrt(1+3u) branch -> (i,j) in [0, 2^30) ->
  *   30 Hilbert steps (kIJtoPos / kPosToOrientation, initial
  *   orientation = face & SWAP) -> ((face << 60) | pos) << 1 | 1.
  *
  * Ids are carried as SIGNED Int64 (two's complement of the UInt64 —
  * the same convention as the hash family; faces 4 and 5 go negative).
  * Values verified structurally (exact round trips at leaf resolution,
  * 4 distinct edge neighbors, containment-range intersection) and
  * against a from-first-principles DuckDB re-derivation (q_geo_s2).
  */
object S2Cells {

  private final val MaxLevel = 30
  private final val Swap = 0x01
  private final val Invert = 0x02

  // Hilbert sub-cell traversal tables (public S2 spec).
  // posToIJ(orientation)(position) = ij index (i*2 + j)
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 2, 3, 1), // swap
    Array(3, 2, 0, 1), // invert
    Array(3, 1, 0, 2)) // swap | invert
  private val ijToPos: Array[Array[Int]] = {
    val inv = Array.fill(4)(new Array[Int](4))
    for (o <- 0 until 4; p <- 0 until 4) inv(o)(posToIJ(o)(p)) = p
    inv
  }
  private val posToOrientation = Array(Swap, 0, 0, Invert | Swap)

  // ---- projections ----
  private def stToUV(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  private def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u)
    else 1 - 0.5 * math.sqrt(1 - 3 * u)

  private def faceOf(x: Double, y: Double, z: Double): Int = {
    val (ax, ay, az) = (math.abs(x), math.abs(y), math.abs(z))
    if (ax >= ay && ax >= az) { if (x >= 0) 0 else 3 }
    else if (ay >= az) { if (y >= 0) 1 else 4 }
    else { if (z >= 0) 2 else 5 }
  }

  private def xyzToFaceUV(x: Double, y: Double, z: Double): (Int, Double, Double) =
    faceOf(x, y, z) match {
      case 0 => (0, y / x, z / x)
      case 1 => (1, -x / y, z / y)
      case 2 => (2, -x / z, -y / z)
      case 3 => (3, z / x, y / x)
      case 4 => (4, z / y, -x / y)
      case 5 => (5, -y / z, -x / z)
    }

  private def faceUVToXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case 5 => (v, u, -1)
    }

  private def clampIJ(v: Long): Int =
    math.max(0L, math.min((1L << MaxLevel) - 1, v)).toInt

  // ---- (face, i, j) <-> cell id ----
  def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
    var pos = 0L
    var orientation = face & Swap
    var k = MaxLevel - 1
    while (k >= 0) {
      val ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val p = ijToPos(orientation)(ij)
      pos = (pos << 2) | p
      orientation ^= posToOrientation(p)
      k -= 1
    }
    ((face.toLong << 60) | pos) << 1 | 1
  }

  /** (face, i, j, orientation) of a LEAF id. */
  def toFaceIJ(id: Long): (Int, Int, Int) = {
    val face = ((id >>> 61) & 7).toInt
    val pos = (id >>> 1) & ((1L << 60) - 1)
    var orientation = face & Swap
    var i = 0
    var j = 0
    var k = MaxLevel - 1
    while (k >= 0) {
      val p = ((pos >> (2 * k)) & 3).toInt
      val ij = posToIJ(orientation)(p)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      orientation ^= posToOrientation(p)
      k -= 1
    }
    (face, i, j)
  }

  def lonLatToXYZ(lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lon = math.toRadians(lonDeg)
    val lat = math.toRadians(latDeg)
    (math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon), math.sin(lat))
  }

  def geoToS2(lonDeg: Double, latDeg: Double): Long = {
    val (x, y, z) = lonLatToXYZ(lonDeg, latDeg)
    val (face, u, v) = xyzToFaceUV(x, y, z)
    val i = clampIJ(math.floor(uvToST(u) * (1L << MaxLevel)).toLong)
    val j = clampIJ(math.floor(uvToST(v) * (1L << MaxLevel)).toLong)
    fromFaceIJ(face, i, j)
  }

  /** Center of the leaf cell -> (lon, lat) degrees. */
  def s2ToGeo(id: Long): (Double, Double) = {
    val (face, i, j) = toFaceIJ(id)
    val s = (2 * i + 1) / (2.0 * (1L << MaxLevel))
    val t = (2 * j + 1) / (2.0 * (1L << MaxLevel))
    val (x, y, z) = faceUVToXYZ(face, stToUV(s), stToUV(t))
    (math.toDegrees(math.atan2(y, x)),
      math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))))
  }

  /** The 4 edge neighbors of a leaf cell. Off-face steps resolve by
    * mapping the stepped (s,t) through the cube geometry (the stepped
    * cell center lies inside the true neighbor on the adjacent face). */
  def neighbors(id: Long): Array[Long] = {
    val (face, i, j) = toFaceIJ(id)
    val max = (1 << MaxLevel) - 1
    def at(ii: Int, jj: Int): Long =
      if (ii >= 0 && ii <= max && jj >= 0 && jj <= max) fromFaceIJ(face, ii, jj)
      else {
        // project the out-of-range cell center back through the cube
        val s = (2.0 * ii + 1) / (2.0 * (1L << MaxLevel))
        val t = (2.0 * jj + 1) / (2.0 * (1L << MaxLevel))
        val (x, y, z) = faceUVToXYZ(face, stToUV(s), stToUV(t))
        val n = math.sqrt(x * x + y * y + z * z)
        val (f2, u2, v2) = xyzToFaceUV(x / n, y / n, z / n)
        fromFaceIJ(f2,
          clampIJ(math.floor(uvToST(u2) * (1L << MaxLevel)).toLong),
          clampIJ(math.floor(uvToST(v2) * (1L << MaxLevel)).toLong))
      }
    Array(at(i - 1, j), at(i, j - 1), at(i + 1, j), at(i, j + 1))
  }

  /** Cells (any level) intersect iff one range contains the other. */
  def cellsIntersect(a: Long, b: Long): Boolean = {
    val lsbA = a & -a
    val lsbB = b & -b
    val (aMin, aMax) = (a - (lsbA - 1), a + (lsbA - 1))
    val (bMin, bMax) = (b - (lsbB - 1), b + (lsbB - 1))
    java.lang.Long.compareUnsigned(bMin, aMax) <= 0 &&
      java.lang.Long.compareUnsigned(aMin, bMax) <= 0
  }

  /** Great-circle distance in DEGREES between two leaf-cell centers. */
  def angleDeg(a: Long, b: Long): Double = {
    val (lon1, lat1) = s2ToGeo(a)
    val (lon2, lat2) = s2ToGeo(b)
    val (x1, y1, z1) = lonLatToXYZ(lon1, lat1)
    val (x2, y2, z2) = lonLatToXYZ(lon2, lat2)
    math.toDegrees(math.acos(math.max(-1.0, math.min(1.0,
      x1 * x2 + y1 * y2 + z1 * z2))))
  }

  def capContains(center: Long, radiusDeg: Double, point: Long): Boolean =
    angleDeg(center, point) <= radiusDeg

  /** Smallest cap containing both caps: (centerId, radiusDeg). */
  def capUnion(c1: Long, r1: Double, c2: Long, r2: Double): (Long, Double) = {
    val d = angleDeg(c1, c2)
    if (r1 >= d + r2) (c1, r1)
    else if (r2 >= d + r1) (c2, r2)
    else {
      val r = (d + r1 + r2) / 2
      // slide from c1 toward c2 by (r - r1) along the great circle
      val f = if (d == 0) 0.0 else (r - r1) / d
      val (lon1, lat1) = s2ToGeo(c1)
      val (lon2, lat2) = s2ToGeo(c2)
      val (x1, y1, z1) = lonLatToXYZ(lon1, lat1)
      val (x2, y2, z2) = lonLatToXYZ(lon2, lat2)
      val (mx, my, mz) = (x1 + (x2 - x1) * f, y1 + (y2 - y1) * f, z1 + (z2 - z1) * f)
      val n = math.sqrt(mx * mx + my * my + mz * mz)
      val lon = math.toDegrees(math.atan2(my / n, mx / n))
      val lat = math.toDegrees(math.atan2(mz / n, math.sqrt(mx * mx + my * my) / n))
      (geoToS2(lon, lat), r)
    }
  }

  // ---- lat/lng rectangles carried as (lo, hi) leaf ids ----
  private def rectOf(lo: Long, hi: Long): (Double, Double, Double, Double) = {
    val (lon1, lat1) = s2ToGeo(lo)
    val (lon2, lat2) = s2ToGeo(hi)
    (math.min(lon1, lon2), math.min(lat1, lat2),
      math.max(lon1, lon2), math.max(lat1, lat2))
  }

  def rectContains(lo: Long, hi: Long, p: Long): Boolean = {
    val (lonLo, latLo, lonHi, latHi) = rectOf(lo, hi)
    val (lon, lat) = s2ToGeo(p)
    lon >= lonLo && lon <= lonHi && lat >= latLo && lat <= latHi
  }

  def rectAdd(lo: Long, hi: Long, p: Long): (Long, Long) = {
    val (lonLo, latLo, lonHi, latHi) = rectOf(lo, hi)
    val (lon, lat) = s2ToGeo(p)
    (geoToS2(math.min(lonLo, lon), math.min(latLo, lat)),
      geoToS2(math.max(lonHi, lon), math.max(latHi, lat)))
  }

  def rectUnion(lo1: Long, hi1: Long, lo2: Long, hi2: Long): (Long, Long) = {
    val (aLonLo, aLatLo, aLonHi, aLatHi) = rectOf(lo1, hi1)
    val (bLonLo, bLatLo, bLonHi, bLatHi) = rectOf(lo2, hi2)
    (geoToS2(math.min(aLonLo, bLonLo), math.min(aLatLo, bLatLo)),
      geoToS2(math.max(aLonHi, bLonHi), math.max(aLatHi, bLatHi)))
  }

  def rectIntersection(lo1: Long, hi1: Long, lo2: Long, hi2: Long): Option[(Long, Long)] = {
    val (aLonLo, aLatLo, aLonHi, aLatHi) = rectOf(lo1, hi1)
    val (bLonLo, bLatLo, bLonHi, bLatHi) = rectOf(lo2, hi2)
    val (lonLo, latLo) = (math.max(aLonLo, bLonLo), math.max(aLatLo, bLatLo))
    val (lonHi, latHi) = (math.min(aLonHi, bLonHi), math.min(aLatHi, bLatHi))
    if (lonLo > lonHi || latLo > latHi) None
    else Some((geoToS2(lonLo, latLo), geoToS2(lonHi, latHi)))
  }

  /** (face, i, j) exposed for the DuckDB first-principles oracle. */
  def faceIJ(lonDeg: Double, latDeg: Double): (Int, Int, Int) = {
    val (x, y, z) = lonLatToXYZ(lonDeg, latDeg)
    val (face, u, v) = xyzToFaceUV(x, y, z)
    (face,
      clampIJ(math.floor(uvToST(u) * (1L << MaxLevel)).toLong),
      clampIJ(math.floor(uvToST(v) * (1L << MaxLevel)).toLong))
  }
}

case class GeoToS2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(lon: Any, lat: Any): Any =
    S2Cells.geoToS2(lon.asInstanceOf[Number].doubleValue, lat.asInstanceOf[Number].doubleValue)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoToS2 =
    copy(left = l, right = r)
}

case class S2ToGeo(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("col1", DoubleType, nullable = false),
    StructField("col2", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any = {
    val (lon, lat) = S2Cells.s2ToGeo(v.asInstanceOf[Number].longValue)
    InternalRow.fromSeq(Seq(lon, lat))
  }
  override protected def withNewChildInternal(c: Expression): S2ToGeo = copy(child = c)
}

case class S2GetNeighbors(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(S2Cells.neighbors(v.asInstanceOf[Number].longValue)
      .map(x => x: Any))
  override protected def withNewChildInternal(c: Expression): S2GetNeighbors = copy(child = c)
}

case class S2CellsIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    S2Cells.cellsIntersect(a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): S2CellsIntersect =
    copy(left = l, right = r)
}

/** Variadic S2 ops sharing one eval shell: capContains(c, r, p);
  * capUnion(c1, r1, c2, r2); rectAdd(lo, hi, p); rectContains(lo, hi, p);
  * rectUnion(lo1, hi1, lo2, hi2); rectIntersection(lo1, hi1, lo2, hi2);
  * faceIJ(lon, lat) for the oracle. */
case class S2Op(children: Seq[Expression], op: String)
    extends Expression with CodegenFallback {
  private def pairType = StructType(Seq(
    StructField("col1", LongType, nullable = false),
    StructField("col2", LongType, nullable = false)))
  override def dataType: DataType = op match {
    case "capContains" | "rectContains" => BooleanType
    case "capUnion" => StructType(Seq(
      StructField("col1", LongType, nullable = false),
      StructField("col2", DoubleType, nullable = false)))
    case "rectAdd" | "rectUnion" | "rectIntersection" => pairType
    case "faceIJ" => StructType(Seq(
      StructField("col1", IntegerType, nullable = false),
      StructField("col2", IntegerType, nullable = false),
      StructField("col3", IntegerType, nullable = false)))
  }
  override def nullable: Boolean =
    children.exists(_.nullable) || op == "rectIntersection"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    def lng(i: Int) = vs(i).asInstanceOf[Number].longValue
    def dbl(i: Int) = vs(i).asInstanceOf[Number].doubleValue
    op match {
      case "capContains" => S2Cells.capContains(lng(0), dbl(1), lng(2))
      case "capUnion" =>
        val (c, r) = S2Cells.capUnion(lng(0), dbl(1), lng(2), dbl(3))
        InternalRow.fromSeq(Seq(c, r))
      case "rectContains" => S2Cells.rectContains(lng(0), lng(1), lng(2))
      case "rectAdd" =>
        val (lo, hi) = S2Cells.rectAdd(lng(0), lng(1), lng(2))
        InternalRow.fromSeq(Seq(lo, hi))
      case "rectUnion" =>
        val (lo, hi) = S2Cells.rectUnion(lng(0), lng(1), lng(2), lng(3))
        InternalRow.fromSeq(Seq(lo, hi))
      case "rectIntersection" =>
        S2Cells.rectIntersection(lng(0), lng(1), lng(2), lng(3)) match {
          case Some((lo, hi)) => InternalRow.fromSeq(Seq(lo, hi))
          case None => null
        }
      case "faceIJ" =>
        val (f, i, j) = S2Cells.faceIJ(dbl(0), dbl(1))
        InternalRow.fromSeq(Seq(f, i, j))
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): S2Op =
    copy(children = c)
}
