package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geo CELL INDEX family over the geohash grid — the engine's analog of
  * the reference's h3/s2 cell function families (src/Functions/geoToH3.cpp,
  * h3kRing.cpp, h3ToParent.cpp, h3ToChildren.cpp, geohashesInBox.cpp).
  * H3's icosahedral hex ids and S2's Hilbert cell ids are bespoke index
  * spaces; the geohash grid gives the same OPERATIONS (point->cell,
  * cell->neighborhood, region->cell cover, parent/child hierarchy —
  * geohash is hierarchical by prefix) on a public, engine-neutral cell
  * id, which is what the downstream joins/aggregations actually consume.
  * geohashesInBox IS a reference function reproduced 1:1 in contract.
  *
  * Scale shape: all kernels are per-row scalar expressions (map-side,
  * no shuffle); a cell cover is bounded by `maxCells` so a degenerate
  * box cannot OOM an executor.
  */
object GeoCells {

  /** Public decode (cell center) — test/debug surface for the cell family. */
  def decodeCenter(gh: String): Option[(Double, Double)] = Codecs.geohashDecode(gh)

  /** (lonWidth, latHeight) of a geohash cell at `precision` chars:
    * lon gets ceil(5p/2) bisection bits, lat floor(5p/2). */
  def cellSize(precision: Int): (Double, Double) = {
    val lonBits = (5 * precision + 1) / 2
    val latBits = 5 * precision / 2
    (360.0 / (1L << lonBits), 180.0 / (1L << latBits))
  }

  private def clampLat(lat: Double): Double = math.max(-90.0, math.min(89.999999, lat))
  private def wrapLon(lon: Double): Double = {
    var x = lon
    while (x < -180.0) x += 360.0
    while (x >= 180.0) x -= 360.0
    x
  }

  /** All cells within Chebyshev distance k of gh's cell (the (2k+1)^2
    * block, h3kRing's square-grid analog), row-major from the south-west
    * corner; degenerate duplicates near the poles collapse. */
  def kRingEval(gh: String, k: Int): Option[Seq[String]] =
    Codecs.geohashDecode(gh).map { case (lon, lat) =>
      val (w, h) = cellSize(gh.length)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      var dy = -k
      while (dy <= k) {
        var dx = -k
        while (dx <= k) {
          out += Codecs.geohashEncode(wrapLon(lon + dx * w), clampLat(lat + dy * h), gh.length)
          dx += 1
        }
        dy += 1
      }
      out.toSeq
    }

  /** Every precision-`p` geohash cell whose RECTANGLE intersects
    * [lonMin,lonMax] x [latMin,latMax] — the reference geohashesInBox
    * contract ("fall inside and intersect the boundaries",
    * src/Functions/geohashesInBox.cpp: empty array on an inverted/
    * degenerate box; result capped, here at `maxCells`). Intersect
    * semantics also make the hierarchy exact: a cell's parent rectangle
    * contains it, so every covered cell's parent PREFIX is in the
    * parent-precision cover. Iterates cell centers row-major from the
    * cell containing the SW corner. */
  def inBoxEval(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
                p: Int, maxCells: Int = 100000): Seq[String] = {
    if (!(lonMin <= lonMax && latMin <= latMax)) return Seq.empty
    val (w, h) = cellSize(p)
    // center of the cell containing the SW corner
    def cellStart(v: Double, origin: Double, step: Double): Double =
      origin + (math.floor((v - origin) / step) + 0.5) * step
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var lat = cellStart(latMin, -90.0, h)
    while (lat - h / 2 <= latMax && lat <= 90.0) {
      var lon = cellStart(lonMin, -180.0, w)
      while (lon - w / 2 <= lonMax && lon < 180.0) {
        if (out.size >= maxCells) throw new IllegalArgumentException(
          s"geohashesInBox would exceed $maxCells cells at precision $p; shrink the box or precision")
        out += Codecs.geohashEncode(lon, clampLat(lat), p)
        lon += w
      }
      lat += h
    }
    out.toSeq
  }

  case class GeohashKRing(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      kRingEval(input.asInstanceOf[UTF8String].toString, k) match {
        case Some(cells) =>
          new GenericArrayData(cells.map(UTF8String.fromString).toArray[Any])
        case None => null
      }
    override protected def withNewChildInternal(c: Expression): GeohashKRing = copy(child = c)
  }

  /** geohashesInBox(lonMin, latMin, lonMax, latMax) at literal precision:
    * children packed as (point struct-free) four numeric expressions via
    * two Binary wrappers would obscure nullability — a single expression
    * with a Seq of children keeps eval simple. */
  case class GeohashesInBox(children: Seq[Expression], precision: Int)
      extends Expression with CodegenFallback {
    require(children.length == 4, "geohashesInBox takes (lonMin, latMin, lonMax, latMax)")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    private def toD(v: Any): Double = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case other => throw new IllegalArgumentException(s"not numeric: $other")
    }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.exists(_ == null)) return null
      new GenericArrayData(
        inBoxEval(toD(vs(0)), toD(vs(1)), toD(vs(2)), toD(vs(3)), precision)
          .map(UTF8String.fromString).toArray[Any])
    }
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): GeohashesInBox =
      copy(children = cs)
  }

  def geohash_kring(gh: Column, k: Int): Column = column(GeohashKRing(expression(gh), k))
  def geohashes_in_box(lonMin: Column, latMin: Column, lonMax: Column, latMax: Column,
                       precision: Int): Column =
    column(GeohashesInBox(Seq(lonMin, latMin, lonMax, latMax).map(expression), precision))
}
