package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cartesian polygon geo functions (reference: src/Functions/pointInPolygon.cpp,
  * src/Functions/polygonArea.cpp, polygonPerimeter.cpp — the Cartesian
  * variants; spherical/h3/s2 stay declared out of scope in SURVEY §2.8).
  *
  * Both queries are pure relational compositions (edge table + conditional
  * aggregation), so they stay inside whole-stage codegen and scale as plain
  * broadcast-join + hash-agg: the polygon side is tiny (broadcast), the
  * point side streams map-side.
  *
  * Determinism across engines: the ray-casting test uses only +,*,/ and
  * comparisons on identical doubles (PNPOLY, Franklin 1994); the area/
  * perimeter polygons are built on a parabola (convex position, rational
  * coordinates) so no transcendental is evaluated on either engine —
  * sqrt is IEEE correctly-rounded and therefore bit-identical.
  */
object Geo {
  private def T(s: SparkSession, dir: String)(n: String): DataFrame = Tables.t(s, dir, n)

  /** Non-convex octagon used by q_point_in_polygon, as consecutive edges. */
  private val poly = Seq(
    (1.0, 1.0), (5.0, 0.5), (9.0, 1.5), (7.0, 5.0),
    (8.5, 9.0), (5.0, 7.0), (1.5, 8.5), (3.0, 4.5))
  private val edges: Seq[(Double, Double, Double, Double)] =
    poly.indices.map { i =>
      val (x1, y1) = poly(i); val (x2, y2) = poly((i + 1) % poly.size)
      (x1, y1, x2, y2)
    }
  private[queries] def edgesSqlValues: String =
    edges.map { case (x1, y1, x2, y2) => s"($x1, $y1, $x2, $y2)" }.mkString(", ")

  val queries: Map[String, Q] = Map(
    // pointInPolygon((px,py), octagon) for a derived point per part:
    // standard even-odd ray cast — count edges whose span crosses the
    // horizontal ray; odd = inside. Edge table is broadcast; crossings
    // counted in one hash-agg keyed by the point id.
    "q_point_in_polygon" -> { (s, dir) =>
      import s.implicits._
      val pts = T(s, dir)("part").select(col("p_partkey"),
        (col("p_partkey") % 100).cast("double") / 10.0 as "px",
        (col("p_size") % 50).cast("double") / 5.0 as "py")
      val e = edges.toDF("x1", "y1", "x2", "y2")
      val crosses = (col("y1") > col("py")) =!= (col("y2") > col("py"))
      val xAt = (col("x2") - col("x1")) * (col("py") - col("y1")) /
        (col("y2") - col("y1")) + col("x1")
      ordered(pts.crossJoin(broadcast(e))
        .groupBy(col("p_partkey"), col("px"), col("py"))
        .agg((sum(when(crosses && col("px") < xAt, 1).otherwise(0)) % 2 === 1)
          .as("inside")))
    },

    // polygonAreaCartesian + polygonPerimeterCartesian per nation over a
    // generated convex polygon (k = 4 + key%4 vertices on a parabola —
    // rational coordinates, no trig). Shoelace area; edge-length sum
    // perimeter; wraparound edge via lead() with a modular self-closing
    // first-vertex carry.
    "q_polygon_metrics" -> { (s, dir) =>
      val n = T(s, dir)("nation")
        .select(col("n_nationkey"), (lit(4) + col("n_nationkey") % 4).as("k"),
          col("n_regionkey").cast("double").as("dy"))
      val verts = n.select(col("n_nationkey"), col("k"), col("dy"),
          posexplode(sequence(lit(0), col("k") - 1)).as(Seq("i", "dummy")))
        .withColumn("x", col("i").cast("double") - (col("k") - 1).cast("double") / 2.0)
        .withColumn("y", col("x") * col("x") / 4.0 + col("dy"))
      val w = Window.partitionBy(col("n_nationkey")).orderBy(col("i"))
      val wrapped = verts
        .withColumn("xn", coalesce(lead(col("x"), 1).over(w),
          first(col("x")).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
        .withColumn("yn", coalesce(lead(col("y"), 1).over(w),
          first(col("y")).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
      ordered(wrapped.groupBy(col("n_nationkey")).agg(
        round(abs(sum(col("x") * col("yn") - col("xn") * col("y"))) / 2.0, 6).as("area"),
        round(sum(sqrt(pow(col("xn") - col("x"), 2) + pow(col("yn") - col("y"), 2))), 6)
          .as("perimeter")))
    },

    // WKT render + parse round trip (reference src/Functions/wkt.cpp,
    // readWKT*): the parabola polygons render as 'POLYGON((x y, ...))',
    // get parsed BACK from the string, and the shoelace area is computed
    // from the PARSED coordinates — so the oracle pins rendering and
    // parsing end-to-end. All coordinates are exact binary fractions
    // (quarters), so double->string rendering is identical across
    // engines.
    "q_fn_wkt" -> { (s, dir) =>
      val n = T(s, dir)("nation")
        .select(col("n_nationkey"), (lit(4) + col("n_nationkey") % 4).as("k"),
          col("n_regionkey").cast("double").as("dy"))
      val verts = n.select(col("n_nationkey"), col("k"), col("dy"),
          posexplode(sequence(lit(0), col("k") - 1)).as(Seq("i", "dummy")))
        .withColumn("x", col("i").cast("double") - (col("k") - 1).cast("double") / 2.0)
        .withColumn("y", col("x") * col("x") / 4.0 + col("dy"))
      val wkt = verts.groupBy("n_nationkey").agg(
        concat(lit("POLYGON(("),
          array_join(
            transform(array_sort(collect_list(struct(col("i"), col("x"), col("y")))),
              v => concat(v.getField("x").cast("string"), lit(" "),
                v.getField("y").cast("string"))), ", "),
          lit("))")).as("wkt"))
      val inner = regexp_extract(col("wkt"), "^POLYGON\\(\\((.*)\\)\\)$", 1)
      val pts = transform(split(inner, ", "), p => struct(
        element_at(split(p, " "), 1).cast("double").as("x"),
        element_at(split(p, " "), 2).cast("double").as("y")))
      val m = size(col("pts"))
      val cross = aggregate(sequence(lit(1), m), lit(0.0), (acc, i) => {
        val a = element_at(col("pts"), i)
        val b = element_at(col("pts"), (i % m) + 1)
        acc + a.getField("x") * b.getField("y") - b.getField("x") * a.getField("y")
      })
      ordered(wkt.withColumn("pts", pts).select(
        col("n_nationkey"), col("wkt"),
        round(abs(cross) / 2.0, 6).as("area_rt"),
        m.cast("int").as("n_pts")))
    },

    // SVG rendering (reference src/Functions/svg.cpp): geometry ->
    // '<polygon points="x,y x,y ..."/>' over the same parabola polygons —
    // pure string building, reproduced exactly in DuckDB.
    "q_fn_svg" -> { (s, dir) =>
      val n = T(s, dir)("nation")
        .select(col("n_nationkey"), (lit(4) + col("n_nationkey") % 4).as("k"),
          col("n_regionkey").cast("double").as("dy"))
      val verts = n.select(col("n_nationkey"), col("k"), col("dy"),
          posexplode(sequence(lit(0), col("k") - 1)).as(Seq("i", "dummy")))
        .withColumn("x", col("i").cast("double") - (col("k") - 1).cast("double") / 2.0)
        .withColumn("y", col("x") * col("x") / 4.0 + col("dy"))
      ordered(verts.groupBy("n_nationkey").agg(
        concat(lit("<polygon points=\""),
          array_join(
            transform(array_sort(collect_list(struct(col("i"), col("x"), col("y")))),
              v => concat(v.getField("x").cast("string"), lit(","),
                v.getField("y").cast("string"))), " "),
          lit("\"/>")).as("svg")))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_point_in_polygon" ->
      s"""WITH e(x1, y1, x2, y2) AS (VALUES $edgesSqlValues),
        |pts AS (SELECT p_partkey,
        |    CAST(p_partkey % 100 AS DOUBLE) / 10.0 AS px,
        |    CAST(p_size % 50 AS DOUBLE) / 5.0 AS py
        |  FROM part)
        |SELECT p_partkey, px, py,
        |  sum(CASE WHEN ((y1 > py) <> (y2 > py))
        |        AND px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
        |      THEN 1 ELSE 0 END) % 2 = 1 AS inside
        |FROM pts CROSS JOIN e
        |GROUP BY p_partkey, px, py
        |ORDER BY p_partkey NULLS FIRST, px NULLS FIRST, py NULLS FIRST,
        |  inside NULLS FIRST""".stripMargin,
    "q_polygon_metrics" ->
      """WITH n AS (SELECT n_nationkey, 4 + n_nationkey % 4 AS k,
        |    CAST(n_regionkey AS DOUBLE) AS dy FROM nation),
        |v AS (SELECT n_nationkey, k, dy, unnest(range(k)) AS i FROM n),
        |xy AS (SELECT n_nationkey, k, i,
        |    CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0 AS x,
        |    (CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0)
        |      * (CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0) / 4.0 + dy AS y
        |  FROM v),
        |wr AS (SELECT n_nationkey, x, y,
        |    coalesce(lead(x) OVER w, first_value(x) OVER w) AS xn,
        |    coalesce(lead(y) OVER w, first_value(y) OVER w) AS yn
        |  FROM xy
        |  WINDOW w AS (PARTITION BY n_nationkey ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT n_nationkey,
        |  round(abs(sum(x * yn - xn * y)) / 2.0, 6) AS area,
        |  round(sum(sqrt(pow(xn - x, 2) + pow(yn - y, 2))), 6) AS perimeter
        |FROM wr GROUP BY n_nationkey
        |ORDER BY n_nationkey NULLS FIRST, area NULLS FIRST, perimeter NULLS FIRST""".stripMargin,
    "q_fn_wkt" ->
      """WITH n AS (SELECT n_nationkey, 4 + n_nationkey % 4 AS k,
        |    CAST(n_regionkey AS DOUBLE) AS dy FROM nation),
        |v AS (SELECT n_nationkey, k, dy, unnest(range(k)) AS i FROM n),
        |xy AS (SELECT n_nationkey, i,
        |    CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0 AS x,
        |    (CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0)
        |      * (CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0) / 4.0 + dy AS y
        |  FROM v),
        |w AS (SELECT n_nationkey,
        |    'POLYGON((' || string_agg(CAST(x AS VARCHAR) || ' ' || CAST(y AS VARCHAR),
        |      ', ' ORDER BY i) || '))' AS wkt
        |  FROM xy GROUP BY n_nationkey),
        |p AS (SELECT n_nationkey, wkt,
        |    list_transform(string_split(regexp_extract(wkt,
        |        '^POLYGON\(\((.*)\)\)$', 1), ', '),
        |      s -> {'x': CAST(string_split(s, ' ')[1] AS DOUBLE),
        |            'y': CAST(string_split(s, ' ')[2] AS DOUBLE)}) AS pts
        |  FROM w)
        |SELECT n_nationkey, wkt,
        |  round(abs(list_sum(list_transform(range(1, len(pts) + 1),
        |    i -> pts[i].x * pts[i % len(pts) + 1].y
        |       - pts[i % len(pts) + 1].x * pts[i].y))) / 2.0, 6) AS area_rt,
        |  CAST(len(pts) AS INT) AS n_pts
        |FROM p
        |ORDER BY n_nationkey NULLS FIRST, wkt NULLS FIRST, area_rt NULLS FIRST,
        |  n_pts NULLS FIRST""".stripMargin,
    "q_fn_svg" ->
      """WITH n AS (SELECT n_nationkey, 4 + n_nationkey % 4 AS k,
        |    CAST(n_regionkey AS DOUBLE) AS dy FROM nation),
        |v AS (SELECT n_nationkey, k, dy, unnest(range(k)) AS i FROM n),
        |xy AS (SELECT n_nationkey, i,
        |    CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0 AS x,
        |    (CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0)
        |      * (CAST(i AS DOUBLE) - CAST(k - 1 AS DOUBLE) / 2.0) / 4.0 + dy AS y
        |  FROM v)
        |SELECT n_nationkey,
        |  '<polygon points="' || string_agg(CAST(x AS VARCHAR) || ',' || CAST(y AS VARCHAR),
        |    ' ' ORDER BY i) || '"/>' AS svg
        |FROM xy GROUP BY n_nationkey
        |ORDER BY n_nationkey NULLS FIRST, svg NULLS FIRST""".stripMargin
  )
}
