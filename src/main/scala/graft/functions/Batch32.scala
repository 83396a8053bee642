package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 batch 32: the embedded-geobase region functions (reference
  * src/Functions/FunctionsEmbeddedDictionaries.h over
  * src/Dictionaries/Embedded/RegionsHierarchy.h).
  *
  * Semantics (RegionsHierarchy.cpp:85-156): each region's
  * city/area/district/country ancestor is the FIRST ancestor of that
  * type on the parent walk (a region of the type maps to itself);
  * `continent` is the first continent ancestor, `topContinent` the
  * LAST one before the root. Unknown regions map to 0. regionIn walks
  * lhs's parents looking for rhs (depth-capped). The geobase is a
  * pluggable (id, parent, type, population) table; the built-in default
  * is the reference's own test geobase
  * (tests/config/regions_hierarchy.txt + regions_names_en.txt — 12
  * regions: World/USA/Colorado/.../Asia) so values here are
  * cross-checkable against the reference's test environment.
  * Region types (GeodataProviders/Types.h): Continent=1, Country=3,
  * District=4, Area=5, City=6. */
object Geobase {

  /** tests/config/regions_hierarchy.txt verbatim (id, parent, type, population) */
  private val defaultHierarchy: Seq[(Int, Int, Int, Long)] = Seq(
    (1, 0, 0, 7000000000L), (2, 10, 3, 330000000L), (3, 2, 4, 5700000L),
    (4, 3, 5, 330000L), (5, 4, 6, 100000L), (6, 12, 3, 1500000000L),
    (7, 6, 4, 83000000L), (8, 7, 6, 20000000L), (9, 1, 1, 1000000000L),
    (10, 9, 1, 600000000L), (11, 1, 1, 5300000000L), (12, 11, 1, 4700000000L))

  /** tests/config/regions_names_en.txt verbatim */
  private val defaultNames: Map[Int, String] = Map(
    1 -> "World", 2 -> "USA", 3 -> "Colorado", 4 -> "Boulder County",
    5 -> "Boulder", 6 -> "China", 7 -> "Sichuan", 8 -> "Chengdu",
    9 -> "America", 10 -> "North America", 11 -> "Eurasia", 12 -> "Asia")

  final case class Tables(parent: Map[Int, Int], tpe: Map[Int, Int],
                          population: Map[Int, Long], name: Map[Int, String]) {
    private val MaxDepth = 32

    def ancestorOfType(id: Int, wanted: Int, last: Boolean): Int = {
      var cur = id
      var found = 0
      var depth = 0
      while (cur != 0 && depth < MaxDepth) {
        if (tpe.getOrElse(cur, -1) == wanted) {
          if (!last) return cur
          found = cur
        }
        cur = parent.getOrElse(cur, 0)
        depth += 1
      }
      found
    }

    def in(lhs0: Int, rhs: Int): Boolean = {
      if (!parent.contains(lhs0)) return false // RegionsHierarchy.h:62
      var lhs = lhs0
      var depth = 0
      while (lhs != 0 && lhs != rhs && depth < MaxDepth) {
        lhs = parent.getOrElse(lhs, 0)
        depth += 1
      }
      lhs != 0 && lhs == rhs
    }

    def hierarchy(id0: Int): Seq[Int] = {
      val out = scala.collection.mutable.Buffer.empty[Int]
      var cur = id0
      var depth = 0
      while (cur != 0 && depth < MaxDepth && parent.contains(cur)) {
        out += cur
        cur = parent.getOrElse(cur, 0)
        depth += 1
      }
      out.toSeq
    }
  }

  @volatile private var current: Tables = fromRows(defaultHierarchy, defaultNames)

  def tables: Tables = current

  private def fromRows(rows: Seq[(Int, Int, Int, Long)],
                       names: Map[Int, String]): Tables =
    Tables(
      parent = rows.map(r => r._1 -> r._2).toMap,
      tpe = rows.map(r => r._1 -> r._3).toMap,
      population = rows.map(r => r._1 -> r._4).toMap,
      name = names)

  /** Restore the built-in default geobase (test hook). */
  def reset(): Unit = current = fromRows(defaultHierarchy, defaultNames)

  /** Load a user geobase from TSV files with the reference's formats. */
  def load(hierarchyTsv: String, namesTsv: String): Unit = {
    val rows = scala.io.Source.fromFile(hierarchyTsv).getLines().flatMap { l =>
      val f = l.trim.split("\t")
      if (f.length >= 4) Some((f(0).toInt, f(1).toInt, f(2).toInt, f(3).toLong))
      else None
    }.toSeq
    val names = scala.io.Source.fromFile(namesTsv).getLines().flatMap { l =>
      val f = l.trim.split("\t")
      if (f.length >= 2) Some(f(0).toInt -> f(1)) else None
    }.toMap
    current = fromRows(rows, names)
  }
}

/** regionToCity/Area/District/Country/Continent/TopContinent/Population
  * — `kind` selects the lookup; unknown regions return 0. */
case class RegionLookup(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (kind == "population") LongType else IntegerType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any = {
    val id = v match {
      case i: Int => i
      case l: Long => l.toInt
      case other => other.toString.toInt
    }
    val t = Geobase.tables
    kind match {
      case "city" => t.ancestorOfType(id, 6, last = false)
      case "area" => t.ancestorOfType(id, 5, last = false)
      case "district" => t.ancestorOfType(id, 4, last = false)
      case "country" => t.ancestorOfType(id, 3, last = false)
      case "continent" => t.ancestorOfType(id, 1, last = false)
      case "topContinent" => t.ancestorOfType(id, 1, last = true)
      case "population" => t.population.getOrElse(id, 0L)
      case other => throw new IllegalArgumentException(s"regionTo$other")
    }
  }
  override protected def withNewChildInternal(c: Expression): RegionLookup =
    copy(child = c)
}

/** regionToName(id) -> name or '' for unknown (reference RegionsNames). */
case class RegionToName(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any = {
    val id = v match {
      case i: Int => i
      case l: Long => l.toInt
      case other => other.toString.toInt
    }
    UTF8String.fromString(Geobase.tables.name.getOrElse(id, ""))
  }
  override protected def withNewChildInternal(c: Expression): RegionToName =
    copy(child = c)
}

/** regionIn(lhs, rhs) — rhs is an ancestor of (or equals) lhs. */
case class RegionIn(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(l: Any, r: Any): Any = {
    def toInt(v: Any): Int = v match {
      case i: Int => i
      case x: Long => x.toInt
      case other => other.toString.toInt
    }
    Geobase.tables.in(toInt(l), toInt(r))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RegionIn =
    copy(left = l, right = r)
}

/** regionHierarchy(id) -> the parent chain starting at id (root last). */
case class RegionHierarchy(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any = {
    val id = v match {
      case i: Int => i
      case l: Long => l.toInt
      case other => other.toString.toInt
    }
    new GenericArrayData(Geobase.tables.hierarchy(id).map(x => x: Any).toArray)
  }
  override protected def withNewChildInternal(c: Expression): RegionHierarchy =
    copy(child = c)
}
