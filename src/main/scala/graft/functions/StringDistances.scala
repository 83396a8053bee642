package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** String-distance family (reference: src/Functions/FunctionsStringDistance.cpp —
  * editDistance, damerauLevenshteinDistance, jaroSimilarity,
  * jaroWinklerSimilarity, byteHammingDistance, stringJaccardIndex).
  * Implemented from the published definitions (Damerau 1964 with adjacent
  * transpositions, Jaro 1989 / Winkler 1990), per-row scalar, map-side.
  * Levenshtein itself is Spark's built-in `levenshtein`.
  */
object StringDistances {
  import org.apache.spark.sql.graft.ColumnBridge.column

  /** Unrestricted Damerau-Levenshtein (adjacent transpositions may be
    * edited again — matches DuckDB's damerau_levenshtein, e.g.
    * DL("ca","abc")=2 where the restricted OSA variant gives 3). */
  def damerauLevenshtein(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2) with a sentinel row/col of `inf`.
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val last = scala.collection.mutable.HashMap.empty[Char, Int] // char -> last row seen
    i = 1
    while (i <= la) {
      var db = 0 // last column in this row where b matched
      j = 1
      while (j <= lb) {
        val i1 = last.getOrElse(b.charAt(j - 1), 0)
        val j1 = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost,                       // substitute / match
            math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1)), // insert / delete
          d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1))   // transpose
        j += 1
      }
      last(a.charAt(i - 1)) = i
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  /** Jaro similarity. Empty input (either side) yields 0.0; transposition
    * count is integer-halved — both match the Winkler reference code and
    * DuckDB (jaro("abcvwxyz","cabvwxyz") = 0.95833...). */
  def jaro(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mism = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = mism / 2
    (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
  }

  /** Jaro-Winkler: prefix boost (p=0.1, prefix capped at 4) applied only
    * when the Jaro score exceeds the 0.7 boost threshold. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** byteHammingDistance: mismatching bytes over the common prefix plus
    * the length difference (reference FunctionsStringDistance.cpp
    * ByteHammingDistanceImpl). */
  def byteHamming(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var d = math.abs(a.length - b.length)
    var i = 0
    while (i < n) { if (a(i) != b(i)) d += 1; i += 1 }
    d
  }

  /** stringJaccardIndex: Jaccard over the byte SETS of the two strings. */
  def byteJaccard(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length == 0 && b.length == 0) return 0.0
    val sa = new Array[Boolean](256); val sb = new Array[Boolean](256)
    a.foreach(x => sa(x & 0xff) = true)
    b.foreach(x => sb(x & 0xff) = true)
    var inter = 0; var union = 0
    var i = 0
    while (i < 256) {
      if (sa(i) && sb(i)) inter += 1
      if (sa(i) || sb(i)) union += 1
      i += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private def str(x: Any): String = x.asInstanceOf[UTF8String].toString
  private def bytes(x: Any): Array[Byte] = x.asInstanceOf[UTF8String].getBytes

  case class DamerauLevenshtein(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any = damerauLevenshtein(str(a), str(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  case class JaroSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = jaro(str(a), str(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = jaroWinkler(str(a), str(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  case class ByteHammingDistance(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any = byteHamming(bytes(a), bytes(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  case class StringJaccardIndex(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = byteJaccard(bytes(a), bytes(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  }

  import org.apache.spark.sql.graft.ColumnBridge.expression

  def damerau_levenshtein(a: Column, b: Column): Column =
    column(DamerauLevenshtein(expression(a), expression(b)))
  def jaro_similarity(a: Column, b: Column): Column =
    column(JaroSim(expression(a), expression(b)))
  def jaro_winkler_similarity(a: Column, b: Column): Column =
    column(JaroWinklerSim(expression(a), expression(b)))
  def byte_hamming(a: Column, b: Column): Column =
    column(ByteHammingDistance(expression(a), expression(b)))
  def string_jaccard(a: Column, b: Column): Column =
    column(StringJaccardIndex(expression(a), expression(b)))
}
