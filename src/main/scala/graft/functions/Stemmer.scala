package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** English stemmer (reference: src/Functions/stem.cpp wraps Snowball;
  * this is a from-scratch implementation of the public-domain original:
  * M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980).
  * Lowercases, then applies steps 1a..5b. Pure per-row scalar — map-side,
  * no state.
  */
object Stemmer {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  private def isVowelAt(w: Array[Char], i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** Porter's measure m of w[0..end): [C](VC)^m[V]. */
  private def measure(w: Array[Char], end: Int): Int = {
    var m = 0; var i = 0
    while (i < end && !isVowelAt(w, i)) i += 1 // leading consonants
    while (i < end) {
      while (i < end && isVowelAt(w, i)) i += 1 // vowel run
      if (i < end) { m += 1; while (i < end && !isVowelAt(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: Array[Char], end: Int): Boolean =
    (0 until end).exists(isVowelAt(w, _))

  private def endsDoubleConsonant(w: Array[Char], end: Int): Boolean =
    end >= 2 && w(end - 1) == w(end - 2) && !isVowelAt(w, end - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: Array[Char], end: Int): Boolean =
    end >= 3 && !isVowelAt(w, end - 3) && isVowelAt(w, end - 2) &&
      !isVowelAt(w, end - 1) && "wxy".indexOf(w(end - 1)) < 0

  /** Apply the word's suffix rules. `s` is already lowercase. */
  def stem(s: String): String = {
    if (s.length <= 2) return s
    var w = s.toCharArray
    var end = w.length

    def endsWith(suffix: String): Boolean = {
      if (suffix.length > end) return false
      var i = 0
      while (i < suffix.length) {
        if (w(end - suffix.length + i) != suffix.charAt(i)) return false
        i += 1
      }
      true
    }
    def stemLen(suffix: String): Int = end - suffix.length
    def replace(suffix: String, by: String): Unit = {
      val base = stemLen(suffix)
      val out = new Array[Char](base + by.length)
      System.arraycopy(w, 0, out, 0, base)
      by.getChars(0, by.length, out, base)
      w = out; end = out.length
    }

    // Step 1a
    if (endsWith("sses")) replace("sses", "ss")
    else if (endsWith("ies")) replace("ies", "i")
    else if (!endsWith("ss") && endsWith("s")) replace("s", "")

    // Step 1b
    var extra1b = false
    if (endsWith("eed")) { if (measure(w, stemLen("eed")) > 0) replace("eed", "ee") }
    else if (endsWith("ed") && containsVowel(w, stemLen("ed"))) { replace("ed", ""); extra1b = true }
    else if (endsWith("ing") && containsVowel(w, stemLen("ing"))) { replace("ing", ""); extra1b = true }
    if (extra1b) {
      if (endsWith("at")) replace("at", "ate")
      else if (endsWith("bl")) replace("bl", "ble")
      else if (endsWith("iz")) replace("iz", "ize")
      else if (endsDoubleConsonant(w, end) && "lsz".indexOf(w(end - 1)) < 0) end -= 1
      else if (measure(w, end) == 1 && endsCvc(w, end)) replace("", "e")
    }

    // Step 1c
    if (endsWith("y") && containsVowel(w, stemLen("y"))) { w(end - 1) = 'i' }

    // Step 2 (m > 0 on the stem)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
      "logi" -> "log")
    step2.find { case (suf, _) => endsWith(suf) && measure(w, stemLen(suf)) > 0 }
      .foreach { case (suf, by) => replace(suf, by) }

    // Step 3 (m > 0)
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => endsWith(suf) && measure(w, stemLen(suf)) > 0 }
      .foreach { case (suf, by) => replace(suf, by) }

    // Step 4 (m > 1; "ion" additionally requires stem ending s or t)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find { suf =>
      endsWith(suf) && measure(w, stemLen(suf)) > 1 &&
        (suf != "ion" || { val b = stemLen(suf); b > 0 && (w(b - 1) == 's' || w(b - 1) == 't') })
    }.foreach(suf => replace(suf, ""))

    // Step 5a
    if (endsWith("e")) {
      val m = measure(w, stemLen("e"))
      if (m > 1 || (m == 1 && !endsCvc(w, stemLen("e")))) replace("e", "")
    }
    // Step 5b
    if (measure(w, end) > 1 && endsDoubleConsonant(w, end) && w(end - 1) == 'l') end -= 1

    new String(w, 0, end)
  }

  case class PorterStem(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(stem(input.asInstanceOf[UTF8String].toString.toLowerCase))
    override protected def withNewChildInternal(c: Expression): PorterStem = copy(child = c)
  }

  def porter_stem(s: Column): Column = column(PorterStem(expression(s)))
}
