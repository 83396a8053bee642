package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** detectLanguage (reference FunctionsLanguageClassification.cpp — a
  * compact-language-detector wrapper there): here the SAME vote the
  * DataFrame-side TextStats.languageId runs — Han-script ratio
  * short-circuit to 'zh', then a stopword-profile vote over 7 Latin
  * languages (first profile with the max hit count; 'und' when nothing
  * hits). Case-folded before matching (the DataFrame-side languageId
  * matches raw tokens; this user-facing form is the forgiving one). One
  * tight pass per row, registered as a SQL function so the dialect names
  * detectLanguage/detectLanguageUnknown resolve. */
case class DetectLanguage(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NlpKernels.detectLanguageEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NlpKernels.detectLanguageEval($a);")
  override protected def withNewChildInternal(c: Expression): DetectLanguage = copy(c)
}

/** Unicode normalization (reference src/Functions/normalizeString.cpp —
  * normalizeUTF8NFC/NFD/NFKC/NFKD over ICU; java.text.Normalizer is the
  * same Unicode algorithm). */
case class NormalizeUtf8(child: Expression, form: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NlpKernels.normalizeUtf8Eval(input.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode) =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.NlpKernels.normalizeUtf8Eval($a, "$form");""")
  override protected def withNewChildInternal(c: Expression): NormalizeUtf8 =
    copy(child = c)
}

/** detectLanguageMixed: Map(language -> share) over 16-word chunks. */
case class DetectLanguageMixed(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType,
      org.apache.spark.sql.types.FloatType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val (langs, shares) =
      NlpKernels.detectLanguageMixedEval(input.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      langs.asInstanceOf[Array[Any]],
      shares.map(x => x: Any))
  }
  override protected def withNewChildInternal(c: Expression): DetectLanguageMixed =
    copy(child = c)
}

object NlpKernels {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  // profiles shared with TextStats.langStopProfiles (same data, flat
  // lookup table here for the per-row kernel)
  private lazy val profiles: Seq[(String, Set[String])] =
    graft.llm.TextStats.langStopProfiles.map { case (l, ws) => (l, ws.toSet) }

  def detectLanguageEval(s: UTF8String): UTF8String = {
    val text = s.toString
    var han = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) han += 1
      i += 1
    }
    if (han * 3 > text.length) return UTF8String.fromString("zh")
    val counts = new Array[Int](profiles.size)
    for (tok <- text.toLowerCase.split("\\s+") if tok.nonEmpty) {
      var p = 0
      while (p < profiles.size) {
        if (profiles(p)._2.contains(tok)) counts(p) += 1
        p += 1
      }
    }
    var best = -1
    var bestC = 0
    var p = profiles.size - 1
    while (p >= 0) {
      if (counts(p) > 0 && counts(p) >= bestC) { best = p; bestC = counts(p) }
      p -= 1
    }
    UTF8String.fromString(if (best < 0) "und" else profiles(best)._1)
  }

  def normalizeUtf8Eval(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))

  /** detectLanguageMixed (reference FunctionsLanguageDetection: language
    * shares over the document) — the text is scored in 16-word chunks by
    * the same classifier, shares = chunk fractions. */
  def detectLanguageMixedEval(s: UTF8String): (Array[UTF8String], Array[Float]) = {
    val words = s.toString.split("\\s+").filter(_.nonEmpty)
    val chunks =
      if (words.isEmpty) Array(s.toString)
      else words.grouped(16).map(_.mkString(" ")).toArray
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    for (c <- chunks) {
      val lang = detectLanguageEval(UTF8String.fromString(c)).toString
      counts(lang) = counts.getOrElse(lang, 0) + 1
    }
    val total = chunks.length.toFloat
    val sorted = counts.toSeq.sortBy { case (l, n) => (-n, l) }
    (sorted.map(kv => UTF8String.fromString(kv._1)).toArray,
      sorted.map(_._2 / total).toArray)
  }

  def detect_language(text: Column): Column = column(DetectLanguage(expression(text)))
  def normalize_utf8(text: Column, form: String): Column =
    column(NormalizeUtf8(expression(text), form))
}
