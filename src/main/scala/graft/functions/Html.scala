package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** extractTextFromHTML (reference src/Functions/extractTextFromHTML.cpp):
  * strip script/style elements wholesale, drop comments and CDATA, drop
  * all other tags, decode the five core entities, and collapse whitespace
  * runs to single spaces (trimmed). Single linear scan per row — map-side
  * scalar, the web-corpus cleaning primitive of an LLM intake pipeline.
  */
object Html {

  // No backreferences: script and style are two sequential passes so the
  // DuckDB oracle (RE2, which lacks \1) can run the IDENTICAL chain.
  private val script = "(?is)<script\\b[^>]*>.*?</script\\s*>".r
  private val style = "(?is)<style\\b[^>]*>.*?</style\\s*>".r
  private val comment = "(?s)<!--.*?-->".r
  private val cdata = "(?s)<!\\[CDATA\\[.*?\\]\\]>".r
  private val tag = "(?s)<[^>]*>".r

  def extractText(html: String): String = {
    var s = html
    s = script.replaceAllIn(s, " ")
    s = style.replaceAllIn(s, " ")
    s = comment.replaceAllIn(s, " ")
    s = cdata.replaceAllIn(s, " ")
    s = tag.replaceAllIn(s, " ")
    s = s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")
    s.replaceAll("\\s+", " ").trim
  }

  case class ExtractTextFromHtml(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(extractText(input.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def extract_text_from_html(c: Column): Column =
    column(ExtractTextFromHtml(expression(c)))
}
