package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CAST(string AS JSON) rendering of the reference's JSON object type
  * (src/Columns/ColumnObject.cpp dumpStructure / serialization): paths
  * are stored sorted, leaf scalars are Dynamic values whose TEXT form is
  * emitted as a JSON STRING (42 -> "42"), booleans stay bare, null paths
  * are dropped, arrays keep element order with the same leaf rule. */
object JsonNorm {
  private val mapper = new ObjectMapper()

  def normalize(s: UTF8String): UTF8String = {
    val node = mapper.readTree(s.toString)
    val sb = new java.lang.StringBuilder
    emit(node, sb)
    UTF8String.fromString(sb.toString)
  }

  private def quote(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case ch if ch < ' ' => sb.append(f"\\u${ch.toInt}%04x")
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.append('"')
  }

  private def scalarText(n: JsonNode): String =
    if (n.isIntegralNumber) n.bigIntegerValue.toString
    else if (n.isFloatingPointNumber) {
      val d = n.doubleValue
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    } else n.asText

  private def emit(n: JsonNode, sb: java.lang.StringBuilder): Unit = {
    if (n.isObject) {
      sb.append('{')
      val names = {
        val it = n.fieldNames()
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) b += it.next()
        b.sorted
      }
      var first = true
      for (k <- names) {
        val v = n.get(k)
        if (!v.isNull) { // null paths are absent in the JSON column
          if (!first) sb.append(',')
          first = false
          quote(k, sb)
          sb.append(':')
          emit(v, sb)
        }
      }
      sb.append('}')
    } else if (n.isArray) {
      sb.append('[')
      var i = 0
      while (i < n.size()) {
        if (i > 0) sb.append(',')
        emit(n.get(i), sb)
        i += 1
      }
      sb.append(']')
    } else if (n.isBoolean) sb.append(if (n.booleanValue) "true" else "false")
    else if (n.isNull) sb.append("null") // only reachable inside arrays
    else quote(scalarText(n), sb)
  }
}

case class ChJsonNorm(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else JsonNorm.normalize(v.asInstanceOf[UTF8String])
  }
  override protected def withNewChildInternal(c: Expression): ChJsonNorm =
    copy(child = c)
}
