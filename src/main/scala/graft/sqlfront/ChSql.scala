package graft.sqlfront

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ClickHouse-dialect SQL front-end (SURVEY.md §3.1 "thin dialect layer"):
  * rewrites the CH-isms the reference parser accepts
  * (src/Parsers/ParserSelectQuery.cpp: FINAL, PREWHERE, QUALIFY,
  * LIMIT n BY, function-name surface) into Spark SQL, then delegates to
  * Catalyst. This is a pragmatic textual rewriter, not a full parser —
  * it handles the documented constructs on well-formed SELECTs and passes
  * everything else through untouched.
  */
object ChSql {

  /** 1:1 function-name aliases (CH name -> Spark SQL name). */
  val aliases: Map[String, String] = Map(
    // date/time extract
    "toYear" -> "year", "toMonth" -> "month", "toDayOfMonth" -> "day",
    "toHour" -> "hour", "toMinute" -> "minute", "toSecond" -> "second",
    "toDayOfYear" -> "dayofyear", "toQuarter" -> "quarter",
    "toISOWeek" -> "weekofyear",
    "toDayOfWeek" -> "iso_weekday", // template below: CH is Mon=1..Sun=7 (ISO)
    "toUnixTimestamp" -> "unix_timestamp",
    "fromUnixTimestamp" -> "from_unixtime",
    "formatDateTime" -> "date_format",
    "dateDiff" -> "timestampdiff", "date_diff" -> "timestampdiff", // templates below: unit quotes stripped
    "addDays" -> "date_add", "subtractDays" -> "date_sub",
    "makeDate" -> "make_date",
    // string
    "lengthUTF8" -> "length", "lowerUTF8" -> "lower", "upperUTF8" -> "upper",
    "substringUTF8" -> "substring", "mid" -> "substring",
    "positionCaseInsensitive" -> "instr_ci", // template below: lower() both sides
    "concatWithSeparator" -> "concat_ws",
    "splitByChar" -> "split_by_char", // handled by template below
    "match" -> "rlike", "extract" -> "regexp_extract",
    "replaceAll" -> "replace", "replaceRegexpAll" -> "regexp_replace",
    "countSubstrings" -> "regexp_count",
    "editDistance" -> "levenshtein", "levenshteinDistance" -> "levenshtein",
    "startsWith" -> "startswith", "endsWith" -> "endswith",
    "trimBoth" -> "trim", "trimLeft" -> "ltrim", "trimRight" -> "rtrim",
    "leftPad" -> "lpad", "rightPad" -> "rpad",
    // math / misc
    "modulo" -> "mod", "plus" -> "try_add",
    "ln" -> "ln", "log2" -> "log2", "log10" -> "log10",
    "roundBankers" -> "bround", "cbrt" -> "cbrt",
    "bitCount" -> "bit_count",
    // conditionals
    "multiIf" -> "case_when_chain", // template below
    "if" -> "if", "ifNull" -> "nvl", "nullIf" -> "nullif",
    "assumeNotNull" -> "coalesce",
    // aggregates
    "uniq" -> "approx_count_distinct", "uniqHLL12" -> "approx_count_distinct",
    "uniqCombined" -> "approx_count_distinct", "uniqExact" -> "count_distinct",
    "groupArray" -> "collect_list", "groupUniqArray" -> "collect_set",
    "anyLast" -> "last", "any" -> "first", "anyHeavy" -> "mode",
    "argMin" -> "min_by", "argMax" -> "max_by",
    "avgWeighted" -> "avg_weighted", // template below
    "varPop" -> "var_pop", "varSamp" -> "var_samp",
    "stddevPop" -> "stddev_pop", "stddevSamp" -> "stddev_samp",
    "covarPop" -> "covar_pop", "covarSamp" -> "covar_samp",
    "skewPop" -> "skewness", "kurtPop" -> "kurtosis",
    "medianExact" -> "median", "quantileExact" -> "percentile",
    "quantile" -> "percentile_approx",
    "topK" -> "top_k", // template below (graft custom)
    // arrays
    "arrayJoin" -> "explode", "has" -> "array_contains",
    "arrayConcat" -> "concat", "arraySlice" -> "slice",
    "arrayUniq" -> "array_size_distinct", // template below
    "arrayDistinct" -> "array_distinct", "arraySort" -> "array_sort",
    "arrayReverse" -> "reverse", "arrayFlatten" -> "flatten",
    "arrayCompact" -> "array_compact", "arrayZip" -> "arrays_zip",
    "indexOf" -> "array_position", "arrayElement" -> "element_at",
    
    "arrayCumSum" -> "array_cum_sum", // no direct; leave template-less
    "arrayStringConcat" -> "array_join", "emptyArrayString" -> "array",
    // json
    "JSONExtractString" -> "get_json_object",
    "JSONLength" -> "json_array_length",
    "toJSONString" -> "to_json",
    "visitParamExtractRaw" -> "get_json_object",
    // hash / encode
    "cityHash64" -> "xxhash64", "sipHash64" -> "xxhash64",
    "halfMD5" -> "xxhash64", "MD5" -> "md5",
    "hex" -> "hex", "unhex" -> "unhex",
    "base64Encode" -> "base64", "base64Decode" -> "unbase64",
    "bitHammingDistance" -> "bit_hamming" // template below
  )

  /** Split a function-argument string on top-level commas. */
  private[sqlfront] def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var last = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(last, i); last = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(last)
    out.map(_.trim).toSeq
  }

  /** Find `name(` occurrences (word boundary), rewrite via `f(args)`. */
  private def rewriteCalls(sql: String, name: String)(f: Seq[String] => String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val idx = sql.indexOf(name + "(", i)
      val boundaryOk = idx >= 0 &&
        (idx == 0 || !Character.isLetterOrDigit(sql.charAt(idx - 1)) && sql.charAt(idx - 1) != '_')
      if (idx < 0) { sb.append(sql.substring(i)); i = sql.length }
      else if (!boundaryOk) { sb.append(sql.substring(i, idx + name.length)); i = idx + name.length }
      else {
        sb.append(sql.substring(i, idx))
        // find matching close paren
        var depth = 0; var j = idx + name.length; var end = -1; var inStr = false
        while (j < sql.length && end < 0) {
          val c = sql.charAt(j)
          if (inStr) { if (c == '\'') inStr = false }
          else if (c == '\'') inStr = true
          else if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth == 0) end = j }
          j += 1
        }
        if (end < 0) { sb.append(sql.substring(idx)); i = sql.length }
        else {
          val args = splitArgs(sql.substring(idx + name.length + 1, end))
          sb.append(f(args))
          i = end + 1
        }
      }
    }
    sb.toString
  }

  /** CH array literals `[a, b]` -> `array(a, b)`, leaving subscripts
    * (`expr[1]`) untouched: a bracket is a literal iff the previous
    * non-space char is not an identifier char, ')' or ']'. */
  private[sqlfront] def rewriteArrayLiterals(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
      else if (c == '[') {
        // subscript only when the bracket DIRECTLY follows an expression
        // (identifier char, ')' or ']'); whitespace before '[' => literal
        val prev = if (sb.nonEmpty) sb.charAt(sb.length - 1) else ' '
        val isSubscript = Character.isLetterOrDigit(prev) || prev == '_' ||
          prev == ')' || prev == ']'
        if (isSubscript) {
          // CH subscripts are 1-based; Spark's [] is 0-based. Rewrite
          // `prim[idx]` -> `element_at(prim, idx)` by backtracking to the
          // start of the preceding primary expression.
          var depth = 0; var j = i; var end = -1; var s2 = false
          while (j < sql.length && end < 0) {
            val ch = sql.charAt(j)
            if (s2) { if (ch == '\'') s2 = false }
            else if (ch == '\'') s2 = true
            else if (ch == '[') depth += 1
            else if (ch == ']') { depth -= 1; if (depth == 0) end = j }
            j += 1
          }
          if (end < 0) { sb.append(c); i += 1 }
          else {
            val idx = rewriteArrayLiterals(sql.substring(i + 1, end))
            // backtrack over the primary expression in sb
            var k = sb.length - 1
            def matchBack(open: Char, close: Char): Unit = {
              var d = 0
              while (k >= 0) {
                val ch = sb.charAt(k)
                if (ch == close) d += 1
                else if (ch == open) { d -= 1; if (d == 0) { k -= 1; return } }
                k -= 1
              }
            }
            if (sb.charAt(k) == ')') matchBack('(', ')')
            else if (sb.charAt(k) == ']') matchBack('[', ']')
            while (k >= 0 && (Character.isLetterOrDigit(sb.charAt(k)) || sb.charAt(k) == '_' || sb.charAt(k) == '.'))
              k -= 1
            val prim = sb.substring(k + 1)
            sb.setLength(k + 1)
            sb.append("element_at(").append(prim).append(", ").append(idx).append(")")
            i = end + 1
          }
        }
        else {
          // find matching ] at depth 0
          var depth = 0; var j = i; var end = -1; var s2 = false
          while (j < sql.length && end < 0) {
            val ch = sql.charAt(j)
            if (s2) { if (ch == '\'') s2 = false }
            else if (ch == '\'') s2 = true
            else if (ch == '[') depth += 1
            else if (ch == ']') { depth -= 1; if (depth == 0) end = j }
            j += 1
          }
          if (end < 0) { sb.append(c); i += 1 }
          else {
            val innerRewritten = rewriteArrayLiterals(sql.substring(i + 1, end))
            sb.append("array(").append(innerRewritten).append(")")
            i = end + 1
          }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Apply all rewrites to a ClickHouse-flavoured SELECT. */
  def rewrite(chSql: String): String = {
    var q = chSql

    // trailing FORMAT clause (output format is the writer's concern here)
    q = q.replaceAll("""(?is)\bFORMAT\s+\w+\s*;?\s*$""", "")

    // array literals before anything else
    q = rewriteArrayLiterals(q)

    // count() -> count(*)
    q = q.replaceAll("""\bcount\(\s*\)""", "count(*)")

    // GLOBAL IN / GLOBAL JOIN are distribution hints in the reference;
    // Spark's optimizer owns distribution — drop the modifier.
    q = q.replaceAll("""(?i)\bGLOBAL\s+(IN|NOT\s+IN|JOIN|ANY|ALL)\b""", "$1")

    // ALL JOIN strictness modifier (reference Joins.h All) is Spark's
    // default join semantics — drop it.
    q = q.replaceAll("""(?i)\bALL\s+(INNER|LEFT|RIGHT|FULL)\b""", "$1")

    // templates (argument-restructuring rewrites) — before plain aliases
    // CH higher-order fns take the LAMBDA first; Spark takes the array first.
    q = rewriteCalls(q, "arrayMap")(a => s"transform(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "arrayFilter")(a => s"filter(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "arrayExists")(a =>
      if (a.length == 2) s"exists(${a(1)}, ${a(0)})" else s"exists(${a(0)}, x -> x)")
    q = rewriteCalls(q, "arrayAll")(a =>
      if (a.length == 2) s"forall(${a(1)}, ${a(0)})" else s"forall(${a(0)}, x -> x)")
    q = rewriteCalls(q, "arrayCount")(a =>
      if (a.length == 2) s"size(filter(${a(1)}, ${a(0)}))" else s"size(filter(${a(0)}, x -> x))")
    q = rewriteCalls(q, "arraySum")(a =>
      if (a.length == 2) s"aggregate(${a(1)}, CAST(0 AS DOUBLE), (acc, x) -> acc + ${a(0)}(x))"
      else s"aggregate(${a(0)}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    q = rewriteCalls(q, "intDiv")(a => s"((${a(0)}) div (${a(1)}))")
    // CH divide(): float division, x/0 -> ±Inf, 0/0 -> NaN (never error)
    q = rewriteCalls(q, "divide")(a =>
      s"(CASE WHEN CAST(${a(1)} AS DOUBLE) = 0.0 THEN " +
        s"CASE WHEN CAST(${a(0)} AS DOUBLE) > 0.0 THEN CAST('Infinity' AS DOUBLE) " +
        s"WHEN CAST(${a(0)} AS DOUBLE) < 0.0 THEN CAST('-Infinity' AS DOUBLE) " +
        s"ELSE CAST('NaN' AS DOUBLE) END " +
        s"ELSE CAST(${a(0)} AS DOUBLE) / CAST(${a(1)} AS DOUBLE) END)")
    // CH toDayOfWeek default mode is ISO Monday=1..Sunday=7; Spark's
    // dayofweek is Sunday=1 — use weekday() (Monday=0) + 1 instead.
    q = rewriteCalls(q, "toDayOfWeek")(a => s"(weekday(${a(0)}) + 1)")
    q = rewriteCalls(q, "positionCaseInsensitive")(a => s"instr(lower(${a(0)}), lower(${a(1)}))")
    // CH dateDiff('day', a, b): unit arrives as a string literal; Spark's
    // timestampdiff needs a bare unit identifier.
    val stripUnit = (u: String) => u.replaceAll("'", "").trim.toUpperCase
    q = rewriteCalls(q, "dateDiff")(a => s"timestampdiff(${stripUnit(a(0))}, ${a(1)}, ${a(2)})")
    q = rewriteCalls(q, "date_diff")(a => s"timestampdiff(${stripUnit(a(0))}, ${a(1)}, ${a(2)})")
    q = rewriteCalls(q, "position")(a => s"instr(${a(0)}, ${a(1)})")
    q = rewriteCalls(q, "sumIf")(a => s"sum(CASE WHEN ${a(1)} THEN ${a(0)} END)")
    q = rewriteCalls(q, "countIf")(a => s"count(CASE WHEN ${a(0)} THEN 1 END)")
    q = rewriteCalls(q, "avgIf")(a => s"avg(CASE WHEN ${a(1)} THEN ${a(0)} END)")
    q = rewriteCalls(q, "minIf")(a => s"min(CASE WHEN ${a(1)} THEN ${a(0)} END)")
    q = rewriteCalls(q, "maxIf")(a => s"max(CASE WHEN ${a(1)} THEN ${a(0)} END)")
    q = rewriteCalls(q, "uniqExact")(a => s"count(DISTINCT ${a.mkString(", ")})")
    q = rewriteCalls(q, "toString")(a => s"cast(${a(0)} AS string)")
    q = rewriteCalls(q, "toInt64")(a => s"cast(${a(0)} AS bigint)")
    q = rewriteCalls(q, "toInt32")(a => s"cast(${a(0)} AS int)")
    q = rewriteCalls(q, "toFloat64")(a => s"cast(${a(0)} AS double)")
    q = rewriteCalls(q, "toInt64OrNull")(a => s"try_cast(${a(0)} AS bigint)")
    q = rewriteCalls(q, "toInt64OrZero")(a => s"coalesce(try_cast(${a(0)} AS bigint), 0)")
    q = rewriteCalls(q, "toDate")(a => s"to_date(${a(0)})")
    q = rewriteCalls(q, "toStartOfDay")(a => s"date_trunc('day', ${a(0)})")
    q = rewriteCalls(q, "toStartOfHour")(a => s"date_trunc('hour', ${a(0)})")
    q = rewriteCalls(q, "toStartOfMonth")(a => s"date_trunc('month', ${a(0)})")
    q = rewriteCalls(q, "toStartOfQuarter")(a => s"date_trunc('quarter', ${a(0)})")
    q = rewriteCalls(q, "toStartOfYear")(a => s"date_trunc('year', ${a(0)})")
    q = rewriteCalls(q, "toStartOfWeek")(a => s"date_trunc('week', ${a(0)})")
    q = rewriteCalls(q, "splitByChar")(a => s"split(${a(1)}, ${a(0)})")
    q = rewriteCalls(q, "arrayStringConcat")(a =>
      if (a.length > 1) s"array_join(${a(0)}, ${a(1)})" else s"array_join(${a(0)}, '')")
    q = rewriteCalls(q, "multiIf") { a =>
      val cases = a.dropRight(1).grouped(2).map(p => s"WHEN ${p(0)} THEN ${p(1)}").mkString(" ")
      s"CASE $cases ELSE ${a.last} END"
    }
    q = rewriteCalls(q, "empty")(a => s"(length(${a(0)}) = 0)")
    q = rewriteCalls(q, "notEmpty")(a => s"(length(${a(0)}) > 0)")
    q = rewriteCalls(q, "avgWeighted")(a => s"(sum((${a(0)}) * (${a(1)})) / sum(${a(1)}))")
    q = rewriteCalls(q, "arrayUniq")(a => s"size(array_distinct(${a(0)}))")
    q = rewriteCalls(q, "bitHammingDistance")(a => s"bit_count((${a(0)}) ^ (${a(1)}))")
    q = rewriteCalls(q, "range")(a =>
      if (a.length == 1) s"sequence(0, (${a(0)}) - 1)" else s"sequence(${a(0)}, (${a(1)}) - 1)")
    // parameterized-aggregate syntax quantile[Exact](0.5)(x) -> percentile(x, 0.5)
    q = q.replaceAll("""\bquantile(?:Exact)?\(([0-9.]+)\)\s*\(""", "__QUANTILE__$1(")
    for (p <- Seq("0.5", "0.25", "0.75", "0.9", "0.95", "0.99"))
      q = rewriteCalls(q, s"__QUANTILE__$p")(a => s"percentile(${a(0)}, $p)")
    q = rewriteCalls(q, "quantileExact")(a => s"percentile(${a(0)}, 0.5)")

    // plain 1:1 aliases (word-boundary)
    for ((ch, sp) <- aliases if !Set("splitByChar", "multiIf", "avgWeighted",
        "arrayUniq", "bitHammingDistance", "uniqExact", "quantileExact",
        "arrayStringConcat", "topK", "arrayCumSum",
        "toDayOfWeek", "positionCaseInsensitive", "dateDiff", "date_diff").contains(ch)) {
      q = q.replaceAll(s"""\\b$ch\\s*\\(""", sp + "(")
    }

    // FINAL modifier: our catalog views are already merge-final
    q = q.replaceAll("""(?i)\bFINAL\b""", "")

    // PREWHERE -> WHERE (merge with existing WHERE if both present)
    if (q.matches("(?is).*\\bPREWHERE\\b.*\\bWHERE\\b.*")) {
      // PREWHERE p ... WHERE w  ->  WHERE (p) AND (w)
      val m = java.util.regex.Pattern
        .compile("(?is)PREWHERE(.*?)WHERE(.*?)(GROUP BY|ORDER BY|LIMIT|QUALIFY|$)")
        .matcher(q)
      if (m.find())
        q = q.substring(0, m.start) + "WHERE (" + m.group(1).trim + ") AND (" +
          m.group(2).trim + ") " + q.substring(m.start(3))
    } else q = q.replaceAll("""(?i)\bPREWHERE\b""", "WHERE")

    // QUALIFY cond -> wrap as subquery filter (cond must reference
    // select-list aliases, the common CH usage)
    val qual = java.util.regex.Pattern
      .compile("(?is)(.*)\\bQUALIFY\\b(.*?)(ORDER BY.*|LIMIT.*|$)").matcher(q)
    if (qual.matches()) {
      val (body, cond, tail) = (qual.group(1).trim, qual.group(2).trim, qual.group(3).trim)
      q = s"SELECT * FROM ($body) WHERE $cond $tail"
    }

    // ORDER BY col WITH FILL FROM a TO b STEP s  (reference
    // FillingTransform): generate the grid, left-join the query, order.
    // Missing measure columns stay NULL here (Fill.withFillLong offers
    // default-fill/carry semantics on the DataFrame side).
    val wf = java.util.regex.Pattern
      .compile("(?is)(.*)\\bORDER BY\\s+(\\w+)\\s+WITH FILL\\s+FROM\\s+(\\S+)\\s+TO\\s+(\\S+)\\s+STEP\\s+(\\S+)\\s*$")
      .matcher(q)
    if (wf.matches()) {
      val (body, c, a, b, st) = (wf.group(1).trim, wf.group(2), wf.group(3), wf.group(4), wf.group(5))
      q = s"""SELECT * FROM (SELECT explode(sequence($a, $b, $st)) AS $c) __grid
             |LEFT JOIN ($body) USING ($c) ORDER BY $c""".stripMargin
    }

    // LIMIT n BY (cols): keep first n rows per key in current order
    val lby = java.util.regex.Pattern
      .compile("(?is)(.*?)\\bLIMIT\\s+(\\d+)\\s+BY\\s+\\(?([\\w, ]+?)\\)?\\s*(ORDER BY.*|LIMIT.*|$)")
      .matcher(q)
    if (lby.matches()) {
      val (body, n, cols, tail) = (lby.group(1).trim, lby.group(2), lby.group(3).trim, lby.group(4).trim)
      // order within groups: the query's ORDER BY if present in body, else cols
      val ord = {
        val om = java.util.regex.Pattern.compile("(?is)ORDER BY\\s+(.*)$").matcher(body)
        if (om.find()) om.group(1) else cols
      }
      val bodyNoOrd = body.replaceAll("(?is)ORDER BY\\s+.*$", "")
      q = s"""SELECT * EXCEPT (__rn) FROM (
             |  SELECT *, row_number() OVER (PARTITION BY $cols ORDER BY $ord) AS __rn
             |  FROM ($bodyNoOrd)) WHERE __rn <= $n $tail""".stripMargin
    }

    q.trim
  }

  /** Run a ClickHouse-flavoured query against the fixture catalog.
    * Also provides the reference's `system.numbers` / `system.one`
    * virtual tables (src/TableFunctions + system tables used throughout
    * the reference's stateless tests). */
  def sql(spark: SparkSession, dir: String, chQuery: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.range(0, 100000000L).toDF("number").createOrReplaceTempView("system_numbers")
    spark.range(0, 1).toDF("dummy").createOrReplaceTempView("system_one")
    val q = rewrite(chQuery)
      .replaceAll("""(?i)\bsystem\.numbers\b""", "system_numbers")
      .replaceAll("""(?i)\bsystem\.one\b""", "system_one")
    spark.sql(q)
  }
}
