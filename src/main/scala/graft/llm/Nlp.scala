package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dictionary-backed NLP functions (reference: src/Functions/lemmatize.cpp,
  * src/Functions/synonyms.cpp, FunctionsTonalityClassification.cpp,
  * FunctionsProgrammingClassification.cpp). In the reference these are all
  * lookups into externally-loaded dictionaries (Interpreters/Lemmatizers
  * morphology files, Common/FrequencyHolder weighted word lists); here the
  * dictionaries are compact embedded literals, so every function is a pure
  * map-side Column expression that stays broadcast-free and shuffle-free.
  *
  * ONE SOURCE OF TRUTH: the same Scala Seqs that build the Spark map
  * literals also render the DuckDB oracle dictionaries (sqlMap / sqlList
  * below) — the two engines can never drift on dictionary contents.
  */
object Nlp {

  // --------------------------------------------------------------- lemmatize

  /** Mechanical English inflections of a base word: plural, gerund, past.
    * Standard orthography rules (sibilant -es, consonant-y -> -ies,
    * e-drop before -ing, CVC doubling). */
  private def inflections(w: String): Seq[(String, String)] = {
    val sibilant = w.matches(".*(s|sh|ch|x|z)$")
    val consY = w.matches(".*[^aeiou]y$")
    val cvc = w.matches(".*[^aeiou][aeiou][^aeiouwxy]$")
    val plural =
      if (sibilant) w + "es"
      else if (consY) w.dropRight(1) + "ies"
      else w + "s"
    val gerund =
      if (w.endsWith("e") && !w.endsWith("ee")) w.dropRight(1) + "ing"
      else if (cvc) w + w.last + "ing"
      else w + "ing"
    val past =
      if (w.endsWith("e")) w + "d"
      else if (consY) w.dropRight(1) + "ied"
      else if (cvc) w + w.last + "ed"
      else w + "ed"
    Seq(plural -> w, gerund -> w, past -> w)
  }

  /** Irregular forms + generated inflection table over the corpus
    * vocabulary. A dictionary lemmatizer maps unknown forms to themselves
    * (same contract as the reference's Lemmatizers::lemmatize). */
  val lemmaDict: Seq[(String, String)] = {
    val irregular = Seq(
      "went" -> "go", "gone" -> "go", "goes" -> "go", "going" -> "go",
      "ran" -> "run", "running" -> "run", "runs" -> "run",
      "mice" -> "mouse", "children" -> "child", "feet" -> "foot",
      "better" -> "good", "best" -> "good", "worse" -> "bad", "worst" -> "bad",
      "wrote" -> "write", "written" -> "write", "took" -> "take",
      "taken" -> "take", "gave" -> "give", "given" -> "give",
      "made" -> "make", "built" -> "build", "kept" -> "keep", "held" -> "hold")
    val vocab = Seq("join", "hash", "row", "batch", "scan", "column",
      "filter", "merge", "order", "vector", "line", "table", "value", "key",
      "stream", "window", "group", "part", "sort", "query", "dup", "agg",
      "customer", "small", "slow", "big", "fast", "data", "spark")
    (irregular ++ vocab.flatMap(inflections)).distinct
  }

  private lazy val lemmaMapCol = typedLit(lemmaDict.toMap)

  /** Dictionary lemmatization (case-folded; unknown words unchanged). */
  def lemmatize(word: Column): Column =
    coalesce(element_at(lemmaMapCol, lower(word)), lower(word))

  // ---------------------------------------------------------------- synonyms

  /** Synonym sets (reference synonyms.cpp returns the whole extension line
    * for a word). Each word belongs to at most one set; lookup returns the
    * full set (including the word), unknown -> empty. */
  val synonymSets: Seq[Seq[String]] = Seq(
    Seq("fast", "quick", "rapid", "swift"),
    Seq("slow", "sluggish", "gradual"),
    Seq("big", "large", "huge"),
    Seq("small", "tiny", "compact"),
    Seq("merge", "combine", "unite"),
    Seq("sort", "order", "arrange"),
    Seq("table", "relation", "grid"),
    Seq("query", "request", "lookup"),
    Seq("value", "amount", "quantity"),
    Seq("key", "identifier", "handle"),
    Seq("stream", "flow", "feed"),
    Seq("scan", "sweep", "pass"))

  private val synMap: Map[String, Seq[String]] =
    synonymSets.flatMap(s => s.map(w => w -> s)).toMap

  private lazy val synMapCol = typedLit(synMap)

  def synonyms(word: Column): Column =
    coalesce(element_at(synMapCol, lower(word)), array().cast("array<string>"))

  // ---------------------------------------------------------------- tonality

  /** Emotional dictionary: word -> weight in [-12, 6] (the reference's
    * FrequencyHolder emotional dict uses the same range; tonality is the
    * mean weight of matched words rescaled to [-1, 1]). */
  val tonalityDict: Seq[(String, Int)] = Seq(
    "fast" -> 5, "good" -> 6, "great" -> 6, "clean" -> 4, "spark" -> 4,
    "value" -> 3, "merge" -> 3, "stream" -> 2, "filter" -> 2, "big" -> 2,
    "small" -> 1, "batch" -> 1, "hash" -> 1,
    "scan" -> -2, "dup" -> -5, "slow" -> -8, "bad" -> -9, "error" -> -10,
    "garbage" -> -11, "fail" -> -12)

  private lazy val tonalityMapCol = typedLit(tonalityDict.toMap)

  /** Word tokens: split on runs of non-alphanumerics, drop empties (the
    * reference's isWhitespaceASCII/isPunctuationASCII word scanner). */
  private def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** detectTonality: average dictionary weight of matched words, scaled
    * to [-1,1] (positive averages / 6, negative / 12 — the dictionary
    * range is asymmetric); 0.0 when no word matches. */
  def detectTonality(text: Column): Column = {
    val ws = filter(
      transform(wordTokens(text), t => element_at(tonalityMapCol, t)),
      w => w.isNotNull)
    val n = size(ws)
    val w = aggregate(ws, lit(0L), (acc, x) => acc + x).cast("double")
    when(n === 0, lit(0.0))
      .when(w > 0, w / n / 6.0)
      .otherwise(w / n / 12.0)
  }

  // ------------------------------------------- programming classification

  /** Keyword-frequency language profiles (the reference's programming
    * classifier votes FrequencyHolder keyword weights the same way). */
  val progKeywords: Seq[(String, Seq[String])] = Seq(
    "sql" -> Seq("table", "query", "join", "group", "order", "filter"),
    "spark" -> Seq("spark", "batch", "stream", "window", "agg"),
    "storage" -> Seq("scan", "merge", "part", "row", "column"),
    "vector" -> Seq("vector", "hash", "key", "value", "sort"))

  /** detectProgrammingLanguage: the profile with the most keyword token
    * hits; earlier-declared profile wins ties; no hits -> 'undefined'. */
  def detectProgrammingLanguage(text: Column): Column = {
    val toks = wordTokens(text)
    val counts = progKeywords.map { case (lang, kws) =>
      lang -> size(filter(toks, t => kws.map(k => t === k).reduce(_ || _)))
    }
    val branches = counts.zipWithIndex.map { case ((lang, c), i) =>
      val laterMax = counts.drop(i + 1).map(_._2)
      val cond = laterMax.foldLeft(c > 0)((acc, o) => acc && c >= o)
      (cond, lang)
    }
    branches.foldRight(lit("undefined")) { case ((cond, lang), rest) =>
      when(cond, lit(lang)).otherwise(rest)
    }
  }

  // ------------------------------------------------------ query normalization

  /** normalizeQuery (reference src/Functions/normalizeQuery.cpp /
    * Parsers/queryNormalization.h): replace string and numeric literals
    * with '?', collapse literal lists to '?..' — the fingerprint used to
    * group query-log entries. Pure regexp chain (same regexes run in the
    * DuckDB oracle). */
  def normalizeQuery(q: Column): Column = {
    val noStr = regexp_replace(q, "'([^'\\\\]|\\\\.)*'", "?")
    val noNum = regexp_replace(noStr, "\\b[0-9]+(\\.[0-9]+)?\\b", "?")
    regexp_replace(noNum, "\\?(\\s*,\\s*\\?)+", "?..")
  }

  /** normalizedQueryHash — 64-bit fingerprint of the normalized text. */
  def normalizedQueryHash(q: Column): Column = xxhash64(normalizeQuery(q))

  // --------------------------------------------------- oracle SQL rendering

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB map literal from string pairs: map(['k',...], ['v',...]). */
  def sqlMap(pairs: Seq[(String, String)]): String =
    "map(" + pairs.map(p => q(p._1)).mkString("[", ",", "]") + ", " +
      pairs.map(p => q(p._2)).mkString("[", ",", "]") + ")"

  /** DuckDB map literal with integer values. */
  def sqlMapInt(pairs: Seq[(String, Int)]): String =
    "map(" + pairs.map(p => q(p._1)).mkString("[", ",", "]") + ", " +
      pairs.map(_._2.toString).mkString("[", ",", "]") + ")"

  /** DuckDB map literal with list-of-string values. */
  def sqlMapList(m: Seq[(String, Seq[String])]): String =
    "map(" + m.map(p => q(p._1)).mkString("[", ",", "]") + ", " +
      m.map(p => p._2.map(q).mkString("[", ",", "]")).mkString("[", ",", "]") + ")"

  /** The synonym map as (word -> set) pairs in deterministic order. */
  def synPairs: Seq[(String, Seq[String])] =
    synonymSets.flatMap(s => s.map(w => w -> s))

  /** DuckDB list literal of strings. */
  def sqlList(xs: Seq[String]): String = xs.map(q).mkString("[", ",", "]")
}
