package graft.tools

import org.apache.spark.sql.SparkSession
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Acceptance runner for the reference's performance-test SQL corpus
  * (tests/performance, 357 XML files) — a public library of
  * HEAVY-operator query shapes (hits-style wide aggregations, multi-key
  * topK, large IN sets, codec/format sweeps) that the stateless anchors
  * barely touch. Each `<query>` body is executed through the dialect
  * for ACCEPTANCE (parse + execute without error), not timing:
  * substitutions take their first listed value, the documented hits
  * tables map to a deterministic synthetic `perf_hits` fixture, and
  * generator cardinalities are downscaled (we check the SHAPE compiles
  * and runs, the scale path is the bench's job).
  *
  * Used by tools.PerfShapeScout (full-corpus sweep + reject histogram)
  * and PerfShapeSpec (curated accepted list, regression-pinned). */
object PerfShapes {
  /** The public hits columns the perf corpus actually references,
    * synthesized deterministically (reference
    * docs/getting-started/example-datasets/metrica.md schema; values are
    * hash-derived, NOT the dataset). 10k rows — acceptance scale. */
  def registerHits(spark: SparkSession): Unit = {
    val hits = spark.range(0, 10000).selectExpr(
      "pmod(xxhash64(id), 1000000000) AS WatchID",
      "CAST(id % 2 AS INT) AS JavaEnable",
      "concat('Title ', CAST(id % 997 AS STRING)) AS Title",
      "CAST(1 AS INT) AS GoodEvent",
      "timestamp_seconds(1372600000 + (id % 86400)) AS EventTime",
      "date_add(DATE'2013-07-01', CAST(id % 30 AS INT)) AS EventDate",
      "CAST(id % 100 AS INT) AS CounterID",
      "pmod(xxhash64(id, 1), 4294967296) AS ClientIP",
      "CAST(id % 5000 AS INT) AS RegionID",
      "pmod(xxhash64(id, 2), 100000) AS UserID",
      "CAST(id % 90 AS INT) AS Age",
      "CAST(id % 2 AS INT) AS Sex",
      "CAST(id % 10 AS INT) AS Income",
      "CAST(id % 8 AS INT) AS AdvEngineID",
      "CAST(id % 20 AS INT) AS SearchEngineID",
      "CASE WHEN id % 5 = 0 THEN '' ELSE concat('phrase ', CAST(id % 211 AS STRING)) END AS SearchPhrase",
      "concat('http://example.com/', CAST(id % 499 AS STRING), '/page?ref=', CAST(id % 7 AS STRING)) AS URL",
      "CASE WHEN id % 3 = 0 THEN '' ELSE concat('http://referer.org/', CAST(id % 101 AS STRING)) END AS Referer",
      "CAST(1000 + id % 1000 AS INT) AS ResolutionWidth",
      "CAST(600 + id % 600 AS INT) AS ResolutionHeight",
      "CAST(id % 3 AS INT) AS MobilePhone",
      "CASE WHEN id % 4 = 0 THEN '' ELSE concat('model-', CAST(id % 37 AS STRING)) END AS MobilePhoneModel",
      "concat('charset-', CAST(id % 5 AS STRING)) AS PageCharset",
      "CAST(id % 19 - 9 AS INT) AS TraficSourceID",
      "xxhash64(id, 3) AS RefererHash",
      "xxhash64(id, 4) AS URLHash",
      "CAST(id % 2 AS INT) AS CookieEnable",
      "CAST(id % 100 AS INT) AS UserAgent",
      "CAST(id % 50 AS INT) AS OS",
      "CAST(id % 25 AS INT) AS UserAgentMajor",
      "CAST(id % 4 AS INT) AS CounterClass",
      "CAST(id % 1400 AS INT) AS WindowClientWidth",
      "CAST(id % 900 AS INT) AS WindowClientHeight",
      "CAST(id % 11 AS INT) AS FetchTiming",
      "CAST(id % 13 AS INT) AS SendTiming",
      "CAST(id % 7 AS INT) AS DNSTiming",
      "concat('param=', CAST(id % 53 AS STRING)) AS Params",
      "concat('title one two three ', CAST(id % 89 AS STRING)) AS PageTitle",
      "CAST(id % 1000000 AS BIGINT) AS FUniqID",
      "CAST(id AS BIGINT) AS HitColor_n",
      "substring('WGP', CAST(id % 3 AS INT) + 1, 1) AS HitColor",
      "CAST(id % 2 AS INT) AS IsRefresh",
      "CAST(id % 2 AS INT) AS IsLink",
      "CAST(id % 2 AS INT) AS IsDownload",
      "CAST(id % 2 AS INT) AS DontCountHits",
      "CAST(id % 3600 AS INT) AS ClientTimeZone",
      "concat('en-', CAST(id % 9 AS STRING)) AS BrowserLanguage",
      "concat('RU', CAST(id % 9 AS STRING)) AS BrowserCountry",
      "CAST(id % 16 AS INT) AS ClientEventTime_n",
      "timestamp_seconds(1372600000 + (id % 86400)) AS ClientEventTime",
      "CAST(id % 1000 AS BIGINT) AS RemoteIP",
      "pmod(xxhash64(id, 5), 18446744073709551) AS UserIDHash",
      "concat('opnstat-', CAST(id % 17 AS STRING)) AS OpenstatServiceName",
      // r16: the residual unresolved-column head of the r15 perf sweep
      "CAST(id % 2 AS INT) AS Refresh",
      "CAST(id % 2 AS INT) AS IsMobile",
      "CASE WHEN id % 6 = 0 THEN '' ELSE concat('utm-src-', CAST(id % 13 AS STRING)) END AS UTMSource",
      "CASE WHEN id % 6 = 1 THEN '' ELSE concat('utm-med-', CAST(id % 7 AS STRING)) END AS UTMMedium",
      "CASE WHEN id % 6 = 2 THEN '' ELSE concat('utm-cmp-', CAST(id % 23 AS STRING)) END AS UTMCampaign",
      "CASE WHEN id % 6 = 3 THEN '' ELSE concat('utm-cnt-', CAST(id % 11 AS STRING)) END AS UTMContent",
      "CASE WHEN id % 6 = 4 THEN '' ELSE concat('utm-term-', CAST(id % 19 AS STRING)) END AS UTMTerm",
      "CAST(id % 10000 AS BIGINT) AS ParamPrice",
      "CAST(id % 4096 AS INT) AS IPNetworkID",
      "CASE WHEN id % 5 = 0 THEN '' ELSE concat('social/', CAST(id % 31 AS STRING)) END AS SocialSourcePage",
      "concat('osrc-', CAST(id % 29 AS STRING)) AS OpenstatSourceID",
      "concat('ocmp-', CAST(id % 41 AS STRING)) AS OpenstatCampaignID",
      "concat('oad-', CAST(id % 43 AS STRING)) AS OpenstatAdID",
      "CASE WHEN id % 7 = 0 THEN '' ELSE concat('tag-', CAST(id % 47 AS STRING)) END AS FromTag",
      "concat('fm2-', CAST(id % 5 AS STRING)) AS FlashMinor2",
      "concat('::ffff:10.0.', CAST(id % 256 AS STRING), '.', CAST(id % 250 AS STRING)) AS ClientIP6",
      // r18: sequence_match.xml array-condition queries
      "CASE WHEN id % 4 = 0 THEN array() ELSE array(CAST(id % 10 AS INT), " +
        "CAST(1 + id % 3849 AS INT), CAST(id % 2326 AS INT)) END AS RefererCategories",
      "CAST(id % 37 AS INT) AS RequestNum")
      .drop("HitColor_n", "ClientEventTime_n")
    hits.createOrReplaceTempView("perf_hits")
  }

  private val hitsTableRe =
    ("(?i)\\b(test\\.hits(?:_s3)?|default\\.hits_10m_single|hits_100m_single|" +
      "hits_10m_single|hits_1m_single|hits_10m|hits_single|hits)\\b").r
  private val genClampRe =
    "(?i)\\b(numbers_mt|numbers|zeros_mt|zeros)\\s*\\(\\s*(\\d+)\\s*\\)".r
  private val limitClampRe = "(?i)\\bLIMIT\\s+(\\d{7,})\\b".r
  // scalar array builders: range(100000000) is a 100M-element ARRAY in
  // one row — clamp every oversized literal argument (acceptance checks
  // the shape, not scale)
  private val rangeClampRe = "(?i)\\brange\\s*\\(([^()]*)\\)".r

  /** Substitute placeholders/tables and downscale generator cardinality. */
  def prepareText(q0: String, subs: Map[String, String]): String = {
    var q = q0
    for ((k, v) <- subs) q = q.replace("{" + k + "}", v)
    q = hitsTableRe.replaceAllIn(q, "perf_hits")
    q = genClampRe.replaceAllIn(q, m => {
      val n = BigInt(m.group(2))
      val cap = if (n > 100000) "100000" else m.group(2)
      s"${m.group(1)}($cap)"
    })
    q = limitClampRe.replaceAllIn(q, "LIMIT 100000")
    q = rangeClampRe.replaceAllIn(q, m => {
      val inner = "\\d{5,}".r.replaceAllIn(m.group(1), "10000")
      java.util.regex.Matcher.quoteReplacement(s"range($inner)")
    })
    q.trim
  }

  case class PerfFile(name: String, subs: Map[String, String],
                      creates: Seq[String], fills: Seq[String],
                      queries: Seq[String])

  def loadFile(path: java.io.File): Either[String, PerfFile] =
    try {
      val x = scala.xml.XML.loadFile(path)
      val subs = (x \ "substitutions" \ "substitution").flatMap { s =>
        val n = (s \ "name").text.trim
        val vs = (s \ "values" \ "value").map(_.text.trim)
        vs.headOption.map(n -> _)
      }.toMap
      Right(PerfFile(path.getName, subs,
        (x \ "create_query").map(_.text.trim),
        (x \ "fill_query").map(_.text.trim),
        (x \ "query").map(_.text.trim).filter(_.nonEmpty)))
    } catch { case e: Throwable => Left(s"xml: ${e.getMessage}") }

  /** Run one statement for acceptance, bounded by `timeout` (the job
    * group is cancelled on expiry — a shape that needs more than that at
    * 10k rows is rejected as runaway, not accepted slow). */
  def runStmt(spark: SparkSession, dir: String, q: String,
              timeout: FiniteDuration = 30.seconds): Either[String, Unit] = {
    val tag = s"perfshape-${System.nanoTime()}"
    // job-group properties are THREAD-local: set them on the thread that
    // actually submits the jobs (inside the Future), or cancelJobGroup
    // after a timeout cancels nothing
    val fut = Future {
      spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = true)
      try graft.sqlfront.ChSql.sql(spark, dir, q).foreach(_ => ())
      finally spark.sparkContext.clearJobGroup()
    }
    try { Await.result(fut, timeout); Right(()) }
    catch {
      case _: concurrent.TimeoutException =>
        spark.sparkContext.cancelJobGroup(tag)
        Left("timeout")
      case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.take(2).mkString(" | ").take(300))
    } finally spark.sparkContext.clearJobGroup()
  }

  /** Prepare a file's tables (reset + hits + creates + fills); returns
    * the first setup error, if any. */
  def setup(spark: SparkSession, dir: String, pf: PerfFile,
            timeout: FiniteDuration = 30.seconds): Option[String] = {
    graft.sqlfront.ChSql.resetSessionState(spark)
    registerHits(spark)
    (pf.creates ++ pf.fills).iterator
      .map(c => runStmt(spark, dir, prepareText(c, pf.subs), timeout))
      .collectFirst { case Left(e) => e }
  }
}
