package graft

import graft.functions.QueryFormat
import org.scalatest.funsuite.AnyFunSuite

/** Pins the formatQuery family against the shapes of the reference's own
  * test (tests/queries/0_stateless/02882_formatQuery.sql|.reference) that
  * the supported dialect subset covers, unescaped from the TSV encoding.
  */
class QueryFormatSpec extends AnyFunSuite {

  private def fq(s: String) = QueryFormat.format(s, singleLine = false)
  private def fq1(s: String) = QueryFormat.format(s, singleLine = true)

  test("02882: trivial selects canonicalize") {
    assert(fq("SELECT 1;").contains("SELECT 1"))
    assert(fq("SELECT 1").contains("SELECT 1"))
    assert(fq("SeLeCt 1;").contains("SELECT 1"))
    assert(fq("SeLeCt 22").contains("SELECT 22"))
    assert(fq("select 1;") == fq("SeLeCt 1"))
    assert(fq1("SELECT 1;").contains("SELECT 1"))
  }

  test("02882: INSERT VALUES collapses to FORMAT Values, table case kept") {
    assert(fq("INSERT INTO tab VALUES ('') ('test')")
      .contains("INSERT INTO tab FORMAT Values"))
    assert(fq("InSerT into TAB values ('')")
      .contains("INSERT INTO TAB FORMAT Values"))
    assert(fq1("INSERT INTO tab VALUES ('') ('test')")
      .contains("INSERT INTO tab FORMAT Values"))
  }

  test("02882: CREATE TABLE multiline and single-line shapes") {
    val in = "CREATE TABLE default.no_prop_table(`some_column` UInt64) ENGINE = MergeTree ORDER BY tuple() SETTINGS index_granularity = 8192"
    val multi = "CREATE TABLE default.no_prop_table\n(\n    `some_column` UInt64\n)\nENGINE = MergeTree\nORDER BY tuple()\nSETTINGS index_granularity = 8192"
    val single = "CREATE TABLE default.no_prop_table (`some_column` UInt64) ENGINE = MergeTree ORDER BY tuple() SETTINGS index_granularity = 8192"
    assert(fq(in).contains(multi))
    assert(fq1(in).contains(single))
  }

  test("02882: EXPLAIN SYNTAX select-list canonicalization") {
    val in = """EXPLAIN SYNTAX SELECT CAST(1 AS INT), CEIL(1), CHAR(49), COALESCE(1), CONCAT('1', '1'), CORR(1, 1), COUNT(1), DATABASE(), DATEDIFF('DAY', toDate('2020-10-24'), toDate('2019-10-24')), EXP(1), FLATTEN([[1]]), IF(1, 1, 1), LCASE('A'), LOCATE('1', '1'), MID('123', 1, 1), MOD(1, 1), NOT(1), NOW64(), NULLIF(1, 1), PI(), POSITION('123', '2'), POW(1, 1), RAND(), ROUND(1), STDDEV_POP(1), SUBSTR('123', 2), SUBSTRING('123', 2), SUM(1), TRUNCATE(1), UPPER('A'), VAR_POP(1), WEEK(toDate('2020-10-24')) format TSVRaw;"""
    val multi = QueryFormat.format(in, singleLine = false).get
    val single = QueryFormat.format(in, singleLine = true).get
    assert(multi.startsWith("EXPLAIN SYNTAX\nSELECT\n    CAST(1, 'INT'),\n    CEIL(1),"))
    assert(multi.endsWith("\nFORMAT TSVRaw"))
    // the reference's canonical alias renames (02882 reference lines)
    assert(multi.contains("    dateDiff('DAY', toDate('2020-10-24'), toDate('2019-10-24')),"))
    assert(multi.contains("    position('123', '2'),"))
    assert(multi.contains("    substring('123', 2),"))
    assert(multi.contains("    SUBSTR('123', 2),")) // NOT renamed, as in the reference
    assert(multi.contains("    NOT 1,"))
    assert(multi.contains("    FLATTEN([[1]]),"))
    assert(multi.contains("    NOW64(),"))
    assert(single.startsWith("EXPLAIN SYNTAX SELECT CAST(1, 'INT'), CEIL(1),"))
    assert(single.endsWith("FORMAT TSVRaw"))
    assert(single.contains(", NOT 1, NOW64(),"))
  }

  test("02882: syntax errors yield None (OrNull contract)") {
    assert(fq("").isEmpty)
    assert(fq("SEECTwrong").isEmpty)
    assert(fq("bad 3").isEmpty)
    assert(fq("bad 5").isEmpty)
    assert(fq1("SEECTwrong").isEmpty)
    assert(fq("SELECT 1 WHERE").isEmpty) // truncated
    assert(fq("SELECT 'unterminated").isEmpty)
  }

  test("full SELECT pipeline shape (dialect canonical form)") {
    val in = "select a, sum(b) as s from t where a < 5 and b != 3 group by a having sum(b) > 0 order by a desc nulls last, s limit 3, 10 settings max_threads = 4"
    val expectedMulti =
      """SELECT
        |    a,
        |    sum(b) AS s
        |FROM t
        |WHERE (a < 5) AND (b != 3)
        |GROUP BY a
        |HAVING sum(b) > 0
        |ORDER BY
        |    a DESC NULLS LAST,
        |    s ASC
        |LIMIT 10 OFFSET 3
        |SETTINGS max_threads = 4""".stripMargin
    assert(fq(in).contains(expectedMulti))
    assert(fq1(in).contains(
      "SELECT a, sum(b) AS s FROM t WHERE (a < 5) AND (b != 3) GROUP BY a " +
        "HAVING sum(b) > 0 ORDER BY a DESC NULLS LAST, s ASC LIMIT 10 OFFSET 3 " +
        "SETTINGS max_threads = 4"))
  }

  test("formatQuery is idempotent on its own output") {
    val in = "select a, count() from t where a in (1, 2, 3) group by a order by a"
    val once = fq1(in).get
    assert(fq1(once).contains(once))
  }
}
