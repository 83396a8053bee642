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

  test("JOIN chains: ON/USING, outer-word normalization, own lines multiline") {
    val in = "select a, b from t1 x join t2 y on x.id = y.id left outer join t3 using (k) cross join t4"
    assert(fq1(in).contains(
      "SELECT a, b FROM t1 AS x INNER JOIN t2 AS y ON x.id = y.id " +
        "LEFT JOIN t3 USING (k) CROSS JOIN t4"))
    val multi = fq(in).get
    assert(multi.contains("FROM t1 AS x\nINNER JOIN t2 AS y ON x.id = y.id\n" +
      "LEFT JOIN t3 USING (k)\nCROSS JOIN t4"))
  }

  test("FROM subquery: indented paren block multiline, flat single-line") {
    val in = "select s from (select sum(v) as s from t group by k) q where s > 0"
    assert(fq1(in).contains(
      "SELECT s FROM (SELECT sum(v) AS s FROM t GROUP BY k) AS q WHERE s > 0"))
    val multi = fq(in).get
    assert(multi.contains(
      "SELECT s\nFROM\n(\n    SELECT sum(v) AS s\n    FROM t\n    GROUP BY k\n) AS q\nWHERE s > 0"))
  }

  test("WITH CTEs: indented blocks multiline, flat single-line") {
    val in = "with base as (select k, v from t), agg as (select k, sum(v) s from base group by k) select k, s from agg order by k"
    assert(fq1(in).contains(
      "WITH base AS (SELECT k, v FROM t), agg AS (SELECT k, sum(v) AS s FROM base GROUP BY k) " +
        "SELECT k, s FROM agg ORDER BY k ASC"))
    val multi = fq(in).get
    assert(multi.startsWith("WITH base AS\n(\n    SELECT\n        k,\n        v\n    FROM t\n),\nagg AS\n("))
    assert(multi.endsWith("\nORDER BY k ASC"))
  }

  test("CASE desugars to multiIf, operand form via equality conditions") {
    assert(fq1("select case when a > 1 then 'x' else 'y' end from t").contains(
      "SELECT multiIf(a > 1, 'x', 'y') FROM t"))
    assert(fq1("select case m when 1 then 'a' when 2 then 'b' end from t").contains(
      "SELECT multiIf(m = 1, 'a', m = 2, 'b', NULL) FROM t"))
  }

  test("BETWEEN and IS [NOT] NULL desugar at the parser, reference style") {
    assert(fq1("select a from t where a between 2 and 5").contains(
      "SELECT a FROM t WHERE (a >= 2) AND (a <= 5)"))
    assert(fq1("select a from t where a not between 2 and 5").contains(
      "SELECT a FROM t WHERE (a < 2) OR (a > 5)"))
    assert(fq1("select a from t where a is null and b is not null").contains(
      "SELECT a FROM t WHERE isNull(a) AND isNotNull(b)"))
  }

  test("window OVER clauses: partition/order/frame canonicalized") {
    val in = "select sum(v) over (partition by k order by ts rows between 2 preceding and current row) from t"
    assert(fq1(in).contains(
      "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM t"))
    assert(fq1("select rank() over (order by v desc) from t").contains(
      "SELECT rank() OVER (ORDER BY v DESC) FROM t"))
  }

  test("UNION stacks and IN (SELECT ...) subqueries") {
    assert(fq1("select a from t1 union all select b from t2 union distinct select c from t3").contains(
      "SELECT a FROM t1 UNION ALL SELECT b FROM t2 UNION DISTINCT SELECT c FROM t3"))
    val multi = fq("select a from t1 union all select b from t2").get
    assert(multi == "SELECT a\nFROM t1\nUNION ALL\nSELECT b\nFROM t2")
    assert(fq1("select a from t where a in (select k from dim)").contains(
      "SELECT a FROM t WHERE a IN (SELECT k FROM dim)"))
  }

  test("property fuzz: 300 random dialect queries format idempotently") {
    val rnd = new scala.util.Random(20260814L)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    // scalar expressions and boolean predicates are generated separately —
    // `x - NOT a` is invalid in every SQL dialect, so NOT/AND/OR/IS NULL
    // only appear in predicate positions
    def exprStr(depth: Int): String = {
      if (depth <= 0) pick(Seq("a", "b", "k", "v", "1", "42", "'s'", "2.5"))
      else pick(Seq(
        s"${exprStr(depth - 1)} ${pick(Seq("+", "-", "*"))} ${exprStr(depth - 1)}",
        s"${pick(Seq("f", "sum", "min", "coalesce"))}(${exprStr(depth - 1)})",
        s"case when ${boolStr(depth - 1)} then ${exprStr(depth - 1)} else ${exprStr(depth - 1)} end",
        s"[${exprStr(depth - 1)}, ${exprStr(depth - 1)}]",
        s"cast(${exprStr(depth - 1)} as Int64)"))
    }
    def boolStr(depth: Int): String = {
      if (depth <= 0)
        s"${pick(Seq("a", "b", "k"))} ${pick(Seq("=", "<", ">="))} ${pick(Seq("1", "42", "'s'"))}"
      else pick(Seq(
        s"${exprStr(depth - 1)} ${pick(Seq("=", "<", ">=", "!="))} ${exprStr(depth - 1)}",
        s"${boolStr(depth - 1)} ${pick(Seq("and", "or"))} ${boolStr(depth - 1)}",
        s"not ${boolStr(depth - 1)}",
        s"${exprStr(depth - 1)} between 1 and 9",
        s"${exprStr(depth - 1)} is null",
        s"${exprStr(depth - 1)} in (1, 2, 3)"))
    }
    def queryStr(): String = {
      val sb = new StringBuilder("select ")
      sb.append((1 to 1 + rnd.nextInt(3)).map(_ => exprStr(2)).mkString(", "))
      sb.append(" from t")
      if (rnd.nextBoolean()) sb.append(s" where ${boolStr(2)}")
      if (rnd.nextBoolean()) sb.append(" group by k")
      if (rnd.nextBoolean()) sb.append(s" having ${boolStr(1)}")
      if (rnd.nextBoolean()) sb.append(" order by a desc, b")
      if (rnd.nextBoolean()) sb.append(s" limit ${1 + rnd.nextInt(99)}")
      sb.toString
    }
    for (n <- 1 to 300; single <- Seq(true, false)) {
      val in = queryStr()
      val once = QueryFormat.format(in, single)
      assert(once.nonEmpty, s"#$n must parse: $in")
      val twice = QueryFormat.format(once.get, single)
      assert(twice == once, s"#$n not idempotent ($single): $in\n-> ${once.get}\n-> ${twice.orNull}")
      // the multiline render of the same query must also reparse
      val multi = QueryFormat.format(in, singleLine = false).get
      assert(QueryFormat.format(multi, singleLine = true) ==
        QueryFormat.format(in, singleLine = true), s"#$n multi/single disagree: $in")
    }
  }

  test("02882: normalizedQueryHash is stable across formatQuery spellings") {
    // mirrors: SELECT normalizedQueryHash(formatQuery('select 1')) =
    //          normalizedQueryHash(formatQuery('SELECT 1'))  -> 1
    val spark = SparkTestSession.spark
    val r = graft.sqlfront.ChSql.sql(spark, "/root/testdata/sf0.001",
      """SELECT
        |  normalizedQueryHash(formatQuery('select 1')) = normalizedQueryHash(formatQuery('SELECT 1')) AS h1,
        |  formatQuerySingleLine('select 1') = formatQuerySingleLine('SeLeCt 1') AS h2
        |FROM nation LIMIT 1""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("CH-specific clauses: PREWHERE, QUALIFY, LIMIT BY, ARRAY JOIN") {
    assert(fq1("select a from t prewhere b > 0 where c < 5").contains(
      "SELECT a FROM t PREWHERE b > 0 WHERE c < 5"))
    assert(fq1("select a, rank() over (order by v) r from t qualify r <= 3").contains(
      "SELECT a, rank() OVER (ORDER BY v ASC) AS r FROM t QUALIFY r <= 3"))
    assert(fq1("select a from t order by a limit 2 by grp limit 10").contains(
      "SELECT a FROM t ORDER BY a ASC LIMIT 2 BY grp LIMIT 10"))
    assert(fq1("select a from t limit 3, 7 by grp").contains(
      "SELECT a FROM t LIMIT 7 OFFSET 3 BY grp"))
    assert(fq1("select x from t array join arr as x").contains(
      "SELECT x FROM t ARRAY JOIN arr AS x"))
    assert(fq1("select x from t left array join arr x").contains(
      "SELECT x FROM t LEFT ARRAY JOIN arr AS x"))
    val multi = fq("select x, n from t array join arr as x, nums n prewhere p where w").get
    assert(multi == "SELECT\n    x,\n    n\nFROM t\nARRAY JOIN arr AS x, nums AS n\nPREWHERE p\nWHERE w")
  }

  test("widened dialect is idempotent on its own output") {
    val ins = Seq(
      "select a, b from t1 x join t2 y on x.id = y.id left join t3 using (k)",
      "with c as (select k from t) select k, row_number() over (partition by k order by k) from c",
      "select case when a is null then 0 else a end from t where b between 1 and 9",
      "select a from t1 union all select b from t2 order by b",
      "select a from t prewhere p where w qualify q limit 2 by g limit 9",
      "select x from t left array join arr as x where x > 0")
    for (in <- ins; single <- Seq(true, false)) {
      val once = QueryFormat.format(in, single)
      assert(once.nonEmpty, s"must parse: $in")
      val twice = QueryFormat.format(once.get, single)
      assert(twice == once, s"not idempotent ($single): $in ->\n${once.get}\nvs\n$twice")
    }
  }
}
