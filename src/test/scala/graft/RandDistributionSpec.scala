package graft

import org.scalatest.funsuite.AnyFunSuite

/** Moment sanity for the randDistribution tail (reference
  * src/Functions/randDistribution.cpp:352-457). These are *(no-oracle)* by
  * SURVEY convention (nondeterministic output), so the pin is statistical:
  * sample mean/variance of 40k draws must sit within a generous multiple of
  * the standard error of the theoretical moments. Tolerances are ~6-10
  * sigma so the test is stable across unseeded runs.
  */
class RandDistributionSpec extends AnyFunSuite {
  val sf = "/root/testdata/sf0.001"
  private val N = 40000

  private def moments(exprSql: String): (Double, Double) = {
    val spark = SparkTestSession.spark
    val df = graft.sqlfront.ChSql.sql(spark, sf,
      s"SELECT avg(x) AS m, var_samp(x) AS v FROM " +
        s"(SELECT CAST($exprSql AS DOUBLE) AS x FROM system.numbers LIMIT $N)")
    val r = df.collect()(0)
    (r.getDouble(0), r.getDouble(1))
  }

  private def check(name: String, exprSql: String, mean: Double, varT: Double,
                    mTol: Double, vTol: Double): Unit = {
    val (m, v) = moments(exprSql)
    assert(math.abs(m - mean) < mTol, s"$name mean $m vs $mean")
    assert(math.abs(v - varT) < vTol, s"$name var $v vs $varT")
  }

  test("randExponential(2): mean 1/2, var 1/4") {
    check("randExponential", "randExponential(2.0)", 0.5, 0.25, 0.03, 0.05)
  }

  test("randLogNormal(0, 0.5): lognormal moments") {
    val m = math.exp(0.125); val v = (math.exp(0.25) - 1) * math.exp(0.25)
    check("randLogNormal", "randLogNormal(0.0, 0.5)", m, v, 0.05, 0.1)
  }

  test("randChiSquared integer dof (exact sum of squared normals)") {
    check("randChiSquared", "randChiSquared(5)", 5.0, 10.0, 0.2, 1.2)
  }

  test("randChiSquared fractional dof (Wilson-Hilferty)") {
    check("randChiSquared-frac", "randChiSquared(2.5)", 2.5, 5.0, 0.25, 1.0)
  }

  test("randStudentT(8): mean 0, var dof/(dof-2)") {
    check("randStudentT", "randStudentT(8)", 0.0, 8.0 / 6.0, 0.05, 0.3)
  }

  test("randFisherF(8, 12): F moments") {
    // mean d2/(d2-2); var 2 d2^2 (d1+d2-2) / (d1 (d2-2)^2 (d2-4))
    check("randFisherF", "randFisherF(8, 12)", 1.2, 0.81, 0.1, 0.35)
  }

  test("randBernoulli(0.3): {0,1} with mean p") {
    check("randBernoulli", "randBernoulli(0.3)", 0.3, 0.21, 0.02, 0.03)
    val spark = SparkTestSession.spark
    val bad = graft.sqlfront.ChSql.sql(spark, sf,
      s"SELECT count() AS n FROM (SELECT randBernoulli(0.3) AS x FROM system.numbers LIMIT 1000) WHERE x NOT IN (0, 1)")
      .collect()(0).getLong(0)
    assert(bad == 0L, "randBernoulli must emit only 0/1")
  }

  test("randBinomial(10, 0.25): exact counting fold") {
    check("randBinomial", "randBinomial(10, 0.25)", 2.5, 1.875, 0.08, 0.25)
    val spark = SparkTestSession.spark
    val bad = graft.sqlfront.ChSql.sql(spark, sf,
      s"SELECT count() AS n FROM (SELECT randBinomial(10, 0.25) AS x FROM system.numbers LIMIT 1000) WHERE x < 0 OR x > 10 OR x != FLOOR(x)")
      .collect()(0).getLong(0)
    assert(bad == 0L, "randBinomial must emit integers in [0, n]")
  }

  test("randNegativeBinomial(5, 0.4): failures before nth success") {
    // mean n(1-p)/p = 7.5; var n(1-p)/p^2 = 18.75
    check("randNegativeBinomial", "randNegativeBinomial(5, 0.4)", 7.5, 18.75, 0.25, 2.5)
  }

  test("02462_distributions anchor: ranges, Bernoulli domain, tag args accepted") {
    val spark = SparkTestSession.spark
    // range assertions, as in the reference's own stateless test
    val ranges = Seq(
      "randUniform(0, 1)" -> "x < 0 OR x > 1",
      "randLogNormal(0, 5)" -> "x < 0",
      "randExponential(15)" -> "x < 0",
      "randChiSquared(3)" -> "x < 0",
      "randFisherF(3, 4)" -> "x < 0",
      "randBinomial(3, 0.5)" -> "x < 0",
      "randNegativeBinomial(3, 0.5)" -> "x < 0",
      "randPoisson(44)" -> "x < 0")
    for ((e, bad) <- ranges) {
      val n = graft.sqlfront.ChSql.sql(spark, sf,
        s"SELECT count() AS n FROM (SELECT $e AS x FROM system.numbers LIMIT 5000) WHERE $bad")
        .collect()(0).getLong(0)
      assert(n == 0L, s"$e out of range")
    }
    // distinct Bernoulli values are exactly {0, 1}
    val b = graft.sqlfront.ChSql.sql(spark, sf,
      "SELECT DISTINCT randBernoulli(0.5) AS a FROM system.numbers LIMIT 5000")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(b == Seq(0L, 1L))
    // the optional trailing tag argument is accepted and ignored ("No errors")
    graft.sqlfront.ChSql.sql(spark, sf,
      "SELECT randUniform(1, 2, 1) AS a, randNormal(0, 1, 'abacaba') AS b, " +
        "randChiSquared(1, 1) AS c, randBernoulli(0.5, 2) AS d, " +
        "randPoisson(4, 44) AS e FROM system.numbers LIMIT 5").collect()
  }

  test("randPoisson(4): mean = var = lambda") {
    check("randPoisson", "randPoisson(4)", 4.0, 4.0, 0.12, 0.5)
    val spark = SparkTestSession.spark
    val bad = graft.sqlfront.ChSql.sql(spark, sf,
      s"SELECT count() AS n FROM (SELECT randPoisson(4) AS x FROM system.numbers LIMIT 1000) WHERE x < 0 OR x != FLOOR(x)")
      .collect()(0).getLong(0)
    assert(bad == 0L, "randPoisson must emit non-negative integers")
  }
}
