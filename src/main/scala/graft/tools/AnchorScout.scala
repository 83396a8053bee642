package graft.tools

/** Bulk-scout reference stateless tests through the anchor runner logic;
  * prints PASS/FAIL so passing tests can be curated into
  * ReferenceAnchorSpec. Usage: runMain graft.tools.AnchorScout <names...>
  * (or no args: scan a built-in candidate list). */
object AnchorScout {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.session("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val base = "/root/reference/tests/queries/0_stateless"

    def render(v: Any): String = v match {
      case null => "\\N"
      case s: String => s
      case a: scala.collection.Seq[_] => a.map(renderNested).mkString("[", ",", "]")
      case r: org.apache.spark.sql.Row =>
        (0 until r.length).map(i => renderNested(r.get(i))).mkString("(", ",", ")")
      case b: Boolean => if (b) "1" else "0"
      // the reference's TSV trims trailing decimal zeros (0.00 -> 0)
      case d: java.math.BigDecimal =>
        val t = d.stripTrailingZeros
        if (t.scale < 0) t.setScale(0).toPlainString else t.toPlainString
      case d: scala.math.BigDecimal =>
        val t = d.underlying.stripTrailingZeros
        if (t.scale < 0) t.setScale(0).toPlainString else t.toPlainString
      case x => x.toString
    }
    def renderNested(v: Any): String = v match {
      case s: String => "'" + s + "'"
      case other => render(other)
    }

    def tryTest(name: String): Either[String, Unit] = try {
      val sqlPath = java.nio.file.Paths.get(s"$base/$name.sql")
      if (!java.nio.file.Files.exists(sqlPath)) return Left("no .sql")
      val sql = new String(java.nio.file.Files.readAllBytes(sqlPath), "UTF-8")
      val expected = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$base/$name.reference")), "UTF-8").stripLineEnd
      val tagged = sql.replaceAll(
        "(?m);\\s*--\\s*\\{\\s*serverError[^\\n]*", " @@MUST_FAIL@@;")
      val statements = tagged.split(";").map(_.trim)
        .map(_.linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n").trim)
        .filter(_.nonEmpty)
        .filterNot(_.toUpperCase.startsWith("SET "))
      val out = statements.flatMap { st0 =>
        val mustFail = st0.endsWith("@@MUST_FAIL@@")
        val st = st0.stripSuffix("@@MUST_FAIL@@").trim
        if (mustFail) {
          try { graft.sqlfront.ChSql.sql(spark, sf, st).collect(); return Left(s"expected failure did not fail: ${st.take(60)}") }
          catch { case _: Exception => () }
          Seq.empty[String]
        } else
          graft.sqlfront.ChSql.sql(spark, sf, st).collect().toSeq.map { row =>
            (0 until row.length).map(i => render(row.get(i))).mkString("\t")
          }
      }.mkString("\n")
      if (out == expected) Right(())
      else Left(s"diff: got ${out.take(60).replace("\n", "|")} want ${expected.take(60).replace("\n", "|")}")
    } catch { case e: Exception =>
      Left(Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString.take(100)) }

    val names =
      if (args.nonEmpty) args.toSeq
      else {
        val dir = new java.io.File(base)
        dir.listFiles().map(_.getName).filter(_.endsWith(".sql"))
          .map(_.stripSuffix(".sql"))
          .filter(_.matches("00[3-9]\\d\\d_.*")).sorted.toSeq
      }
    var pass = 0
    names.foreach { n =>
      tryTest(n) match {
        case Right(_) => pass += 1; println(s"PASS $n")
        case Left(why) => println(s"FAIL $n :: $why")
      }
    }
    println(s"== $pass / ${names.length} pass ==")
    spark.stop()
  }
}
