package graft

import graft.functions.Stemmer
import graft.ops.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Porter stemmer vectors from the published algorithm (Porter 1980,
  * "An algorithm for suffix stripping" — the step examples in the paper)
  * plus the inverted-index hasToken path. */
class StemmerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti", "cats" -> "cat",
    // step 1b + cleanup
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "digitizer" -> "digit",
    "differentli" -> "differ", // step 2 gives 'different'; step 4 then strips 'ent'
    "vietnamization" -> "vietnam", "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal", "sensitiviti" -> "sensit",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "communism" -> "commun", "activate" -> "activ", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("Porter stemmer matches the paper's step examples") {
    val df = vectors.map(_._1).toDF("w")
      .select(col("w"), Stemmer.porter_stem(col("w")).as("s"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val bad = vectors.filter { case (in, want) => got(in) != want }
    assert(bad.isEmpty,
      bad.map { case (in, want) => s"$in: got ${got(in)}, want $want" }.mkString("; "))
  }

  test("inverted index lookup pushes the token equality into the scan") {
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val path = "/tmp/graft_invidx/spec_documents"
    InvertedIndex.build(docs, "doc_id", "text", path)
    val lookup = InvertedIndex.lookup(spark, path, "data")
    val plan = lookup.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(token,data)"),
      s"token filter not pushed:\n${plan.take(2000)}")
    // index path must agree with the direct text predicate
    val viaIndex = InvertedIndex.hasTokenViaIndex(docs, "doc_id", spark, path, "data")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = docs.filter(array_contains(
        split(lower(col("text")), "[^a-z0-9]+"), "data"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == direct && viaIndex.nonEmpty)
  }
}
