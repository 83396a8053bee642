package graft

import graft.functions.{Codecs, IdGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Public test vectors for the address/geo codecs and ID generators
  * (RFC 5952 examples, the classic geohash reference point, RFC 9562
  * layout). These pin exact values the DuckDB oracle can't provide
  * (no inet/geohash functions in core DuckDB). */
class CodecsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("IPv6 canonicalization follows RFC 5952") {
    val cases = Seq(
      "2001:0db8:0000:0000:0000:ff00:0042:8329" -> "2001:db8::ff00:42:8329",
      "2001:DB8:0:0:1:0:0:1" -> "2001:db8::1:0:0:1", // leftmost longest run wins
      "0:0:0:0:0:0:0:1" -> "::1",
      "0:0:0:0:0:0:0:0" -> "::",
      "2001:db8:0:1:1:1:1:1" -> "2001:db8:0:1:1:1:1:1", // single zero group NOT compressed
      "fe80:0:0:0:0:0:0:1" -> "fe80::1",
      "::ffff:192.0.2.128" -> "::ffff:192.0.2.128",
      "1.2.3.4" -> "::ffff:1.2.3.4" // IPv4 maps into IPv6 (reference FunctionsCodingIP)
    )
    val df = cases.map(_._1).toDF("addr")
      .select(col("addr"),
        Codecs.ipv6_num_to_string(Codecs.ipv6_string_to_num(col("addr"))).as("canon"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"canonical($in)") }
  }

  test("IPv6 parse rejects malformed input with null, never a DNS lookup") {
    val df = Seq("nonsense", "1:2:3", "12345::1", "example.com").toDF("addr")
      .select(Codecs.ipv6_string_to_num(col("addr")).as("n"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("geohash encodes the classic reference vector") {
    // (lat 42.605, lon -5.603) -> ezs42 (the Wikipedia/original example)
    val df = Seq((-5.60302734375, 42.60498046875)).toDF("lon", "lat")
      .select(Codecs.geohash_encode(col("lon"), col("lat"), 5).as("gh"))
    assert(df.head().getString(0) == "ezs42")
  }

  test("geohash decode is the cell center and roundtrips") {
    val df = Seq(("ezs42", 0), ("u4pruydqqvj", 1)).toDF("gh", "i")
      .select(col("gh"), Codecs.geohash_decode(col("gh")).as("ll"))
    val rows = df.collect()
    val ez = rows.find(_.getString(0) == "ezs42").get.getSeq[Double](1)
    assert(math.abs(ez(1) - 42.605) < 0.03 && math.abs(ez(0) - (-5.603)) < 0.03)
    // u4pruydqqvj is the 11-char vector for (57.64911, 10.40744)
    val u4 = rows.find(_.getString(0) == "u4pruydqqvj").get.getSeq[Double](1)
    assert(math.abs(u4(1) - 57.64911) < 1e-4 && math.abs(u4(0) - 10.40744) < 1e-4)
  }

  test("uuid v7 is version 7, variant 10, time-ordered; snowflake embeds now") {
    val df = spark.range(0, 1000)
      .select(IdGen.generate_uuid_v7().as("u7"), IdGen.generate_snowflake_id().as("sf"))
    val rows = df.collect()
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    assert(rows.forall(r => re.findFirstIn(r.getString(0)).isDefined))
    assert(rows.map(_.getString(0)).distinct.length == rows.length, "v7 uniqueness")
    assert(rows.map(_.getLong(1)).distinct.length == rows.length, "snowflake uniqueness")
    val now = System.currentTimeMillis()
    val ms = rows.map(r => (r.getLong(1) >> 22) + 1288834974657L)
    assert(ms.forall(m => math.abs(m - now) < 3600L * 1000), "snowflake time sane")
  }

  test("base58 matches public Bitcoin-alphabet vectors; decode is inverse") {
    import graft.functions.Encodings
    import org.apache.spark.unsafe.types.UTF8String
    // vectors from the btc reference test set (public knowledge)
    val cases = Seq(
      "Hello World!" -> "2NEpo7TZRRrLZSi2U",
      "The quick brown fox jumps over the lazy dog." ->
        "USm3fpXnKG5EUBx2ndxBDMPVciP5hGey2Jh4NDv6gmeo1LkMeiKrLJUUBk6Z",
      "" -> "")
    for ((plain, enc) <- cases) {
      assert(Encodings.base58EncodeEval(UTF8String.fromString(plain)).toString == enc,
        s"encode($plain)")
      assert(Encodings.base58DecodeEval(UTF8String.fromString(enc)).toString == plain,
        s"decode($enc)")
    }
    // leading zero bytes -> leading '1's
    assert(Encodings.base58EncodeEval(
      UTF8String.fromBytes(Array[Byte](0, 0, 1))).toString == "112")
    // invalid alphabet char -> null
    assert(Encodings.base58DecodeEval(UTF8String.fromString("0OIl")) == null)
  }

  test("idna encode/decode matches java.net.IDN pipeline") {
    import graft.functions.Encodings
    import org.apache.spark.unsafe.types.UTF8String
    def enc(s: String) = Encodings.idnaEncodeEval(UTF8String.fromString(s)).toString
    def dec(s: String) = Encodings.idnaDecodeEval(UTF8String.fromString(s)).toString
    assert(enc("münchen.de") == "xn--mnchen-3ya.de")
    assert(dec("xn--mnchen-3ya.de") == "münchen.de")
    assert(enc("plain.example.com") == "plain.example.com")
  }

  test("base58/idna via SQL registration and CH dialect names") {
    val r = graft.sqlfront.ChSql.sql(spark, "/root/testdata/sf0.001",
      """SELECT base58Encode('Hello World!') AS e,
        |base58Decode(base58Encode('round trip')) AS rt,
        |idnaEncode('münchen.de') AS i""".stripMargin).collect()(0)
    assert(r.getString(0) == "2NEpo7TZRRrLZSi2U")
    assert(r.getString(1) == "round trip")
    assert(r.getString(2) == "xn--mnchen-3ya.de")
  }
}
