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

  test("geohash kRing: (2k+1)^2 distinct neighbors, all adjacent, contains self") {
    import graft.functions.GeoCells
    val cells = Seq(("ezs42", 0)).toDF("gh", "i")
      .select(GeoCells.geohash_kring(col("gh"), 1).as("ring"))
      .head().getSeq[String](0)
    assert(cells.length == 9 && cells.contains("ezs42"))
    // every neighbor decodes within 1.5 cell sizes of the center
    val (w, h) = GeoCells.cellSize(5)
    val (clon, clat) = graft.functions.GeoCells.decodeCenter("ezs42").get
    cells.foreach { c =>
      val (lon, lat) = graft.functions.GeoCells.decodeCenter(c).get
      assert(math.abs(lon - clon) <= 1.5 * w && math.abs(lat - clat) <= 1.5 * h, c)
    }
    // k=2 block is 25; kRing is closed under expansion (ring1 subset ring2)
    val ring2 = GeoCells.kRingEval("ezs42", 2).get
    assert(ring2.length == 25 && cells.forall(ring2.contains))
  }

  test("geohashesInBox covers the box, only the box, hierarchically") {
    import graft.functions.GeoCells
    // precision-3 cells: 1.40625 x 1.40625 degrees
    val cells = GeoCells.inBoxEval(-6.0, 42.0, -4.0, 43.5, 3)
    assert(cells.nonEmpty && cells.distinct.length == cells.length)
    val (w, h) = GeoCells.cellSize(3)
    cells.foreach { c =>
      val (lon, lat) = graft.functions.GeoCells.decodeCenter(c).get
      assert(lon >= -6.0 - w && lon <= -4.0 + w && lat >= 42.0 - h && lat <= 43.5 + h, c)
    }
    // the classic vector's cell is inside this box at every precision
    assert(cells.contains("ezs"))
    assert(GeoCells.inBoxEval(-6.0, 42.0, -4.0, 43.5, 4).contains("ezs4"))
    // geohash hierarchy: every precision-4 cell in the box has its
    // precision-3 parent PREFIX in the box cover (h3ToParent analog)
    val p4 = GeoCells.inBoxEval(-6.0, 42.0, -4.0, 43.5, 4)
    assert(p4.map(_.take(3)).toSet.subsetOf(cells.toSet))
    // inverted box -> empty (reference geohashesInBox contract)
    assert(GeoCells.inBoxEval(1.0, 1.0, 0.0, 0.0, 3).isEmpty)
  }

  test("geo cell functions via SQL registration and CH dialect names") {
    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val r = graft.sqlfront.ChSql.sql(spark, "/root/testdata/sf0.001",
      """SELECT arrayStringConcat(geohashKRing('ezs42', 1), ',') AS ring,
        |length(geohashesInBox(-6.0, 42.0, -4.0, 43.5, 3)) AS nbox""".stripMargin)
      .head()
    assert(r.getString(0).split(",").length == 9)
    assert(r.getAs[Number](1).longValue > 0)
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

  test("base32 matches the RFC 4648 §10 vectors; decode is inverse") {
    import graft.functions.Encodings._
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val vectors = Seq(
      "" -> "", "f" -> "MY======", "fo" -> "MZXQ====", "foo" -> "MZXW6===",
      "foob" -> "MZXW6YQ=", "fooba" -> "MZXW6YTB", "foobar" -> "MZXW6YTBOI======")
    for ((plain, enc) <- vectors) {
      assert(base32EncodeEval(u(plain)).toString == enc, s"encode $plain")
      assert(base32DecodeEval(u(enc)).toString == plain, s"decode $enc")
    }
    assert(base32DecodeEval(u("M=======")) == null)          // 1-symbol tail: no encoder produces it
    assert(base32DecodeEval(u("MZX=====")) == null)          // 3-symbol tail invalid
    assert(base32DecodeEval(u("MZXW6Y==")) == null)          // 6-symbol tail invalid
    assert(base32DecodeEval(u("MZ======")) == null)          // non-zero leftover bits ('Z' low bits)
    assert(base32DecodeEval(u("MZXW6YT!")) == null)          // bad symbol
    assert(base32DecodeEval(u("MZXW6")) == null)             // bad length
  }

  test("bech32 matches the BIP-0173 P2WPKH vector; checksum rejects noise") {
    import graft.functions.Encodings._
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // BIP-0173 example: witness v0, program
    // 751e76e8199196d454941c45d1b3a323f1433bd6 on mainnet hrp 'bc'
    val program: Array[Byte] =
      "751e76e8199196d454941c45d1b3a323f1433bd6".grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    val addr = bech32EncodeEval(u("bc"), program, 0)
    assert(addr.toString == "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4")
    val dec = bech32DecodeEval(addr)
    assert(dec.toString == "bc:0:751e76e8199196d454941c45d1b3a323f1433bd6")
    // uppercase form accepted (BIP-0173), mixed case rejected
    assert(bech32DecodeEval(u(addr.toString.toUpperCase)) != null)
    assert(bech32DecodeEval(u("bc1Qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4")) == null)
    // any flipped payload character breaks the checksum
    assert(bech32DecodeEval(u("bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t5")) == null)
    // witver > 0 uses the bech32m constant and round-trips
    val m = bech32EncodeEval(u("bc"), program, 1)
    assert(m != null && bech32DecodeEval(m).toString
      == "bc:1:751e76e8199196d454941c45d1b3a323f1433bd6")
  }

  test("sparseGrams: borders dominate interiors, minimal length holds") {
    import graft.functions.TextHashes
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val text = "the quick brown fox jumps over the lazy dog"
    val n = 3
    val grams = TextHashes.sparseGramsEval(u(text), n)
    assert(grams.numElements() > 0)
    def fnv(s: String) = graft.functions.Fnv64.hashString(s)
    (0 until grams.numElements()).foreach { gi =>
      val g = grams.getUTF8String(gi).toString
      assert(g.length >= n && text.contains(g))
      val k = n - 1
      val hb = fnv(g.substring(0, k))
      val he = fnv(g.substring(g.length - k))
      val interior = (1 until g.length - k).map(i => fnv(g.substring(i, i + k)))
      assert(interior.forall(h => h < hb && h < he), s"borders must dominate in '$g'")
    }
    // shift invariance: the same substring selected regardless of prefix
    val shifted = TextHashes.sparseGramsEval(u("PAD " + text), n)
    val a = (0 until grams.numElements()).map(grams.getUTF8String(_).toString).toSet
    val b = (0 until shifted.numElements()).map(shifted.getUTF8String(_).toString).toSet
    assert(a.subsetOf(b))
    // dialect names
    val r = ChSqlSpecHelper.ch(spark, "/root/testdata/sf0.001",
      """SELECT base32Encode('foobar') AS b32,
        |base32Decode(base32Encode('round')) AS rt,
        |bech32Decode(bech32Encode('tb', unhex('00'))) AS bd,
        |size(sparseGrams('abcdefgh')) AS ng""".stripMargin).collect()(0)
    assert(r.getString(0) == "MZXW6YTBOI======")
    assert(r.getString(1) == "round")
    assert(r.getString(2) == "tb:0:00")
    assert(r.getInt(3) >= 0)
  }
}

/** Tiny indirection so codec tests can drive the CH dialect without
  * depending on ChSqlSpec internals. */
object ChSqlSpecHelper {
  def ch(spark: org.apache.spark.sql.SparkSession, sf: String, q: String) =
    graft.sqlfront.ChSql.sql(spark, sf, q)
}
