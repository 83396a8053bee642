package graft

import graft.functions.{HashCompat, StringShingles}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Bit-level checks for the ngram/wordShingle SimHash + MinHash family.
  * The shingle hash is raw CRC32C (init ~0, no final xor) — verified
  * against java.util.zip.CRC32C, which computes the standard (inverted)
  * value: raw == standard ^ 0xFFFFFFFF. Structural identities pin the
  * reference's documented quirks. */
class StringShinglesSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes(UTF_8)

  private def rawCrc32c(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes)
    (c.getValue ^ 0xFFFFFFFFL) & 0xFFFFFFFFL
  }

  test("shingleHash is raw CRC32C (java.util.zip.CRC32C oracle)") {
    for (s <- Seq("", "a", "abc", "hello world", "The quick brown fox", "x" * 100)) {
      assert(StringShingles.shingleHash(b(s), 0, b(s).length, ci = false) === rawCrc32c(b(s)), s)
    }
  }

  test("case-insensitive shingle hash ORs 0x20 into every byte") {
    // '@' | 0x20 = '`' — even non-letters are folded, as in the reference
    val folded = "hello@world".map(c => (c | 0x20).toChar).mkString
    assert(StringShingles.shingleHash(b("HELLO@WORLD"), 0, 11, ci = true) === rawCrc32c(b(folded)))
  }

  test("ngramSimHash: short string returns the whole-string shingle hash") {
    assert(StringShingles.ngramSimHash(b("ab"), 3, ci = false, utf8 = false) === rawCrc32c(b("ab")))
    assert(StringShingles.ngramSimHash(b(""), 3, ci = false, utf8 = false) === rawCrc32c(b("")))
  }

  test("ngramSimHash: single gram equals that gram's hash") {
    assert(StringShingles.ngramSimHash(b("abc"), 3, ci = false, utf8 = false) === rawCrc32c(b("abc")))
  }

  test("ngramSimHash ASCII hashes every overlapping gram") {
    // 'abcd' n=3: grams 'abc','bcd' -> simhash of two votes
    val h1 = rawCrc32c(b("abc"))
    val h2 = rawCrc32c(b("bcd"))
    var expect = 0L
    for (i <- 0 until 64) {
      val v = (if ((h1 & (1L << i)) != 0) 1 else -1) + (if ((h2 & (1L << i)) != 0) 1 else -1)
      if (v > 0) expect |= (1L << i)
    }
    assert(StringShingles.ngramSimHash(b("abcd"), 3, ci = false, utf8 = false) === expect)
  }

  test("ngramSimHash UTF8 quirk: exactly-n-codepoint string hashes to 0") {
    // reference scan loop advances before hashing -> zero vector -> 0
    assert(StringShingles.ngramSimHash(b("abc"), 3, ci = false, utf8 = true) === 0L)
    // and the first gram is skipped: 'abcd' hashes only 'bcd'
    assert(StringShingles.ngramSimHash(b("abcd"), 3, ci = false, utf8 = true) === rawCrc32c(b("bcd")))
  }

  test("wordShingleSimHash: single >=4-char word is its own hash; short words drop") {
    assert(StringShingles.wordShingleSimHash(b("hello"), 3, ci = false) === rawCrc32c(b("hello")))
    // 'a bb ccc' has no word of length >= 4 -> 0
    assert(StringShingles.wordShingleSimHash(b("a bb ccc"), 3, ci = false) === 0L)
    // separators are not part of the shingle bytes
    assert(StringShingles.wordShingleSimHash(b("hello...world"), 2, ci = false) ===
      StringShingles.wordShingleSimHash(b("hello world"), 2, ci = false))
  }

  test("wordShingle window rotation: oldest word leads the concatenation") {
    // words w1 w2 w3 with n=2: shingles are [w1w2] then after w3 replaces
    // oldest slot, offset rotates so hash is over w2||w3 (not w3||w2)
    val s = "alpha bravo charlie"
    val g1 = rawCrc32c(b("alphabravo"))
    val g2 = rawCrc32c(b("bravocharlie"))
    var expect = 0L
    for (i <- 0 until 64) {
      val v = (if ((g1 & (1L << i)) != 0) 1 else -1) + (if ((g2 & (1L << i)) != 0) 1 else -1)
      if (v > 0) expect |= (1L << i)
    }
    assert(StringShingles.wordShingleSimHash(b(s), 2, ci = false) === expect)
  }

  test("minHash folds K smallest descending / K largest ascending via Hash128to64") {
    // 'abcd' n=3 -> grams 'abc','bcd' (2 distinct hashes, k=6 keeps both)
    val h1 = rawCrc32c(b("abc"))
    val h2 = rawCrc32c(b("bcd"))
    val lo = math.min(h1, h2)
    val hi = math.max(h1, h2)
    val expMin = HashCompat.hash128to64(HashCompat.hash128to64(0L, hi), lo) // descending
    val expMax = HashCompat.hash128to64(HashCompat.hash128to64(0L, lo), hi) // ascending
    val (m1, m2) = StringShingles.minHashPair(b("abcd"), 3, 6, ci = false, utf8 = false, ngram = true)
    assert(m1 === expMin && m2 === expMax)
  }

  test("minHash keeps only K distinct hashes") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val (k2min, _) = StringShingles.minHashPair(b(text), 3, 2, ci = false, utf8 = false, ngram = true)
    val (k6min, _) = StringShingles.minHashPair(b(text), 3, 6, ci = false, utf8 = false, ngram = true)
    assert(k2min !== k6min) // different K -> different folds
    // repeated grams don't double-count: dedup text with unique-gram text
    val (d1, _) = StringShingles.minHashPair(b("abcabcabc"), 3, 25, ci = false, utf8 = false, ngram = true)
    val (d2, _) = StringShingles.minHashPair(b("abcabc"), 3, 25, ci = false, utf8 = false, ngram = true)
    assert(d1 === d2) // same distinct gram set {abc,bca,cab}
  }

  test("minHashArg returns the shingles behind the kept hashes, padded with ''") {
    val (mins, maxs) = StringShingles.minHashArgs(b("hello"), 3, 4, ci = false, utf8 = false, ngram = true)
    // grams: hel,ell,llo -> 3 distinct, padded to 4
    assert(mins.length === 4 && maxs.length === 4)
    assert(mins.map(_.toString).count(_.nonEmpty) === 3)
    assert(mins.map(_.toString).toSet - "" === Set("hel", "ell", "llo"))
    assert(maxs.map(_.toString).toSet - "" === Set("hel", "ell", "llo"))
  }

  test("SQL surface: dialect names resolve and match kernels") {
    val spark = SparkTestSession.spark
    val r = graft.sqlfront.ChSql.sql(spark, "/root/testdata/sf0.001",
      """SELECT ngramSimHash('clickhouse engine') AS s1,
        |ngramSimHashCaseInsensitive('CLICKHOUSE ENGINE') AS s1ci,
        |wordShingleSimHash('the quick brown foxes jumped over lazy dogs', 2) AS ws,
        |ngramMinHash('clickhouse engine') AS mh,
        |ngramMinHashArg('hello', 3, 4) AS mha,
        |wordShingleMinHashUTF8('alpha bravo charlie delta', 2) AS wmh""".stripMargin).collect()(0)
    assert(r.getLong(0) === StringShingles.ngramSimHash(b("clickhouse engine"), 3, ci = false, utf8 = false))
    assert(r.getLong(1) === StringShingles.ngramSimHash(b("CLICKHOUSE ENGINE"), 3, ci = true, utf8 = false))
    assert(r.getLong(2) === StringShingles.wordShingleSimHash(b("the quick brown foxes jumped over lazy dogs"), 2, ci = false))
    val (em1, em2) = StringShingles.minHashPair(b("clickhouse engine"), 3, 6, ci = false, utf8 = false, ngram = true)
    val mh = r.getStruct(3)
    assert(mh.getLong(0) === em1 && mh.getLong(1) === em2)
    val mha = r.getStruct(4)
    assert(mha.getSeq[String](0).count(_.nonEmpty) === 3)
    val (wm1, wm2) = StringShingles.minHashPair(b("alpha bravo charlie delta"), 2, 6, ci = false, utf8 = false, ngram = false)
    val wmh = r.getStruct(5)
    assert(wmh.getLong(0) === wm1 && wmh.getLong(1) === wm2)
  }
}
