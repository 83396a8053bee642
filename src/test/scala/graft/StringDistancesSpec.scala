package graft

import graft.functions.StringDistances._
import org.scalatest.funsuite.AnyFunSuite

/** Published test vectors for the string-distance family (reference
  * FunctionsStringDistance.cpp semantics; values cross-checked against
  * DuckDB's native functions, which the oracle query also uses). */
class StringDistancesSpec extends AnyFunSuite {

  test("damerauLevenshtein is the unrestricted variant") {
    assert(damerauLevenshtein("ca", "abc") == 2) // OSA would say 3
    assert(damerauLevenshtein("a cat", "an act") == 2)
    assert(damerauLevenshtein("abcd", "acbd") == 1) // one transposition
    assert(damerauLevenshtein("", "abc") == 3)
    assert(damerauLevenshtein("kitten", "sitting") == 3)
    assert(damerauLevenshtein("same", "same") == 0)
  }

  test("jaro matches the classic vectors (integer-halved transpositions)") {
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    assert(r9(jaro("martha", "marhta")) == r9(17.0 / 18))
    assert(r9(jaro("dwayne", "duane")) == r9(37.0 / 45))
    assert(jaro("ab", "ba") == 0.0) // window 0: no matches
    assert(jaro("", "") == 0.0)     // empty defined as 0, not 1
    assert(r9(jaro("abcvwxyz", "cabvwxyz")) == r9((1.0 + 1.0 + 7.0 / 8) / 3))
  }

  test("jaroWinkler boosts only above 0.7") {
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    assert(r9(jaroWinkler("martha", "marhta")) == r9(17.0 / 18 + 3 * 0.1 * (1 - 17.0 / 18)))
    // jaro = 0.5 with a 2-char common prefix: below threshold, NO boost
    assert(jaroWinkler("abxxxxxx", "abyyyyyy") == 0.5)
    // prefix capped at 4
    assert(r9(jaroWinkler("aaaaaab", "aaaaaba")) ==
      r9 { val j = jaro("aaaaaab", "aaaaaba"); j + 4 * 0.1 * (1 - j) })
  }

  test("byteHamming counts prefix mismatches plus the length difference") {
    assert(byteHamming("abcd".getBytes, "abcf".getBytes) == 1)
    assert(byteHamming("abcd".getBytes, "ab".getBytes) == 2)
    assert(byteHamming("".getBytes, "xyz".getBytes) == 3)
    assert(byteHamming("abc".getBytes, "xyzabc".getBytes) == 6)
  }

  test("byteJaccard is set-of-bytes Jaccard") {
    assert(byteJaccard("abc".getBytes, "abd".getBytes) == 0.5)
    assert(byteJaccard("aab".getBytes, "ab".getBytes) == 1.0)
    assert(byteJaccard("Hello".getBytes, "hello".getBytes) == 0.6)
    assert(byteJaccard("".getBytes, "".getBytes) == 0.0)
  }
}
