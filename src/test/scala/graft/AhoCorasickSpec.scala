package graft

import graft.extract.{AhoCorasick, CompiledDict, DictAnalyzer}
import org.scalatest.funsuite.AnyFunSuite

/** The Aho–Corasick compiled dictionary must count exactly like the
  * naive non-overlapping indexOf scan — on hand-picked overlap traps
  * and on random corpora over a small alphabet (maximizing collisions,
  * shared prefixes/suffixes, and self-overlapping patterns).
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def naive(terms: Array[String], text: String): Array[Int] =
    terms.map(DictAnalyzer.countOccurrences(text, _))

  test("overlap traps: shared prefixes, suffix-of-other, self-overlap") {
    val terms = Array("ab", "abc", "bc", "c", "aa", "aaa", "she", "he", "hers")
    val ac = AhoCorasick(terms)
    for (text <- Seq(
      "abcabc", "aaaa", "aaaaaaa", "ushers", "shehehers", "abcbcbcab",
      "", "a", "cccc", "aabbcc abc aaa he she hers")) {
      assert(ac.countAll(text).toSeq === naive(terms, text).toSeq, s"text=$text")
    }
  }

  test("random corpora over a 3-char alphabet match the naive scan") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    def randStr(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (trial <- 0 until 200) {
      val terms = Array.fill(3 + rnd.nextInt(10))(randStr(1 + rnd.nextInt(4))).distinct
      val ac = AhoCorasick(terms)
      val text = randStr(rnd.nextInt(120))
      assert(ac.countAll(text).toSeq === naive(terms, text).toSeq,
        s"trial=$trial terms=${terms.mkString(",")} text=$text")
    }
  }

  test("CompiledDict switches to the automaton above the threshold, same counts") {
    val terms = (0 until CompiledDict.acThreshold + 8).map(i => s"t${i}x").toArray
    val dict = CompiledDict(terms.zip(terms).toSeq)
    val text = "t0x t1x t1x t40x zzz t39x t0xt0x"
    assert(dict.countAll(text).toSeq === naive(terms, text).toSeq)
  }
}
