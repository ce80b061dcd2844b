package graft.extract

import graft.core.Ontology

/** The per-row analyzers re-realizing the reference's CV scorers with
  * deterministic text semantics (SURVEY.md §7.5 deviations ledger):
  *
  *  - classifier-analog (A6): probability = min(count/8, 1.0) — a pure
  *    function of the mention frequency, thresholded at > 0.5 like the
  *    reference classifier (data/inspection/image_node.py:36);
  *  - segmenter-analog (A8): coverage = count·|term| / |content| —
  *    fraction of characters covered by mentions, thresholded at > 0.01
  *    (image_node.py:41);
  *  - score fusion (A15): score = [cls > 0.5] + [cov > 0.01] ∈ {0,1,2}
  *    (image_node.py:33-45). The object-detection channel is dropped,
  *    matching the reference quirk where detector output never reaches
  *    the graph (pipeline/pipeline.py:107, SURVEY.md §1.1).
  *
  * Counting semantics: non-overlapping, left-to-right substring count
  * (equivalent to the `replace`-trick SQL the DuckDB oracle uses, and
  * to token counting for the space-separated corpora in play).
  */
object DictAnalyzer {
  val classifierDivisor = 8.0

  def classifierProb(count: Int): Double = math.min(count / classifierDivisor, 1.0)

  def coverage(count: Int, termLen: Int, contentLen: Int): Double =
    if (contentLen <= 0) 0.0 else count.toDouble * termLen / contentLen

  def score(cls: Double, cov: Double): Int =
    (if (cls > Ontology.classifierThreshold) 1 else 0) +
      (if (cov > Ontology.segmentationThreshold) 1 else 0)

  /** Non-overlapping left-to-right occurrence count. */
  def countOccurrences(text: String, term: String): Int = {
    if (term.isEmpty) return 0
    var i = 0; var n = 0
    while ({ i = text.indexOf(term, i); i >= 0 }) { n += 1; i += term.length }
    n
  }
}

/** A dictionary compiled once per partition (north_star: "regex/dictionary
  * tokenizers compiled per-partition"). The reference dictionary is 25
  * terms, where a direct multi-term `indexOf` scan (SIMD-intrinsified)
  * wins; above [[CompiledDict.acThreshold]] terms the compiled form is an
  * Aho–Corasick automaton — one pass over the text regardless of
  * dictionary size, the shape a 100k-term dictionary needs at 100 TB.
  * Both paths implement the same per-term NON-OVERLAPPING left-to-right
  * counting semantics (DictAnalyzerSpec proves them equal on random
  * corpora).
  */
final class CompiledDict(val labels: Array[String], val terms: Array[String])
    extends Serializable {
  @transient private lazy val automaton: AhoCorasick =
    if (terms.length > CompiledDict.acThreshold) AhoCorasick(terms) else null

  def countAll(text: String): Array[Int] =
    if (automaton ne null) automaton.countAll(text)
    else {
      val out = new Array[Int](terms.length)
      var i = 0
      while (i < terms.length) {
        out(i) = DictAnalyzer.countOccurrences(text, terms(i))
        i += 1
      }
      out
    }
}

/** Aho–Corasick automaton for multi-pattern counting in a single text
  * pass. Transitions are per-node open-addressed char→state tables (no
  * boxing in the hot loop); fail links collapse to the standard
  * goto/fail BFS construction; outputs are term-index lists per node,
  * merged transitively via the fail links at build time.
  *
  * Counting reproduces `DictAnalyzer.countOccurrences`'s non-overlapping
  * left-to-right semantics per term independently: a match of term t
  * starting at s counts iff s ≥ lastEnd(t), then lastEnd(t) = s + |t|.
  * Matches of one term arrive in increasing start order (fixed length,
  * increasing end), so greedy acceptance is identical to the indexOf
  * scan.
  */
final class AhoCorasick private (
    nTerms: Int,
    termLen: Array[Int],
    gotoKeys: Array[Array[Char]],    // per-state sorted transition chars
    gotoVals: Array[Array[Int]],     // matching next states
    fail: Array[Int],
    outTerms: Array[Array[Int]]      // per-state matched term indices (incl. via suffix links)
) extends Serializable {

  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val keys = gotoKeys(s)
      val idx = java.util.Arrays.binarySearch(keys, c)
      if (idx >= 0) return gotoVals(s)(idx)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }

  def countAll(text: String): Array[Int] = {
    val counts = new Array[Int](nTerms)
    val lastEnd = new Array[Int](nTerms)
    java.util.Arrays.fill(lastEnd, 0)
    var s = 0
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      val outs = outTerms(s)
      var j = 0
      while (j < outs.length) {
        val t = outs(j)
        val start = i + 1 - termLen(t)
        if (start >= lastEnd(t)) {
          counts(t) += 1
          lastEnd(t) = start + termLen(t)
        }
        j += 1
      }
      i += 1
    }
    counts
  }
}

object AhoCorasick {
  def apply(terms: Array[String]): AhoCorasick = {
    // trie construction with growable parallel arrays
    val maxNodes = terms.map(_.length).sum + 1
    val next = Array.fill(maxNodes)(scala.collection.mutable.TreeMap.empty[Char, Int])
    val termAt = Array.fill(maxNodes)(List.empty[Int])
    var nNodes = 1
    var t = 0
    while (t < terms.length) {
      var s = 0
      val term = terms(t)
      var i = 0
      while (i < term.length) {
        s = next(s).getOrElseUpdate(term.charAt(i), { val n = nNodes; nNodes += 1; n })
        i += 1
      }
      if (term.nonEmpty) termAt(s) ::= t
      t += 1
    }
    // BFS fail links + transitive output merge
    val fail = new Array[Int](nNodes)
    val outs = Array.fill(nNodes)(List.empty[Int])
    var s0 = 0
    while (s0 < nNodes) { outs(s0) = termAt(s0); s0 += 1 }
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).foreach { case (_, v) => fail(v) = 0; queue.enqueue(v) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        // next(0)(c) == v exactly when v is a depth-1 node → fail = root
        fail(v) = next(f).get(c).filter(_ != v).getOrElse(0)
        outs(v) = outs(v) ++ outs(fail(v))
        queue.enqueue(v)
      }
    }
    new AhoCorasick(
      terms.length,
      terms.map(_.length),
      Array.tabulate(nNodes)(s => next(s).keys.toArray),
      Array.tabulate(nNodes)(s => next(s).values.toArray),
      fail,
      outs.map(_.toArray)
    )
  }
}

object CompiledDict {
  /** Term count above which the compiled form is the Aho–Corasick
    * automaton; below it the intrinsified multi-indexOf scan is faster.
    */
  val acThreshold = 32

  /** label → mention term. For the synthetic corpus the term IS the label
    * token; for other corpora (e.g. the driver's `documents` table) the
    * mapping is configurable.
    */
  def apply(dict: Seq[(String, String)]): CompiledDict = {
    val arr = dict.toArray
    new CompiledDict(arr.map(_._1), arr.map(_._2))
  }

  /** The 10 reference labels, term == label (synthetic corpus). */
  val selfNamed: Seq[(String, String)] = Ontology.allLabels.map(l => (l, l))
}
