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
  * tokenizers compiled per-partition"). For the small reference dictionary
  * a direct multi-term scan is optimal; the structure is the hook where an
  * Aho–Corasick automaton slots in for large dictionaries.
  */
final class CompiledDict(val labels: Array[String], val terms: Array[String])
    extends Serializable {
  def countAll(text: String): Array[Int] = {
    val out = new Array[Int](terms.length)
    var i = 0
    while (i < terms.length) {
      out(i) = DictAnalyzer.countOccurrences(text, terms(i))
      i += 1
    }
    out
  }
}

object CompiledDict {
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
