package graft

import graft.ops.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** PMI collocations: hand-computed integer milli-log2 scores, the
  * positive-PMI cut, presence (not frequency) counting, and the
  * vocabulary bound.
  */
class PmiSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("pmi: exact integer scores, negative pairs cut, presence counting") {
    // N=4; df: x=3 y=2 z=2 w=1
    // (w,z): 1·4 / (1·2) = 2      -> milli-log2 = 1000
    // (x,y): 2·4 / (3·2) = 4/3    -> 0 bits + 1000·8//6 − 1000 = 333
    // (x,z): 1·4 / (3·2) < 1      -> negative PMI, excluded
    // "x x y" proves presence counting: repeated x adds nothing
    val got = TextAnalysis.pmiPairs(docs("x x y", "x y", "x z", "w z"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("w", "z", 1L, 1000L), ("x", "y", 2L, 333L)))
  }

  test("pmi: words outside the df-top-vocabSize never pair") {
    // vocabSize=2 keeps {a, b} (df 2 each; 'q' df 1 loses the cut)
    val got = TextAnalysis.pmiPairs(docs("a b q", "a b"), vocabSize = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("a", "b")))
  }
}
