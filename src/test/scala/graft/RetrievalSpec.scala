package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Retrieval

/** Quantized-integer BM25 retrieval (ops/Retrieval.scala): the
  * hand-computed fixed-point arithmetic, the Lucene-style idf clamp,
  * and the rank shape (saturation + length normalization).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("scores match the hand-computed quantized formula") {
    // N=3, lens 3/2/4 -> avg_milli = 3000
    // term x: df=2 -> aa=3 < bb=5 -> idf clamps to 0 (df > N/2)
    // term y: df=1 -> aa=5, bb=3 -> bits=0, idf_milli = 5000//3 - 1000 = 666
    // doc1 y: tf=1, len=3 -> l=1000, bnorm=1000, tfn=220000//220=1000
    //   -> contrib 666*1000 = 666000; doc2 only x -> 0; doc3 no hits
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "z z z z"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, Seq("x", "y"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 666000L), (2L, 0L)))
  }

  test("rrfFusion: integer reciprocal ranks, both-leg docs outrank single-leg") {
    import spark.implicits._
    // sparse leg: only doc 1 contains the query term → sparse = [1]
    val docs = Seq((1L, "q a"), (2L, "a b"), (3L, "b c")).toDF("doc_id", "text")
    // dense leg vs query (1,0): cosines 0 / 1 / ~0.994 → ranks 2, 3, 1
    val emb = Seq(
      (1L, Seq(0f, 1f)), (2L, Seq(1f, 0f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.rrfFusion(docs, emb, Seq("q"), Array(1.0, 0.0),
        k = 5, pool = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // doc1: sparse rank 1 + dense rank 3 → 1000000//61 + 1000000//63
    // doc2: dense rank 1 → 16393; doc3: dense rank 2 → 16129
    assert(got === Seq((1L, 2, 32266L), (2L, 1, 16393L), (3L, 1, 16129L)))
  }

  test("tf saturation and length normalization shape the ranking") {
    // rare term q (df 2 of 5): doc2 has tf=2 but is 3x longer — the
    // length penalty outweighs the saturated second occurrence, the
    // classic BM25 trade-off the fixed-point path must preserve
    val docs = Seq((1L, "q a"), (2L, "q q a a a a"),
      (3L, "a a"), (4L, "a a"), (5L, "a a")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, Seq("q"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._1) === Seq(1L, 2L), s"ranking was $got")
    assert(got.forall(_._2 > 0))
  }

  test("top-k is deterministic with doc_id tie-break and bounded by k") {
    val docs = (0L until 30L).map(i => (i, "same words here")).toDF("doc_id", "text")
    val a = Retrieval.bm25TopK(docs, Seq("same"), k = 7).collect()
    val b = Retrieval.bm25TopK(docs, Seq("same"), k = 7).collect()
    assert(a.length === 7)
    assert(a.map(_.getLong(0)).toSeq === (0L until 7L))
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
  }

  test("invertedIndex: one posting per (term, doc), hand-computed tf/df") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c")).toDF("doc_id", "text")
    val got = Retrieval.invertedIndex(docs).orderBy("term", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", 1L, 2L, 1L),           // tf 2 in doc 1, df 1
      ("b", 1L, 1L, 2L), ("b", 2L, 1L, 2L),
      ("c", 2L, 1L, 2L), ("c", 3L, 3L, 2L)))
    // partition invariance of the postings
    val again = Retrieval.invertedIndex(docs.repartition(5))
      .orderBy("term", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === got.toSeq)
  }
}
