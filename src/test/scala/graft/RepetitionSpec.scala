package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Repetition

/** Hand-computed fixtures for the Gopher-style repetition stats and the
  * CCNet-style corpus segment dedup (ops/Repetition.scala).
  */
class RepetitionSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  test("repetitionStats matches hand-computed dup/top-gram fractions") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b c"),                 // 5 words, 3 distinct; top 2-gram "a b" ×2
      (1L, "x y z w v x y z w v")        // the 5-gram "x y z w v" repeats
    ).toDF("doc_id", "text")
    val out = Repetition.repetitionStats(docs).orderBy("doc_id").collect()

    val r0 = out(0)
    assert(r0.getAs[Double]("dup_word_frac") === 0.4) // (5-3)/5
    assert(r0.getAs[String]("top_2gram") === "a b")
    assert(r0.getAs[Double]("top2gram_frac") === 0.666667) // 2*3/9 chars
    assert(r0.getAs[Double]("dup_5gram_frac") === 0.0)

    val r1 = out(1)
    assert(r1.getAs[Int]("n_words") === 10)
    assert(r1.getAs[Double]("dup_word_frac") === 0.5)
    // 6 overlapping 5-grams, "x y z w v" occurs twice -> 2/6
    assert(r1.getAs[Double]("dup_5gram_frac") === 0.333333)
  }

  test("segmentDedup keeps the first (doc_id, pos) occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // segments (segWords=2): "a b", "c d"
      (2L, "a b x y")  // "a b" duplicates doc 1's first segment
    ).toDF("doc_id", "text")
    val out = Repetition.segmentDedup(docs, segWords = 2)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 2L, 0L, 0.0))
    assert(out(1) === Row(2L, 2L, 1L, 0.5))
  }

  test("segmentDedup truncates the trailing short segment, no dup double-count") {
    import spark.implicits._
    // 5 words at segWords=2 -> segments "a b", "c d", "e"; the repeated
    // in-doc segment "a b" at pos 2 of doc 9 counts as a duplicate too
    val docs = Seq((9L, "a b c d e"), (10L, "a b a b z")).toDF("doc_id", "text")
    val out = Repetition.segmentDedup(docs, segWords = 2)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(9L, 3L, 0L, 0.0))
    assert(out(1) === Row(10L, 3L, 2L, 0.666667))
  }

  test("sourceOverlap counts distinct shared segments with permille Jaccard") {
    import spark.implicits._
    // segWords=2 tiles: s1 {"a b","c d"}, s2 {"a b","x y","c d"},
    // s3 {"q r"}; s1∩s2 = 2 segments, Jaccard 2/3 -> 666 permille;
    // s3 shares nothing and must not appear. The repeated "a b" within
    // s2 (docs 2 and 3) must count once (distinct per source).
    val docs = Seq(
      (1L, "a b c d", "s1"),
      (2L, "a b x y", "s2"),
      (3L, "a b c d", "s2"),
      (4L, "q r", "s3")
    ).toDF("doc_id", "text", "source")
    val out = Repetition.sourceOverlap(docs, segWords = 2).collect()
    assert(out.toSeq === Seq(Row("s1", "s2", 2L, 2L, 3L, 666L)))
  }

  test("dedupGrowth: cumulative totals rise, uniques rise no faster") {
    import spark.implicits._
    // batches of 2 docs; batch 0 all fresh, batch 1 repeats doc 0's
    // segments entirely, batch 2 half-fresh
    val docs = Seq(
      (0L, "a b c d"), (1L, "e f g h"),    // bucket 0: 4 segs, 4 first
      (2L, "a b c d"), (3L, "a b e f"),    // bucket 1: 4 segs, 0 first
      (4L, "z z c d"), (5L, "w w")         // bucket 2: 3 segs, 2 first
    ).toDF("doc_id", "text")
    val out = Repetition.dedupGrowth(docs, segWords = 2, bucketDocs = 2)
      .collect()
    assert(out.toSeq === Seq(
      Row(0L, 4L, 4L, 0L),
      Row(1L, 8L, 4L, 500L),
      Row(2L, 11L, 6L, 454L)))
    // partition invariance: the first-occurrence rank and the bounded
    // prefix sum must not depend on input layout
    val again = Repetition.dedupGrowth(docs.repartition(7), segWords = 2,
      bucketDocs = 2).collect()
    assert(again.toSeq === out.toSeq)
  }
}
