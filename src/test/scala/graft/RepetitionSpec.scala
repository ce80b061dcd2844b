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
}
