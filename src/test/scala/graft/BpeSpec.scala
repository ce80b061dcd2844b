package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.BpeTrainer

/** BPE merge learning (ops/BpeTrainer.scala): hand-traced merges with
  * the (count desc, pair asc) tie rule, and end-to-end tokenization.
  */
class BpeSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("merges follow the classic iteration with deterministic ties") {
    // low x3, lower x2. Pair counts 'l o'=5, 'o w'=5 tie -> 'l o' by
    // pair order; then 'lo w'=5; then 'e r'=2 vs 'low e'=2 tie -> 'e r'
    val docs = Seq((1L, "low low low"), (2L, "lower lower"))
      .toDF("doc_id", "text")
    val got = BpeTrainer.learnMerges(docs, merges = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1, "l o", 5L), (2, "lo w", 5L),
      (3, "e r", 2L), (4, "low er", 2L)))
  }

  test("driver-fit and distributed merge loops produce identical merges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val driver = BpeTrainer.learnMerges(docs, merges = 6)
      .orderBy("merge_rank").collect().toSeq
    val dist = BpeTrainer.learnMerges(docs, merges = 6, vocabLimit = 0L)
      .orderBy("merge_rank").collect().toSeq
    assert(driver === dist)
  }

  test("tokenizeCount applies merges in rank order") {
    val docs = Seq((1L, "low low low"), (2L, "lower lower"))
      .toDF("doc_id", "text")
    val ms = BpeTrainer.learnMerges(docs, merges = 4)
      .orderBy("merge_rank").collect().map(_.getString(1)).toSeq
    val counts = BpeTrainer.tokenizeCount(docs, ms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all 4 merges collapse 'low' and 'lower' to single subwords
    assert(counts === Map(1L -> 3L, 2L -> 2L))
    // with only the first two merges, 'lower' is 'low e r' = 3 subwords
    val partial = BpeTrainer.tokenizeCount(docs, ms.take(2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial === Map(1L -> 3L, 2L -> 6L))
  }

  test("self-abutting pairs merge left-to-right non-overlapping") {
    // ' a a a a ' -> the first ' a a ' match consumes its trailing
    // space, so the scan resumes mid-run and cannot re-match: one
    // merge -> 'aa a a' (3 subwords). The documented quirk — both
    // engines share it (bpe_tokenize's oracle replays it exactly)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val ms = BpeTrainer.learnMerges(docs, merges = 1)
      .collect().map(_.getString(1)).toSeq
    assert(ms === Seq("a a"))
    val counts = BpeTrainer.tokenizeCount(docs, ms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 3L))
  }
}
