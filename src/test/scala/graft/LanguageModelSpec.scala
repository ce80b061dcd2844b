package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LanguageModel

/** Bigram LM scoring (ops/LanguageModel.scala): hand-checked surprisal
  * arithmetic on a tiny corpus, the in-domain < out-of-domain ordering
  * the CCNet-style filter relies on, and filter/score consistency.
  */
class LanguageModelSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("surprisal arithmetic matches the hand-computed model") {
    // force everything into training with trainPermille = 1000
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = LanguageModel.perplexityScore(docs, trainPermille = 1000)
      .orderBy("doc_id").collect()
    // train bigrams: d1: "a b","b a","a b"  d2: "a b","b c"
    // counts: "a b"->3, "b a"->1, "b c"->1; ctx: a->3, b->2; V = 3
    // doc1 bits: "a b": (3+3) div 4 = 1 -> 0 bits; "b a": (2+3) div 2 = 2 -> 1
    //   "a b" again -> 0; total 1, n=3, oov=0, bpb = 1000*1 div 3 = 333
    // doc2 bits: "a b" -> 0; "b c": (2+3) div 2 = 2 -> 1; total 1, n=2,
    //   oov=0, bpb = 500
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq ===
      Seq((1L, 1, 3L, 0L, 1L, 333L), (2L, 1, 2L, 0L, 1L, 500L)))
  }

  test("minority out-of-domain text scores more bits per bigram") {
    // 40 docs of one register vs 10 of another, all in training: the
    // minority's conditional counts are smaller, so its quantized
    // surprisal is higher — the ordering the CCNet-style cut relies on
    val inDomain = (0L until 40L).map(i => (i, "the hull shows heavy marine growth"))
    val outDomain = (100L until 110L).map(i => (i, "zz qq xx vv ww yy"))
    val byKind = LanguageModel.perplexityScore(
        (inDomain ++ outDomain).toDF("doc_id", "text"), trainPermille = 1000)
      .withColumn("kind", when(col("doc_id") < 100, "in").otherwise("out"))
      .groupBy("kind").agg(avg("bpb_milli").as("b"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byKind("out") > byKind("in"),
      s"out-of-domain ${byKind("out")} must exceed in-domain ${byKind("in")}")
  }

  test("unseen bigrams count as OOV and dominate the surprisal") {
    val docs = Seq((1L, "a b a b a b"), (2L, "x y")).toDF("doc_id", "text")
    // content bucket of "a b a b a b" and "x y": pick permille so that
    // doc1 trains and doc2 does not — probe the buckets directly
    val b = docs.select(col("doc_id"),
      graft.ops.CurationPipeline.hashBucket(col("text"), 1000L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = (math.min(b(1L), b(2L)) + 1).toInt
    val (trainId, oovId) = if (b(1L) < b(2L)) (1L, 2L) else (2L, 1L)
    val got = LanguageModel.perplexityScore(docs, trainPermille = cut)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(3), r.getLong(5))).toMap
    assert(got(trainId)._1 === 1 && got(oovId)._1 === 0)
    assert(got(oovId)._2 > 0, "held-out doc's novel bigrams must be OOV")
    assert(got(oovId)._3 > got(trainId)._3,
      "novel-content doc must carry more bits per bigram")
  }

  test("perplexityTiers buckets per source at the integer permille boundary") {
    // 20 scorable docs per source: head = lowest 10% = ranks 1-2,
    // middle = next 40% = ranks 3-10, tail = the rest
    val docs = (0L until 40L).map { i =>
      (i, s"w$i x$i y$i z$i common tokens here", s"src${i % 2}")
    }.toDF("doc_id", "text", "source")
    val tiers = LanguageModel.perplexityTiers(docs, trainPermille = 1000)
      .collect()
    assert(tiers.length === 40)
    val bySrc = tiers.groupBy(_.getString(1))
    for ((_, rows) <- bySrc) {
      val counts = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
      assert(counts === Map("head" -> 2, "middle" -> 8, "tail" -> 10))
      // head docs never score above tail docs within a source
      val maxHead = rows.filter(_.getString(3) == "head").map(_.getLong(2)).max
      val minTail = rows.filter(_.getString(3) == "tail").map(_.getLong(2)).min
      assert(maxHead <= minTail)
    }
  }

  test("perplexityFilter keeps exactly the docs at or under the cut") {
    val docs = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) "one two three four five six"
          else s"rare$i tok$i odd$i end$i")
    }.toDF("doc_id", "text")
    val scored = LanguageModel.perplexityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val cut = scored.values.toSeq.sorted.apply(scored.size / 2)
    val kept = LanguageModel.perplexityFilter(docs, cut)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === scored.filter(_._2 <= cut).keySet)
  }
}
