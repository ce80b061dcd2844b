package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests.
  *
  * docs/PLANS.md captures the physical plans as point-in-time evidence;
  * this spec pins the scale-critical properties as assertions so a
  * refactor cannot silently regress them: filter pushdown + column
  * pruning at the parquet scan, partial+final hash aggregation,
  * broadcast joins for dimensions and semi/anti joins, global top-k as
  * TakeOrderedAndProject, and — across the ENTIRE query surface — no
  * unintended cartesian / broadcast-nested-loop join and no
  * single-partition exchange outside the one bounded prefix-sum.
  *
  * Plans are built (analyzed + optimized + planned), not executed; the
  * assertions read the physical plan string. AQE wrapping is fine: the
  * initial plan already shows scan pushdown, join strategies and
  * exchange placement.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val planCache = scala.collection.mutable.Map.empty[String, String]
  private def plan(name: String): String =
    planCache.getOrElseUpdate(name,
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString)

  /** Exact verifiers over a deterministic bounded candidate set
    * (doc_id < 200 all-pairs / a fixed probe set): the nested-loop side
    * is a small broadcast by design, never the corpus.
    */
  private val boundedAllPairs = Set("ngram_jaccard", "q27_cosine_pairs")

  /** Streaming entries return a memory-sink scan (the interesting plan
    * is the stream side, proven in StreamingSpec) and invoking them
    * runs a whole micro-batch query — excluded from the batch audits.
    */
  private val batchNames: Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("streaming_"))

  test("no query plan contains an unintended cartesian / nested-loop join") {
    val offenders = batchNames.filterNot(boundedAllPairs).filter { n =>
      val p = plan(n)
      p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian/BNLJ in: ${offenders.mkString(", ")}")
  }

  test("no single-partition exchange outside the bounded prefix-sum") {
    // shard_pack's phase 2 is the documented two-phase prefix sum: the
    // SinglePartition exchange carries one row PER BUCKET (post
    // partial+final agg), not the corpus — the only allowed occurrence.
    // seq_pack and corpus_shuffle share shard_pack's two-phase prefix
    // sum / rank — their one SinglePartition exchange also carries one
    // row per bucket (256 rows for the shuffle), never the corpus.
    // hll_distinct's final fold is a global agg over the ≤64-row
    // register table and bottomk_distinct's over exactly k=64
    // TakeOrdered rows: their SinglePartition exchange carries one
    // partial-agg row per partition, never the corpus.
    // ppjoin_pairs' global rarity-rank window touches one row per
    // VOCAB entry after the df partial agg — shard_pack's bounded
    // argument again. weighted_sample shares shard_pack's two-phase
    // prefix sum (one row per bucket on the single partition);
    // zorder_prune's global fold aggregates one row per FILE (≤256)
    // after the per-file partial agg. dedup_growth's running sum walks
    // one row per 50-DOC BATCH after the bucket partial agg — the same
    // bounded prefix-sum shape as shard_pack.
    // rrf_fusion's two rank windows run over the ≤pool-row candidate
    // lists AFTER each leg's bounded top-k — serving-side tables (the
    // MMR stage-2 class), never the corpus.
    val offenders = batchNames.filterNot(
      Set("shard_pack", "seq_pack", "corpus_shuffle", "hll_distinct",
        "bottomk_distinct", "ppjoin_pairs", "weighted_sample",
        "zorder_prune", "dedup_growth", "rrf_fusion"))
      .filter(n => plan(n).contains("SinglePartition"))
    assert(offenders.isEmpty,
      s"unexpected single-partition exchange in: ${offenders.mkString(", ")}")
    assert(plan("shard_pack").contains("partial_sum"),
      "shard_pack must partial-aggregate per bucket before the global cumsum")
  }

  test("q01: pushdown, pruning, partial agg, vectorized scan") {
    val p = plan("q01_pricing_agg")
    assert(p.contains("PushedFilters: [") &&
      p.contains("LessThanOrEqual(l_shipdate"),
      "shipdate filter must reach the parquet scan")
    assert(!p.contains("l_comment"),
      "unreferenced lineitem columns must be pruned from the scan")
    assert(p.contains("partial_sum"), "map-side partial aggregation expected")
    assert(p.contains("Batched: true"), "scan should use the vectorized reader")
  }

  test("q02: nation and region dimensions join as broadcasts") {
    val p = plan("q02_region_rollup")
    assert(p.split("BroadcastHashJoin").length >= 3,
      "customer⋈nation⋈region should broadcast both dimension sides")
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join expected in the dimension rollup")
  }

  test("semi/anti joins build the subquery side as a broadcast") {
    val s = plan("q09_semijoin")
    assert(s.contains("LeftSemi") && s.contains("BroadcastHashJoin"))
    val a = plan("q10_antijoin")
    assert(a.contains("LeftAnti") && a.contains("BroadcastHashJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject, not sort+limit") {
    for (n <- Seq("q03_topk_orders", "ann_topk", "kg_topk_quality", "vocab_topk"))
      assert(plan(n).contains("TakeOrderedAndProject"),
        s"$n should plan the global top-k as TakeOrderedAndProject")
  }
}
