package graft.canon

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** k-NN similarity edges per group (reference A26: per-inspection
  * KDTree, k=5, self-match skipped — similarity_pipeline.py:153-192).
  *
  * Two physical strategies:
  *  - [[exactTopK]]: group-scoped self-join + windowed top-k. Exact;
  *    quadratic in group size — right when groups are bounded (frames
  *    per inspection), wrong at web scale.
  *  - [[approxTopK]]: random-hyperplane LSH bucketing + within-bucket
  *    join + windowed top-k. Near-linear; the 100 TB path. Multiple
  *    hash tables raise recall; candidates are deduplicated before
  *    ranking.
  */
object KnnJoin {

  /** Squared L2 between two array<double> columns — native codegen'd
    * expression (graft.core.VectorExprs), not a boxed HOF lambda.
    */
  def sqDist(a: Column, b: Column): Column = graft.core.VectorExprs.sq_dist(a, b)

  def dist(a: Column, b: Column): Column = sqrt(sqDist(a, b))

  /** Bounded top-k accumulator over (distance, dst) candidates.
    *
    * Replaces the dropDuplicates + row_number() two-shuffle rank with a
    * single groupBy(src) whose partial aggregation runs map-side: each
    * task reduces its candidates to ≤ k survivors before the exchange,
    * so the shuffle carries k rows per src instead of the whole
    * candidate stream — the property that matters when hot LSH buckets
    * fan out at 100 TB. Safe to prune partially because membership in
    * the global top-k implies membership in the top-k of every subset;
    * per-dst dedup is free since a pair's distance is identical in
    * every hash table it collides in. Deterministic ties by (d, dst).
    */
  class TopKNeighbors(k: Int)
      extends Aggregator[(Double, String), Seq[(Double, String)], Seq[(Double, String)]] {
    private def prune(s: Seq[(Double, String)]): Seq[(Double, String)] =
      if (s.lengthCompare(k) <= 0) s else s.sorted.take(k)
    def zero: Seq[(Double, String)] = Nil
    // dst collision keeps the MIN distance: current callers provably feed
    // identical distances per (src, dst) (same pair from different hash
    // tables), but a future caller with differing per-pair scores must
    // not get silently wrong rankings
    def reduce(b: Seq[(Double, String)], a: (Double, String)): Seq[(Double, String)] = {
      val i = b.indexWhere(_._2 == a._2)
      if (i < 0) prune(b :+ a)
      else if (a._1 < b(i)._1) b.updated(i, a)
      else b
    }
    def merge(b1: Seq[(Double, String)], b2: Seq[(Double, String)]): Seq[(Double, String)] =
      prune((b1 ++ b2).groupBy(_._2).valuesIterator.map(_.min).toSeq)
    def finish(r: Seq[(Double, String)]): Seq[(Double, String)] = r.sorted
    def bufferEncoder: Encoder[Seq[(Double, String)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, String)]] = ExpressionEncoder()
  }

  /** Long-id twin of [[TopKNeighbors]] for the high-volume path (the
    * pipeline's packed-long frame ids): no per-candidate string
    * allocation, buffer kept sorted so a candidate worse than the
    * current k-th is rejected with one compare and ZERO allocation —
    * the common case once the buffer warms up, which is what keeps the
    * per-candidate cost flat when LSH buckets fan out.
    */
  class TopKNeighborsLong(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    def zero: Seq[(Double, Long)] = Nil
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
      if (b.lengthCompare(k) >= 0) {
        val w = b.last
        // safe even if a's dst is already in the buffer: the buffered
        // entry is ≤ worst, so rejecting the worse duplicate keeps the min
        if (a._1 > w._1 || (a._1 == w._1 && a._2 >= w._2)) return b
      }
      val di = b.indexWhere(_._2 == a._2)
      if (di >= 0 && b(di)._1 <= a._1) b
      else {
        // dst collision keeps the min distance (identical-distance in
        // current callers; see TopKNeighbors note); sorted insert by (d, dst)
        val base = if (di >= 0) b.patch(di, Nil, 1) else b
        val (lo, hi) = base.span(x => x._1 < a._1 || (x._1 == a._1 && x._2 < a._2))
        val ins = (lo :+ a) ++ hi
        if (ins.lengthCompare(k) > 0) ins.take(k) else ins
      }
    }
    def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (b1 ++ b2).groupBy(_._2).valuesIterator.map(_.min).toSeq.sorted.take(k)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  /** (src, dst, distance) candidates → k nearest per src, one shuffle.
    * Long dst ids rank through the allocation-lean [[TopKNeighborsLong]];
    * other id types round-trip through the aggregator as strings
    * (lossless for the ids used here) and are cast back on the way out.
    */
  private def topKByDistance(candidates: DataFrame, k: Int,
                             dropSelf: Boolean): DataFrame = {
    val dstType = candidates.schema("dst").dataType
    val ranked =
      if (dstType == org.apache.spark.sql.types.LongType) {
        val topk = udaf(new TopKNeighborsLong(k))
        candidates.groupBy("src")
          .agg(topk(col("distance"), col("dst")).as("nn"))
          .select(col("src"), explode(col("nn")).as("p"))
          .select(col("src"), col("p._2").as("dst"), col("p._1").as("distance"))
      } else {
        val topk = udaf(new TopKNeighbors(k))
        candidates.groupBy("src")
          .agg(topk(col("distance"), col("dst").cast("string")).as("nn"))
          .select(col("src"), explode(col("nn")).as("p"))
          .select(col("src"), col("p._2").cast(dstType).as("dst"), col("p._1").as("distance"))
      }
    if (dropSelf) ranked.where(col("src") =!= col("dst")) else ranked
  }

  /** feat: (id string, group long/string, vec array<double>).
    * Returns (src, dst, distance): k nearest neighbors of each id
    * within its group, deterministic ties by dst id.
    *
    * `selfRank = true` reproduces the reference's KDTree semantics
    * (similarity_pipeline.py:176-192): the query point is IN the tree,
    * so `query(v, k)` spends one of the k slots on the self-match, which
    * is then skipped — at most k−1 edges per node. With `false` (the
    * generic ANN-graph default) the self pair is excluded before ranking
    * and each node gets a full k neighbors.
    */
  def exactTopK(feat: DataFrame, k: Int, selfRank: Boolean = false): DataFrame = {
    // self-join: materialize once or the whole upstream lineage runs twice
    val f = feat.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = f.select(col("id").as("src"), col("group"), col("vec").as("va"))
    val b = f.select(col("id").as("dst"), col("group"), col("vec").as("vb"))
    val pairs = a.join(b, Seq("group"))
    val candidates = if (selfRank) pairs else pairs.where(col("src") =!= col("dst"))
    topKByDistance(
      candidates.select(col("src"), col("dst"), dist(col("va"), col("vb")).as("distance")),
      k, dropSelf = true)
  }

  /** LSH top-k: `tables` independent sign-random-projection signatures
    * of `bits` bits each; rows sharing (table, signature, group) become
    * candidates. Deterministic hyperplanes from a seeded hash of the
    * dimension index — no fitted model state to persist.
    *
    * Candidate generation is LINEAR in bucket size: a full within-bucket
    * self-join goes K² on a hot bucket (at 400k rows the telemetry space
    * produced 117M pairs, 29× the useful work; a 100 TB boilerplate
    * bucket would be quadratic). Instead, rows in a bucket are ordered
    * by one extra deterministic projection (near in L2 ⇒ near in any 1-d
    * projection, so true neighbors land at adjacent positions) and each
    * row pairs only with its ±`window` positional neighbors — exactly
    * 2·window·tables candidates per row. Buckets of ≤ window+1 rows are
    * still paired exhaustively, so fixture-scale recall is unchanged
    * (CanonSpec's 0.8 floor). The per-bucket row_number is the only
    * skew-sensitive step, and it ranks scalars, not vectors.
    */
  def approxTopK(feat: DataFrame, k: Int, tables: Int = 4, bits: Int = 8,
                 seed: Long = 42L, selfRank: Boolean = false,
                 window: Int = 8, compact: Boolean = false,
                 portable: Boolean = false): DataFrame = {
    // compact: carry the vectors through the candidate shuffle as
    // array<float> — half the bytes on the highest-volume stream in the
    // engine (distances still accumulate in double; ranking shifts only
    // on 1e-7-relative near-ties). Opt-in: on a NETWORK shuffle the
    // bytes dominate and this is the right default, but on this box's
    // tmpfs shuffle it measured neutral-to-slightly-negative (pinned
    // 8-core leg: 575-653 task-s float vs 541-593 double — the per-
    // element float→double conversion costs what the bus saves), so the
    // single-box bench keeps doubles. The full-probe oracle path
    // (lshTopKFull) must keep compact=false to stay bit-exact against
    // the double-arithmetic SQL oracle.
    val featIn = if (compact)
      feat.withColumn("vec", col("vec").cast("array<float>")) else feat
    val dims = 64 // upper bound on vec length used for plane generation
    // signature per table: sum over bits of sign(dot(vec, plane)) << bit.
    // portable=true swaps the avalanche-mixed coefficients for the
    // md5-derived portable formula (key "<table>_<bit>_<dim>") so an
    // external SQL engine regenerates the identical hyperplanes — the
    // oracle gate for the positional-block machinery; seed is ignored.
    def planeCoef(t: Int, bit: Int, d: Int): Double =
      if (portable) graft.ops.SimilaritySearch.portablePlaneCoef(s"${t}_${bit}_${d}")
      else {
        val h = graft.core.Rng.mix(seed + t * 1000003L, bit * 131L + d)
        (h >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0
      }
    def plane(t: Int, bit: Int): Column =
      lit((0 until dims).map(d => planeCoef(t, bit, d)).toArray)
    def signature(t: Int): Column = {
      val bitCols = (0 until bits).map { bit =>
        // Dot runs over min(|vec|, |planes|) — no slicing needed
        val dot = graft.core.VectorExprs.vec_dot(col("vec"), plane(t, bit))
        when(dot >= 0, lit(1L << bit)).otherwise(lit(0L))
      }
      // bits = 0 → one bucket per group: the FULL-PROBE degenerate case
      // (with window ≥ group size this reduces to exact k-NN — the
      // reduction the driver's ann_lsh_full oracle gate exploits)
      if (bits == 0) lit(0L) else bitCols.reduce(_ + _)
    }
    // ordering projection: one extra plane per table (index `bits`, never
    // used by the signature), so bucket order is independent of the bits
    def orderProj(t: Int): Column =
      graft.core.VectorExprs.vec_dot(col("vec"), plane(t, bits))
    val tagged = featIn.select(
      col("id"), col("group"), col("vec"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signature(t).as("sig"), orderProj(t).as("p"))): _*)).as("h"))
      .select(col("id"), col("group"), col("vec"),
        col("h.t").as("t"), col("h.sig").as("sig"), col("h.p").as("p"))
    val posed = tagged
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("group", "t", "sig").orderBy(col("p"), col("id"))))
      // localCheckpoint, not persist: `posed` is referenced three times
      // below (two join sides + self candidates), and persist only caches
      // execution — the ANALYZER still walks the full upstream plan per
      // reference. With a wide feature lineage (the 25-label frame
      // extraction) that made Catalyst the bottleneck: one query spent
      // 150+ s in plan transforms and could stack-overflow. The eager
      // checkpoint truncates the plan to an RDD leaf.
      .localCheckpoint(true)

    // block = pos / window as an extra join key: an in-window pair
    // (Δpos ≤ window) spans at most two adjacent blocks, so the hi side
    // replicates into (block, block−1) and every equi-key bucket holds
    // O(window) rows — the join never enumerates a quadratic cross
    // product, not even transiently inside a sort-merge task
    val lo = posed.select(col("id").as("src"), col("group"), col("t"),
      col("sig"), (col("pos") / window).cast("int").as("blk"),
      col("pos"), col("vec").as("va"))
    val hi = posed.select(col("id").as("dst"), col("group"), col("t"), col("sig"),
      explode(array((col("pos") / window).cast("int"),
        ((col("pos") / window).cast("int") - 1))).as("blk"),
      col("pos").as("pos_hi"), col("vec").as("vb"))
    // each unordered in-window pair matches exactly one (blk) key and is
    // scored once; the explode emits both directions WITHOUT re-executing
    // the join (a second select over `scored` would replay its lineage).
    // shuffle_hash hint: stack-sampling the 4-cpu scaling leg showed the
    // sort comparators of a merge join as the hottest executor frames —
    // hashing skips sorting BOTH multi-hundred-MB sides. Safe at scale:
    // the build side is partitioned on (group, t, sig, blk) whose per-key
    // population is O(window) by construction, so no partition's hash map
    // outgrows memory. (Broadcast stays out: AQE under-estimates the
    // checkpointed sides and a million-row vec broadcast OOMed the driver
    // at 400k rows — hence an explicit hint rather than Catalyst's pick.)
    val scored = lo.join(hi.hint("shuffle_hash"), Seq("group", "t", "sig", "blk"))
      .where(col("pos_hi") - col("pos") >= 1 && col("pos_hi") - col("pos") <= window)
      .select(col("src"), col("dst"), dist(col("va"), col("vb")).as("distance"))
    val both = scored
      .select(explode(array(
        struct(col("src"), col("dst"), col("distance")),
        struct(col("dst").as("src"), col("src").as("dst"), col("distance")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.distance").as("distance"))
    // reference KDTree semantics: the query point is in the tree, so the
    // self-match occupies one of the k result slots before being skipped.
    // Self pairs come from `posed` (one per hash table — the ranker
    // dedups by dst), so no extra upstream lineage is referenced.
    val candidates = if (!selfRank) both else both.unionByName(
      posed.select(col("id").as("src"), col("id").as("dst"), lit(0.0).as("distance")))
    // cross-table duplicate pairs are deduped inside the aggregator
    topKByDistance(candidates, k, dropSelf = true)
  }
}
