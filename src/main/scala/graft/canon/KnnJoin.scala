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
    def reduce(b: Seq[(Double, String)], a: (Double, String)): Seq[(Double, String)] =
      if (b.exists(_._2 == a._2)) b else prune(b :+ a)
    def merge(b1: Seq[(Double, String)], b2: Seq[(Double, String)]): Seq[(Double, String)] =
      prune((b1 ++ b2).distinct)
    def finish(r: Seq[(Double, String)]): Seq[(Double, String)] = r.sorted
    def bufferEncoder: Encoder[Seq[(Double, String)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, String)]] = ExpressionEncoder()
  }

  /** (src, dst, distance) candidates → k nearest per src, one shuffle.
    * dst round-trips through the aggregator as a string (lossless for
    * the long/string ids used here) and is cast back on the way out.
    */
  private def topKByDistance(candidates: DataFrame, k: Int,
                             dropSelf: Boolean): DataFrame = {
    val dstType = candidates.schema("dst").dataType
    val topk = udaf(new TopKNeighbors(k))
    val ranked = candidates
      .groupBy("src")
      .agg(topk(col("distance"), col("dst").cast("string")).as("nn"))
      .select(col("src"), explode(col("nn")).as("p"))
      .select(col("src"), col("p._2").cast(dstType).as("dst"), col("p._1").as("distance"))
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
    */
  def approxTopK(feat: DataFrame, k: Int, tables: Int = 4, bits: Int = 8,
                 seed: Long = 42L, selfRank: Boolean = false): DataFrame = {
    val dims = 64 // upper bound on vec length used for plane generation
    // signature per table: sum over bits of sign(dot(vec, plane)) << bit
    def planeCoef(t: Int, bit: Int, d: Int): Double = {
      val h = graft.core.Rng.mix(seed + t * 1000003L, bit * 131L + d)
      (h >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0
    }
    def signature(t: Int): Column = {
      val bitCols = (0 until bits).map { bit =>
        val planes = lit((0 until dims).map(d => planeCoef(t, bit, d)).toArray)
        // Dot runs over min(|vec|, |planes|) — no slicing needed
        val dot = graft.core.VectorExprs.vec_dot(col("vec"), planes)
        when(dot >= 0, lit(1L << bit)).otherwise(lit(0L))
      }
      bitCols.reduce(_ + _)
    }
    val tagged = feat.select(
      col("id"), col("group"), col("vec"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signature(t).as("sig"))): _*)).as("h"))
      .select(col("id"), col("group"), col("vec"),
        col("h.t").as("t"), col("h.sig").as("sig"))
      // self-join below: without materialization the signature stage and
      // everything upstream would execute once per join side
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val a = tagged.select(col("id").as("src"), col("group"), col("t"), col("sig"), col("vec").as("va"))
    val b = tagged.select(col("id").as("dst"), col("group"), col("t"), col("sig"), col("vec").as("vb"))
    val pairs = a.join(b, Seq("group", "t", "sig"))
    val candidates = if (selfRank) pairs else pairs.where(col("src") =!= col("dst"))
    // cross-table duplicate pairs are deduped inside the aggregator
    topKByDistance(
      candidates.select(col("src"), col("dst"), dist(col("va"), col("vb")).as("distance")),
      k, dropSelf = true)
  }
}
