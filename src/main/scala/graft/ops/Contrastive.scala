package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive-training data mining: hard-negative selection over the
  * embedding space. A contrastive or metric-learning run wants, per
  * anchor, the most-similar examples that are NOT semantically its
  * class — "hard" negatives carry nearly all the gradient signal
  * (the triplet-mining literature's core observation; the reference's
  * label-blocked similarity edges, `pipeline/similarity_pipeline.py:
  * 176-192`, are the complementary POSITIVE side of the same graph).
  *
  * Portable end to end, same discipline as
  * [[Dedup.embeddingNearDupPortable]]: candidates come from the shared
  * md5-derived hyperplane buckets ([[SimilaritySearch.portablePlanes]]),
  * the per-bucket candidate side is rank-capped so pair count is linear
  * in bucket size (never all-pairs), and the per-anchor ranking is
  * cosine in the one op order both engines compute bit-identically.
  */
object Contrastive {

  /** Top-`k` cross-label (hard) negatives per anchor vector:
    * (vec_id, neg_id, rank, cosine). Candidates are same-hyperplane-
    * bucket vectors with a DIFFERENT label; ties on the double cosine
    * break by ascending neg_id, and anchors whose bucket holds no
    * cross-label vector simply emit no rows (mirrors the kNN join).
    *
    * Scale shape: bucketing is a map-only projection (the 8 plane dots
    * constant-fold into one codegen stage); the candidate side is the
    * rank-&le;`cap` window per bucket, so the bucket join emits at most
    * `cap` rows per anchor; the top-k is a per-anchor window over that
    * bounded set. No global sort, no all-pairs — the same shape that
    * holds the near-dup family linear at 100 TB. At corpus scale the
    * plane count (not `cap`) is the recall lever: more bits → smaller
    * buckets → cheaper and sharper, the standard LSH trade.
    */
  def hardNegatives(embeddings: DataFrame, k: Int = 5, bits: Int = 8,
                    dims: Int = 64, cap: Int = 64): DataFrame =
    hardNegativesRaw(embeddings, k, bits, dims, cap)
      .select(col("vec_id"), col("neg_id"), col("rank"),
        round(col("cos_raw"), 6).as("cosine"))

  /** Unrounded twin of [[hardNegatives]] for OracleMarginSpec's
    * round-6 boundary audit (the [[SimilaritySearch.sqApproxRaw]]
    * precedent). */
  private[graft] def hardNegativesRaw(embeddings: DataFrame, k: Int = 5,
                                      bits: Int = 8, dims: Int = 64,
                                      cap: Int = 64): DataFrame = {
    val planes = SimilaritySearch.portablePlanes(bits, dims)
    val bucketCol: Column = concat(planes.map(p =>
      when(SimilaritySearch.dot(col("vec"), lit(p)) >= 0, lit("1"))
        .otherwise(lit("0"))).toIndexedSeq: _*)
    // localCheckpoint, not persist: the frame is self-joined (anchor
    // side + candidate side) — without materialization the scan and
    // the 8-plane bucketing replay per side, and a persist would leak
    // a CacheManager entry per call (the portableMinhashPairs lesson)
    val bucketed = embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"))
      .withColumn("bucket", bucketCol)
      .localCheckpoint(false)
    val perBucket = Window.partitionBy("bucket").orderBy("vec_id")
    val cands = bucketed.withColumn("rk", row_number().over(perBucket))
      .where(col("rk") <= cap)
      .select(col("vec_id").as("neg_id"), col("label").as("neg_label"),
        col("vec").as("nvec"), col("bucket"))
    val scored = bucketed.join(cands, Seq("bucket"))
      .where(col("label") =!= col("neg_label"))
      .withColumn("cos_raw", SimilaritySearch.cosine(col("vec"), col("nvec")))
    val topk = Window.partitionBy("vec_id").orderBy(desc("cos_raw"), asc("neg_id"))
    scored.withColumn("rank", row_number().over(topk))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("neg_id"), col("rank").cast("long").as("rank"),
        col("cos_raw"))
  }
}
