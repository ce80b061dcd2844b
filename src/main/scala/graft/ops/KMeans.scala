package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fully DISTRIBUTED fixed-point Lloyd k-means over the whole corpus.
  *
  * [[SimilaritySearch.fitCentroids]] fits on a bounded sample (the right
  * call when centroids are an index artifact, reference anchor: the
  * KDTree stand-in of `pipeline/similarity_pipeline.py:153-157`); this
  * operator is the other canonical shape — the model IS the output, so
  * every vector participates in every Lloyd round. That is the 100 TB
  * "fit" pattern: per round one map-only broadcast-argmin assignment
  * (no shuffle) plus one (cluster, dim)-keyed partial aggregation whose
  * result is C·D rows regardless of corpus size — the only data that
  * ever reaches the driver.
  *
  * Portable arithmetic throughout, so a SQL engine replays the fit
  * bit-for-bit from its own md5:
  *   - vectors are encoded fixed-point: `floor((x + 1) * 2^20)` — the
  *     +1 offset keeps every code positive (corpus values are in
  *     (-1, 1)), so Spark's `div` (truncation) and the oracle's `//`
  *     agree (they differ on negatives: trunc vs floor), and all
  *     distance/sum arithmetic is exact int64 (max code ~2^21, squared
  *     ~2^42, ×64 dims ~2^48; update sums stay exact past 10^12 rows);
  *   - seeds are the md5-ranked sample ([[CurationPipeline.hashBucket]]
  *     on vec_id, the recipe every portable twin here shares), centroid
  *     index = seed rank;
  *   - assignment is the strict-< integer-argmin fold (lowest cluster id
  *     wins ties) as a LINEAR `aggregate` HOF — see
  *     [[SimilaritySearch.nearestCentroid]]'s scaladoc for why a
  *     when/otherwise reduce would explode to 2^C expression nodes;
  *   - the centroid update is `sum(code) div count` per (cluster, dim):
  *     an order-free integer sum, so the fit is partition-invariant;
  *     empty clusters keep their previous centroid.
  */
object KMeans {

  /** Fixed-point encoding of the embedding column (array<bigint>). */
  private[graft] val encode: Column =
    expr("transform(embedding, x -> " +
      "cast(floor((cast(x as double) + 1.0D) * 1048576.0D) as bigint))")

  /** Exact int64 squared distance between two array<bigint> columns. */
  private def sqDistLong(vec: Column, cent: Column): Column =
    aggregate(zip_with(vec, cent, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** (distance, index) of the nearest centroid as a linear fold over the
    * broadcast centroid literal; strict < keeps the lowest index on ties
    * (the oracle's `ORDER BY dist, cid` row_number).
    */
  private def nearest(vec: Column, cents: Array[Array[Long]]): Column = {
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    aggregate(
      sequence(lit(0), lit(cents.length - 1)),
      struct(lit(Long.MaxValue).as("d"), lit(-1).as("i")),
      (acc, i) => {
        val d = sqDistLong(vec, element_at(centsLit, i + 1))
        when(d < acc("d"), struct(d.as("d"), i.as("i"))).otherwise(acc)
      })
  }

  /** `iters` Lloyd rounds over ALL vectors; returns the C×D fixed-point
    * centroid table. Driver state is C·D longs — never corpus-sized.
    */
  def fit(embeddings: DataFrame, c: Int = 8, iters: Int = 3): Array[Array[Long]] = {
    // lazy localCheckpoint: the encoded vectors are re-read once per
    // round; a persist here would leak a CacheManager entry per call
    // (the portableMinhashPairs lesson)
    val vecs = embeddings
      .select(col("vec_id"), encode.as("xq"),
        CurationPipeline.hashBucket(col("vec_id").cast("string")).as("h"))
      .localCheckpoint(false)
    var cents = vecs.orderBy("h", "vec_id").limit(c)
      .select("xq").collect().map(_.getSeq[Long](0).toArray)
    for (_ <- 0 until iters) {
      val stats = vecs
        .withColumn("cluster", nearest(col("xq"), cents)("i"))
        .select(col("cluster"), posexplode(col("xq")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        // all codes positive ⇒ Java truncating division == floor division
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** Final assignment: (vec_id, cluster, dist_fixed) — one map-only
    * broadcast-argmin pass with the exact int64 distance carried out.
    */
  def assign(embeddings: DataFrame, c: Int = 8, iters: Int = 3): DataFrame = {
    val cents = fit(embeddings, c, iters)
    embeddings.select(col("vec_id"), encode.as("xq"))
      .withColumn("nc", nearest(col("xq"), cents))
      .select(col("vec_id"),
        col("nc")("i").cast("long").as("cluster"),
        col("nc")("d").as("dist_fixed"))
  }

  /** The fitted model itself, dim-exploded for exact gating:
    * (cluster, dim, c_fixed), C·D rows.
    */
  def centroidTable(spark: SparkSession, embeddings: DataFrame,
                    c: Int = 8, iters: Int = 3): DataFrame = {
    import spark.implicits._
    fit(embeddings, c, iters).zipWithIndex.flatMap { case (cv, cid) =>
      cv.zipWithIndex.map { case (x, d) => (cid.toLong, d.toLong, x) }
    }.toSeq.toDF("cluster", "dim", "c_fixed")
  }
}
