package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id long, embedding array<float>, label int)`).
  *
  * Baseline: brute-force cosine top-k — one scan, no shuffle besides
  * the final TakeOrdered. Scale path: IVF-style bucketing — assign each
  * vector to its nearest of C deterministic centroids (sign-projection
  * buckets), probe only matching buckets.
  */
object SimilaritySearch {

  def dot(a: Column, b: Column): Column = graft.core.VectorExprs.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(graft.core.VectorExprs.vec_dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k for one query vector: the exact baseline.
    * Whole plan = scan → project (codegen HOF) → TakeOrderedAndProject.
    */
  def bruteForceTopK(embeddings: DataFrame, query: Array[Double], k: Int): DataFrame = {
    val q = lit(query)
    val v = expr("transform(embedding, x -> cast(x as double))")
    embeddings.select(col("vec_id"), round(cosine(v, q), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed ANN: query probes only its own sign-projection
    * buckets across `tables` hash tables, then exact re-rank.
    */
  def lshTopK(embeddings: DataFrame, query: Array[Double], k: Int,
              tables: Int = 6, bits: Int = 6, window: Int = 8): DataFrame = {
    val feat = embeddings.select(col("vec_id").cast("string").as("id"),
      lit(1L).as("group"), expr("transform(embedding, x -> cast(x as double))").as("vec"))
    // reuse the deterministic hyperplanes of KnnJoin via a one-row query df
    val qdf = feat.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("__query__", 1L, query)),
      feat.schema)
    // compact=false: the full-probe variant is hash-gated against a
    // double-arithmetic SQL oracle — distances must stay bit-exact
    val knn = graft.canon.KnnJoin.approxTopK(feat.unionByName(qdf), k, tables, bits,
      window = window, compact = false)
    knn.where(col("src") === "__query__")
      .select(col("dst").cast("long").as("vec_id"), col("distance"))
  }

  /** Full-probe LSH: one table, zero signature bits (a single bucket) and
    * a pairing window covering the whole corpus — the bucketing machinery
    * runs end-to-end (tagging, positional blocking, pair join, top-k
    * ranker) but the candidate set is exhaustive, so the result reduces
    * to exact k-NN by L2 distance. This is the oracle gate for the LSH
    * path: the driver hash-checks it against brute-force SQL.
    * `n` must be ≥ the corpus size.
    */
  def lshTopKFull(embeddings: DataFrame, query: Array[Double], k: Int,
                  n: Int): DataFrame =
    lshTopK(embeddings, query, k, tables = 1, bits = 0, window = n)

  /** Argmin over a broadcast centroid table as a LINEAR fold: the
    * centroid table is one array<array<double>> literal and `aggregate`
    * threads the running (best distance, index) through a lambda
    * variable — a fixed-size expression regardless of C. (A naive
    * when(a<=b,a).otherwise(b) reduce duplicates the accumulated subtree
    * per step: 2^C nodes, megabyte task binaries, and a 585 s query at
    * sf0.1.)
    */
  private def nearestCentroid(vecCol: Column, cents: Array[Array[Double]]): Column = {
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    aggregate(
      sequence(lit(0), lit(cents.length - 1)),
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("i")),
      (acc, i) => {
        val d = graft.core.VectorExprs.sq_dist(vecCol, element_at(centsLit, i + 1))
        when(d < acc("d"), struct(d.as("d"), i.as("i"))).otherwise(acc)
      }
    )("i")
  }

  /** Deterministic seed centroids: the C vectors with the smallest id
    * hash — a seeded sample of the data.
    */
  private def sampleCentroids(embeddings: DataFrame, c: Int): Array[Array[Double]] =
    embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"),
        xxhash64(col("vec_id")).as("h"))
      .orderBy("h").limit(c)
      .select(col("vec"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Lloyd-iteration centroid fit (the k-means|| shape: seed from a
    * deterministic sample, refine with `iters` assign/average rounds over
    * a bounded sample). Hash-sample seeds give no balance guarantee on
    * clustered real data — a couple of Lloyd rounds make the
    * nProbe/recall trade-off trustworthy (reference anchor: the exact
    * KDTree of similarity_pipeline.py:153-157 is what IVF approximates).
    *
    * Scale shape: the fit runs on a `sampleCap`-bounded deterministic
    * sample (fitting is a statistics pass, not a corpus pass); each round
    * is one map-side assignment + one (bucket, dim)-grouped average —
    * shuffle rows ≤ sample·dims, independent of corpus size. Empty
    * clusters keep their previous centroid.
    */
  def fitCentroids(embeddings: DataFrame, c: Int, iters: Int,
                   sampleCap: Int = 100000): Array[Array[Double]] = {
    val sample = embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"),
        xxhash64(col("vec_id")).as("h"))
      .orderBy("h").limit(sampleCap)
      .select("vec")
      .localCheckpoint(true) // re-read once per Lloyd round
    var cents = sampleCentroids(embeddings, c)
    for (_ <- 0 until iters) {
      val stats = sample
        .withColumn("bucket", nearestCentroid(col("vec"), cents))
        .select(col("bucket"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("bucket", "dim")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        val (b, d) = (r.getInt(0), r.getInt(1))
        next(b)(d) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  /** IVF-flat ANN: C centroids (deterministic hash-sample seeds, or
    * `fitIters` Lloyd rounds over a sample when > 0), every vector
    * assigned to its nearest centroid (broadcast argmin, map-only), a
    * query probes the nProbe nearest centroid buckets and re-ranks
    * exactly. The inverted-list shape that scales: candidate set ≈
    * nProbe/C of the corpus instead of all of it.
    */
  def ivfTopK(embeddings: DataFrame, query: Array[Double], k: Int,
              centroids: Int = 16, nProbe: Int = 4,
              fitIters: Int = 0): DataFrame = {
    val v = expr("transform(embedding, x -> cast(x as double))")
    val cents =
      if (fitIters > 0) fitCentroids(embeddings, centroids, fitIters)
      else sampleCentroids(embeddings, centroids)

    val assigned = embeddings.select(col("vec_id"), v.as("vec"))
      .withColumn("bucket", nearestCentroid(col("vec"), cents))

    // buckets the query probes: nProbe nearest centroids (driver-side,
    // centroids are a dimension)
    val qDist = cents.zipWithIndex.map { case (c, i) =>
      val d = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      (d, i)
    }.sortBy(_._1).take(nProbe).map(_._2)

    assigned.where(col("bucket").isin(qDist: _*))
      .select(col("vec_id"), round(cosine(col("vec"), lit(query)), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** All-pairs top-k neighbor edges (per-label groups): the batch ANN
    * used for embedding-space graph building.
    */
  def neighborGraph(embeddings: DataFrame, k: Int, exact: Boolean): DataFrame = {
    val feat = embeddings.select(col("vec_id").cast("string").as("id"),
      col("label").cast("long").as("group"),
      expr("transform(embedding, x -> cast(x as double))").as("vec"))
    if (exact) graft.canon.KnnJoin.exactTopK(feat, k)
    else graft.canon.KnnJoin.approxTopK(feat, k)
  }
}
