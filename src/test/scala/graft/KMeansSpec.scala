package graft

import graft.ops.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("fit is partition-invariant (order-free integer sums)") {
    val a = KMeans.fit(emb, c = 4, iters = 2)
    val b = KMeans.fit(emb.repartition(13), c = 4, iters = 2)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("assign covers every vector exactly once, clusters in range") {
    val got = KMeans.assign(emb, c = 4, iters = 2).collect()
    assert(got.length === emb.count())
    assert(got.map(_.getLong(0)).distinct.length === got.length)
    assert(got.forall { r => val c = r.getLong(1); c >= 0 && c < 4 })
    assert(got.forall(_.getLong(2) >= 0L))
  }

  test("one Lloyd round strictly reduces (or holds) total inertia") {
    def inertia(iters: Int): Long = KMeans.assign(emb, c = 4, iters = iters)
      .agg(sum("dist_fixed")).head().getLong(0)
    // Lloyd is monotone in exact arithmetic; fixed-point floors can only
    // leave it equal-or-lower per round on this scale of values
    val i0 = inertia(0); val i1 = inertia(1); val i2 = inertia(2)
    assert(i1 <= i0 && i2 <= i1, s"inertia not monotone: $i0 -> $i1 -> $i2")
  }

  test("empty cluster keeps its previous centroid") {
    import spark.implicits._
    // 4 vectors, c = 4 ⇒ every row is a seed; rows 1 and 2 are
    // bit-identical, so the strict-< argmin tie-break sends both to the
    // lower-cid duplicate seed and the higher-cid one is GUARANTEED
    // empty — its centroid must survive verbatim into the fitted model
    val df = Seq(
      (1L, Seq(0.9f, 0.9f)), (2L, Seq(0.9f, 0.9f)),
      (3L, Seq(-0.9f, -0.9f)), (4L, Seq(-0.9f, -0.88f)))
      .toDF("vec_id", "embedding")
    val seeds = df
      .select(col("vec_id"), KMeans.encode.as("xq"),
        graft.ops.CurationPipeline.hashBucket(col("vec_id").cast("string")).as("h"))
      .orderBy("h", "vec_id").limit(4)
      .select("xq").collect().map(_.getSeq[Long](0).toSeq)
    val fitted = KMeans.fit(df, c = 4, iters = 3).map(_.toSeq)
    val assigned = KMeans.assign(df, c = 4, iters = 3)
      .select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(assigned.size < 4, "fixture failed to produce an empty cluster")
    val emptyCids = (0 until 4).filterNot(c => assigned.contains(c.toLong))
    emptyCids.foreach { c =>
      assert(fitted(c) === seeds(c), s"empty cluster $c drifted off its seed")
    }
  }
}
