package graft

import graft.ops.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  lazy val query: Array[Double] = emb.where(col("vec_id") === 0)
    .select(expr("transform(embedding, x -> cast(x as double))"))
    .collect()(0).getSeq[Double](0).toArray
  lazy val rest = emb.where(col("vec_id") =!= 0)

  test("brute-force top-k is ordered by cosine desc and sized k") {
    val got = SimilaritySearch.bruteForceTopK(rest, query, 10).collect()
    assert(got.length === 10)
    val cos = got.map(_.getDouble(1))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("IVF top-k recall vs brute force is reasonable at nProbe=4/16") {
    val exact = SimilaritySearch.bruteForceTopK(rest, query, 20)
      .collect().map(_.getLong(0)).toSet
    val ivf = SimilaritySearch.ivfTopK(rest, query, 20, centroids = 16, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // synthetic embeddings are isotropic — no cluster structure for the
    // inverted lists to exploit, so the floor is ~nProbe/C (0.25); real
    // corpora cluster and IVF recall rises accordingly
    assert(recall >= 0.25, s"IVF recall $recall")
    // probing ALL buckets must equal brute force exactly
    val full = SimilaritySearch.ivfTopK(rest, query, 20, centroids = 16, nProbe = 16)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact)
  }
}
