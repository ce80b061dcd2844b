package graft

import graft.corpus.CorpusGen
import graft.materialize.Upsert
import graft.pipeline.KgPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingestion == full rebuild, end to end.
  *
  * Every similarity/cluster stage is inspection-scoped (kNN, DBSCAN,
  * mosaics all group by inspection), so upserting a new repo's pipeline
  * output onto an existing graph must equal rebuilding from the union
  * corpus — the property that makes the reference's per-inspection
  * add/retract flow (datastore.py:51-58) sound, and what lets a 100 TB
  * deployment ingest inspections incrementally instead of recomputing
  * the world.
  */
class IncrementalSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  private val keys = Seq("subj", "pred", "obj")
  private def tset(df: DataFrame): Set[(String, String, String)] =
    df.select("subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private lazy val corpus =
    CorpusGen.corpus(spark, CorpusGen.Config(6000, 4, partitions = 8)).persist()
  private lazy val full = KgPipeline.runFull(corpus).triples.persist()
  private lazy val repos = corpus.select("repo").distinct().orderBy("repo")
    .collect().map(_.getString(0)).toSeq

  test("upserting a new repo batch's output == full rebuild (exact set equality)") {
    val (ra, rb) = repos.splitAt(repos.length / 2)
    val tA = KgPipeline.runFull(corpus.filter(col("repo").isin(ra: _*))).triples
    val tB = KgPipeline.runFull(corpus.filter(col("repo").isin(rb: _*))).triples
    val merged = Upsert.upsert(tA, tB, keys)
    assert(tset(merged) === tset(full))
  }

  test("retract + re-add one repo's inspections restores the graph exactly") {
    val tR = KgPipeline.runFull(corpus.filter(col("repo") === repos.head)).triples
      .persist()
    val insIds = tR.where(col("pred") === "HAS_INSPECTION")
      .select("obj").collect().map(_.getString(0).stripPrefix("i_").toLong).toSeq
    assert(insIds.nonEmpty)
    val retracted = Upsert.retractInspections(full, insIds)
    val fullSet = tset(full)
    val retractedSet = tset(retracted)
    assert(retractedSet.subsetOf(fullSet) && retractedSet.size < fullSet.size)
    assert(tset(Upsert.upsert(retracted, tR, keys)) === fullSet)
  }
}
