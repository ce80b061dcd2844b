package graft

import graft.corpus.CorpusGen
import graft.materialize.Mosaics
import graft.pipeline.KgPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MosaicSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("union coverage aggregator: 1 - prod(1-cov), partial-agg safe") {
    val df = Seq(0.5, 0.5, 0.0).toDF("c").repartition(3)
    val got = df.agg(Mosaics.unionCoverage(col("c"))).collect()(0).getDouble(0)
    assert(math.abs(got - 0.75) < 1e-12)
  }

  test("sessionization: breaks on heading/depth jumps, contiguous ids") {
    val rows = Seq(
      // inspection 1: heading drifts slowly then jumps
      ("f1", 1L, 0L, 10.0, 5.0), ("f2", 1L, 1L, 20.0, 5.1), ("f3", 1L, 2L, 30.0, 5.2),
      ("f4", 1L, 3L, 120.0, 5.2), // heading jump > 45
      ("f5", 1L, 4L, 125.0, 9.0)  // depth jump > 2
    ).toDF("frame_id", "inspection_id", "framenumber", "Heading", "Depth")
    val s = Mosaics.withSessions(rows).select("frame_id", "session")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s("f1") === s("f2") && s("f2") === s("f3"))
    assert(s("f4") === s("f3") + 1)
    assert(s("f5") === s("f4") + 1)
  }

  test("sessionization handles heading wrap-around (359 -> 1 is no break)") {
    val rows = Seq(
      ("f1", 1L, 0L, 359.0, 5.0), ("f2", 1L, 1L, 1.0, 5.0)
    ).toDF("frame_id", "inspection_id", "framenumber", "Heading", "Depth")
    val s = Mosaics.withSessions(rows).select("session").as[Long].collect()
    assert(s.distinct.length === 1)
  }

  test("gate thresholds are parameters: reference 180-frame constant drops short sessions") {
    // inspection 1: 200 steady frames (one session), then a heading jump
    // opens a 3-frame session with no depth growth
    val rows = (0L until 200L).map(i => (s"1.$i", 1L, i, 10.0, 5.0)) ++
      Seq(("1.200", 1L, 200L, 200.0, 5.0), ("1.201", 1L, 201L, 200.0, 5.0),
        ("1.202", 1L, 202L, 200.0, 5.0))
    val frames = rows.toDF("frame_id", "inspection_id", "framenumber", "Heading", "Depth")
    val defaults = Mosaics.build(frames, labels = Nil)._2.count()
    val reference = Mosaics.build(frames, labels = Nil,
      minFrames = Mosaics.referenceMinFrames)._2.count()
    assert(defaults === 2)  // fixture-scale gate keeps both sessions
    assert(reference === 1) // 180-frame gate: 3-frame non-growing session dropped
  }

  test("mosaic nodes carry the reference image artifacts (pipeline.py:172-173)") {
    val rows = (0L until 5L).map(i => (s"1.$i", 1L, i, 10.0, 5.0))
    val nodes = Mosaics.build(rows.toDF(
      "frame_id", "inspection_id", "framenumber", "Heading", "Depth"), labels = Nil)._2
    val props = nodes.select("props").collect()(0).getMap[String, String](0)
    assert(props("image_file") === props("seg_image_file").replace("_seg", ""))
    assert(props("seg_image_file").endsWith("_seg.jpg"))
    assert(!props.contains("uciqe")) // reference Mosaic has no uciqe prop
  }

  test("full pipeline phase 2 emits mosaics, similarity and cluster triples") {
    val cfg = CorpusGen.Config(rows = 600, nRepos = 2, partitions = 4)
    val result = KgPipeline.runFull(CorpusGen.corpus(spark, cfg))
    val preds = result.triples.groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(preds.contains("IN_MOSAIC"))
    assert(preds.contains("SIMILAR_TO"))
    assert(preds.contains("VISUALLY_SIMILAR_TO"))
    // KDTree semantics: k=5 including the self-match, which is skipped
    // (similarity_pipeline.py:176-192) -> 4 edges per frame
    assert(preds("SIMILAR_TO") === 600L * 4)
    // every SIMILAR_TO edge stays within one inspection and has a distance
    val cross = result.triples.where(col("pred") === "SIMILAR_TO")
      .where(split(col("subj"), "\\.")(0) =!= split(col("obj"), "\\.")(0)).count()
    assert(cross === 0)
    assert(result.triples.where(col("pred") === "SIMILAR_TO" && col("distance").isNull)
      .count() === 0)
    // mosaic nodes carry coverage props
    val mosaicNodes = result.nodes.where(col("label") === "Mosaic")
    assert(mosaicNodes.count() > 0)
    assert(mosaicNodes.where(col("props")("marine_growth_percentage").isNull).count() === 0)
  }
}
