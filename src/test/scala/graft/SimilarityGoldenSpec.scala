package graft

import graft.canon.SimilarityPipeline
import graft.corpus.CorpusGen
import graft.extract.MentionExtractor
import graft.pipeline.KgPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Phase-2 golden parity: the engine's exact SIMILAR_TO edges must
  * equal a single-threaded kNN oracle applying the reference's feature
  * definition (similarity_pipeline.py:87-93 — [Depth, sin, cos, tilt,
  * framenumber]) and the KDTree's k=5 INCLUDING the self-match, which
  * is then skipped (:176-192) — at most 4 edges per frame.
  */
class SimilarityGoldenSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  val cfg = CorpusGen.Config(rows = 400, nRepos = 2, partitions = 4)

  test("exact SIMILAR_TO edges == single-threaded kNN oracle") {
    val result = KgPipeline.run(CorpusGen.corpus(spark, cfg))
    val got = SimilarityPipeline.similarTriples(result.frames, graft.core.Ontology.allLabels,
        exact = true)
      .where(col("pred") === "SIMILAR_TO")
      .select("subj", "obj").collect().map(r => (r.getString(0), r.getString(1))).toSet

    // oracle: rebuild features single-threaded from the corpus spec
    val rows = CorpusGen.localRows(cfg)
    val byRepo = rows.groupBy(_.repo)
    val want = scala.collection.mutable.Set[(String, String)]()
    byRepo.foreach { case (repo, rs) =>
      val ship = graft.link.ShipCatalog.shipFor(repo)
      val pts = rs.map { r =>
        val fno = r.path.dropWhile(!_.isDigit).takeWhile(_.isDigit).toLong
        val tel = MentionExtractor.telemetry(repo, fno)
        val id = s"${ship.inspection_id}.$fno"
        (id, Array(tel(0), math.sin(tel(1) * math.Pi * 2 / 360),
          math.cos(tel(1) * math.Pi * 2 / 360), tel(4), fno.toDouble))
      }
      pts.foreach { case (id, v) =>
        // KDTree query over ALL points (self included): the self-match
        // occupies one of the 5 slots and is skipped afterwards
        val nbrs = pts
          .map { case (oid, ov) =>
            val d = math.sqrt(v.zip(ov).map { case (a, b) => (a - b) * (a - b) }.sum)
            (oid, d)
          }
          .sortBy { case (oid, d) => (d, oid) }
          .take(5)
          .filter(_._1 != id)
        nbrs.foreach { case (oid, _) => want += ((id, oid)) }
      }
    }
    assert(got === want.toSet)
  }
}
