package graft

import graft.core.Ontology
import graft.corpus.CorpusGen
import graft.link.ShipCatalog
import graft.pipeline.KgPipeline
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden-triple parity (SURVEY.md §5 / FIXTURES.md §4):
  * a single-threaded oracle implements the reference's decision rules
  * *independently* (token-equality counting vs the engine's compiled
  * substring scanner) and the full triple set must match exactly
  * (P = R = 1.0 ≥ the 0.95 BASELINE.json bar).
  */
class GoldenTripleSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  val cfg = CorpusGen.Config(rows = 2000, nRepos = 3, partitions = 7)

  /** Reference decision rules, single-threaded (image_node.py:33-45,
    * frame.py:37-43,65-73; structural edges per SURVEY §1.1).
    */
  def goldenTriples(cfg: CorpusGen.Config): Set[(String, String, String)] = {
    val rows = CorpusGen.localRows(cfg)
    val out = scala.collection.mutable.Set[(String, String, String)]()
    val ships = rows.map(_.repo).distinct.map(r => r -> ShipCatalog.shipFor(r)).toMap

    // structural: HAS tree + HAS_INSPECTION per ship
    ships.values.foreach { s =>
      Ontology.entries.foreach { e =>
        val subj =
          if (e.parentVisCode == null) s"ship_${s.ship_id}"
          else s"c_${s.imo}_${e.parentVisCode}"
        out += ((subj, "HAS", s"c_${s.imo}_${e.visCode}"))
      }
      out += ((s"ship_${s.ship_id}", "HAS_INSPECTION", s"i_${s.inspection_id}"))
    }

    rows.foreach { r =>
      val ship = ships(r.repo)
      val frameNo = r.path.dropWhile(!_.isDigit).takeWhile(_.isDigit).toLong
      val frameId = s"${ship.inspection_id}.$frameNo"
      out += ((s"i_${ship.inspection_id}", "HAS_FRAME", frameId))
      val tokens = r.content.split(" ")
      Ontology.linkDict.foreach { case (label, vis) =>
        val count = tokens.count(_ == label) // independent counting method
        val cls = math.min(count / 8.0, 1.0)
        val cov = count.toDouble * label.length / r.content.length
        val score = (if (cls > 0.5) 1 else 0) + (if (cov > 0.01) 1 else 0)
        if (score > 0) out += ((frameId, "DEPICTS", s"c_${ship.imo}_$vis"))
      }
    }
    out.toSet
  }

  test("engine triples == golden oracle triples (P=R=1.0)") {
    val result = KgPipeline.run(CorpusGen.corpus(spark, cfg))
    val got = result.triples.select("subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = goldenTriples(cfg)
    val missing = want -- got
    val extra = got -- want
    assert(missing.isEmpty, s"missing ${missing.size}, e.g. ${missing.take(3)}")
    assert(extra.isEmpty, s"extra ${extra.size}, e.g. ${extra.take(3)}")
  }

  test("triple set is invariant to input partitioning (local scaling precondition)") {
    val a = KgPipeline.run(CorpusGen.corpus(spark, cfg.copy(partitions = 2)))
      .triples.select("subj", "pred", "obj").collect().map(_.toSeq).toSet
    val b = KgPipeline.run(CorpusGen.corpus(spark, cfg.copy(partitions = 16)))
      .triples.select("subj", "pred", "obj").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("DEPICTS edges carry the raw channel scores as properties") {
    val result = KgPipeline.run(CorpusGen.corpus(spark, cfg.copy(rows = 300)))
    val depicts = result.triples.where("pred = 'DEPICTS'")
    assert(depicts.where("classification IS NULL OR segmentation IS NULL").count() === 0)
    // classification is count/8 capped at 1 ⇒ within (0, 1]
    assert(depicts.where("classification <= 0 OR classification > 1").count() === 0)
  }

  test("skewed corpus (hot labels on every row) still reaches P=R=1.0") {
    val skewCfg = cfg.copy(rows = 1500, hotLabelProb = 1.0, coldLabelProb = 0.6)
    val got = KgPipeline.run(CorpusGen.corpus(spark, skewCfg))
      .triples.select("subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === goldenTriples(skewCfg))
  }

  test("assertInvariant passes on clean digests and fails on tampered content") {
    import org.apache.spark.sql.functions._
    val corpus = CorpusGen.corpus(spark, cfg.copy(rows = 50)).toDF()
    val withExpected = KgPipeline.withInvariant(corpus)
      .withColumnRenamed("content_sha256", "expected_sha256")
    KgPipeline.assertInvariant(withExpected) // must not throw
    val tampered = withExpected.withColumn("content", concat(col("content"), lit("x")))
    intercept[IllegalArgumentException] {
      KgPipeline.assertInvariant(tampered)
    }
  }

  test("per-row sha256 invariant holds on the corpus") {
    val corpus = CorpusGen.corpus(spark, cfg.copy(rows = 500)).toDF()
    val withSha = KgPipeline.withInvariant(corpus)
    // independent digest via mapPartitions + java MessageDigest
    import spark.implicits._
    val bad = withSha.select("content", "content_sha256").as[(String, String)]
      .filter { case (c, h) =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hex = md.digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString
        hex != h
      }.count()
    assert(bad === 0)
  }
}
