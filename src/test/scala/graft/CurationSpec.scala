package graft

import graft.ops.CurationPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the fast scan merge data " * 8, "en", "s0", 0L),
    (2L, "the fast scan merge data " * 8, "en", "s0", 0L), // exact dup of 1
    (3L, "join batch window sort filter " * 10, "de", "s1", 0L),
    (4L, "x", "en", "s1", 0L) // degenerate, low quality
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("curation drops exact dups and low-quality rows, keeps languages") {
    val out = CurationPipeline.run(docs,
      CurationPipeline.Config(minQuality = 0.05, keepLangs = Seq("en", "de")))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!(kept.contains(1L) && kept.contains(2L))) // one of the dups gone
    assert(kept.contains(3L))
    assert(!kept.contains(4L)) // quality-gated
  }

  test("portable curation twin: near-dup loser dropped, distinct rows kept") {
    val base = "the fast scan merge data join batch window sort filter " * 6
    val pd = Seq(
      (10L, base + "alpha ending", "en", "s0", 0L),
      (11L, base + "omega ending", "en", "s0", 0L), // near-dup of 10
      (12L, "completely different text body about nothing shared at all " * 6,
        "en", "s0", 0L),
      (13L, base + "alpha ending", "en", "s0", 0L) // exact dup of 10
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = CurationPipeline.runPortable(pd,
        CurationPipeline.Config(minQuality = 0.0), minMatch = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(10L)) // exact + near-dup keeper (min id)
    assert(!kept.contains(13L)) // exact dup dropped at stage 1
    assert(!kept.contains(11L)) // near-dup dropped at stage 2
    assert(kept.contains(12L)) // distinct survivor
  }

  test("token budget sampling is deterministic and approximately bounded") {
    val many = spark.range(0, 500).selectExpr(
      "id AS doc_id",
      "concat('doc ', id, ' ', repeat('tok ', cast(id % 50 + 10 as int))) AS text",
      "'en' AS lang", "'s' AS source", "0L AS n_chars")
    val cfg = CurationPipeline.Config(minQuality = 0.0, tokenBudget = 2000L)
    val a = CurationPipeline.run(many, cfg).agg(sum("tokens")).collect()(0).getLong(0)
    val b = CurationPipeline.run(many, cfg).agg(sum("tokens")).collect()(0).getLong(0)
    assert(a === b) // deterministic
    assert(a < 2000L * 2) // within sampling error of the budget
  }
}
