package graft

import graft.ops.{Decontaminate, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Benchmark decontamination + PII scrubbing semantics. */
class ScrubSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("contamination flags docs sharing n-grams with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta trailing words here"), // contains bench grams
      (2L, "totally unrelated content with no overlap at all present"),
      (3L, "alpha beta gamma delta epsilon zeta")                      // identical
    ).toDF("doc_id", "text")
    val c = Decontaminate.contamination(docs, bench, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(c(3L) === ((4, 4L))) // 6 words → 4 trigrams, all contaminated
    assert(c(1L)._2 === 4L)     // the 4 bench trigrams appear, later grams don't
    assert(c(2L)._2 === 0L)
    val clean = Decontaminate.decontaminated(docs, bench, threshold = 0.5, n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(2L))
  }

  test("piiScrub redacts emails and phones with exact counts") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org or call 555-867-5309 ok"),
      (2L, "no pii here at all"),
      (3L, "a@b.co and c_d%e@f-g.info twice")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L)._1 === "mail me at <EMAIL> or call <PHONE> ok")
    assert(out(1L)._2 === 1 && out(1L)._3 === 1)
    assert(out(2L) === (("no pii here at all", 0, 0)))
    assert(out(3L)._1 === "<EMAIL> and <EMAIL> twice")
    assert(out(3L)._2 === 2)
  }

  test("phone-shaped substring inside an email is not double-counted") {
    val docs = Seq((1L, "reach 555-123-4567@example.com now")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs).collect()(0)
    assert(r.getString(1) === "reach <EMAIL> now")
    assert(r.getInt(2) === 1) // one email
    assert(r.getInt(3) === 0) // the phone count runs on the email-scrubbed text
  }
}
