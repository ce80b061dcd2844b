package graft

import graft.link.FuzzyLinker
import org.scalatest.funsuite.AnyFunSuite

class FuzzyLinkSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  val entities = Seq(
    ("102.2", "Anodes"), ("631.1", "Openings"), ("413", "Propeller Arrangement"),
    ("465", "Bilge Keels"), ("632.332", "Box Cooler")
  ).toDF("entity_id", "name")

  test("exact normalized hits use the broadcast path with score 1.0") {
    val mentions = Seq((1L, "anodes"), (2L, "BILGE  keels")).toDF("mention_id", "text")
    val got = FuzzyLinker.link(mentions, entities).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(got === Set((1L, "102.2", "exact"), (2L, "465", "exact")))
  }

  test("typo'd mentions resolve via MinHash-LSH blocking to the right entity") {
    val mentions = Seq(
      (10L, "propeler arangement"), // typos
      (11L, "box coolerr"),
      (12L, "zzzz qqqq") // garbage: no link
    ).toDF("mention_id", "text")
    val byId = FuzzyLinker.link(mentions, entities).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    assert(byId(10L)._1 === "413" && byId(10L)._2 === "minhash_lsh")
    assert(byId(11L)._1 === "632.332")
    assert(!byId.contains(12L))
  }
}
