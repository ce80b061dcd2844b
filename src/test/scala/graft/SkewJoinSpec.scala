package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join semantics: exact equality with the plain equi-join on a
  * hot-key fixture, for every supported join type, plus the plan-level
  * evidence that the join key really carries the salt.
  */
class SkewJoinSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  // 90% of fact rows hit key 7 (the hot entity); keys 10..12 have no dim
  private lazy val fact = (0 until 2000).map { i =>
    (if (i % 10 == 0) ((i / 10) % 13).toLong else 7L) -> i.toLong
  }.toDF("okey", "row_id")
  private lazy val dim = (0 until 10).map(k => (k.toLong, s"attr_$k"))
    .toDF("okey", "attr")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("salted inner/left/semi/anti equal the plain join exactly") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = fact.join(dim, Seq("okey"), jt)
      val salted = SkewJoin.saltedJoin(fact, dim, "okey", 8, jt)
      assert(rows(salted) === rows(plain), s"join type $jt diverged")
      assert(salted.columns.toSeq === plain.columns.toSeq)
    }
  }

  test("the physical join key carries the salt; right/full are rejected") {
    val p = SkewJoin.saltedJoin(fact, dim, "okey", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), "salt must survive into the physical join")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "okey", 8, "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "okey", 0)
    }
  }
}
