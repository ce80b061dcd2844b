package graft

import graft.ops.SetJoin
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filtered exact set-similarity join: equality with brute
  * force (the lossless-filter claim), the ≥ τ boundary, and partition
  * invariance.
  */
class SetJoinSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force ground truth in plain Scala. */
  private def brute(docs: Seq[(Long, String)], tauMilli: Long): Set[(Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> t.split(" ", -1).toSet }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      jm = 1000L * inter / (sa.size + sb.size - inter)
      if jm >= tauMilli
    } yield (a, b, jm)).toSet
  }

  test("ppJoin == brute force on a corpus where the prefix filter actually prunes") {
    // 200-word vocab, 10-word docs, planted near-dup pairs
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 10).map(j => s"w${(i * 13 + j * 7) % 200}").distinct.mkString(" "))
    }
    val nearDups = base.take(6).map { case (id, t) =>
      (id + 100L, t.split(" ").dropRight(1).mkString(" ")) // 9 of 10 shared
    }
    val docs = (base ++ nearDups).toDF("doc_id", "text")
    val got = SetJoin.ppJoin(docs, tauMilli = 700L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    assert(got === brute(base ++ nearDups, 700L))
    assert(got.nonEmpty, "fixture should contain qualifying pairs")
  }

  test("a pair at exactly Jaccard = tau is kept") {
    // b ⊂ a with |b|=4, |a|=5 → J = 4/5 = 0.800 exactly
    val docs = Seq((1L, "p q r s t"), (2L, "p q r s"),
      (3L, "x y z")).toDF("doc_id", "text")
    val got = SetJoin.ppJoin(docs, tauMilli = 800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(got.toSeq === Seq((1L, 2L, 800L)))
  }

  test("ppJoin is partition-invariant") {
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until 8).map(j => s"t${(i * 5 + j * 3) % 60}").distinct.mkString(" "))
    }.toDF("doc_id", "text")
    val a = SetJoin.ppJoin(docs, 600L).orderBy("a", "b").collect().toSeq
    val b = SetJoin.ppJoin(docs.repartition(7), 600L).orderBy("a", "b").collect().toSeq
    assert(a === b)
  }
}
