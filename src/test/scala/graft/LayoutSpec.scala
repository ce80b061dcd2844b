package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** Physical-layout operators (ops/Layout.scala): the Morton curve's
  * bijectivity, min-max pruning safety and effectiveness, and the
  * bucketed co-located join's zero-exchange plan + result neutrality.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def events = spark.read.parquet(s"$sfDir/events.parquet")

  test("zValue is a bijection on the 64x64 grid") {
    val grid = spark.range(4096).select(
      expr("id % 64").as("qx"), expr("id div 64").as("qy"))
    val zs = grid.select(Layout.zValue(col("qx"), col("qy")).as("z"))
    assert(zs.distinct().count() === 4096L)
    val mm = zs.agg(min("z"), max("z")).head
    assert(mm.getLong(0) === 0L && mm.getLong(1) === 4095L)
  }

  test("min-max pruning never skips a file holding a matching row") {
    val (matching, inSurviving) = Layout.pruneAudit(events)
    assert(matching > 0L, "the benchmark predicate should match some rows")
    assert(matching === inSurviving,
      "every matching row must live in a file the stats keep")
  }

  test("z-order layout skips more files than insertion order") {
    val rows = Layout.zorderPrune(events).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("files_total"), r.getAs[Long]("files_scanned")))
      .toMap
    val (zTotal, zScanned) = rows("zorder")
    val (lTotal, lScanned) = rows("linear")
    assert(zTotal > 0 && lTotal > 0)
    // the whole point of clustering: the 2-D predicate prunes the
    // z-ordered layout harder than the time-correlated insertion order
    assert(zScanned.toDouble / zTotal < lScanned.toDouble / lTotal,
      s"zorder $zScanned/$zTotal should prune better than linear $lScanned/$lTotal")
  }

  test("bucketed join: no exchange/sort on the join keys, result neutral") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val out = Layout.bucketedRollup(spark, orders, cust, tag = "layoutspec")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), "the merge hint must hold")
    assert(!p.contains("hashpartitioning(o_custkey") &&
      !p.contains("hashpartitioning(c_custkey"),
      "bucketed sides must not be re-shuffled on the join key")
    assert(!p.contains("Sort [o_custkey") && !p.contains("Sort [c_custkey"),
      "single-file-per-bucket sortBy metadata must satisfy the SMJ ordering")
    val plain = orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("c_mktsegment")
    assert(out.collect().toSeq === plain.collect().toSeq)
  }
}
