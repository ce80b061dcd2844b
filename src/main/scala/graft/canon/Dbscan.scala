package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Density clustering re-expressed Spark-first (reference A25:
  * sklearn DBSCAN(eps, min_samples=5) per inspection,
  * similarity_pipeline.py:139-150):
  *
  *   ε-neighbor join → core-point filter (≥ minPts neighbors incl.
  *   self) → connected components over core-core edges → border
  *   points attach to their minimum-id core neighbor's cluster.
  *
  * Same cluster semantics as DBSCAN for deterministic fixtures; noise
  * (non-core, no core neighbor) gets cluster number −1 exactly like
  * the reference (filtered by its queries, data_manager.py:137,254).
  */
object Dbscan {

  /** points: (id long, group string/long, vec array<double>).
    * Returns (id, group, cluster long) where cluster is a dense number
    * per group ordered by min member id; noise = −1.
    */
  def cluster(points: DataFrame, eps: Double, minPts: Int)(
      implicit spark: SparkSession): DataFrame = {
    val a = points.select(col("id").as("src"), col("group"), col("vec").as("va"))
    val b = points.select(col("id").as("dst"), col("group"), col("vec").as("vb"))
    // ε-ball neighbor edges within group (exact; swap in KnnJoin.approxTopK
    // bucketing for web-scale inputs)
    val nbrs = a.join(b, Seq("group"))
      .where(col("src") =!= col("dst") &&
        KnnJoin.sqDist(col("va"), col("vb")) <= lit(eps * eps))
      .select("group", "src", "dst")
      .localCheckpoint(eager = true)

    val degrees = nbrs.groupBy("src").agg(count("*").as("deg"))
    // core: |N_eps(p)| >= minPts counting the point itself
    val core = degrees.where(col("deg") >= minPts - 1).select(col("src").as("id"))

    val coreEdges = nbrs
      .join(core.withColumnRenamed("id", "src"), Seq("src"))
      .join(core.withColumnRenamed("id", "dst"), Seq("dst"))
      .select("src", "dst")
    val comps = ConnectedComponents.run(coreEdges) // (id, component)

    // isolated core points (no core neighbor) are their own cluster
    val coreClusters = core
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))

    // border points: non-core with ≥1 core neighbor → min core neighbor's comp
    val borderClusters = nbrs
      .join(coreClusters.withColumnRenamed("id", "dst")
        .withColumnRenamed("component", "dstComp"), Seq("dst"))
      .join(coreClusters.withColumnRenamed("id", "src2"),
        col("src") === col("src2"), "left_anti") // src not core
      .groupBy(col("src").as("id"))
      .agg(min(col("dstComp")).as("component"))

    val assigned = coreClusters.unionByName(borderClusters)

    // dense per-group cluster numbers, deterministic by component id
    val withGroup = points.select("id", "group")
      .join(assigned, Seq("id"), "left")
    val wNum = Window.partitionBy("group").orderBy("component")
    val numbered = withGroup.where(col("component").isNotNull)
      .withColumn("cluster", dense_rank().over(wNum) - 1)
      .select("id", "group", "cluster")
    withGroup.where(col("component").isNull)
      .select(col("id"), col("group"), lit(-1L).as("cluster"))
      .unionByName(numbered.withColumn("cluster", col("cluster").cast("long")))
  }
}
