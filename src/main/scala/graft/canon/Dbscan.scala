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
      implicit spark: SparkSession): DataFrame =
    clusterFromNeighbors(points, exactNeighbors(points, eps), minPts)

  /** Web-scale variant: grid-DBSCAN. Points land in ε-sized grid cells
    * (map-only); a cell with ≥ minPts points is core; core cells that
    * are face-adjacent merge via connected components over the *cell*
    * graph — orders of magnitude smaller than the point graph, so the
    * iterative CC converges on a contracted problem. Density semantics
    * are the standard grid approximation of DBSCAN (cell diagonal ≤ ε
    * merge guarantee in each axis direction).
    */
  def clusterApprox(points: DataFrame, eps: Double, minPts: Int,
                    maxDegree: Int = 16)(implicit spark: SparkSession): DataFrame = {
    // project early (guide §2.3): the vectors are consumed entirely by
    // the cell expression — dropping them here keeps them out of the
    // persisted rows and every downstream exchange (the final
    // cell→cluster join used to shuffle the full vec payload)
    val pts = points.select(col("id"), col("group"),
        concat_ws(",", col("group"),
          expr("array_join(transform(vec, v -> cast(floor(v / " + eps + ") as string)), '_')"))
          .as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val cellCounts = pts.groupBy("group", "cell").agg(count(lit(1)).as("cnt"))
    val coreCells = cellCounts.where(col("cnt") >= minPts)
      .select("group", "cell")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // face-adjacent neighbor cells (±1 along each axis)
    val dims = points.select(size(col("vec"))).first().getInt(0)
    val offsets = (0 until dims).flatMap(d => Seq((d, 1), (d, -1)))
    val withCoords = coreCells.withColumn("coords",
      split(element_at(split(col("cell"), ","), 2), "_").cast("array<long>"))
    val nbrCells = withCoords.select(col("group"), col("cell"),
      explode(array(offsets.map { case (d, off) =>
        concat_ws(",", col("group"),
          array_join(transform(col("coords"), (v, i) =>
            when(i === d, v + off).otherwise(v).cast("string")), "_"))
      }: _*)).as("nbr"))
    val cellEdges = nbrCells
      .join(coreCells.select(col("cell").as("nbr")), Seq("nbr"), "left_semi")
      .select(col("cell").as("srcS"), col("nbr").as("dstS"))

    // CC over the contracted cell graph (string ids, min-lexicographic rep)
    val comps = ConnectedComponents.runString(cellEdges)
    val cellComp = coreCells
      .join(comps, coreCells("cell") === comps("sid"), "left")
      .select(col("group"), col("cell"),
        coalesce(col("component_s"), col("cell")).as("component"))

    val w = Window.partitionBy("group").orderBy("component")
    val numbered = cellComp
      .select(col("group"), col("cell"), col("component")).distinct()
      .withColumn("cluster", (dense_rank().over(w) - 1).cast("long"))

    // cell→cluster attach: with AQE off (scaling legs) the static
    // planner has no size estimate for `numbered` and picks a
    // sort-merge join — a full sort+shuffle of the point table to
    // attach a small cell map. Decide from the measured core-cell
    // count (coreCells is persisted; the count is an O(cells) agg):
    // broadcast when the cell map is provably small, keep the shuffle
    // join above the cap so a billion-cell corpus can't OOM the driver.
    val cellMap = numbered.select("cell", "cluster")
    val smallCellMap = coreCells.count() <= 2000000L
    val assigned = pts.join(
      if (smallCellMap) broadcast(cellMap) else cellMap, Seq("cell"), "left")
    assigned.select(col("id"), col("group"),
      coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }

  /** Exact in-group ε-ball join (fixture scale). */
  private def exactNeighbors(points: DataFrame, eps: Double): DataFrame = {
    val a = points.select(col("id").as("src"), col("group"), col("vec").as("va"))
    val b = points.select(col("id").as("dst"), col("group"), col("vec").as("vb"))
    a.join(b, Seq("group"))
      .where(col("src") =!= col("dst") &&
        KnnJoin.sqDist(col("va"), col("vb")) <= lit(eps * eps))
      .select("group", "src", "dst")
  }

  private def clusterFromNeighbors(points: DataFrame, neighborEdges: DataFrame,
                                   minPts: Int)(implicit spark: SparkSession): DataFrame = {
    val nbrs = neighborEdges.localCheckpoint(eager = true)

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
