package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative connected components over a `Dataset[Edge]` — the
  * canonicalization primitive (reference A25's DBSCAN grouping and the
  * north rule's entity-canonicalization stage), with no GraphFrames
  * dependency.
  *
  * Hash-min label propagation: every vertex repeatedly adopts the
  * minimum component id in its closed neighborhood until fixpoint.
  * Deterministic (min is order-free), partition-count independent.
  * Lineage is truncated with `localCheckpoint` every iteration, and the
  * messages stage aggregates BEFORE the join-back (partial aggregation
  * = map-side combine), so hot vertices (star graphs from ubiquitous
  * entities) don't concentrate on one task.
  */
object ConnectedComponents {

  /** edges: (src: long, dst: long). Returns (id: long, component: long)
    * where component = min vertex id of the component.
    *
    * Below `collectThreshold` edges the computation collapses to one
    * collect + driver union-find (the [[runString]] fast path, added
    * for long ids in optimization round 6): min-root union produces
    * exactly the min-vertex-id representative the hash-min fixpoint
    * converges to, and it removes the ~4 barrier stages + checkpoint
    * per distributed iteration. Above the threshold the distributed
    * loop runs as before, so a billion-edge graph never lands on the
    * driver (≤ threshold longs ≈ 8 MB).
    */
  def run(edges: DataFrame, maxIter: Int = 25,
          collectThreshold: Long = 500000L)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val e0 = edges.select(col("src"), col("dst"))
    // the typed probe only applies to long vertex ids — runString's
    // distributed fallback re-enters here with string columns
    if (e0.schema("src").dataType != org.apache.spark.sql.types.LongType)
      return runDistributed(e0, maxIter)
    val probe = e0.limit((collectThreshold + 1).toInt).as[(Long, Long)].collect()
    if (probe.length <= collectThreshold) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      probe.foreach { case (a, b) =>
        if (a != b) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
      }
      // same vertex set as the distributed path: every endpoint of a
      // non-self edge (self-loop-only vertices are their own component
      // there too, via the symmetrized-distinct edge set — but those
      // rows are filtered before label init, so a vertex appearing
      // ONLY in self-loops is absent in both paths)
      val verts = probe.iterator.filter { case (a, b) => a != b }
        .flatMap { case (a, b) => Iterator(a, b) }.toSet
      verts.iterator.map(v => (v, find(v))).toSeq.toDF("id", "component")
    } else runDistributed(e0, maxIter)
  }

  private def runDistributed(edges: DataFrame, maxIter: Int)(
      implicit spark: SparkSession): DataFrame = {
    // undirected: symmetrize once
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = true)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(eager = true)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // 1) min component among neighbors, partial-aggregated map-side
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min(col("component")).as("nbrMin"))
      val stepped = labels.join(msgs, labels("id") === msgs("id2"), "left")
        .select(
          col("id"),
          least(col("component"), coalesce(col("nbrMin"), col("component"))).as("component"),
          (col("nbrMin").isNotNull && col("nbrMin") < col("component")).as("changed")
        )

      // 2) pointer jumping: component := component(component) — collapses
      // long chains in O(log diameter) rounds instead of O(diameter)
      val reps = stepped.select(col("id").as("rid"), col("component").as("rcomp"))
      val updated = stepped.join(reps, stepped("component") === reps("rid"), "left")
        .select(
          stepped("id"),
          least(stepped("component"), coalesce(col("rcomp"), stepped("component")))
            .as("component"),
          (stepped("changed") ||
            (col("rcomp").isNotNull && col("rcomp") < stepped("component"))).as("changed")
        )
        .localCheckpoint(eager = true)

      val nChanged = updated.where(col("changed")).count()
      labels = updated.drop("changed")
      converged = nChanged == 0
      iter += 1
    }
    labels
  }

  /** Same algorithm over string vertex ids (used for contracted graphs
    * like grid cells); representative = lexicographic min id.
    * edges: (srcS, dstS) → (sid, component_s).
    *
    * Contracted graphs are usually tiny relative to the input (cells,
    * not points), so below `collectThreshold` edges the component
    * computation collapses to one collect + driver union-find + one
    * small broadcastable result — removing ~4 barrier stages per
    * iteration of the distributed loop. Above the threshold the
    * distributed hash-min loop runs as usual.
    */
  def runString(edges: DataFrame, maxIter: Int = 25,
                collectThreshold: Long = 500000L)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("srcS").as("src"), col("dstS").as("dst"))
    // one execution decides AND fetches: the previous limit+count probe
    // re-ran the whole edge derivation a second time for the collect
    val probe = e.limit((collectThreshold + 1).toInt).as[(String, String)].collect()
    if (probe.length <= collectThreshold) {
      val local = probe
      val parent = scala.collection.mutable.Map[String, String]()
      def find(x: String): String = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      local.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      parent.keys.toSeq.map(k => (k, find(k))).toDF("sid", "component_s")
    } else {
      run(e, maxIter).select(col("id").as("sid"), col("component").as("component_s"))
    }
  }
}
