package graft.materialize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent write primitives (reference A17/A20).
  *
  * The reference's find-before-create upserts (datastore.py:10-15,
  * frame.py:23-29, cluster.py:14-23) become dedup + anti-join — the
  * MERGE-INTO shape realized on plain partitioned tables; cascading
  * deletes (datastore.py:51-58, similarity_pipeline.py:32-40) become
  * predicate-scoped rewrites (partition drop when the predicate is the
  * partition key).
  */
object Upsert {

  /** MERGE-style upsert: keep all existing rows, add incoming rows whose
    * key is absent. Incoming dupes collapse to one row per key
    * (deterministic: first by sort on all columns).
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val deduped = incoming.dropDuplicates(keys)
    existing.unionByName(
      deduped.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti"))
  }

  /** `fail_on_exists` analog (ship.py:10-16): throws if any incoming key
    * already exists.
    */
  def insertNew(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val clash = incoming.join(existing, keys, "left_semi").limit(1).count()
    require(clash == 0, s"insertNew: key(s) already exist for $keys")
    existing.unionByName(incoming.dropDuplicates(keys))
  }

  /** Per-inspection cascading retract (datastore.py:54-58): drop all
    * triples whose subject or object belongs to the inspections' frames
    * or derived nodes. Returns the surviving triple set (a partition
    * rewrite in table terms).
    */
  def retractInspections(triples: DataFrame, inspectionIds: Seq[Long]): DataFrame = {
    val ids = inspectionIds.map(_.toString)
    val ownedBy = (c: org.apache.spark.sql.Column) =>
      ids.map(i => c === s"i_$i" || c.startsWith(s"$i.") ||
        c.startsWith(s"c$i.") || c.startsWith(s"m$i.")).reduce(_ || _)
    triples.where(!(ownedBy(col("subj")) || ownedBy(col("obj"))))
  }

  /** Similarity-only retract (similarity_pipeline.py:32-40): drop
    * similarity/cluster predicates for the given inspections, keep the
    * construction triples.
    */
  def retractSimilarity(triples: DataFrame, inspectionIds: Seq[Long]): DataFrame = {
    val simPreds = Seq("SIMILAR_TO", "VISUALLY_SIMILAR_TO", "IN_CLUSTER")
    val ids = inspectionIds.map(_.toString)
    val owned = (c: org.apache.spark.sql.Column) =>
      ids.map(i => c.startsWith(s"$i.") || c.startsWith(s"c$i.")).reduce(_ || _)
    triples.where(!(col("pred").isin(simPreds: _*) &&
      (owned(col("subj")) || owned(col("obj")))))
  }
}
