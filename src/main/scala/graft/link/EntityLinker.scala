package graft.link

import graft.core.Ontology
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 2 — entity linking (reference A16/A18).
  *
  * The reference resolves each of the 5 dictionary labels to the
  * per-ship Classification node via a variable-length path query
  * `(c {visCode}) <-[HAS*]- (s:Ship {imo})` (data/access/datastore.py:24-27)
  * and emits a DEPICTS edge per label with score > 0
  * (data/access/frame.py:65-73).
  *
  * Spark-first realization: unpivot the per-label score columns into a
  * long `mentions` relation (map-side explode, no shuffle), then a
  * **broadcast hash join** against the 5-row link dictionary — the
  * per-ship scoping folds into the `c_{imo}_{visCode}` node id, so no
  * path traversal is needed at query time.
  */
object EntityLinker {

  def linkDictDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Ontology.linkDict.toSeq.toDF("label", "visCode")
  }

  /** Long-format mentions: one row per (frame, label) with score > 0. */
  def mentions(frames: DataFrame, labels: Seq[String]): DataFrame = {
    val entries = labels.map { l =>
      struct(
        lit(l).as("label"),
        col(l).as("score"),
        col(s"${l}_classification").as("classification"),
        col(s"${l}_segmentation").as("segmentation")
      )
    }
    frames
      .select(col("frame_id"), col("imo"), col("inspection_id"),
        explode(array(entries: _*)).as("m"))
      .where(col("m.score") > 0)
      .select(col("frame_id"), col("imo"), col("inspection_id"),
        col("m.label").as("label"), col("m.score").as("score"),
        col("m.classification").as("classification"),
        col("m.segmentation").as("segmentation"))
  }

  /** DEPICTS triples: mentions ⋈ broadcast(dict) — emitted only for the
    * 5 dictionary labels, with the raw channel scores as edge properties
    * (frame.py:68-72).
    */
  def depicts(frames: DataFrame, labels: Seq[String])(
      implicit spark: SparkSession): DataFrame = {
    mentions(frames, labels)
      .join(broadcast(linkDictDf(spark)), Seq("label"))
      .select(
        col("frame_id").as("subj"),
        lit("DEPICTS").as("pred"),
        concat(lit("c_"), col("imo"), lit("_"), col("visCode")).as("obj"),
        col("classification"),
        col("segmentation"),
        lit(null).cast("double").as("distance"),
        lit(null).cast("array<double>").as("homography")
      )
  }
}
