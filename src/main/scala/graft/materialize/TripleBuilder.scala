package graft.materialize

import graft.core.Ontology
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 4 — structural triple emission (reference A19) and the
  * `nodes` table (SURVEY.md §1.1 node/relationship inventory).
  *
  * All structural edges are map-side projections or broadcast
  * cross-joins against the 25-row ontology — no shuffles besides the
  * final partitioned write.
  */
object TripleBuilder {

  /** Null-prop padding so every emitter matches the `triples` schema. */
  def tripleCols(subj: org.apache.spark.sql.Column, pred: String,
                 obj: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    subj.as("subj"), lit(pred).as("pred"), obj.as("obj"),
    lit(null).cast("double").as("classification"),
    lit(null).cast("double").as("segmentation"),
    lit(null).cast("double").as("distance"),
    lit(null).cast("array<double>").as("homography")
  )

  def ontologyDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Ontology.entries.toDF("visCode", "name", "parentVisCode")
  }

  def shipNodeId(c: org.apache.spark.sql.Column) = concat(lit("ship_"), c)
  def inspNodeId(c: org.apache.spark.sql.Column) = concat(lit("i_"), c)
  def classNodeId(imo: org.apache.spark.sql.Column, vis: org.apache.spark.sql.Column) =
    concat(lit("c_"), imo, lit("_"), vis)

  /** HAS tree: Ship → top-level component, component → sub-component,
    * 25 edges per ship (data/access/ship.py:21-155).
    */
  def hasOntology(shipsDim: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val onto = broadcast(ontologyDf(spark))
    shipsDim.crossJoin(onto).select(
      tripleCols(
        when(col("parentVisCode").isNull, shipNodeId(col("ship_id")))
          .otherwise(classNodeId(col("imo"), col("parentVisCode"))),
        "HAS",
        classNodeId(col("imo"), col("visCode"))
      ): _*
    )
  }

  /** Ship → Inspection (data/access/inspection.py:24,28). */
  def hasInspection(shipsDim: DataFrame): DataFrame =
    shipsDim.select(tripleCols(
      shipNodeId(col("ship_id")), "HAS_INSPECTION", inspNodeId(col("inspection_id"))): _*)

  /** Inspection → Frame (data/access/frame.py:62-63). */
  def hasFrame(frames: DataFrame): DataFrame =
    frames.select(tripleCols(
      inspNodeId(col("inspection_id")), "HAS_FRAME", col("frame_id")): _*)

  /** The `nodes` table: fixed identity columns + long-tail props map. */
  def nodes(shipsDim: DataFrame, frames: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    val ships = shipsDim.select(
      shipNodeId(col("ship_id")).as("id"), lit("Ship").as("label"),
      map(
        lit("imo"), col("imo"),
        lit("name"), col("ship_name"),
        lit("type"), lit("vessel")
      ).as("props"))
    val inspections = shipsDim.select(
      inspNodeId(col("inspection_id")).as("id"), lit("Inspection").as("label"),
      map(lit("imo"), col("imo"), lit("date"), col("inspection_date"),
        lit("ship_heading"), col("ship_heading").cast("string")).as("props"))
    val classifications = shipsDim.crossJoin(broadcast(ontologyDf(spark))).select(
      classNodeId(col("imo"), col("visCode")).as("id"),
      lit("Classification").as("label"),
      map(lit("name"), col("name"), lit("visCode"), col("visCode")).as("props"))
    val frameNodes = frames.select(
      col("frame_id").as("id"), lit("Frame").as("label"),
      map(
        lit("imo"), col("imo"),
        lit("framenumber"), col("framenumber").cast("string"),
        lit("inspection_id"), col("inspection_id").cast("string")
      ).as("props"))
    ships.unionByName(inspections).unionByName(classifications).unionByName(frameNodes)
  }
}
