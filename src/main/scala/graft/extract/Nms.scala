package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy IoU non-max suppression (reference A7,
  * LIACi_detector.py:54-106: threshold prob > 0.15, IoU 0.45, top-20).
  * The reference never materializes detector output into the graph
  * (SURVEY §1.1 quirk), so this stage is optional for parity — kept as
  * a first-class per-row operator: candidates arrive as an array of
  * box structs, suppression runs inside the row (no shuffle).
  */
object Nms {

  final case class Box(x1: Double, y1: Double, x2: Double, y2: Double,
                       prob: Double, label: String)

  def iou(a: Box, b: Box): Double = {
    val ix = math.max(0.0, math.min(a.x2, b.x2) - math.max(a.x1, b.x1))
    val iy = math.max(0.0, math.min(a.y2, b.y2) - math.max(a.y1, b.y1))
    val inter = ix * iy
    val ua = (a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1) - inter
    if (ua <= 0) 0.0 else inter / ua
  }

  /** Greedy NMS: sort by prob desc, keep while IoU with all kept ≤ thr. */
  def suppress(boxes: Seq[Box], probThreshold: Double = 0.15,
               iouThreshold: Double = 0.45, topK: Int = 20): Seq[Box] = {
    val sorted = boxes.filter(_.prob > probThreshold)
      .sortBy(b => (-b.prob, b.x1, b.y1))
    val kept = scala.collection.mutable.ArrayBuffer[Box]()
    val it = sorted.iterator
    while (it.hasNext && kept.size < topK) {
      val c = it.next()
      if (!kept.exists(k => k.label == c.label && iou(k, c) > iouThreshold)) kept += c
    }
    kept.toSeq
  }

  /** Dataset operator: (id, candidates array<Box>) → (id, detections). */
  def apply(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col("id"), col("candidates")).as[(String, Seq[Box])]
      .map { case (id, boxes) => (id, suppress(boxes)) }
      .toDF("id", "detections")
  }
}
