package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resample + linear interpolation onto a uniform frame
  * grid (reference A3/A4, ass_telemetry_reader.py:7-83):
  *
  *  - raw samples arrive at irregular timestamps, possibly duplicated
  *    (the reference dedups the index, :64);
  *  - heading is unwrapped before interpolation and re-wrapped mod 360
  *    (:79-81) so 359° → 1° interpolates through 360, not through 180;
  *  - output: one row per frame index 0..frameCount-1 (:82).
  *
  * Spark-first: the uniform grid is `sequence` + explode; interpolation
  * is a window join — for each grid point, the last sample at-or-before
  * (`last(ignoreNulls)` over unbounded preceding) and the next sample
  * after, then the linear blend. One shuffle per inspection partition.
  */
object TelemetryInterpolation {

  /** Circular unwrap: cumulative correction of ±360 jumps (numpy.unwrap
    * analog in degrees) over an ordered window.
    */
  def unwrapped(df: DataFrame, valueCol: String, w: org.apache.spark.sql.expressions.WindowSpec): org.apache.spark.sql.Column = {
    val diff = col(valueCol) - lag(valueCol, 1).over(w)
    val step = when(diff > 180.0, -360.0).when(diff < -180.0, 360.0).otherwise(0.0)
    col(valueCol) + coalesce(
      sum(step).over(w.rowsBetween(Window.unboundedPreceding, 0)), lit(0.0))
  }

  /** samples: (inspection_id, ts double seconds, channel string, value double).
    * Returns (inspection_id, frame_index, channel, value) on a uniform
    * grid of `frameCount` points spanning [min(ts), max(ts)] per
    * (inspection, channel), linearly interpolated, heading unwrapped.
    */
  def interpolate(samples: DataFrame, frameCount: Int,
                  headingChannel: String = "Heading")(
      implicit spark: SparkSession): DataFrame = {
    val wDedup = Window.partitionBy("inspection_id", "channel", "ts").orderBy("value")
    val wOrd = Window.partitionBy("inspection_id", "channel").orderBy("ts")

    // dedup identical timestamps (keep first like pandas groupby-first)
    val dedup = samples
      .withColumn("rn", row_number().over(wDedup)).where(col("rn") === 1).drop("rn")

    // unwrap heading in the sample domain
    val unwrappedDf = dedup.withColumn("v",
      when(col("channel") === headingChannel, unwrapped(dedup, "value", wOrd))
        .otherwise(col("value")))

    val bounds = unwrappedDf.groupBy("inspection_id", "channel")
      .agg(min("ts").as("t0"), max("ts").as("t1"))

    // uniform grid per (inspection, channel)
    val grid = bounds.select(col("inspection_id"), col("channel"), col("t0"), col("t1"),
        explode(sequence(lit(0), lit(frameCount - 1))).as("frame_index"))
      .withColumn("gts",
        col("t0") + col("frame_index") * (col("t1") - col("t0")) / math.max(frameCount - 1, 1))

    // union grid points (value null) with samples, then window-fill
    val unioned = unwrappedDf
      .select(col("inspection_id"), col("channel"), col("ts"), col("v"),
        lit(null).cast("int").as("frame_index"))
      .unionByName(grid.select(col("inspection_id"), col("channel"),
        col("gts").as("ts"), lit(null).cast("double").as("v"),
        col("frame_index")))

    val wAll = Window.partitionBy("inspection_id", "channel")
      .orderBy(col("ts"), col("frame_index").asc_nulls_first)
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = wAll.rowsBetween(0, Window.unboundedFollowing)

    val filled = unioned
      .withColumn("pv", last("v", ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(when(col("v").isNotNull, col("ts")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first("v", ignoreNulls = true).over(wNext))
      .withColumn("nt", first(when(col("v").isNotNull, col("ts")), ignoreNulls = true).over(wNext))
      .where(col("frame_index").isNotNull)
      .withColumn("interp",
        when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .when(col("nt") === col("pt"), col("pv"))
          .otherwise(col("pv") +
            (col("nv") - col("pv")) * (col("ts") - col("pt")) / (col("nt") - col("pt"))))

    filled.select(col("inspection_id"), col("frame_index"), col("channel"),
      // re-wrap heading into [0, 360)
      when(col("channel") === headingChannel, pmod(col("interp"), lit(360.0)))
        .otherwise(col("interp")).as("value"))
  }

  /** A3 analog: parse raw telemetry event lines
    * `t=<seconds> <channel>=<value>` (the .ass dialogue payload shape)
    * into typed samples — regexp projection, no UDFs.
    */
  def parseEvents(lines: DataFrame, inspectionId: Long): DataFrame =
    lines
      // validate shape first — ANSI mode makes cast('' as double) an error
      .where(col("value").rlike("^t=[0-9.]+ \\w+=-?[0-9.]+$"))
      .select(
        lit(inspectionId).as("inspection_id"),
        regexp_extract(col("value"), "t=([0-9.]+)", 1).cast("double").as("ts"),
        regexp_extract(col("value"), "t=[0-9.]+ (\\w+)=", 1).as("channel"),
        regexp_extract(col("value"), "=(\\-?[0-9.]+)$", 1).cast("double").as("value"))
}
