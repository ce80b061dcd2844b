package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators the reference's telemetry/frame alignment
  * implies but Spark lacks as built-ins: the AS-OF join (each event
  * matched to the latest earlier event of another kind — the
  * telemetry-to-frame alignment shape of
  * `pipeline/video_input/inspection_video_input.py:118-138`, where each
  * consumed frame is paired with the most recent telemetry fix) and a
  * value-range rolling window (per-key aggregates over a trailing time
  * interval, the sliding-window analog of A12's sessionization).
  *
  * Both are expressed Spark-first as single-pass window plans: the
  * as-of join is NOT a join at all but a union + one keyed sort + a
  * running `last(ignoreNulls)` carry — one shuffle on the key, no
  * range-join explosion, no per-row probe; the rolling window is a
  * native RANGE frame over `unix_micros`. Each partitions by the
  * natural key (user), so both scale linearly in events per key and
  * AQE skew-split applies to hot keys.
  */
object Temporal {

  /** AS-OF join within one event stream: every `leftType` event gains
    * the most recent `rightType` event of the SAME user with
    * `right.ts <= left.ts` (ties at equal ts: the right event is
    * visible, and among equal-ts right events the largest event_id
    * wins — the deterministic total order (ts, side, event_id)).
    *
    * Plan: union-tag both sides, one window per user ordered by
    * (ts_us, side, event_id) with side = 0 for the right stream, then a
    * running `last(ignoreNulls)` carries the latest right event onto
    * every left row. One shuffle, no join — the standard distributed
    * as-of at any scale (a range join would rescan; a per-row probe
    * wouldn't distribute).
    *
    * Output: (event_id, user_id, ts_us, asof_event_id, gap_us,
    * asof_cents) — cents via the integer-cent contract, null asof
    * columns when no earlier right event exists.
    */
  def asofJoin(events: DataFrame, leftType: String = "click",
               rightType: String = "view"): DataFrame = {
    val tagged = events
      .where(col("event_type").isin(leftType, rightType))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        when(col("event_type") === leftType, lit(1)).otherwise(lit(0)).as("side"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy("user_id")
      .orderBy("ts_us", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightOnly = (c: String) => when(col("side") === 0, col(c))
    tagged
      .withColumn("asof_event_id", last(rightOnly("event_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts_us", last(rightOnly("ts_us"), ignoreNulls = true).over(w))
      .withColumn("asof_cents", last(rightOnly("cents"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_event_id"), (col("ts_us") - col("asof_ts_us")).as("gap_us"),
        col("asof_cents"))
  }

  /** Trailing time-range rolling aggregate: per user, per event, the
    * count and integer-cent sum of `value` over events in
    * [ts − windowUs, ts] — a native RANGE frame on `unix_micros`, so
    * equal-ts ties are frame-complete on every engine (value-based
    * frames don't depend on peer order). One shuffle on user_id.
    */
  def rollingRange(events: DataFrame, windowUs: Long = 600000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-windowUs, 0)
    events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("cents_window", sum("cents").over(w))
      .select("event_id", "user_id", "ts_us", "n_window", "cents_window")
  }

  /** Bucketized interval-overlap join: every (view, click) pair of the
    * SAME user whose `durUs`-long closed intervals [ts, ts + durUs]
    * overlap — the temporal-extent join Spark has no built-in for (a
    * raw `l.s <= r.e AND r.s <= l.e` join plans as a per-user nested
    * loop; at corpus scale that's quadratic in events per key).
    *
    * Plan: the standard distributed interval join — quantize time into
    * buckets of width `durUs` (each interval then spans ≤ 2 buckets),
    * explode both sides to their covered buckets, EQUI-join on
    * (user_id, bucket) and keep a pair only in the FIRST bucket the two
    * intervals share (`bucket = greatest(l_b0, r_b0)` — the bucket of
    * `greatest(l_start, r_start)`, which overlap guarantees lies in
    * both intervals' ranges), so no post-join distinct is needed. The
    * overlap test runs only on bucket-colocated candidates: linear in
    * events per (user, window), never all-pairs, and the equi-join
    * shuffles/broadcasts like any other join (AQE skew-split applies).
    *
    * Output: (l_event_id, r_event_id, user_id, overlap_us) with
    * overlap_us = least(ends) − greatest(starts) ≥ 0 (0 = touching).
    */
  def intervalJoin(events: DataFrame, durUs: Long = 21600000000L): DataFrame = {
    def side(t: String, p: String) = events
      .where(col("event_type") === t)
      .select(col("event_id").as(s"${p}_event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as(s"${p}_start"))
      .withColumn(s"${p}_end", col(s"${p}_start") + durUs)
      .withColumn(s"${p}_b0", expr(s"${p}_start div ${durUs}L"))
      .withColumn("bucket",
        explode(sequence(col(s"${p}_b0"), expr(s"${p}_end div ${durUs}L"))))
    val l = side("view", "l")
    val r = side("click", "r")
    l.join(r, Seq("user_id", "bucket"))
      .where(col("l_start") <= col("r_end") && col("r_start") <= col("l_end") &&
        col("bucket") === greatest(col("l_b0"), col("r_b0")))
      .select(col("l_event_id"), col("r_event_id"), col("user_id"),
        (least(col("l_end"), col("r_end")) -
          greatest(col("l_start"), col("r_start"))).as("overlap_us"))
  }

  /** Strict three-step conversion funnel (view → click → purchase):
    * per user, how many views see a click within `windowUs`, and how
    * many of those see a purchase within `windowUs` of THAT click (the
    * first-touch attribution rule: each view attributes to its FIRST
    * following click, each click to its first following purchase —
    * no back-tracking, so the count is a strict funnel, monotone
    * n_views ≥ n_clicked ≥ n_converted).
    *
    * Plan: two chained forward-looking `first(ignoreNulls)` windows
    * over the same (ts_us, step, event_id) total order — same
    * partitioning and sort, so Catalyst plans ONE shuffle + one sort
    * for both passes. Equal-ts rows resolve by step order (view before
    * click before purchase), making same-instant chains visible and
    * the whole computation engine-replayable.
    */
  def funnelCounts(events: DataFrame, windowUs: Long = 1800000000L): DataFrame = {
    val step = when(col("event_type") === "view", 0)
      .when(col("event_type") === "click", 1).otherwise(2)
    val tagged = events
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), step.as("step"))
    val fwd = Window.partitionBy("user_id")
      .orderBy("ts_us", "step", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // both first_value's CASE is non-null exactly on click rows, so
    // c_ts and c_pts come from the SAME first click
    tagged
      .withColumn("p_ts",
        first(when(col("step") === 2, col("ts_us")), ignoreNulls = true).over(fwd))
      .withColumn("c_ts",
        first(when(col("step") === 1, col("ts_us")), ignoreNulls = true).over(fwd))
      .withColumn("c_pts",
        first(when(col("step") === 1, col("p_ts")), ignoreNulls = true).over(fwd))
      .where(col("step") === 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_views"),
        sum(when(col("c_ts") - col("ts_us") <= windowUs, 1L).otherwise(0L))
          .as("n_clicked"),
        sum(when(col("c_ts") - col("ts_us") <= windowUs &&
            col("c_pts") - col("c_ts") <= windowUs, 1L).otherwise(0L))
          .as("n_converted"))
  }

  /** Slowly-changing-dimension type-2 history: fold a change stream
    * (each purchase event sets the user's current value) into validity
    * intervals — (user_id, cents, valid_from_us, valid_to_us,
    * is_current), with runs of the UNCHANGED value collapsed (true SCD2
    * records changes, not touches) and half-open interval chaining
    * rendered inclusive as `valid_to_us = next_from - 1`; the open
    * current row keeps a NULL valid_to. This is the batch twin of the
    * triple ledger's AS-OF snapshot ([[graft.materialize.Upsert]]):
    * the ledger answers "the graph at time T", this materializes every
    * entity's full validity timeline as a table.
    *
    * Plan shape: two window passes over the SAME (user_id → ts, id)
    * partitioning and order — one `lag` to drop no-change touches, one
    * `lead` to chain intervals — so Catalyst plans a single shuffle +
    * sort; per-user work is linear and AQE skew-split applies to hot
    * users. Integer-cent values and epoch-micro bounds keep every
    * column on the cross-engine determinism contract.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val base = events.where(col("event_type") === "purchase")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id"),
        expr("cast(floor(value * 100.0D + 0.5D) as bigint)").as("cents"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base.withColumn("prev", lag("cents", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("cents"))
      .withColumn("valid_to_us", lead("ts_us", 1).over(w) - 1L)
      .select(col("user_id"), col("cents"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.cast("int").as("is_current"))
  }
}
