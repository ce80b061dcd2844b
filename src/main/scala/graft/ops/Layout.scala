package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout operators — the table-design half of running at
  * 100 TB that no query plan can compensate for: multi-column locality
  * clustering (Z-order / Morton curve) with min-max file-skipping
  * statistics, and bucketed co-located joins (the zero-shuffle join a
  * bucketed table layout buys at any scale).
  *
  * The reference stores its graph in a single Neo4j instance and never
  * faces layout; these operators are the Spark-first answer to the same
  * workload grown 1000×: DEPICTS/telemetry scans keyed by two
  * dimensions at once (ship × time — `data_manager.py`'s
  * inspection+date filters) want Z-order clustering, and the repeated
  * frame⋈telemetry / triple⋈ontology equi-joins want bucketed layouts
  * so the shuffle is paid once at write time, not per query.
  *
  * Everything is integer arithmetic on quantized coordinates — the
  * cross-engine determinism recipe — so the DuckDB oracle replays the
  * curve, the file assignment, the per-file stats and the pruning
  * verdicts bit-for-bit.
  */
object Layout {

  /** Bits per dimension of the Morton curve (6 → a 64×64 grid, 4096
    * z-values); 2^FileShift consecutive z-values form one "file"
    * (4096/16 = 256 files), mirroring how a lakehouse OPTIMIZE ZORDER
    * rewrites row groups in curve order.
    */
  val ZBits = 6
  val FileShift = 4

  /** Interleave the low `ZBits` bits of two quantized coordinates into
    * the Morton z-value: bit i of qx lands at 2i, bit i of qy at 2i+1.
    * Sum of disjoint powers of two == bitwise OR, and every term is a
    * codegen'd shift/mask — no UDF.
    */
  def zValue(qx: Column, qy: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The fitted quantization frame: min and span (max - min + 1) per
    * dimension, from ONE bounded aggregate over the table (the
    * one-row-fit precedent of pcaDet/ivf centroids). Quantized
    * coordinate = (v - min) * 2^ZBits div span ∈ [0, 2^ZBits).
    */
  private case class Frame(minU: Long, spanU: Long, minT: Long, spanT: Long,
                           minE: Long, spanE: Long)

  private def base(events: DataFrame): DataFrame = events.select(
    col("event_id").cast("long").as("event_id"),
    col("user_id").cast("long").as("user_id"),
    unix_micros(col("ts").cast("timestamp")).as("ts_us"))

  private def fit(b: DataFrame): Frame = {
    val r = b.agg(
      min("user_id"), max("user_id"), min("ts_us"), max("ts_us"),
      min("event_id"), max("event_id")).head
    Frame(r.getLong(0), r.getLong(1) - r.getLong(0) + 1,
      r.getLong(2), r.getLong(3) - r.getLong(2) + 1,
      r.getLong(4), r.getLong(5) - r.getLong(4) + 1)
  }

  /** The benchmark pruning predicate, derived from the fitted frame in
    * exact integer percent arithmetic so both engines reproduce the
    * same constants: users in the [40%, 50%] span slice, timestamps in
    * the [30%, 45%] span slice.
    */
  private def bounds(f: Frame): (Long, Long, Long, Long) = (
    f.minU + f.spanU * 40L / 100L, f.minU + f.spanU * 50L / 100L,
    f.minT + f.spanT * 30L / 100L, f.minT + f.spanT * 45L / 100L)

  private def withZFile(b: DataFrame, f: Frame): DataFrame = {
    val n = 1L << ZBits
    val qx = expr(s"((user_id - ${f.minU}) * $n) div ${f.spanU}")
    val qy = expr(s"((ts_us - ${f.minT}) * $n) div ${f.spanT}")
    b.withColumn("file_id", shiftright(zValue(qx, qy), FileShift))
  }

  private def fileStats(rows: DataFrame, f: Frame): DataFrame = {
    val (uLo, uHi, tLo, tHi) = bounds(f)
    rows.groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min("user_id").as("min_u"), max("user_id").as("max_u"),
        min("ts_us").as("min_t"), max("ts_us").as("max_t"))
      .withColumn("survives",
        (!(col("max_u") < uLo || col("min_u") > uHi ||
          col("max_t") < tLo || col("min_t") > tHi)).cast("int"))
  }

  /** Per-file min-max statistics of the Z-ordered layout plus the
    * pruning verdict for the benchmark predicate — the data-skipping
    * index a lakehouse table format keeps per file, materialized as a
    * queryable table. Scale shape: one map (quantize + interleave, all
    * codegen'd shifts) + one partial-agg groupBy on the file id; the
    * stats table has one row per FILE, never per row.
    */
  def zorderStats(events: DataFrame): DataFrame = {
    val b = base(events)
    val f = fit(b)
    fileStats(withZFile(b, f), f)
  }

  /** The pruning-effectiveness comparison: the same min-max
    * file-skipping applied to the Z-ordered layout vs a naive
    * insertion-order (event_id range) layout with the same file count.
    * Z-order keeps both dimensions local, so a two-dimensional
    * predicate skips most files; insertion order is time-correlated
    * only, so every file straddles the user dimension and almost
    * nothing is skipped — THE reason to cluster at 100 TB, stated as
    * one hash-checked table: (layout, files_total, files_scanned,
    * rows_total, rows_scanned).
    */
  def zorderPrune(events: DataFrame): DataFrame = {
    val b = base(events)
    val f = fit(b)
    def summarize(rows: DataFrame, label: String): DataFrame =
      fileStats(rows, f).agg(
        count(lit(1)).as("files_total"),
        sum("survives").cast("long").as("files_scanned"),
        sum("n").as("rows_total"),
        sum(when(col("survives") === 1, col("n")).otherwise(0L))
          .as("rows_scanned"))
        .select(lit(label).as("layout"), col("files_total"),
          col("files_scanned"), col("rows_total"), col("rows_scanned"))
    val nFiles = 1L << (2 * ZBits - FileShift)
    val linear = b.withColumn("file_id",
      expr(s"((event_id - ${f.minE}) * $nFiles) div ${f.spanE}"))
    summarize(withZFile(b, f), "zorder")
      .unionByName(summarize(linear, "linear"))
  }

  /** Pruning-safety audit: (rows matching the benchmark predicate,
    * matching rows that live in SURVIVING files). Min-max skipping is
    * safe iff the two are equal — a skipped file may never hide a
    * matching row. LayoutSpec asserts it.
    */
  def pruneAudit(events: DataFrame): (Long, Long) = {
    val b = base(events)
    val f = fit(b)
    val (uLo, uHi, tLo, tHi) = bounds(f)
    val rows = withZFile(b, f)
    val verdicts = fileStats(rows, f).select("file_id", "survives")
    val matches = rows.where(col("user_id").between(uLo, uHi) &&
      col("ts_us").between(tLo, tHi))
      .join(verdicts, Seq("file_id"))
      .select(col("survives")).persist()
    val out = (matches.count(), matches.where(col("survives") === 1).count())
    matches.unpersist()
    out
  }

  /** Bucketed co-located join: write both sides bucketed (and sorted)
    * on the join key, then join the bucketed reads — the physical
    * layout pays the shuffle once at write time and every subsequent
    * join on that key runs with ZERO exchange on either side (and zero
    * sort, since the buckets are written sorted). At 100 TB this is the
    * difference between a join that moves the fact table every query
    * and one that never moves it; LayoutSpec asserts the no-exchange,
    * no-sort plan property.
    *
    * Output: per-market-segment order rollup in integer cents —
    * value-identical to the plain join the DuckDB oracle runs, so the
    * hash match proves the bucketed layout is semantics-neutral.
    */
  def bucketedRollup(spark: SparkSession, orders: DataFrame,
                     customer: DataFrame, tag: String,
                     buckets: Int = 8): DataFrame = {
    val dir = s"/tmp/graft_bucketed/$tag"
    def writeBucketed(df: DataFrame, table: String, key: String): DataFrame = {
      val name = s"graft_${table}_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // repartition on the key into exactly `buckets` tasks: Spark's
      // bucket id uses the same Murmur3 hash as hash partitioning, so
      // each task holds one whole bucket and writes ONE file per
      // bucket — the single-file-per-bucket layout the reader needs to
      // trust the sortBy metadata (multi-file buckets are re-sorted).
      df.repartition(buckets, col(key)).write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$dir/$table")
        .format("parquet").saveAsTable(name)
      spark.table(name)
    }
    val o = writeBucketed(
      orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders", "o_custkey")
    val c = writeBucketed(
      customer.select("c_custkey", "c_mktsegment"), "customer", "c_custkey")
    // merge hint: the point is the co-located sort-merge join (a
    // broadcast would hide the bucketing); with both sides bucketed and
    // sorted on the key the planner inserts no Exchange and no Sort.
    o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("c_mktsegment")
  }
}
