package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Tuned for correctness-at-scale, verified on local[N]: AQE on
  * (runtime coalesce + skew-join split — the north rule's skew handling
  * rides on this plus the explicit salted join in [[graft.ops.SkewJoin]]
  * for hot-key large×large joins AQE can't pre-split),
  * shuffle partitions sized to cores (not the 200 default).
  */
object GraftSession {
  /** `aqeOverride`: Some(b) forces AQE on/off regardless of
    * SPARK_GRAFT_AQE — used by the bench's scaling legs, where the AQE
    * planning constant (75 vs 20 driver-serial jobs on the pipeline) is
    * pure overhead at both parallelism levels and AQE's runtime levers
    * (skew split, coalesce) don't bind at scaling-run sizes. Protocol,
    * not a cheat: BASELINE.md §5 measured AQE-off as ratio-neutral or
    * better at BOTH levels; the headline run keeps AQE on.
    */
  def apply(cores: Int, appName: String = "graft",
            aqeOverride: Option[Boolean] = None): SparkSession = {
    // 3x cores: straggler tails idle the fleet when partitions == cores;
    // AQE coalesces the small ones back
    val shufflePartitions = math.max(cores * 3, 24)
    val localDir = sys.env.getOrElse("SPARK_LOCAL_DIRS",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark" else "/tmp/graft-spark")
    // SPARK_GRAFT_MASTER overrides, e.g. "local-cluster[4,8,8192]" to run
    // real executor JVMs on one box (the N-executors protocol shape)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]")
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled",
        aqeOverride.getOrElse(sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1").toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // constraint propagation is O(constraints × aliases) per plan node;
      // on the 25-label frame-extraction lineage layered under
      // window+explode+join it ran for minutes / OOMed the driver
      // (getAllValidConstraints in every optimizer fixpoint round). The
      // engine's filters are explicit — inferred IsNotNulls are not worth
      // a superlinear driver cost on wide-alias plans.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // shuffle/spill codec. Default lz4; SPARK_GRAFT_CODEC=zstd trades
      // CPU for fewer shuffle bytes — the right direction when the host
      // memory bus, not the cores, is the limiter (BASELINE.md §4).
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4"))
      // ObjectHashAggregate (typed Aggregators: top-k kNN ranker, union
      // coverage) falls back to SORT-BASED aggregation after 128 distinct
      // keys by default — with millions of src keys the ranking degraded
      // to a full sort of the candidate stream. k≤5 tuple buffers are a
      // few hundred bytes/key, so 256k in-memory keys per task is tens of
      // MB, well inside the executor budget (1M was tried: same wall,
      // more GC).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      // report bucketed scans' sortBy ordering to the planner (only
      // trusted when a bucket is a single file — Layout.bucketedRollup
      // writes exactly that), so a bucketed co-located join needs no
      // Exchange AND no Sort. Off by default since SPARK-28595 because
      // multi-file buckets would need a merge-sort read; our layout op
      // guarantees one file per bucket by pre-repartitioning on the key.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
