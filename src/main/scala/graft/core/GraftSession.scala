package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Tuned for correctness-at-scale, verified on local[N]: AQE on
  * (runtime coalesce + skew-join split — the north rule's skew handling
  * rides on this plus explicit salting in the canonicalize stage),
  * shuffle partitions sized to cores (not the 200 default).
  */
object GraftSession {
  def apply(cores: Int, appName: String = "graft"): SparkSession = {
    val shufflePartitions = math.max(cores, 8)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
