package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit salting for skewed shuffle joins (north rule: hot entity
  * keys — the ubiquitous component classes — concentrate on single
  * reducers). AQE's skew-join split handles sort-merge cases at
  * runtime; this helper is the deterministic plan-time variant for
  * joins AQE can't split (e.g. under a required distribution).
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, S)
  * hashed from a high-cardinality column; the small side is exploded
  * ×S so every (key, salt) pair finds its match.
  */
object Salting {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltCol: String, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val b = big.withColumn("__salt", pmod(xxhash64(col(saltCol)), lit(salts)).cast("int"))
    // generator must be top-level (no cast wrapping)
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
