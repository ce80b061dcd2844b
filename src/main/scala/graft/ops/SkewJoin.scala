package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit hot-key salting for LARGE × LARGE equi-joins — the north
  * rule's named skew lever alongside AQE's runtime skew-split.
  *
  * AQE splits a skewed SHUFFLE partition after materialization, which
  * caps wall-clock damage but still funnels every hot-key row through
  * one map output. Salting removes the hot spot from the plan itself:
  * the skewed side's key gains a deterministic salt in [0, F) (a hash
  * of the full row, so identical rows salt identically and the result
  * is reproducible run to run), the other side replicates each row F
  * times — once per salt value — and the join runs on (key, salt),
  * spreading a hot key over F partitions. Cost: F× the non-skewed
  * side's shuffle volume, which is why F stays small and the REPLICATED
  * side should be the smaller input (but too big to broadcast — for
  * broadcastable dims salting is pointless).
  *
  * Join semantics are EXACTLY the plain equi-join's for inner / left /
  * left_semi / left_anti (each big-side row carries one salt, each
  * small-side key covers every salt). right/full would duplicate
  * unmatched replicated rows and are rejected.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, replicated: DataFrame, key: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val fanned = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(fanned, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
