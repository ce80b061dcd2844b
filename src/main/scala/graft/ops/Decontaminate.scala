package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag documents whose
  * word-n-gram overlap with a benchmark/eval set exceeds a threshold —
  * the standard train-test contamination guard in LLM data pipelines.
  *
  * Scale shape: the benchmark gram set is tiny relative to a 100 TB
  * corpus (eval suites are megabytes), so it BROADCASTS; the corpus
  * side is a map-only gram explode + broadcast left join + one
  * groupBy(doc) — no corpus-sized shuffle beyond the per-doc count.
  */
object Decontaminate {

  /** Per-document contamination against `benchmark` (both tables need
    * (doc_id, text)): distinct n-grams, how many appear anywhere in the
    * benchmark set, and their ratio.
    */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val bench = broadcast(
      Dedup.gramSets(benchmark, n).select(explode(col("grams")).as("g")).distinct()
        .withColumn("hit", lit(1)))
    Dedup.gramSets(docs, n)
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("g"))
      .join(bench, Seq("g"), "left")
      .groupBy("doc_id", "n_grams")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
      .withColumn("ratio", col("n_contaminated") / col("n_grams"))
  }

  /** Corpus minus contaminated docs (ratio ≥ threshold). */
  def decontaminated(docs: DataFrame, benchmark: DataFrame, threshold: Double,
                     n: Int = 8): DataFrame =
    docs.join(
      contamination(docs, benchmark, n)
        .where(col("ratio") >= threshold).select("doc_id"),
      Seq("doc_id"), "left_anti")
}
