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

  /** Distinct word-n-grams as STRINGS (unlike [[Dedup.gramSets]]'s
    * engine-internal murmur3 ints): the Bloom positions md5 the gram
    * text itself, so the filter — and the oracle replay — is
    * engine-portable.
    */
  private def gramStrings(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"),
        array_distinct(expr(
          s"transform(sequence(0, greatest(size(words) - $n, 0)), " +
            s"i -> array_join(slice(words, i + 1, $n), ' '))")).as("grams"))

  /** Like [[contamination]], but the benchmark gram set is a Bloom
    * filter (`Sketches.bloomBits`, 8192 bits / 4 salted positions)
    * instead of the exact gram table: `bloom_hits ≥ n_contaminated`
    * always (no false negatives — a contaminated doc can never slip
    * through), overcounting only by the filter's false-positive rate.
    * The point at 100 TB: the broadcast is 8 KiB of bits regardless of
    * how many eval suites are unioned in, and membership is a k-row
    * explode against it — the probe never re-ships the gram strings.
    */
  def bloomContamination(docs: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val bits = broadcast(Sketches.bloomBits(
        gramStrings(benchmark, n).select(explode(col("grams")).as("g")).distinct(),
        col("g"))
      .withColumn("hit", lit(1)))
    val posed = gramStrings(docs, n)
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("g"))
      .select(col("doc_id"), col("n_grams"), col("g"),
        explode(array((0 until Sketches.BloomK).map(i =>
          Sketches.bloomPos(col("g"), i)): _*)).as("bit"))
    posed.join(bits, Seq("bit"), "left")
      .groupBy("doc_id", "n_grams", "g")
      .agg((sum(coalesce(col("hit"), lit(0))) === Sketches.BloomK)
        .cast("int").as("m"))
      .groupBy("doc_id", "n_grams").agg(sum("m").as("bloom_hits"))
  }
}
