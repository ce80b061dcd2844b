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
    // the filter itself: ≤ 8192 set bits, folded to an 8 KiB '0'/'1'
    // literal the probe tests by pure substring arithmetic — the probe
    // side is ONE map pass + one per-doc partial agg, no join and no
    // per-gram shuffle at any corpus scale (a bounded driver collect,
    // same class as the centroid/vocab fits)
    val setBits = Sketches.bloomBits(
        gramStrings(benchmark, n).select(explode(col("grams")).as("g")).distinct(),
        col("g"))
      .collect().map(_.getLong(0).toInt)
    val bitStr = {
      val arr = Array.fill(Sketches.BloomM.toInt)('0')
      setBits.foreach(arr(_) = '1')
      new String(arr)
    }
    val tests = (0 until Sketches.BloomK).map(i =>
      s"substring('$bitStr', cast(p$i as int) + 1, 1) = '1'").mkString(" AND ")
    var g = gramStrings(docs, n)
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("g"))
    for (i <- 0 until Sketches.BloomK)
      g = g.withColumn(s"p$i", Sketches.bloomPos(col("g"), i))
    g.withColumn("m", expr(s"CASE WHEN $tests THEN 1 ELSE 0 END"))
      .groupBy("doc_id", "n_grams").agg(sum("m").as("bloom_hits"))
  }
}
