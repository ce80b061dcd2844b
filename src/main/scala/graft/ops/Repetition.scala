package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Repetition / boilerplate signals for training-data curation over
  * `documents(doc_id, text, ...)` — the Gopher-style intra-document
  * repetition filters and the CCNet-style corpus-level segment dedup.
  *
  * Everything here is exact and engine-portable (plain word/segment
  * strings, integer counts, one rounded division per ratio), so the
  * driver's DuckDB gate value-checks both operators end to end. At
  * 100 TB the segment key would be a 128-bit digest of the segment
  * rather than the string itself (same plan shape, smaller shuffle);
  * the string key is kept here for bit-exact oracle parity.
  */
object Repetition {

  private def words(text: Column): Column = split(text, " ")

  /** Overlapping word-n-grams as strings; `slice` truncates at the end
    * of the array exactly like the oracle's list slicing, and the
    * `greatest(..., 0)` lower bound keeps `sequence` ascending on
    * short documents (same contract as [[Dedup.gramSets]]).
    */
  private def gramArray(ws: Column, n: Int): Column =
    expr(s"transform(sequence(0, greatest(size(words) - $n, 0)), " +
      s"i -> array_join(slice(words, i + 1, $n), ' '))")

  /** Gopher-style repetition stats, one row per document:
    *
    *   - `n_words`        total word occurrences
    *   - `dup_word_frac`  (n_words − distinct words) / n_words
    *   - `top_2gram`      the most frequent word-2-gram (ties broken by
    *                      the lexicographically greatest gram, so the
    *                      argmax is deterministic on both engines)
    *   - `top2gram_frac`  characters covered by that 2-gram's
    *                      occurrences / document characters
    *   - `dup_5gram_frac` 5-gram occurrences whose gram appears ≥ 2
    *                      times / total 5-gram occurrences
    *
    * Scale shape: two explode → partial-agg count paths keyed on
    * (doc_id, gram) — map-side combine collapses within-document
    * repeats before the shuffle, and the per-doc reduce is a bounded
    * max/sum. No corpus-sized state anywhere.
    */
  def repetitionStats(docs: DataFrame): DataFrame =
    repetitionStatsRaw(docs).select(col("doc_id"), col("n_words"),
      round(col("dup_word_frac"), 6).as("dup_word_frac"),
      col("top_2gram"),
      round(col("top2gram_frac"), 6).as("top2gram_frac"),
      round(col("dup_5gram_frac"), 6).as("dup_5gram_frac"))

  /** Unrounded twin of [[repetitionStats]] — OracleMarginSpec audits
    * these raw ratios against the cross-engine round-6 boundary.
    */
  private[graft] def repetitionStatsRaw(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), length(col("text")).as("n_chars"),
      words(col("text")).as("words"))
    val wordStats = base.select(col("doc_id"), col("n_chars"),
      size(col("words")).as("n_words"),
      size(array_distinct(col("words"))).as("n_distinct"))

    val g2 = base.select(col("doc_id"), col("n_chars"),
        explode(gramArray(col("words"), 2)).as("g"))
      .groupBy("doc_id", "n_chars", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "n_chars")
      .agg(max(struct(col("cnt"), col("g"))).as("top"))
      .select(col("doc_id"), col("top.g").as("top_2gram"),
        (col("top.cnt") * length(col("top.g")) / col("n_chars"))
          .as("top2gram_frac"))

    val g5 = base.select(col("doc_id"), explode(gramArray(col("words"), 5)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup_occ"),
        sum(col("cnt")).as("tot_occ"))
      .select(col("doc_id"), (col("dup_occ") / col("tot_occ"))
        .as("dup_5gram_frac"))

    wordStats
      .select(col("doc_id"), col("n_words"),
        ((col("n_words") - col("n_distinct")).cast("double") / col("n_words"))
          .as("dup_word_frac"))
      .join(g2.drop("n_chars"), Seq("doc_id"))
      .join(g5, Seq("doc_id"))
  }

  /** CCNet-style corpus-level segment dedup: documents are cut into
    * consecutive `segWords`-word segments and a segment occurrence is a
    * DUPLICATE iff an identical segment appeared earlier in the corpus
    * (ordered by (doc_id, position) — first occurrence is the keeper).
    * Returns one row per document: segment count, duplicate count, and
    * the duplicate fraction.
    *
    * Scale shape: posexplode (map-only) → one shuffle partitioned by
    * the segment key for the first-occurrence rank → per-doc partial
    * agg. Exactly the plan a 100 TB paragraph-dedup job runs, with the
    * segment digest as the shuffle key; hot boilerplate segments skew
    * that key, which AQE's skew-join/agg split absorbs (the per-key
    * state is a single running rank, never a buffered group).
    */
  def segmentDedup(docs: DataFrame, segWords: Int = 10): DataFrame = {
    val segs = docs
      .select(col("doc_id"), words(col("text")).as("words"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(words) / ${segWords}.0D) as int) - 1), " +
          s"i -> array_join(slice(words, i * $segWords + 1, $segWords), ' '))")))
      .toDF("doc_id", "pos", "seg")
    val ranked = segs.withColumn("occ",
      row_number().over(Window.partitionBy("seg").orderBy("doc_id", "pos")))
    ranked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dup_segments"))
      .select(col("doc_id"), col("n_segments"), col("n_dup_segments"),
        round(col("n_dup_segments") / col("n_segments"), 6).as("dup_frac"))
  }

  /** Unrounded dup_frac twin for the OracleMarginSpec boundary audit. */
  private[graft] def segmentDedupRaw(docs: DataFrame, segWords: Int = 10): DataFrame =
    segmentDedup(docs, segWords).select(col("doc_id"),
      (col("n_dup_segments") / col("n_segments")).as("dup_frac"))
}
