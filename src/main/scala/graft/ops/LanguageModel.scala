package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality scoring: fit an add-one-smoothed
  * word-bigram model on a deterministic content-keyed training slice of
  * the corpus, then score EVERY document by its quantized cross-entropy
  * under that model. High bits-per-bigram = the document looks unlike
  * the in-domain slice — the same signal CCNet's KenLM perplexity
  * buckets use to tier web text (head/middle/tail), here as a bigram
  * analog the sandbox can fit without external model files.
  *
  * Cross-engine determinism: NO transcendental ever reaches a value or
  * a comparison. The per-bigram surprisal is the integer
  * floor(log2((ctx + V) / (c + 1))) computed exactly as
  * `length(bin(q)) - 1` over the INTEGER quotient q — `bin` is
  * unpadded in both Spark and DuckDB and floor(log2(floor(x))) =
  * floor(log2(x)) for x >= 1, so the value is bit-identical on both
  * engines (a float log2 would not be: Spark computes log(x)/log(2),
  * which can land a hair under an exact power of two). Per-doc sums
  * are order-free int64 sums; the bits-per-bigram mean is int64 `div`.
  *
  * Scale shape: one explode to the bigram occurrence stream (~token
  * count of the corpus), two partial-agg groupBys onto vocabulary-
  * bounded model tables, sort-merge joins keyed on the gram / the
  * context word, and a per-doc partial-agg reduce. The only driver
  * value is V (one scalar). At 100 TB the gram key would be a 64-bit
  * digest and the model pruned by a minimum count (both change only
  * constants in this plan); the string key is kept here for bit-exact
  * oracle parity, like [[Repetition.segmentDedup]].
  */
object LanguageModel {

  /** Overlapping word bigrams as strings; empty below two words (no
    * truncated pseudo-gram — a unigram tail would skew the model).
    */
  private def bigramArray: Column =
    expr("case when size(words) >= 2 then " +
      "transform(sequence(1, size(words) - 1), " +
      "i -> concat(element_at(words, i), ' ', element_at(words, i + 1))) " +
      "else cast(array() as array<string>) end")

  /** Per-document LM score: one row per doc with >= 1 bigram —
    * (doc_id, is_train, n_bigrams, oov_bigrams, total_bits, bpb_milli).
    * `is_train` (0/1) tags the md5-content-bucket training slice
    * (the same [[CurationPipeline.hashBucket]] recipe the dataset
    * split and the portable dedup twins use), `oov_bigrams` counts
    * bigrams unseen in training, `total_bits` the summed integer
    * surprisal and `bpb_milli` its truncating per-bigram mean ×1000.
    */
  def perplexityScore(docs: DataFrame, trainPermille: Int = 500): DataFrame = {
    val base = docs.select(col("doc_id"),
        (CurationPipeline.hashBucket(col("text"), 1000L) < trainPermille)
          .cast("int").as("is_train"),
        split(col("text"), " ").as("words"))
    // the occurrence stream feeds the two model tables AND the scoring
    // join: LAZY localCheckpoint so the explode runs once (materialized
    // by the first action, not an up-front job) and every consumer's
    // analyzer walk starts from a truncated plan. The eager variant +
    // a separate vocab scan over `base` cost two extra corpus passes
    // cold (13.2 s vs 0.8 s warm in the round-4 driver bench).
    val occ = base.select(col("doc_id"), col("is_train"),
        explode(bigramArray).as("g"))
      .localCheckpoint(false)
    val train = occ.where(col("is_train") === 1)
    val counts = train.groupBy("g").agg(count(lit(1)).as("c"))
    val ctx = train
      .groupBy(split(col("g"), " ").getItem(0).as("w1"))
      .agg(count(lit(1)).as("cc"))
    // V = distinct words PARTICIPATING IN TRAIN BIGRAMS — derived from
    // the already-checkpointed occurrence stream (this count is the
    // action that materializes it), not a second scan of the corpus.
    // Every word of a >=2-word doc sits in some bigram, so this differs
    // from "all train words" only by words exclusive to 1-word docs —
    // and a bigram model's smoothing constant should count the bigram
    // vocabulary anyway. The oracle CTE computes the same V.
    val vocab: Long = train
      .select(explode(split(col("g"), " ")).as("w")).distinct().count()
    occ
      .join(counts, Seq("g"), "left")
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .join(ctx, Seq("w1"), "left")
      .select(col("doc_id"), col("is_train"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("cc"), lit(0L)).as("cc"))
      .withColumn("bits",
        (length(bin(expr(s"(cc + ${vocab}L) div (c + 1L)"))) - 1).cast("long"))
      .groupBy("doc_id", "is_train")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c") === 0, 1L).otherwise(0L)).as("oov_bigrams"),
        sum("bits").as("total_bits"))
      .withColumn("bpb_milli", expr("(1000L * total_bits) div n_bigrams"))
  }

  /** CCNet's head/middle/tail buckets, PER SOURCE: within each source,
    * rank documents by (bpb_milli asc, doc_id) and tag the lowest
    * `headPermille` fraction "head", the next `middlePermille`
    * "middle", the rest "tail". The tier boundary is the integer
    * comparison 1000·rank <= permille·count — no float ever decides a
    * tier, so the bucketing replays exactly on any engine. Documents
    * with no bigram are unscorable and drop out (inner join).
    *
    * Scale shape: the scoring plan of [[perplexityScore]] plus one
    * window partitioned BY SOURCE — shuffles on the source key only;
    * a skewed mega-source makes this window its partition's sort,
    * which is the same cost profile as the reference engines' per-
    * domain bucketing (and AQE skew-split applies to the exchange).
    */
  def perplexityTiers(docs: DataFrame, headPermille: Int = 100,
                      middlePermille: Int = 400,
                      trainPermille: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = perplexityScore(docs, trainPermille)
      .select(col("doc_id"), col("bpb_milli"))
    val bySource = Window.partitionBy("source")
    docs.select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        bySource.orderBy(col("bpb_milli"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(bySource))
      .select(col("doc_id"), col("source"), col("bpb_milli"),
        when(expr(s"1000L * rk <= ${headPermille}L * cnt"), "head")
          .when(expr(s"1000L * rk <= ${headPermille + middlePermille}L * cnt"),
            "middle")
          .otherwise("tail").as("tier"))
  }

  /** Keep documents scoring at most `maxBpbMilli` quantized bits per
    * bigram — the CCNet head/middle cut as a semi-join against the
    * scored keep set (docs without a bigram are dropped: unscorable).
    */
  def perplexityFilter(docs: DataFrame, maxBpbMilli: Long,
                       trainPermille: Int = 500): DataFrame =
    docs.join(
      perplexityScore(docs, trainPermille)
        .where(col("bpb_milli") <= maxBpbMilli).select("doc_id"),
      Seq("doc_id"), "left_semi")
}
