package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-mixing operators for assembling a training set: per-source
  * reweighting, token-budget shard packing, and a corpus-level rarity
  * (inverse-document-frequency) score. All three keep the cross-engine
  * determinism recipe — portable md5 buckets, order-free integer sums,
  * one rounded division at the end — so the driver's DuckDB gate
  * value-checks them end to end.
  */
object Mixing {

  /** Domain reweighting (DoReMi-style mixture adjustment): keep each
    * document with its source's target probability, decided by the
    * portable md5 bucket of the text — deterministic, reproducible
    * across engines and reruns, and independent of row order.
    *
    * Scale shape: the weights table is a handful of rows → broadcast
    * join + map-side filter; no shuffle of the corpus at any scale.
    */
  def sourceSample(docs: DataFrame, weights: Map[String, Double])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val m = 1000000L
    val w = weights.toSeq.toDF("source", "keep_frac")
      .select(col("source"), (col("keep_frac") * m).cast("long").as("keep_below"))
    docs.join(broadcast(w), Seq("source"))
      .where(CurationPipeline.hashBucket(col("text"), m) < col("keep_below"))
      .select("doc_id", "source", "lang")
  }

  /** Temperature-scaled source sampling at α = 1/2 — the multilingual-
    * mixing classic (mBERT/XLM-R exponentiated sampling): a source with
    * n documents gets mixture weight √n, so head sources are damped and
    * tail sources up-weighted relative to proportional sampling. The
    * per-source quota is the exact integer
    * `budget · floor(√n) div Σ floor(√n)`, and WHICH documents fill it
    * is the deterministic portable order (md5(text), doc_id) — lowest
    * hashes first — so the admitted set is reproducible across engines,
    * reruns and partitionings.
    *
    * floor(√n) is cross-engine safe: IEEE-754 sqrt is correctly
    * rounded, n is integer-exact in a double, and for n < 2^51 a
    * non-square n can never round ONTO an integer (the gap to the
    * nearest integer is ≥ 1/(2√n) ≫ ulp) — OracleMarginSpec audits the
    * fixture counts against an exact integer isqrt.
    *
    * Scale shape: the per-source count is a partial-agg rollup to a
    * handful of rows (collected driver-side — the bounded vocab-fit
    * class), quotas ride back as a broadcast map literal, and the rank
    * is ONE window partitioned by source (AQE skew-split applies to a
    * dominant source). No global ordering anywhere.
    */
  def temperatureSample(docs: DataFrame, budget: Long = 200L): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "temperatureSample: empty corpus")
    val w = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble)).toLong }
    val tot = w.map(_._2).sum
    require(tot > 0, "temperatureSample: all sources empty")
    val quota = w.map { case (s, ww) => s -> budget * ww / tot }
    val quotaMap = map(quota.flatMap { case (s, q) =>
      Seq(lit(s), lit(q)) }.toIndexedSeq: _*)
    val rk = Window.partitionBy("source")
      .orderBy(asc("hk"), asc("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long").as("hk"))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .where(col("rank") <= element_at(quotaMap, col("source")))
      .select(col("doc_id"), col("source"), col("rank"))
  }

  /** Data-constrained epoch mixing (the Muennighoff et al. regime):
    * like [[temperatureSample]] but the per-source quota MAY EXCEED the
    * source's size — the whole source then repeats for
    * `quota div n` full epochs and the `quota mod n` remainder tops up
    * in the same portable (md5(text), doc_id) order. Output is one row
    * per admitted document with its exact repetition count
    * (`n_copies`), i.e. the materialization plan a data-constrained
    * training run feeds the sampler; Σ n_copies per source = quota
    * exactly.
    *
    * Same determinism contract and scale shape as [[temperatureSample]]
    * (bounded per-source fit driver-side, broadcast quota maps, one
    * source-partitioned rank window); the epoch arithmetic is pure
    * int64.
    */
  def epochSample(docs: DataFrame, budget: Long = 900L): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(counts.nonEmpty, "epochSample: empty corpus")
    val w = counts.map { case (s, n) =>
      (s, n, math.floor(math.sqrt(n.toDouble)).toLong) }
    val tot = w.map(_._3).sum
    require(tot > 0, "epochSample: all sources empty")
    val full = w.map { case (s, n, ww) => s -> (budget * ww / tot) / n }
    val rem = w.map { case (s, n, ww) => s -> (budget * ww / tot) % n }
    def mapOf(kv: Seq[(String, Long)]) =
      map(kv.flatMap { case (s, q) => Seq(lit(s), lit(q)) }.toIndexedSeq: _*)
    val rk = Window.partitionBy("source").orderBy(asc("hk"), asc("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long").as("hk"))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .withColumn("n_copies",
        element_at(mapOf(full.toSeq), col("source")) +
          when(col("rank") <= element_at(mapOf(rem.toSeq), col("source")),
            lit(1L)).otherwise(lit(0L)))
      .where(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_copies"))
  }

  /** Token-budget shard packing: assign each document to a training
    * shard of ~`shardTokens` whitespace tokens, in deterministic
    * doc_id order (shard = the running token offset at the START of
    * the doc, integer-divided by the budget).
    *
    * The prefix sum is the classic two-phase distributed scan, NOT a
    * single-partition global window: docs are bucketed by
    * `doc_id div bucketWidth`, per-bucket token totals roll up first
    * (map-side partial agg), a window over the SMALL bucket table
    * turns them into bucket offsets, and the intra-bucket cumsum runs
    * partitioned by bucket. The only unpartitioned window touches one
    * row per bucket (corpus_rows / bucketWidth — at 10^12 docs and the
    * default width that is ~10^6 rows on one task, still trivial; widen
    * `bucketWidth` to shrink it further). All arithmetic is int64 —
    * exact far past the 2^53 double cliff a float cumsum would hit.
    */
  def shardPack(docs: DataFrame, shardTokens: Long, bucketWidth: Long = 1000000L): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"),
      expr(s"doc_id div $bucketWidth").as("bucket"))
    val offsets = toks.groupBy("bucket").agg(sum("tokens").as("btoks"))
      .withColumn("offset", coalesce(
        sum("btoks").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    val intra = Window.partitionBy("bucket").orderBy("doc_id")
    toks.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", sum("tokens").over(intra))
      // pack_offset: where in its shard the doc STARTS (greedy
      // concatenation with spillover — a doc near the boundary runs
      // into the next shard, the packing sequence trainers consume)
      .select(col("doc_id"), col("tokens"),
        expr(s"(offset + cum - tokens) div $shardTokens").as("shard_id"),
        expr(s"(offset + cum - tokens) % $shardTokens").as("pack_offset"))
  }

  /** Fixed-length training-sequence packing (concat-and-chunk): lay all
    * documents end to end in deterministic doc_id order and cut the
    * token stream into sequences of exactly `seqTokens` — emitting the
    * per-sequence SEGMENT MAP a trainer materializes for attention
    * masking: one row per (sequence, document segment) with the token
    * range of the document it covers and where in the sequence it
    * lands. This is the step after [[shardPack]]'s shard assignment:
    * shardPack says which shard a doc starts in; this says exactly
    * which tokens of which doc fill which training sequence (documents
    * crossing a boundary appear in every sequence they span — the
    * cross-doc attention a packed-pretraining mask must cut).
    *
    * Scale shape: the same two-phase distributed prefix sum as
    * [[shardPack]] (bucketed partial totals, one tiny bucket-offset
    * window, intra-bucket cumsum), then a PURE MAP explode bounded by
    * each doc's span count (~tokens/seqTokens + 1). All int64. Empty
    * documents carry no tokens and drop out.
    *
    * Output: (seq_id, doc_id, doc_from, doc_to, seq_off) — 0-based
    * inclusive token positions within the doc, seq_off = where the
    * segment starts inside the sequence.
    */
  def packSequences(docs: DataFrame, seqTokens: Long,
                    bucketWidth: Long = 1000000L): DataFrame = {
    val toks = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"),
        expr(s"doc_id div $bucketWidth").as("bucket"))
      .where(col("tokens") > 0)
    val offsets = toks.groupBy("bucket").agg(sum("tokens").as("btoks"))
      .withColumn("offset", coalesce(
        sum("btoks").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    val intra = Window.partitionBy("bucket").orderBy("doc_id")
    toks.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", sum("tokens").over(intra))
      .withColumn("start", col("offset") + col("cum") - col("tokens"))
      .select(col("doc_id"), col("tokens"), col("start"),
        explode(expr(
          s"sequence(start div $seqTokens, (start + tokens - 1) div $seqTokens)"))
          .as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        greatest(col("seq_id") * seqTokens - col("start"), lit(0L)).as("doc_from"),
        (least((col("seq_id") + 1) * seqTokens - col("start"), col("tokens")) - 1L)
          .as("doc_to"),
        greatest(col("start") - col("seq_id") * seqTokens, lit(0L)).as("seq_off"))
  }

  /** Deterministic global corpus shuffle: assign every document a
    * pseudorandom but REPRODUCIBLE training position — the final
    * "shuffle the corpus" step an LLM data pipeline runs so batch
    * composition is decorrelated from crawl/source order, made
    * deterministic (seed-keyed md5) so a rerun, a resume, or another
    * engine lays out the identical training order.
    *
    * The global rank is materialized with the same two-phase pattern as
    * [[shardPack]], never a single-partition window over the corpus:
    * the first md5 hex byte buckets rows into 256 ranges whose STRING
    * order equals their numeric order (hex digits are ascii-ordered, so
    * ordering by (bucket, key) == ordering by key), per-bucket counts
    * roll up map-side, a window over the 256-row bucket table yields
    * range offsets, and row_number runs partitioned by bucket. At any
    * scale the unpartitioned work is 256 rows.
    *
    * Output: (doc_id, shuffle_key, pos) — pos is the dense 0-based
    * training position under seed.
    */
  def shuffleOrder(docs: DataFrame, seed: Long = 0L): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      md5(concat(lit(seed.toString), lit("_"), col("doc_id").cast("string")))
        .as("shuffle_key"))
      .withColumn("bucket",
        conv(substring(col("shuffle_key"), 1, 2), 16, 10).cast("long"))
    val offsets = keyed.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(
        sum("n").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    val intra = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    keyed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("pos", col("offset") + row_number().over(intra) - 1L)
      .select(col("doc_id"), col("shuffle_key"), col("pos"))
  }

  /** Probability-proportional-to-size systematic sampling: k
    * deterministic grid points p_j = phase + j·step (step = totalW div
    * k, phase = step div 2) are laid over the corpus's cumulative
    * weight axis, and a document is drawn once per grid point inside
    * its weight interval [start, start+w) — the classic PPS systematic
    * design (heavier docs proportionally likelier, a doc heavier than
    * `step` draws multiple picks), made exactly reproducible: no RNG,
    * pure int64 arithmetic, Σ n_picks == k by construction.
    *
    * Scale shape: the cumulative offsets are [[shardPack]]'s two-phase
    * distributed prefix sum (bucketed partial totals, one tiny
    * bucket-offset window, intra-bucket cumsum); the grid-point count
    * per doc is then a pure map expression. The only driver scalar is
    * the total weight — one row off the already-bucketed totals table.
    */
  def weightedSample(docs: DataFrame, k: Long = 100L,
                     bucketWidth: Long = 64L): DataFrame = {
    val w = docs.select(col("doc_id"), col("n_chars").cast("long").as("weight"),
        expr(s"doc_id div $bucketWidth").as("bucket"))
      .where(col("weight") > 0)
    val btoks = w.groupBy("bucket").agg(sum("weight").as("bw"))
    val offsets = btoks.withColumn("offset", coalesce(
        sum("bw").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    val total = btoks.agg(sum("bw")).head.getLong(0)
    val step = total / k
    require(step > 0, s"corpus weight $total must be at least k=$k")
    val phase = step / 2
    val intra = Window.partitionBy("bucket").orderBy("doc_id")
    // grid points inside [start, start+w): j_lo = ceil((start-phase)/step)
    // clamped at 0, j_hi = floor((start+w-1-phase)/step)+1 clamped at k —
    // every division has a nonnegative numerator (CASE-guarded), where
    // Spark's `div` and DuckDB's `//` agree exactly.
    w.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start_off",
        col("offset") + sum("weight").over(intra) - col("weight"))
      .withColumn("j_lo", when(col("start_off") <= phase, 0L)
        .otherwise(expr(s"(start_off - $phase + $step - 1) div $step")))
      .withColumn("j_hi", least(
        when(col("start_off") + col("weight") <= phase, lit(0L))
          .otherwise(expr(s"((start_off + weight - 1 - $phase) div $step) + 1")),
        lit(k)))
      .withColumn("n_picks", greatest(col("j_hi") - col("j_lo"), lit(0L)))
      .where(col("n_picks") > 0)
      .select("doc_id", "weight", "start_off", "n_picks")
  }

  /** Deterministic train/validation/test split, keyed on the CONTENT
    * hash (portable md5 bucket), not the row id: byte-identical
    * documents land in the same split by construction, so exact
    * duplicates can never leak across the train/eval boundary — the
    * first leakage a training pipeline must rule out. (Near-duplicate
    * leakage is what [[Dedup.canonicalize]] upstream removes.)
    *
    * Permille thresholds: train < `trainPermille`, then validation up
    * to `trainPermille + valPermille`, remainder test. Pure map-side
    * expression — no shuffle, no sample-sort, reproducible across
    * engines, reruns and cluster sizes.
    */
  def datasetSplit(docs: DataFrame, trainPermille: Int = 980,
                   valPermille: Int = 10): DataFrame = {
    val b = CurationPipeline.hashBucket(col("text"), 1000L)
    docs.select(col("doc_id"), b.as("bucket"),
      when(b < trainPermille, "train")
        .when(b < trainPermille + valPermille, "validation")
        .otherwise("test").as("split"))
  }

  /** Corpus-level rarity score: mean inverse document frequency over a
    * document's word occurrences, ENTIRELY in fixed-point micro units —
    * per-word `floor(1e6 / df)` is bit-exact on both engines (IEEE
    * division + floor, no transcendental), the per-doc sum is an
    * order-free int64 sum, and the mean is int64 `div` (truncating).
    * Higher = rarer vocabulary. No float ever reaches the output: the
    * OracleMarginSpec audit showed a rounded float mean lands EXACTLY
    * on round-6 half boundaries on this corpus (values like 2564.5
    * micro), where Spark's BigDecimal rounding and DuckDB's float
    * rounding may part ways — integer units have no boundary at all.
    *
    * Scale shape: the document-frequency table is vocabulary-sized
    * (distinct (word, doc) partial-agg before the count), the join back
    * is keyed on the word — sort-merge on a vocab-bounded key, with the
    * per-doc reduce a plain partial-agg sum.
    */
  def idfScore(docs: DataFrame): DataFrame = {
    val occ = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val df = occ.distinct().groupBy("word").agg(count(lit(1)).as("df"))
    occ.join(df, Seq("word"))
      .withColumn("idf_micro", expr("cast(floor(1000000.0D / df) as bigint)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("idf_micro").as("s"))
      .select(col("doc_id"), col("n_words"),
        expr("s div n_words").as("idf_micro_mean"))
  }

  /** Per-source KL divergence from the corpus token distribution —
    * the mixture-drift diagnostic (which sources' vocabularies deviate
    * most from the blend they feed): Σ_w c_sw · log2(p_s(w)/q(w)) with
    * p_s(w) = c_sw/T_s and q(w) = t_w/T, reported UNNORMALIZED in
    * token·milli-log2 units. Every log2 is the signed interpolated
    * floor-log2 of the exact integer rational c_sw·T vs t_w·T_s — the
    * [[idfScore]]/bm25 discipline, so the statistic is bit-identical
    * on any engine. (At extreme corpus scale the c_sw·T product wants
    * a shared-gcd rescale before the rational; documented, not needed
    * at these magnitudes.)
    *
    * Scale shape: one (source, word) partial agg over the token
    * explode, then vocab-bounded df/total side tables broadcast onto
    * it — no corpus-sized join, no global sort.
    */
  def sourceKl(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .localCheckpoint(false)
    val sw = toks.groupBy("source", "w").agg(count(lit(1)).as("csw"))
    val tw = toks.groupBy("w").agg(count(lit(1)).as("tw"))
    val ts = sw.groupBy("source").agg(sum("csw").as("tsrc"))
    val total = toks.count()
    val slm =
      s"(CASE WHEN csw * ${total}L >= tw * tsrc " +
        s"THEN ${Selection.logRatioMilli(s"csw * ${total}L", "tw * tsrc")} " +
        s"ELSE -(${Selection.logRatioMilli("tw * tsrc", s"csw * ${total}L")}) END)"
    sw.join(broadcast(tw), Seq("w"))
      .join(broadcast(ts), Seq("source"))
      .withColumn("term", expr(s"csw * $slm"))
      .groupBy("source")
      .agg(sum("csw").as("n_tokens"), sum("term").as("kl_milli_tokens"))
  }
}
