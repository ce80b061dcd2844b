package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact set-similarity join via prefix filtering (the PPJoin family):
  * ALL document pairs with word-set Jaccard ≥ τ, with no approximation
  * anywhere — the exact counterpart to the MinHash/SimHash band joins,
  * completing the dedup-candidate toolbox (probabilistic banding for
  * recall-tunable scale, prefix filtering for exact guarantees).
  *
  * The classic prefix-filter argument: order every token by global
  * rarity (df asc, then token asc — fully deterministic); two sets with
  * Jaccard ≥ τ MUST share at least one token among each one's
  * ⌊(1−τ)·n⌋+1 rarest tokens, so equi-joining on PREFIX tokens only is
  * lossless. Candidates then verify exactly with one intersection size.
  *
  * Scale shape: the token-frequency table is vocab-bounded (broadcast);
  * prefix extraction is a per-doc window (corpus-keyed, AQE-splittable);
  * the candidate join keys on the RAREST tokens, so bucket sizes track
  * token df from the bottom — the high-df tokens that would explode a
  * naive token join never enter a prefix unless τ is very low. Verify
  * cost is |candidates| set intersections, each bounded by doc length.
  *
  * Output is all-integer ((a, b, inter_n, a_n, b_n, jaccard_milli) with
  * jaccard_milli = 1000·inter // (a_n + b_n − inter)) so the DuckDB
  * oracle replays ranking, prefixes, candidates and verification with
  * no float boundary anywhere.
  */
object SetJoin {

  def ppJoin(docs: DataFrame, tauMilli: Long = 700L): DataFrame = {
    // distinct word sets, one row per (doc, word)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct()
      .localCheckpoint(true) // feeds rank build, prefix AND verify sides
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // global rarity order: df asc, word asc (deterministic total order).
    // The unpartitioned rank window touches one row per VOCAB entry
    // after the partial-agg df rollup — the shard_pack bounded-global
    // argument, never the corpus (allow-listed in PlanShapeSpec)
    val rank = toks.groupBy("word").agg(count(lit(1)).as("df"))
      .withColumn("rk", row_number().over(Window.orderBy("df", "word")))
      .select("word", "rk")
    // per-doc prefix: the ⌊(1−τ)·n⌋+1 rarest tokens
    val posW = Window.partitionBy("doc_id").orderBy("rk")
    // prefix length ⌊(1−τ)n⌋+1 = n − ⌈τn⌉ + 1, in exact integer milli
    // arithmetic (a float divide could shorten a prefix by one and
    // silently lose pairs); referenced by both sides of the candidate
    // self-join → materialize once
    val prefix = toks.join(broadcast(rank), Seq("word"))
      .join(broadcast(sizes), Seq("doc_id"))
      .withColumn("pos", row_number().over(posW))
      .where(col("pos") <= expr(s"(n * ${1000L - tauMilli}) div 1000 + 1"))
      .select(col("word"), col("doc_id"))
      .localCheckpoint(true)
    // candidates: share ≥1 prefix token, a < b (+ the length filter:
    // τ·max(n) ≤ min(n) is necessary for Jaccard ≥ τ)
    val cand = prefix.as("pa")
      .join(prefix.as("pb"), col("pa.word") === col("pb.word") &&
        col("pa.doc_id") < col("pb.doc_id"))
      .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
      .distinct()
      .join(broadcast(sizes.select(col("doc_id").as("a"), col("n").as("a_n"))), Seq("a"))
      .join(broadcast(sizes.select(col("doc_id").as("b"), col("n").as("b_n"))), Seq("b"))
      .where(lit(tauMilli) * greatest(col("a_n"), col("b_n"))
        <= lit(1000L) * least(col("a_n"), col("b_n")))
    // exact verify: intersection size via the (doc, word) stream
    val ta = toks.select(col("doc_id").as("a"), col("word"))
    val tb = toks.select(col("doc_id").as("b"), col("word"))
    cand.join(ta, Seq("a")).join(tb, Seq("b", "word"))
      .groupBy("a", "b", "a_n", "b_n")
      .agg(count(lit(1)).as("inter_n"))
      .withColumn("jaccard_milli",
        expr("(1000 * inter_n) div (a_n + b_n - inter_n)"))
      .where(col("jaccard_milli") >= tauMilli)
      .select("a", "b", "inter_n", "a_n", "b_n", "jaccard_milli")
  }
}
