package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge learning over the corpus — the tokenizer-training prep a
  * training-data engine owes its users: aggregate the corpus once into
  * the word-count table, then learn the top-`merges` byte-pair merges
  * by iterated most-frequent-adjacent-pair selection, exactly the
  * classic algorithm (Sennrich et al.) run on word frequencies.
  *
  * Scale shape: ONE corpus-scale pass (explode → partial-agg word
  * count); every later iteration touches only the VOCABULARY-bounded
  * symbolization table (millions of rows at web scale, never the
  * corpus), with a single-row argmax collect per merge — the same
  * bounded-fit pattern as the IVF Lloyd step. Each iteration
  * localCheckpoints the (small) table so the k-deep replace lineage
  * never reaches the analyzer.
  *
  * Determinism & portability: pair selection orders by (count desc,
  * pair asc) — both engines agree; the merge application is
  * space-padded string `replace`, which is left-to-right
  * non-overlapping in BOTH Spark (Java String semantics) and DuckDB —
  * including the shared-boundary quirk ("a b a b" merges once, not
  * twice, because the matched trailing space is consumed). That quirk
  * is deterministic and replayed identically by the oracle; canonical
  * BPE tie-handling differs only when a pair abuts itself.
  */
object BpeTrainer {

  private def sq(s: String): String = s.replace("'", "''")

  /** The learned merge table: (merge_rank, pair, frequency) — pair is
    * the two space-separated symbols merged at that rank, frequency
    * its weighted adjacent-pair count at selection time.
    */
  def learnMerges(docs: DataFrame, merges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "), concat_ws(" ", split(col("word"), "")),
        lit(" ")).as("syms"), col("cnt"))
      .localCheckpoint(true)
    val out = Seq.newBuilder[(Int, String, Long)]
    for (i <- 1 to merges) {
      val best = words
        .select(col("cnt"), expr("split(trim(syms), ' ')").as("s"))
        .where(size(col("s")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "j -> concat(element_at(s, j), ' ', element_at(s, j + 1)))")).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("n"))
        .orderBy(desc("n"), asc("pair")).limit(1)
        .collect()
      if (best.nonEmpty) {
        val (pair, n) = (best(0).getString(0), best(0).getLong(1))
        out += ((i, pair, n))
        words = words.select(
          expr(s"replace(syms, ' ${sq(pair)} ', ' ${sq(pair.replace(" ", ""))} ')")
            .as("syms"), col("cnt"))
          .localCheckpoint(true)
      }
    }
    out.result().toDF("merge_rank", "pair", "frequency")
  }

  /** Tokenize the corpus with a learned merge table: apply the merges
    * in rank order to every document's words (broadcast merge list →
    * a chain of `replace` column expressions, pure map-side) and emit
    * (doc_id, n_tokens) — the subword token count the packing and
    * budget stages consume.
    */
  def tokenizeCount(docs: DataFrame, mergeTable: Seq[String]): DataFrame = {
    val chain = mergeTable.foldLeft(
      concat(lit(" "), concat_ws(" ", split(col("word"), "")), lit(" "))
    )((acc, p) => regexp_replace(acc,
      java.util.regex.Pattern.quote(s" $p "), s" ${p.replace(" ", "")} "))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), chain.as("syms"))
      .select(col("doc_id"), size(expr("split(trim(syms), ' ')")).as("toks"))
      .groupBy("doc_id").agg(sum("toks").as("n_tokens"))
  }
}
