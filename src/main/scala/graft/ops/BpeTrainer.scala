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
  /** Below this vocabulary size the merge loop runs on the driver over
    * the collected word-count table (identical argmax + replace
    * semantics — Java String.replace is the same left-to-right
    * non-overlapping contract as Spark's StringReplace), saving the
    * per-iteration job round-trips; above it the distributed loop
    * runs. The same small/large switch as ConnectedComponents' driver
    * union-find threshold, and BpeSpec pins path equivalence.
    */
  val driverVocabLimit = 200000L

  def learnMerges(docs: DataFrame, merges: Int = 8): DataFrame =
    learnMerges(docs, merges, driverVocabLimit)

  def learnMerges(docs: DataFrame, merges: Int, vocabLimit: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Two overheads dominate the iteration loop at ANY corpus scale,
    // because everything after the corpus pass is vocabulary-bounded:
    // (1) task scheduling — the vocab table inherits the corpus agg's
    // shuffle partitioning, so each tiny stage runs shuffle.partitions
    // tasks; coalesce to ~1 partition per 64k vocab entries (capped at
    // the cluster parallelism) so small vocabularies iterate in
    // single-task stages while web-scale vocabularies stay parallel.
    // (2) jobs — lazy persist per generation instead of an eager
    // checkpoint: the argmax collect is each iteration's only job
    // (materializing the current generation from its cached parent);
    // older generations unpersist once superseded.
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def cache(df: DataFrame): DataFrame = { df.persist(); cached += df; df }
    val counted = cache(docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "), concat_ws(" ", split(col("word"), "")),
        lit(" ")).as("syms"), col("cnt")))
    val vocabN = counted.count()
    if (vocabN <= vocabLimit) {
      // driver fit: one corpus pass, then in-memory merge iterations
      var tbl = counted.collect().map(r => (r.getString(0), r.getLong(1)))
      cached.foreach(_.unpersist())
      val out = Seq.newBuilder[(Int, String, Long)]
      for (i <- 1 to merges) {
        val counts = new java.util.HashMap[String, Long]()
        tbl.foreach { case (syms, cnt) =>
          val s = syms.trim.split(" ")
          var j = 0
          while (j < s.length - 1) {
            counts.merge(s(j) + " " + s(j + 1), cnt, Long.box(_) + _)
            j += 1
          }
        }
        if (!counts.isEmpty) {
          // frequency ties break by UTF-8 BYTE order, not Java's UTF-16
          // code-unit order: the distributed path's `orderBy(asc("pair"))`
          // and the DuckDB oracle both collate binary UTF-8, and the two
          // orders differ for U+E000..U+FFFF vs supplementary chars — a
          // code-unit compare here could pick a different merge on a tie
          // and diverge the whole table from the distributed path.
          def utf8Lt(a: String, b: String): Boolean = {
            val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var i = 0
            val n = math.min(x.length, y.length)
            while (i < n) {
              val c = (x(i) & 0xff) - (y(i) & 0xff)
              if (c != 0) return c < 0
              i += 1
            }
            x.length < y.length
          }
          var bestPair: String = null; var bestN = Long.MinValue
          counts.forEach { (p, n) =>
            if (n > bestN || (n == bestN && utf8Lt(p, bestPair))) { bestPair = p; bestN = n }
          }
          out += ((i, bestPair, bestN))
          val merged = " " + bestPair.replace(" ", "") + " "
          tbl = tbl.map { case (syms, cnt) =>
            (syms.replace(" " + bestPair + " ", merged), cnt)
          }
        }
      }
      return out.result().toDF("merge_rank", "pair", "frequency")
    }
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (vocabN / 65536L).toInt))
    var words = counted.coalesce(parts)
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
      // the latest generation is materialized now — its parents can go
      while (cached.size > 1) cached.remove(0).unpersist()
      if (best.nonEmpty) {
        val (pair, n) = (best(0).getString(0), best(0).getLong(1))
        out += ((i, pair, n))
        if (i < merges) words = cache(words.select(
          expr(s"replace(syms, ' ${sq(pair)} ', ' ${sq(pair.replace(" ", ""))} ')")
            .as("syms"), col("cnt")))
      }
    }
    cached.foreach(_.unpersist())
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
