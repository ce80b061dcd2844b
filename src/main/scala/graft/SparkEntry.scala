package graft

import graft.core.{CorpusRow, Ontology}
import graft.extract.MentionExtractor
import graft.link.{EntityLinker, ShipCatalog}
import graft.ops.{Dedup, Multimodal, SimilaritySearch, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: one entry per implemented operator (SURVEY.md §2),
  * runnable on the driver's parquet tables; `oracleSql` gives the
  * DuckDB-equivalent for every SQL-expressible operator. Column names
  * and value arithmetic are mirrored exactly (integer-cent sums instead
  * of float accumulation, floor-based binning instead of round) so the
  * driver's sorted-column value hash matches bit-for-bit.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Operator-only wall seconds for queries whose `queries` entry carries
    * harness setup the operator shouldn't be billed for — the streaming
    * entries stage a temp-parquet source and boot the micro-batch engine
    * before the keyed-state operator runs. Populated (overwritten) each
    * time such a query executes; Bench emits it as `operator_sec` next to
    * the harness-inclusive sweep timings so operator regressions aren't
    * masked by (or blamed on) harness noise.
    */
  val operatorSec = scala.collection.concurrent.TrieMap.empty[String, Double]

  /** Times the streaming window only: start → processAllAvailable → stop. */
  private def timedStream(name: String)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val t0 = System.nanoTime()
    val q = start
    q.processAllAvailable(); q.stop()
    operatorSec(name) = (System.nanoTime() - t0) / 1e9
  }

  // ---- documents-as-corpus: the KG pipeline over the driver's table ----

  /** label → mention term from the documents vocabulary (no term is a
    * substring of any other vocab word — verified against the corpus).
    */
  val docDict: Seq[(String, String)] = Seq(
    "anode" -> "scan", "bilge_keel" -> "merge", "sea_chest_grating" -> "hash",
    "defect" -> "slow", "corrosion" -> "dup", "marine_growth" -> "data",
    "over_board_valve" -> "filter", "paint_peel" -> "batch",
    "propeller" -> "join", "ship_hull" -> "the")

  val docLabels: Seq[String] = docDict.map(_._1)

  def docsCorpus(s: SparkSession, dir: String): org.apache.spark.sql.Dataset[CorpusRow] = {
    import s.implicits._
    t(s, dir, "documents").select(
      col("source").as("repo"),
      col("doc_id").cast("string").as("path"),
      md5(col("text")).as("commit"),
      col("lang"),
      col("text").as("content")
    ).as[CorpusRow]
  }

  def docFrames(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val corpus = docsCorpus(s, dir)
    MentionExtractor.frames(
      MentionExtractor.extract(corpus, docDict), docLabels, ShipCatalog.dim(corpus))
  }

  /** Flagship: DEPICTS triples of the KG pipeline over sf0.001 docs. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val sp: SparkSession = spark
    EntityLinker.depicts(docFrames(spark, "/root/testdata/sf0.001"), docLabels)
  }

  // ---- SQL fragments shared by the generated oracles ----

  /** Non-overlapping substring count of `term` in documents.text. */
  private def cntSql(term: String): String =
    s"(length(text) - length(replace(text, '$term', ''))) / ${term.length}"

  private def scoreSql(term: String): String = {
    val c = cntSql(term)
    s"(CASE WHEN $c / 8.0 > 0.5 THEN 1 ELSE 0 END + " +
      s"CASE WHEN $c * ${term.length} / length(text) > 0.01 THEN 1 ELSE 0 END)"
  }

  private val tokSql =
    "CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END"

  /** DuckDB twin of Selection.logRatioMilli: interpolated milli-log2 of
    * num/den, REQUIRING num >= den >= 1 — floor-log2 via unpadded bin
    * length plus the linear milli fraction (bm25's idf recipe).
    */
  private def lrmSql(num: String, den: String): String = {
    val bits = s"(length(bin(($num) // ($den))) - 1)"
    s"($bits * 1000 + (1000 * ($num)) // (($den) * (1 << $bits)) - 1000)"
  }

  /** Shared CTE chain of the bigram-LM oracles: md5-content train
    * slice, add-one bigram/context counts, bigram-participating train
    * vocab V (matching the engine's single-pass derivation), per-doc
    * integer surprisal sums — ends at the `per` relation
    * (doc_id, is_train, n_bigrams, oov_bigrams, total_bits).
    */
  private val lmScoreCtes =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
      |   CASE WHEN cast(concat('0x', substr(md5(text), 1, 8)) as bigint) % 1000 < 500
      |        THEN 1 ELSE 0 END AS is_train FROM documents),
      | big AS (SELECT doc_id, is_train,
      |     unnest(list_transform(generate_series(1, len(w) - 1),
      |       i -> concat(w[i], ' ', w[i + 1]))) AS g FROM d),
      | cnts AS (SELECT g, count(*) AS c FROM big WHERE is_train = 1 GROUP BY g),
      | ctx AS (SELECT split_part(g, ' ', 1) AS w1, count(*) AS cc
      |   FROM big WHERE is_train = 1 GROUP BY 1),
      | v AS (SELECT count(DISTINCT x) AS vv
      |   FROM (SELECT unnest(string_split(g, ' ')) AS x FROM big WHERE is_train = 1)),
      | sc AS (SELECT b.doc_id, b.is_train,
      |     coalesce(c.c, 0) AS c, coalesce(x.cc, 0) AS cc
      |   FROM big b LEFT JOIN cnts c ON b.g = c.g
      |   LEFT JOIN ctx x ON split_part(b.g, ' ', 1) = x.w1),
      | per AS (SELECT doc_id, is_train,
      |     cast(count(*) as bigint) AS n_bigrams,
      |     cast(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) as bigint) AS oov_bigrams,
      |     cast(sum(length(bin((cc + vv) // (c + 1))) - 1) as bigint) AS total_bits
      |   FROM sc, v GROUP BY doc_id, is_train)""".stripMargin

  /** Shared CTE chain of the kmeans_* oracles: fixed-point encode
    * (floor((x+1)·2^20) — all-positive so `//` truncation == floor on
    * both engines), md5-ranked seed centroids, then `iters` unrolled
    * Lloyd rounds (integer argmin with the (dist, cid) tie-break, sum//n
    * centroid update, empty clusters carry the previous centroid) —
    * ends at the `c<iters>` relation (cid, cv). All distances are exact:
    * int64 codes ≤ 2^21, inner products ≤ 2^48 < 2^53, so DuckDB's
    * double-returning list_inner_product is lossless.
    */
  private def kmeansCtes(c: Int, iters: Int, dims: Int): String = {
    def dist(a: String, b: String) =
      s"list_inner_product($a, $a) + list_inner_product($b, $b)" +
        s" - 2 * list_inner_product($a, $b)"
    val head =
      s"""WITH e AS (SELECT vec_id, list_transform(cast(embedding as double[]),
        |     x -> cast(floor((x + 1.0) * 1048576.0) as bigint)) AS xq FROM embeddings),
        | hb AS (SELECT vec_id, xq,
        |     cast(concat('0x', substr(md5(cast(vec_id as varchar)), 1, 8)) as bigint) % 1000000 AS h
        |   FROM e),
        | c0 AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, xq AS cv
        |   FROM hb ORDER BY h, vec_id LIMIT $c)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""" a$i AS (SELECT t.vec_id, t.xq, c.cid,
        |     row_number() OVER (PARTITION BY t.vec_id
        |       ORDER BY ${dist("t.xq", "c.cv")}, c.cid) AS rk
        |   FROM hb t CROSS JOIN c${i - 1} c),
        | m$i AS (SELECT vec_id, xq, cid FROM a$i WHERE rk = 1),
        | s$i AS (SELECT cid, d, cast(sum(xq[d + 1]) as bigint) // cast(count(*) as bigint) AS cx
        |   FROM m$i CROSS JOIN (SELECT unnest(range(0, $dims)) AS d) dims
        |   GROUP BY cid, d),
        | c$i AS (SELECT p.cid, coalesce(l.cv, p.cv) AS cv
        |   FROM c${i - 1} p LEFT JOIN
        |     (SELECT cid, list(cx ORDER BY d) AS cv FROM s$i GROUP BY cid) l USING (cid))""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** Shared CTE chain of the substring-dedup oracles: stride-1 10-word
    * grams, per-gram first/second owners, cross-doc hit positions, the
    * pos−prev ≤ k island merge — ends at the `spans` relation
    * (doc_id, span_start, span_len, n_grams, other_doc).
    */
  private val substringSpanCtes =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      | p AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 9)) AS pos
      |   FROM w WHERE len(ws) >= 10),
      | g AS (SELECT doc_id, pos, array_to_string(list_slice(ws, pos, pos + 9), ' ') AS gram FROM p),
      | own AS (SELECT gram, min(doc_id) AS m1 FROM g GROUP BY gram),
      | dup AS (SELECT g.gram, o.m1, min(g.doc_id) AS m2 FROM g JOIN own o USING (gram)
      |   WHERE g.doc_id > o.m1 GROUP BY g.gram, o.m1),
      | hits AS (SELECT g.doc_id, g.pos,
      |     CASE WHEN g.doc_id = d.m1 THEN d.m2 ELSE d.m1 END AS other_doc
      |   FROM g JOIN dup d USING (gram)),
      | isl AS (SELECT doc_id, pos, other_doc,
      |     CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 10
      |          THEN 0 ELSE 1 END AS brk
      |   FROM hits),
      | i2 AS (SELECT doc_id, pos, other_doc,
      |     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
      |   FROM isl),
      | spans AS (SELECT doc_id, cast(min(pos) as bigint) AS span_start,
      |     cast(max(pos) + 10 - min(pos) as bigint) AS span_len,
      |     cast(count(*) as bigint) AS n_grams,
      |     cast(min(other_doc) as bigint) AS other_doc
      |   FROM i2 GROUP BY doc_id, island)""".stripMargin

  /** Code-generated CTE chain replaying `k` BPE merge iterations:
    * w0 = char-symbolized word counts, then per iteration the pair
    * counts (p_i), the (n desc, pair asc) argmax (b_i), and the
    * space-padded replace application (w_i) — the same left-to-right
    * non-overlapping `replace` semantics as the engine.
    */
  private def bpeCtes(k: Int): String = {
    // AS MATERIALIZED on every stage: without it DuckDB inlines the
    // k-deep CTE chain (each w_i references w_{i-1}, each b_i is a
    // scalar subquery used twice) into an exponentially-expanded tree
    val sb = new StringBuilder(
      """WITH w0 AS MATERIALIZED (SELECT ' ' || array_to_string(regexp_split_to_array(word, ''), ' ') || ' ' AS syms,
        |   cast(count(*) as bigint) AS cnt
        | FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        | GROUP BY word)""".stripMargin)
    for (i <- 1 to k) {
      sb ++= s""",
        | p$i AS MATERIALIZED (SELECT unnest(list_transform(generate_series(1, len(s) - 1),
        |     j -> concat(s[j], ' ', s[j + 1]))) AS pair, cnt
        |   FROM (SELECT string_split(trim(syms), ' ') AS s, cnt FROM w${i - 1})),
        | b$i AS MATERIALIZED (SELECT pair, cast(sum(cnt) as bigint) AS n FROM p$i
        |   GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
        | w$i AS MATERIALIZED (SELECT replace(syms, ' ' || (SELECT pair FROM b$i) || ' ',
        |     ' ' || (SELECT replace(pair, ' ', '') FROM b$i) || ' ') AS syms, cnt
        |   FROM w${i - 1})""".stripMargin
    }
    sb.toString
  }

  private def bpeMergesOracleSql(k: Int): String =
    bpeCtes(k) + (1 to k).map(i =>
      s"\n SELECT $i AS merge_rank, (SELECT pair FROM b$i) AS pair," +
        s" (SELECT n FROM b$i) AS frequency").mkString("", "\n UNION ALL", "") +
      "\n ORDER BY merge_rank"

  /** Tokenize oracle: the merge chain above, then every document word
    * symbolized and run through the k replaces in rank order.
    */
  private def bpeTokenizeOracleSql(k: Int): String = {
    val replaced = (1 to k).foldLeft("syms0") { (acc, i) =>
      s"replace($acc, ' ' || (SELECT pair FROM b$i) || ' '," +
        s" ' ' || (SELECT replace(pair, ' ', '') FROM b$i) || ' ')"
    }
    bpeCtes(k) + s""",
      | tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      | symd AS (SELECT doc_id,
      |     ' ' || array_to_string(regexp_split_to_array(word, ''), ' ') || ' ' AS syms0
      |   FROM tok),
      | applied AS (SELECT doc_id, $replaced AS syms FROM symd)
      | SELECT doc_id, cast(sum(len(string_split(trim(syms), ' '))) as bigint) AS n_tokens
      | FROM applied GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** MMR oracle: candidate pool (round-6 cosine top-`pool`), pairwise
    * round-6 sims, then the k greedy steps UNROLLED as a CTE chain
    * (bpe_merges' discipline) — step i picks the argmax of
    * 0.7·rel − 0.3·max(sim to s1..s(i-1)), ties by vec_id. DuckDB's
    * `list_cosine_similarity` is bit-identical to the engine's
    * dot/(√·√) left-to-right fold, and 0.7e0/0.3e0 are double literals,
    * so every score double matches the engine's exactly.
    */
  private def annMmrOracleSql(k: Int, pool: Int): String = {
    // MATERIALIZED: the unrolled chain references c/sim/s_j many times;
    // inlined CTEs would re-open the parquet per reference and exhaust
    // the process file-handle budget
    val base =
      s"""WITH e AS MATERIALIZED (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
         | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         | c AS MATERIALIZED (SELECT e.vec_id, e.v,
         |     round(list_cosine_similarity(e.v, q.qv), 6) AS rel
         |   FROM e, q WHERE e.vec_id <> 0
         |   ORDER BY rel DESC, e.vec_id LIMIT $pool),
         | sim AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b,
         |     round(list_cosine_similarity(a.v, b.v), 6) AS s
         |   FROM c a JOIN c b ON a.vec_id <> b.vec_id),
         | s1 AS MATERIALIZED (SELECT vec_id, rel, rel AS score FROM c
         |   ORDER BY rel DESC, vec_id LIMIT 1)""".stripMargin
    val steps = (2 to k).map { i =>
      val sel = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      s""",
         | s$i AS MATERIALIZED (SELECT c.vec_id, c.rel,
         |     0.7e0 * c.rel - 0.3e0 * (SELECT max(s.s) FROM sim s
         |       WHERE s.a = c.vec_id AND s.b IN ($sel)) AS score
         |   FROM c WHERE c.vec_id NOT IN ($sel)
         |   ORDER BY score DESC, c.vec_id LIMIT 1)""".stripMargin
    }.mkString
    val out = (1 to k).map(i =>
      s" SELECT cast($i as bigint) AS mmr_rank, vec_id, rel AS relevance," +
        s" score AS mmr_score FROM s$i").mkString("\n UNION ALL\n")
    s"$base$steps\n$out\n ORDER BY mmr_rank"
  }

  val tableDefectLabels = Seq("marine_growth", "corrosion", "paint_peel", "defect")

  /** Root ancestor in the HAS tree (transitive closure of the 25-row
    * ontology dimension, resolved at plan time — B11's path semantics).
    */
  def ontologyRoot(vis: String): String = {
    val parent = Ontology.entries.map(e => e.visCode -> Option(e.parentVisCode)).toMap
    @scala.annotation.tailrec
    def go(v: String): String = parent.get(v).flatten match {
      case Some(p) => go(p)
      case None => v
    }
    go(vis)
  }

  // =======================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // --- scans / filters / aggregation (B14-style conditional sums) ---

    "q01_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1995-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("revenue_cents"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_region_rollup" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
          sum(floor(col("c_acctbal") * 100 + 0.5).cast("long")).as("acct_cents"))
        .orderBy("r_name", "n_name")
    }),

    "q03_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(10)),

    "q04_priority_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "rn")
        .orderBy("o_orderpriority", "rn")
    }),

    "q05_cust_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")), lit(0L))
            .as("spend_cents"))
        .orderBy("c_custkey")
    }),

    "q06_cond_agg" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_hi_disc"),
          sum(when(col("l_tax") > 0.04, 1).otherwise(0)).as("n_hi_tax"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // --- binning histogram (B13 heading-bin arithmetic) ---

    "q07_value_bins" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(pmod(floor(col("value") / 30) * 30, lit(360)).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bin")),

    // --- per-group argmax (B15 key-frame) ---

    "q08_user_argmax" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
      t(s, dir, "events").withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // --- semi / anti joins (B8-style id-set membership) ---

    "q09_semijoin" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").where(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q10_antijoin" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q11_union_distinct" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_type").as("v"))
        .unionByName(t(s, dir, "orders").select(col("o_orderpriority").as("v")))
        .distinct().orderBy("v")),

    // --- sessionization (A12 window shape) ---

    "q12_sessions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      val b = e.withColumn("brk",
        when(lag("us", 1).over(w).isNull ||
          col("us") - lag("us", 1).over(w) > 1800000000L, 1).otherwise(0))
      val sess = b.withColumn("session",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy("user_id", "session").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("cnt").as("n_events"),
          max("cnt").as("max_session"))
        .orderBy("user_id")
    }),

    // --- running window (A4 cumulative shape) ---

    "q13_running" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events").where(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("running_cents", sum("cents").over(w))
        .select("user_id", "event_id", "running_cents")
        .orderBy("user_id", "event_id")
    }),

    "q14_lang_stats" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("lang")),

    "q15_exact_moments" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("sum_cents"),
          sum(col("c") * col("c")).as("sumsq_cents"))
        .orderBy("event_type")),

    // --- dedup / text analysis over documents ---

    "q16_distinct_count" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    "q17_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("total_cents"))
        .orderBy(asc_nulls_first("o_orderpriority"), asc_nulls_first("o_orderstatus"))),

    "q20_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents")).orderBy("content_hash")),

    "q21_token_stats" -> ((s, dir) => {
      val tok = TextAnalysis.tokenCount(col("text"))
      t(s, dir, "documents").select(col("lang"), tok.as("tok"))
        .groupBy("lang")
        .agg(sum("tok").as("total_tokens"), min("tok").as("min_tokens"),
          max("tok").as("max_tokens"))
        .orderBy("lang")
    }),

    "q22_doc_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // --- the KG pipeline over documents (extract → link → aggregate) ---

    "kg_scores" -> ((s, dir) => {
      val f = docFrames(s, dir)
      f.select(Seq(col("framenumber").as("doc_id")) ++
        docLabels.map(l => col(l)): _*).orderBy("doc_id")
    }),

    "kg_depicts" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      EntityLinker.mentions(docFrames(s, dir), docLabels)
        .join(broadcast(EntityLinker.linkDictDf(s)), Seq("label"))
        .select(
          split(col("frame_id"), "\\.").getItem(1).cast("long").as("doc_id"),
          col("visCode").as("vis_code"),
          col("classification"), col("segmentation"))
        .orderBy("doc_id", "vis_code")
    }),

    "kg_ship_table" -> ((s, dir) => {
      val aggs = tableDefectLabels.map(l =>
        sum(when(col(l) >= 1, 1).otherwise(0)).as(s"${l}_docs")) :+
        count(lit(1)).as("n_docs")
      docFrames(s, dir).groupBy(col("repo").as("source"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("source")
    }),

    "kg_part_rollup" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val rootMap = Ontology.linkDict.keys.toSeq.sorted
        .map(l => l -> ontologyRoot(Ontology.linkDict(l))).toDF("label", "root_vis")
      EntityLinker.mentions(docFrames(s, dir), docLabels)
        .join(broadcast(rootMap), Seq("label"))
        .groupBy("root_vis").agg(count(lit(1)).as("n_mentions"))
        .orderBy("root_vis")
    }),

    "kg_topk_quality" -> ((s, dir) =>
      docFrames(s, dir)
        .select(col("framenumber").as("doc_id"), round(col("uciqe"), 6).as("uciqe"))
        .orderBy(desc("uciqe"), asc("doc_id")).limit(100)),

    "ann_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      val v = expr("transform(embedding, x -> cast(x as double))")
      emb.where(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(SimilaritySearch.cosine(v, lit(q)), 4).as("cosine"))
        .orderBy("vec_id")
    }),

    // exact twin of the embedding near-dup operator: all-pairs cosine
    // above a threshold chosen 550x the engines' arithmetic noise away
    // from the nearest pair (0.45; closest pair at 0.4494)
    // corpus-distribution monitoring: EXACT type-7 quantiles of doc
    // length per language. Quantile points are quarter-multiples so the
    // interpolation weight (frac of p*(n-1)) is a power-of-2 fraction —
    // exact in binary on both engines. The 100 TB path swaps in
    // percentile_approx (t-digest) with identical plan shape.
    "q28_length_quantiles" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(n_chars, 0.25D)"), 6).as("p25"),
          round(expr("percentile(n_chars, 0.5D)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.75D)"), 6).as("p75"))
        .orderBy("lang")),
    "q27_cosine_pairs" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      val a = emb.select(col("vec_id").as("a"), col("v").as("va"))
      val b = emb.select(col("vec_id").as("b"), col("v").as("vb"))
      a.join(b, col("a") < col("b"))
        .withColumn("cos", SimilaritySearch.cosine(col("va"), col("vb")))
        .where(col("cos") >= 0.45)
        .select(col("a"), col("b"), round(col("cos"), 4).as("cosine"))
        .orderBy("a", "b")
    }),

    // --- exact ANN baselines vs list-arithmetic oracles ---

    "ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.bruteForceTopK(emb.where(col("vec_id") =!= 0), q, 20)
    }),

    // MMR diversified re-ranking over the exact top-24 candidate pool:
    // the greedy λ·rel − (1−λ)·maxsim selection, oracle-replayed step
    // for step (unrolled CTE chain, bpe_merges' discipline)
    "ann_mmr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.mmrTopK(emb.where(col("vec_id") =!= 0), q, k = 10, pool = 24)
    }),

    // binary sign quantization (1-bit rung under SQ/PQ): 32 portable
    // md5-derived hyperplanes → int64 codes, candidates ranked by
    // popcount(xor) — pure-integer output, the oracle regenerates the
    // planes from its own md5 and replays code → xor → popcount
    "ann_hamming" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.hammingTopK(emb.where(col("vec_id") =!= 0), q, k = 20)
    }),

    // Matryoshka adaptive retrieval: coarse rank on the first 16 dims
    // (raw-double ordering), pool-50 candidates, full-dim round-6
    // cosine re-rank — the two-tier serving shape, oracle-replayed
    "ann_matryoshka" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.matryoshkaTopK(emb.where(col("vec_id") =!= 0), q, k = 20)
    }),

    // hybrid retrieval: reciprocal-rank fusion of the BM25 keyword leg
    // (bm25_topk's terms) and the dense cosine leg (vec 0 as the query)
    // — integer 1000000 div (60 + rank) contributions, both legs' ranks
    // replayed by the oracle (the dense leg on RAW doubles, no rounding)
    "rrf_fusion" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      graft.ops.Retrieval.rrfFusion(
        t(s, dir, "documents").where(col("doc_id") =!= 0),
        emb.where(col("vec_id") =!= 0),
        Seq("dup", "key", "merge", "vector"), q, k = 20, pool = 50)
    }),

    "knn_graph" -> ((s, dir) =>
      SimilaritySearch.neighborGraph(t(s, dir, "embeddings"), k = 5, exact = true)
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
          round(col("distance"), 6).as("distance"))
        .orderBy("src", "distance", "dst")),

    // the POSITIONAL-BLOCK linearized-LSH kNN — the engine's web-scale
    // candidate plan (tag → bucket → order-projection → ±window pairing →
    // bounded top-k aggregator) — with PORTABLE md5-derived hyperplanes,
    // so the DuckDB oracle replays every stage (signature bits, bucket
    // order, window pairing, (distance, dst-string) tie rule) and the
    // whole machinery is hash-proven with REAL bucketing (16 sign
    // buckets per group, candidates a strict subset). knn_graph stays
    // the exact-path gate; CanonSpec pins the production variant's recall.
    "knn_portable" -> ((s, dir) => {
      val feat = t(s, dir, "embeddings")
        .select(col("vec_id").cast("string").as("id"),
          col("label").cast("long").as("group"),
          expr("transform(embedding, x -> cast(x as double))").as("vec"))
      graft.canon.KnnJoin.approxTopK(feat, 5, tables = 1, bits = 4,
          window = 8, portable = true)
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
          round(col("distance"), 6).as("distance"))
        .orderBy("src", "dst")
    }),

    // --- B3/B13 heading-bin arithmetic with the reference's +180 offset ---

    "q18_heading_bins" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(graft.query.GraphQueries.headingBin(col("value"), lit(77.0))
          .as("heading_bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("heading_bin")),

    // --- BPE-ish token estimate (codegen'd HOF aggregate) ---

    "q19_bpe_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(sum(TextAnalysis.bpeTokenEstimate).as("bpe_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")),

    // --- exact n-gram Jaccard over a SQL-expressible candidate set ---

    "q23_jaccard_adj" -> ((s, dir) => {
      val grams = t(s, dir, "documents").select(col("doc_id"),
        array_distinct(expr(
          "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
            "i -> array_join(slice(split(text, ' '), i, 3), ' '))")).as("grams"))
      val ga = grams.select(col("doc_id").as("a"), col("grams").as("ga"))
      val gb = grams.select((col("doc_id") - 1).as("a"), col("doc_id").as("b"),
        col("grams").as("gb"))
      ga.join(gb, Seq("a"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("ga"), col("gb"))) /
            size(array_union(col("ga"), col("gb")))).as("jaccard"))
        .orderBy("a")
    }),

    // --- deterministic hash-threshold sampling (audit-reproducible) ---

    "q24_det_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(graft.ops.CurationPipeline.hashBucket(col("text")) < 300000L)
        .select("doc_id", "lang").orderBy("doc_id")),

    // A12-A14 mosaic sessionization against a window-SQL oracle: frames
    // synthesized from `events` with SQL-visible arithmetic (the pipeline's
    // own telemetry comes from the Scala Rng, which DuckDB cannot replay),
    // then the REAL operator (Mosaics.withSessions + gate + UnionCoverage)
    "q25_mosaic_sessions" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_type"), col("value"))
      val frames = t(s, dir, "events").select(
        col("user_id").as("inspection_id"),
        row_number().over(w).as("framenumber"),
        pmod(col("value") * 7.3, lit(360.0)).as("Heading"),
        (pmod(col("value"), lit(25.0)) / 10.0).as("Depth"),
        (pmod(col("value"), lit(1.0)) * 0.9).as("cov"))
      graft.materialize.Mosaics.withSessions(frames)
        .groupBy(col("inspection_id"), col("session"))
        .agg(count("*").as("n_frames"),
          (lit(1.0) + max("Depth") - min("Depth")).as("size_raw"),
          round(graft.materialize.Mosaics.unionCoverage(col("cov")), 6)
            .as("union_cov"))
        .where(col("n_frames") >= graft.materialize.Mosaics.minFrames ||
          col("size_raw") >= graft.materialize.Mosaics.sizeIncreaseKeep)
        .select(col("inspection_id"), col("session").cast("long").as("session"),
          col("n_frames"), round(col("size_raw"), 6).as("size_increase"),
          col("union_cov"))
        .orderBy("inspection_id", "session")
    }),

    // A25 exact DBSCAN against a DuckDB oracle that replays the full
    // semantics (eps-ball core test, connected components over core-core
    // edges via recursive closure, border attach to min core component,
    // dense per-group numbering, noise = -1) on SQL-visible vectors
    "q26_dbscan" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val pts = t(s, dir, "embeddings").select(
        col("vec_id").cast("long").as("id"),
        col("label").cast("long").as("group"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"))
      graft.canon.Dbscan.cluster(pts, eps = 1.25, minPts = 4).orderBy("id")
    }),

    // --- connected components against a window-SQL oracle ---

    "cc_sizes" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val d = t(s, dir, "documents")
      val a = d.select(col("doc_id").as("src"), col("lang").as("src_lang"))
      val b = d.select(col("doc_id").as("dst"), col("lang").as("dst_lang"))
      // chain edges between adjacent doc ids of the same language: the
      // resulting components are language runs — oracle-expressible
      val edges = a.join(b,
          col("src") + 1 === col("dst") && col("src_lang") === col("dst_lang"))
        .select("src", "dst")
      graft.canon.ConnectedComponents.run(edges)
        .select(col("id"), col("component")).orderBy("id")
    }),

    // --- language-ID heuristic vs a CASE-expression oracle ---

    "lang_id" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      TextAnalysis.languageId(t(s, dir, "documents")).orderBy("doc_id")
    }),

    // --- A4 interpolate/resample vs a DuckDB window-SQL oracle ---

    "telemetry_interp" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // resample event values per user onto a 64-point uniform grid
      val samples = t(s, dir, "events").select(
        col("user_id").as("inspection_id"),
        unix_micros(col("ts").cast("timestamp")).cast("double").as("ts"),
        col("event_type").as("channel"), col("value"))
      graft.extract.TelemetryInterpolation.interpolate(samples, 64)
        .orderBy("inspection_id", "channel", "frame_index")
    })
  ) ++ rowsOnlyQueries

  // --- operator queries added after the first wave; most have no
  // SQL-expressible oracle (driver rows-only check), but any key that
  // also appears in oracleSql (cc_components, fuzzy_link, ...) is
  // hash-gated like the main set ---

  def rowsOnlyQueries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.lshTopK(emb.where(col("vec_id") =!= 0), q, 20)
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.ivfTopK(emb.where(col("vec_id") =!= 0), q, 20)
    }),
    // FULL-PROBE twins, hash-gated against the brute-force oracle: with
    // nProbe = centroids (IVF) / one zero-bit table + corpus-wide pairing
    // window (LSH) the approximate machinery — assignment, probing,
    // positional blocking, top-k re-rank — runs end-to-end but must
    // reproduce the exact answer. Proves the ANN plumbing, not just its
    // recall floor (AnnSpec covers that).
    "ann_ivf_full" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.ivfTopK(emb.where(col("vec_id") =!= 0), q, 20,
        centroids = 16, nProbe = 16)
    }),
    "ann_lsh_full" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      val base = emb.where(col("vec_id") =!= 0)
      SimilaritySearch.lshTopKFull(base, q, 20, n = base.count().toInt + 1)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),
    // PORTABLE twins with REAL probing (candidates a strict subset, unlike
    // the full-probe gates): md5-ranked seed centroids / md5-derived
    // hyperplanes, Euclidean argmin with index tie-break — every stage
    // recomputable in plain SQL, so the DuckDB oracle replays centroid
    // choice → inverted lists → probing → exact re-rank (IVF) and plane
    // generation → sign buckets → probe → re-rank (LSH) bit-for-bit.
    // ann_ivf_topk / ann_lsh_topk stay the engine-hash production variants.
    "ann_ivf_portable" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.ivfTopKPortable(emb.where(col("vec_id") =!= 0), q, 20)
    }),
    "ann_lsh_portable" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.lshTopKPortable(emb.where(col("vec_id") =!= 0), q, 20)
    }),
    // product-quantization ANN: 8 blocks x 8 codes from the md5-ranked
    // seed rows; encode argmin, driver ADC table, two-level
    // left-to-right sums — the oracle replays codebook, per-block code
    // assignment, ADC lookup and the block fold bit-for-bit
    "ann_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.pqTopK(emb.where(col("vec_id") =!= 0), q, 20)
    }),
    // IVF-PQ composite (the faiss-default shape): probe 2 of 8
    // portable inverted lists, PQ-score only the candidates with the
    // same md5-ranked codebook — assignment, probing, encode and ADC
    // all replayed by the oracle end to end
    "ann_ivfpq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.ivfPqTopK(emb.where(col("vec_id") =!= 0), q, 20)
    }),
    // int8 scalar quantization MIPS: exact-int64 code dot, one
    // fixed-order float product at the end — oracle replays the
    // quantization and scoring bit-for-bit
    "ann_sq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> cast(x as double))"))
        .collect()(0).getSeq[Double](0).toArray
      SimilaritySearch.sqTopK(emb.where(col("vec_id") =!= 0), q, 20)
    }),
    "minhash_pairs" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Dedup.minhashPairs(t(s, dir, "documents"), threshold = 0.0)
    }),
    // variable-length duplicated-span detection (the exact-substring
    // dedup family): maximal cross-doc word spans >= 10 reconstructed
    // from stride-1 gram hits — oracle replays grams → owners → hit
    // positions → island merge exactly
    "substring_spans" -> ((s, dir) =>
      Dedup.duplicateSpans(t(s, dir, "documents"))
        .orderBy("doc_id", "span_start")),
    // keep-first span REMOVAL over the same spans: docs rewritten with
    // every non-canonical duplicated span dropped, word-position HOF
    // filter replayed by the oracle's nested list lambdas
    "substring_scrub" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(t(s, dir, "documents")).orderBy("doc_id")),
    "simhash_pairs" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 16)
    }),
    // the FULL minhash+LSH machinery (shingle → signature → band key →
    // capped bucket join → signature-agreement verify) in portable
    // mod-2³¹−1 arithmetic, hash-proven end to end by a DuckDB oracle
    // that recomputes every stage; minhash_pairs stays the avalanche-
    // hash production variant (rows-only by construction)
    "minhash_portable" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Dedup.portableMinhashPairs(t(s, dir, "documents")).orderBy("a", "b")
    }),
    // incremental dedup: the delta batch (doc_id % 8 = 7) probes the
    // corpus's capped band-key index — |delta| × bucket-fanout work,
    // never corpus² — and the oracle replays signatures → bands →
    // corpus-side rank cap → agreement count stage for stage
    "delta_pairs" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      Dedup.deltaPairs(
        docs.where(col("doc_id") % 8 =!= 7),
        docs.where(col("doc_id") % 8 === 7))
        .orderBy("delta_id", "corpus_id")
    }),
    // per-delta-doc admission verdict on the same split: dup_corpus
    // beats dup_delta (first-occurrence-keeps within the batch) beats
    // admit; short docs have no signature and admit
    "delta_dedup" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      Dedup.deltaAdmit(
        docs.where(col("doc_id") % 8 =!= 7),
        docs.where(col("doc_id") % 8 === 7))
        .orderBy("doc_id")
    }),
    // the simhash machinery (token hash → bit-majority vote → nibble
    // bands → Hamming verify) with md5-derived 16-bit token hashes —
    // recomputable in any engine, so the DuckDB oracle hash-proves it;
    // simhash_pairs stays the 64-bit avalanche production variant
    "simhash_portable" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Dedup.portableSimhashPairs(t(s, dir, "documents")).orderBy("a", "b")
    }),
    "ngram_jaccard" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      // deterministic exact candidate set (all pairs among doc_id < 200,
      // a < b — fuzzy_link precedent) so the Jaccard arithmetic is
      // oracle-checkable end to end; the hash-dependent minhash candidate
      // variant of the same operator stays in minhash_pairs (rows-only)
      val ids = docs.where(col("doc_id") < 200).select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")), col("a") < col("b"))
      Dedup.ngramJaccard(docs, pairs, n = 3).orderBy("a", "b")
    }),
    "embedding_neardup" -> ((s, dir) =>
      // synthetic embeddings are near-orthogonal; -1 returns all bucketed
      // candidate pairs with their cosine (the op's 0.95 default is for
      // real near-dup corpora)
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), threshold = -1.0)),
    // PORTABLE twin of embedding_neardup: md5-derived hyperplanes →
    // sign buckets → capped anchor pairing → exact cosine, every stage
    // recomputable by the oracle; threshold -1 keeps the full candidate
    // set so the cosine verify arithmetic is hash-checked too
    "embedding_neardup_portable" -> ((s, dir) =>
      Dedup.embeddingNearDupPortable(t(s, dir, "embeddings"), threshold = -1.0)
        .orderBy("a", "b")),
    "fingerprints" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // exploded to scalar (doc_id, fingerprint) rows — the driver's
      // pandas comparer cannot sort array columns
      TextAnalysis.fingerprints(t(s, dir, "documents"))
        .select(col("doc_id"), explode(col("fingerprints")).as("fingerprint"))
        .orderBy("doc_id", "fingerprint")
    }),
    // full decode surface: real PNG decode for images, synthetic-
    // container header parse for audio/video — every output field is
    // independently recomputable, so the whole table is hash-checked
    "multimodal_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeFeatures(Multimodal.syntheticMedia(s, 1000))
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("nFrames").as("n_frames"), round(col("meanLuma"), 6).as("mean_luma"))
        .orderBy("media_id")
    }),
    "multimodal_frame_sample" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.sampleFrames(
        Multimodal.decodeFeatures(Multimodal.syntheticMedia(s, 1000)), step = 30)
        .orderBy("media_id", "frame_index")
    }),
    // REAL image decode (javax.imageio over real PNG bytes): the oracle
    // never sees the images — it recomputes dims + mean luma from the
    // closed-form pixel pattern, so a hash match proves the encoder →
    // bytes → decoder → raster arithmetic round-trips exactly
    "multimodal_image_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeFeatures(Multimodal.syntheticMedia(s, 1000))
        .where(col("kind") === "image")
        .select(col("media_id"), col("width"), col("height"),
          round(col("meanLuma"), 6).as("mean_luma"))
        .orderBy("media_id")
    }),
    // REAL audio decode (javax.sound.sampled over real WAV/PCM bytes):
    // the oracle never hears the audio — it recomputes rate, sample
    // count and |amplitude| sum from the closed-form sample formula, so
    // a hash match proves encoder → RIFF bytes → decoder → sample
    // arithmetic round-trips exactly; every output is an exact integer
    "multimodal_audio_decode" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.decodeAudioFeatures(Multimodal.syntheticMedia(s, 1000))
        .orderBy("media_id")
    }),
    // perceptual image near-dup: dHash over REAL decoded PNG rasters
    // (9×8 integer block grid, cross-multiplied brightness compares) +
    // exact-fingerprint canonicalization; the oracle recomputes grid,
    // bits and keeper from the synthetic pixel formula without ever
    // seeing an image — a hash match proves encoder → PNG bytes →
    // decoder → grid/compare/canon arithmetic end to end
    "image_dhash" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.imageDhash(Multimodal.syntheticMedia(s, 1000))
        .orderBy("media_id")
    }),
    // Hamming-ball (≤6 of 64 bits) image near-dup over the same dHash:
    // 4×16-bit bands → capped equi-join buckets → exact popcount. The
    // oracle replays fingerprint → banding → rank cap → popcount from
    // the pixel formula, so the hash gate covers the full candidate
    // machinery including the hot-bucket anchor rule
    "image_neardup" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      Multimodal.imageNearDup(Multimodal.syntheticMedia(s, 1000))
        .orderBy("a", "b")
    }),
    "fuzzy_link" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      // mentions = misspelled component names planted deterministically
      // (doc_id < 200, not limit(200): the oracle must select the same rows)
      val entities = graft.core.Ontology.entries
        .map(e => (e.visCode, e.name)).toDF("entity_id", "name")
      val mentions = t(s, dir, "documents")
        .where(col("doc_id") < 200)
        .select(col("doc_id").as("mention_id"),
          lit("propeler arangement").as("text"))
      graft.link.FuzzyLinker.link(mentions, entities)
        .select(col("mention_id").cast("long").as("mention_id"), col("entity_id"),
          round(col("score"), 6).as("score"), col("method"))
        .orderBy("mention_id")
    }),
    "kg_similar_edges" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.canon.SimilarityPipeline.similarTriples(
        docFrames(s, dir), docLabels, exact = false)
    }),
    "kg_clusters" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // exact eps-join path: small per-repo groups (grid cells need
      // dense populations); web-scale grid variant runs in the bench
      graft.canon.SimilarityPipeline.clusterTriples(
        docFrames(s, dir), exact = true)._1
    }),
    "kg_mosaics" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // homography stringified: array columns crash the driver comparer
      graft.materialize.Mosaics.build(docFrames(s, dir), docLabels)._1
        .select(col("subj"), col("pred"), col("obj"),
          array_join(transform(col("homography"), _.cast("string")), ",")
            .as("homography"))
    }),
    "cc_components" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val edges = SimilaritySearch.neighborGraph(
        t(s, dir, "embeddings"), k = 3, exact = true)
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      graft.canon.ConnectedComponents.run(edges)
    }),
    // stateful streaming operator (flatMapGroupsWithState): exact dedup,
    // first-seen-wins keyed state; single-file source → one micro-batch,
    // so first-seen == global min doc_id == the batch/DuckDB oracle
    "streaming_dedup" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import org.apache.spark.sql.streaming.Trigger
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup_q").toString
      docs.coalesce(1).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(docs.schema).parquet(tmp)
      timedStream("streaming_dedup") {
        graft.streaming.StreamingIngest.dedupStream(stream)
          .writeStream.outputMode("append").format("memory")
          .queryName("graft_sdedup_q").trigger(Trigger.AvailableNow()).start()
      }
      s.sql("SELECT doc_id, hash FROM graft_sdedup_q ORDER BY doc_id")
    }),

    "streaming_sessions" -> ((s, dir) => {
      // Structured Streaming surface, driven synchronously: session_window
      // over the event stream, complete mode, memory sink
      import org.apache.spark.sql.streaming.Trigger
      val batch = t(s, dir, "events")
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_q").toString
      batch.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(batch.schema).parquet(tmp)
      timedStream("streaming_sessions") {
        graft.streaming.StreamingIngest.sessionCounts(stream, gap = "30 minutes")
          .writeStream.outputMode("complete").format("memory")
          .queryName("graft_sessions_q").trigger(Trigger.AvailableNow()).start()
      }
      s.sql("SELECT user_id, count(*) AS n_sessions FROM graft_sessions_q " +
        "GROUP BY 1 ORDER BY 1")
    }),
    // streaming LSH near-dup candidates (first-seen bucket anchors in
    // keyed state); single-batch source → pair set == batch
    // minhashCandidates(maxBucket = 1), proven by StreamingSpec.
    // Rows-only here: bucket keys are engine-internal hashes (the exact
    // Jaccard arithmetic is hash-proven separately by ngram_jaccard)
    "streaming_neardup" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import org.apache.spark.sql.streaming.Trigger
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_sneardup_q").toString
      docs.coalesce(1).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(docs.schema).parquet(tmp)
      timedStream("streaming_neardup") {
        graft.streaming.StreamingIngest.neardupStream(stream)
          .writeStream.outputMode("append").format("memory")
          .queryName("graft_sneardup_q").trigger(Trigger.AvailableNow()).start()
      }
      s.sql("SELECT DISTINCT a, b FROM graft_sneardup_q ORDER BY a, b")
    }),
    // the portable streaming twin: keyed-state LSH anchors over PORTABLE
    // band keys, so the DuckDB oracle replays banding + first-seen
    // (min-id) anchors and the STREAMING near-dup machinery itself is
    // hash-proven (streaming_neardup stays the avalanche production path)
    "streaming_neardup_portable" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import org.apache.spark.sql.streaming.Trigger
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_sneardup_p_q").toString
      docs.coalesce(1).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(docs.schema).parquet(tmp)
      timedStream("streaming_neardup_portable") {
        graft.streaming.StreamingIngest.neardupStreamPortable(stream)
          .writeStream.outputMode("append").format("memory")
          .queryName("graft_sneardup_p_q").trigger(Trigger.AvailableNow()).start()
      }
      s.sql("SELECT DISTINCT a, b FROM graft_sneardup_p_q ORDER BY a, b")
    }),
    // the web-scale grid-DBSCAN path (ε-cell bucketing + contracted CC
    // over the CELL graph) timed in the sweep next to the exact entries
    // (kg_clusters, q26_dbscan), so the plan that runs at 100× is the
    // one being benched per round. Emits the full assignment (noise
    // included) — rows-only by design: grid semantics approximate the
    // exact ε-join, whose full semantics q26_dbscan hash-proves
    "kg_clusters_grid" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.canon.Dbscan.clusterApprox(
        graft.canon.SimilarityPipeline.standardize(
          graft.canon.SimilarityPipeline.telemetryFeatures(docFrames(s, dir)),
          graft.canon.SimilarityPipeline.TeleDims),
        eps = 2.0, minPts = 5, maxDegree = 16)
        .orderBy("id")
    }),
    "curation_pipeline" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.ops.CurationPipeline.run(t(s, dir, "documents"),
        graft.ops.CurationPipeline.Config(minQuality = 0.1, tokenBudget = 20000L))
    }),
    // exact-stage curation twin (no minhash stage): every stage is plain
    // SQL, so the composite's stage WIRING is hash-proven by the driver
    // gate; curation_pipeline above stays the rows-only full variant
    "curation_exact" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.ops.CurationPipeline.runExact(t(s, dir, "documents"),
        graft.ops.CurationPipeline.Config(minQuality = 0.1, tokenBudget = 20000L))
        .select(col("doc_id"), col("lang"), col("tokens"), col("quality"))
        .orderBy("doc_id")
    }),
    // the FULL five-stage curation composite with the near-dup stage on
    // portable minhash — the one stage that kept curation_pipeline
    // rows-only is now recomputed by the oracle too (candidates, bands,
    // caps and all), so the whole composite is hash-proven
    "curation_portable" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.ops.CurationPipeline.runPortable(t(s, dir, "documents"),
        graft.ops.CurationPipeline.Config(minQuality = 0.1, tokenBudget = 20000L))
        .select(col("doc_id"), col("lang"), col("tokens"), col("quality"))
        .orderBy("doc_id")
    }),
    // benchmark decontamination: distinct 8-grams vs a broadcast
    // benchmark set (docs ≡ 0 mod 97 stand in for an eval suite)
    "decontaminate" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.contamination(
        docs, docs.where(col("doc_id") % 97 === 0), n = 8)
        .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
          round(col("ratio"), 6).as("ratio"))
        .orderBy("doc_id")
    }),
    // PII scrubbing over deterministically planted emails/phones (the
    // synthetic corpus has none — the planting is the test harness, the
    // operator is generic)
    "pii_scrub" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val planted = t(s, dir, "documents")
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com soon")))
          .otherwise(col("text")))
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" call 555-867-5309 today")))
          .otherwise(col("text")))
      TextAnalysis.piiScrub(planted).orderBy("doc_id")
    }),
    // Gopher-style intra-doc repetition signals (dup-word fraction,
    // top-2-gram coverage, duplicated-5-gram occurrence fraction) —
    // exact arithmetic, value-checked against the DuckDB mirror
    "repetition_stats" -> ((s, dir) =>
      graft.ops.Repetition.repetitionStats(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // TextRank keyword extraction: integer PageRank composed over the
    // adjacent-token co-occurrence graph (string vertex ids), top-10
    // by (rank desc, word) — every iteration oracle-unrolled
    "textrank_words" -> ((s, dir) =>
      TextAnalysis.textRank(t(s, dir, "documents"))),
    // per-doc unigram entropy in exact milli-bits/token (interpolated
    // floor-log2, order-free integer sums) — the low-entropy
    // spam/template filter next to q22's surface-quality ratios
    "entropy_score" -> ((s, dir) =>
      TextAnalysis.entropyScore(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // CCNet-style corpus-level segment dedup: 10-word segments, first
    // occurrence by (doc_id, pos) keeps, later identical segments are
    // duplicates
    "segment_dedup" -> ((s, dir) =>
      graft.ops.Repetition.segmentDedup(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // cross-source duplicate-overlap matrix: shared 10-word segments per
    // source pair + integer-permille Jaccard (provenance audit before
    // source mixing); only pairs sharing >= 1 segment appear
    "source_overlap" -> ((s, dir) =>
      graft.ops.Repetition.sourceOverlap(t(s, dir, "documents"))),
    // dedup growth curve: cumulative total vs first-occurrence segments
    // per 50-doc batch — the diminishing-returns curve of new content
    "dedup_growth" -> ((s, dir) =>
      graft.ops.Repetition.dedupGrowth(t(s, dir, "documents"))),
    // inverted-index build: (term, doc_id, tf, df) postings, the batch
    // index-construction job behind bm25_topk's serving path
    "inverted_index" -> ((s, dir) =>
      graft.ops.Retrieval.invertedIndex(t(s, dir, "documents"))
        .orderBy("term", "doc_id")),
    // near-dup canonicalization end-step: CC over exact verified pairs
    // (3-gram Jaccard >= 0.1 among all doc_id < 200 pairs — the same
    // deterministic candidate recipe as ngram_jaccard/fuzzy_link), one
    // keeper per duplicate cluster; the production path feeds
    // minhashPairs-verified candidates into the same canonicalize()
    "neardup_canon" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val docs = t(s, dir, "documents").where(col("doc_id") < 200)
      val ids = docs.select(col("doc_id"))
      val allPairs = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")), col("a") < col("b"))
      val pairs = graft.ops.Dedup.ngramJaccard(docs, allPairs, n = 3)
        .where(col("jaccard") >= 0.1)
      graft.ops.Dedup.canonicalize(docs, pairs).orderBy("doc_id")
    }),
    // DoReMi-style domain reweighting: portable md5 keep-bucket per
    // source, broadcast weights join — sources outside the mixture drop
    "source_sample" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.ops.Mixing.sourceSample(t(s, dir, "documents"),
        Map("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1))
        .orderBy("doc_id")
    }),
    // temperature-scaled (α = ½) source sampling: per-source quota
    // budget·⌊√n⌋ div Σ⌊√n⌋, filled in the portable (md5(text), doc_id)
    // order — the multilingual tail-up-weighting classic, admitted set
    // replayed exactly by the oracle (OracleMarginSpec audits ⌊√n⌋)
    "temperature_mix" -> ((s, dir) =>
      graft.ops.Mixing.temperatureSample(t(s, dir, "documents"), budget = 200L)
        .orderBy("doc_id")),
    // data-constrained epoch mixing: budget 900 pushes every sf0.01
    // source's quota past its 25 docs (quota 45 → one full epoch +
    // 20-doc hash-order top-up), so n_copies ∈ {1, 2} is exercised;
    // Σ n_copies per source = quota exactly
    "epoch_mix" -> ((s, dir) =>
      graft.ops.Mixing.epochSample(t(s, dir, "documents"), budget = 900L)
        .orderBy("doc_id")),
    // token-budget shard packing via the two-phase distributed prefix
    // sum (bucketWidth 64 at test scale so the bucket-offset path is
    // actually exercised across ~8 buckets)
    "shard_pack" -> ((s, dir) =>
      graft.ops.Mixing.shardPack(t(s, dir, "documents"),
        shardTokens = 2000L, bucketWidth = 64L)
        .orderBy("doc_id")),
    // corpus-level rarity: mean fixed-point inverse document frequency
    "idf_score" -> ((s, dir) =>
      graft.ops.Mixing.idfScore(t(s, dir, "documents")).orderBy("doc_id")),
    // content-keyed train/val/test split: exact duplicates cannot
    // straddle the eval boundary by construction (portable md5 bucket)
    "dataset_split" -> ((s, dir) =>
      graft.ops.Mixing.datasetSplit(t(s, dir, "documents")).orderBy("doc_id")),
    // tokenizer vocabulary: top-k words, deterministic tie-break;
    // k=20 against the 31-word synthetic vocab so the selection
    // boundary (count ties broken by word) is actually exercised
    "vocab_topk" -> ((s, dir) =>
      TextAnalysis.vocabTopK(t(s, dir, "documents"), k = 20)),
    // fastText/GPT-3-style NB quality classifier: per-class word
    // likelihoods fit on the md5-content train slice, label = curated
    // source set, every doc scored by integer milli log-likelihood
    // ratio + class prior — no transcendental reaches a value
    "nb_quality" -> ((s, dir) =>
      graft.ops.Selection.nbQualityScore(t(s, dir, "documents"),
        positiveSources = Seq("src0", "src1", "src2", "src3", "src4"))
        .orderBy("doc_id")),
    // DSIR hashed-bigram importance weights toward a target source
    // set — 64 buckets at fixture scale so bucket collisions (the
    // hashing approximation being gated) actually occur
    "dsir_weights" -> ((s, dir) =>
      graft.ops.Selection.dsirWeights(t(s, dir, "documents"),
        targetSources = Seq("src0", "src1", "src2"), buckets = 64L)
        .orderBy("doc_id")),
    // fixed-length training-sequence packing: 128-token sequences over
    // ~60-word docs, so most sequences contain a doc boundary and many
    // docs span two sequences — the segment-map rows a trainer masks on
    "seq_pack" -> ((s, dir) =>
      graft.ops.Mixing.packSequences(t(s, dir, "documents"),
        seqTokens = 128L, bucketWidth = 64L)
        .orderBy("seq_id", "doc_id")),
    // deterministic global corpus shuffle: seed-keyed md5 order with
    // the dense training position materialized by the two-phase rank
    // (256-bucket range offsets, never a corpus-wide window)
    "corpus_shuffle" -> ((s, dir) =>
      graft.ops.Mixing.shuffleOrder(t(s, dir, "documents"), seed = 7L)
        .orderBy("doc_id")),
    // HyperLogLog distinct-content sketch: the 64-row register table
    // (the mergeable state itself — shards combine by elementwise max)
    "hll_registers" -> ((s, dir) =>
      graft.ops.Sketches.hllRegisters(t(s, dir, "documents"), col("text"))
        .orderBy("register")),
    // ... and the raw integer estimator over it: one row, approximate
    // count(distinct text) without shuffling the corpus (the fixture's
    // ~366 distinct contents sit in the raw-estimator regime n > 2.5m)
    "hll_distinct" -> ((s, dir) =>
      graft.ops.Sketches.hllDistinct(t(s, dir, "documents"), col("text"))),
    // Count-Min frequency sketch: every word estimated from the 4×512
    // counter grid; est ≥ true by construction, the gap = collision
    // mass (the fixture vocab is small but the grid is salted-md5, so
    // specific collisions are deterministic and the oracle replays them)
    "cms_estimate" -> ((s, dir) =>
      graft.ops.Sketches.cmsEstimate(t(s, dir, "documents"))
        .orderBy("word")),
    // fixed-point PageRank over the exact kNN similarity graph (k=5
    // within label groups, same edges as knn_graph): 5 integer
    // iterations, damping 85/100 — graph centrality as a curation
    // signal, every iteration replayed by the oracle
    "pagerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.pageRank(nodes, edges)
        .select(col("id").as("vec_id"), col("rank_fp"))
        .orderBy("vec_id")
    }),
    // personalized PageRank from the vec_id % 97 seed set (bfs_dist's
    // anchors): teleport mass restarts at the seeds only, rank decays
    // with graph distance — seed-expansion as a curation signal, all 5
    // integer iterations oracle-unrolled
    "ppr_scores" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.personalizedPageRank(nodes, edges,
          nodes.where(col("id") % 97 === 0))
        .select(col("id").as("vec_id"), col("ppr_fp"))
        .orderBy("vec_id")
    }),
    // GraphSAGE-style one-hop neighbor MEAN aggregation over the
    // symmetrized kNN graph: micro-unit quantized coordinates
    // (floor(x·1e6+0.5) — pure IEEE arithmetic, identical both
    // engines), order-free integer sums, one truncating division
    "neighbor_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val feats = emb.select(col("vec_id").cast("long").as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"))
      graft.ops.GraphRank.neighborMean(feats, edges)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "dim")
    }),
    // HITS hubs & authorities on the directed kNN graph: 4 rounds of
    // the UNNORMALIZED integer mutual recursion (pure order-free int64
    // sums, no division) — bit-exact, every round oracle-unrolled
    "hits_scores" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.hits(nodes, edges)
        .select(col("id").as("vec_id"), col("hub_score"), col("auth_score"))
        .orderBy("vec_id")
    }),
    // per-vertex triangle counts on the symmetrized kNN graph — the
    // a<b<c oriented two-join enumeration, each triangle exactly once
    "knn_triangles" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.triangleCounts(nodes, edges)
        .select(col("id").as("vec_id"), col("n_triangles"))
        .orderBy("vec_id")
    }),
    // Bloom-filter decontamination: same benchmark slice + 8-grams as
    // `decontaminate`, membership via the 8192-bit/4-salt filter —
    // bloom_hits ≥ n_contaminated always (no false negatives)
    "bloom_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ops.Decontaminate.bloomContamination(
        docs, docs.where(col("doc_id") % 97 === 0), n = 8)
        .orderBy("doc_id")
    }),
    // bottom-k content sample: deterministic mergeable uniform sample,
    // k smallest (md5-32bit, doc_id) — map-side top-k, no shuffle
    "bottomk_sample" -> ((s, dir) =>
      graft.ops.Sketches.bottomK(t(s, dir, "documents"), col("text"), k = 100)),
    // ... and the KMV distinct estimator off the k-th smallest
    // DISTINCT hash: est = (k−1)·2^32 div h_k, one row, all int64
    "bottomk_distinct" -> ((s, dir) =>
      graft.ops.Sketches.bottomKDistinct(t(s, dir, "documents"), col("text"), k = 64)),
    // exact set-similarity join via prefix filtering (PPJoin family):
    // ALL pairs with word-set Jaccard ≥ 0.8 in integer milli output;
    // the oracle is the brute-force all-pairs ground truth, so the
    // gate proves the prefix filter loses nothing. Bounded to the
    // deterministic doc_id < 1000 slice (= the whole sf0.01 gate
    // fixture): the synthetic 31-word vocabulary is the prefix
    // filter's adversarial worst case — every token is common, so
    // candidates degrade toward all-pairs regardless of algorithm
    // (SetJoinSpec proves real pruning on a realistic-vocab corpus)
    "ppjoin_pairs" -> ((s, dir) =>
      graft.ops.SetJoin.ppJoin(
        t(s, dir, "documents").where(col("doc_id") < 1000), tauMilli = 800L)
        .orderBy("a", "b")),
    // deterministic synchronous label propagation over the kNN graph:
    // 4 rounds, most-frequent neighbor label, smallest-label ties —
    // every round replayed by the oracle
    "label_prop" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.labelPropagation(nodes, edges)
        .select(col("id").as("vec_id"), col("label").as("community"))
        .orderBy("vec_id")
    }),
    // CCNet-style LM quality scoring: add-one bigram model on the
    // md5-content train slice, every doc scored by INTEGER quantized
    // surprisal (floor-log2 via unpadded bin() — no transcendental
    // reaches a value, so the oracle replays fit + scoring bit-exactly)
    "lm_perplexity" -> ((s, dir) =>
      graft.ops.LanguageModel.perplexityScore(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // quantized-integer BM25 keyword retrieval: "dup" is the corpus's
    // one rare term (df 25/500 — exercises the floor-log2 idf AND its
    // linear-interpolation milli fraction); the common terms clamp to
    // idf 0 exactly where Lucene clamps (df > N/2), so the zero branch
    // is exercised too
    "bm25_topk" -> ((s, dir) =>
      graft.ops.Retrieval.bm25TopK(t(s, dir, "documents"),
        Seq("dup", "key", "merge", "vector"), k = 15)),
    // CCNet head/middle/tail per source on the integer bpb rank — the
    // tier boundary is 1000*rank <= permille*count, never a float
    "lm_tiers" -> ((s, dir) =>
      graft.ops.LanguageModel.perplexityTiers(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // overlapping word-window chunking (window 16, stride 12 against
    // ~60-word docs so multi-chunk overlap + truncated tails both occur)
    "chunk_docs" -> ((s, dir) =>
      TextAnalysis.chunk(t(s, dir, "documents"), window = 16, stride = 12)
        .orderBy("doc_id", "chunk_id")),
    // classic BPE merge learning on the corpus word-count table:
    // 8 iterated (count desc, pair asc) argmax merges — the oracle
    // replays every iteration via code-generated chained CTEs
    "bpe_merges" -> ((s, dir) =>
      graft.ops.BpeTrainer.learnMerges(t(s, dir, "documents"), merges = 8)),
    // end-to-end subword tokenization with the learned merges: per-doc
    // subword counts after applying all 8 merges in rank order
    "bpe_tokenize" -> ((s, dir) => {
      val ms = graft.ops.BpeTrainer.learnMerges(t(s, dir, "documents"), merges = 8)
        .orderBy("merge_rank").collect().map(_.getString(1)).toSeq
      graft.ops.BpeTrainer.tokenizeCount(t(s, dir, "documents"), ms)
        .orderBy("doc_id")
    }),
    "pca_reduce" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      // deterministic PCA twin (sign-canonicalized, integer-sum fit) —
      // (id, dim, value) rows, hash-checkable against the DuckDB mirror
      // of the same arithmetic; Reduce.pca stays the MLlib variant
      graft.canon.Reduce.pcaDet(
        t(s, dir, "embeddings").select(col("vec_id").cast("string").as("id"),
          col("label").cast("long").as("group"),
          expr("transform(embedding, x -> cast(x as double))").as("vec")), 8)
        .select(col("id"), posexplode(col("vec")).as(Seq("dim", "value")))
        .select(col("id"), col("dim"), round(col("value"), 6).as("value"))
        .orderBy("id", "dim")
    }),

    // --- round 5: temporal joins, semantic dedup, graph link
    //     prediction, PMI collocations, stratified sampling,
    //     semi-structured extraction ---

    // distributed AS-OF join (telemetry-to-frame alignment shape):
    // every click gains the latest view of the same user at ts <= its
    // own — union-tag + ONE keyed window + running last(ignoreNulls),
    // no range join; the oracle replays the identical
    // (ts, side, event_id) total order
    "asof_join" -> ((s, dir) =>
      graft.ops.Temporal.asofJoin(t(s, dir, "events"))
        .orderBy("event_id")),
    // trailing 10-minute RANGE-frame rolling count/cents-sum per user —
    // value-based frames are peer-order-free, so ties at equal ts are
    // frame-complete on both engines
    "range_rolling" -> ((s, dir) =>
      graft.ops.Temporal.rollingRange(t(s, dir, "events"))
        .orderBy("event_id")),
    // bucketized interval-overlap join: (view, click) pairs of the same
    // user whose 6-hour intervals overlap. The oracle runs the NAIVE
    // overlap join, so a hash match proves the engine's bucket-explode →
    // equi-join → first-shared-bucket machinery against the plain
    // semantics, not against a replay of itself
    "interval_join" -> ((s, dir) =>
      graft.ops.Temporal.intervalJoin(t(s, dir, "events"))
        .orderBy("l_event_id", "r_event_id")),
    // ledger time-travel: events become an add/del triple change ledger
    // (any engagement asserts (user, ENGAGED_WITH, item-k); an 'error'
    // retracts it), snapshotted at the corpus-midpoint timestamp. The
    // scalar min/max fetch is a bounded one-row collect (established
    // convention); the snapshot itself is one keyed window
    "triple_snapshot" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val ledger = ev.select(
        concat(lit("u"), col("user_id")).as("subj"),
        lit("ENGAGED_WITH").as("pred"),
        concat(lit("k"), get_json_object(col("props"), "$.k")).as("obj"),
        when(col("event_type") === "error", lit("del"))
          .otherwise(lit("add")).as("op"),
        col("ts_us"), col("event_id"))
      val r = ev.agg(min("ts_us"), max("ts_us")).head()
      graft.materialize.Upsert.asOfSnapshot(ledger, (r.getLong(0) + r.getLong(1)) / 2)
        .orderBy("subj", "obj")
    }),
    // ledger snapshot DIFF between the 25% and 75% timestamps: every
    // triple whose liveness changed, tagged added/removed — the
    // change-audit consumers sync on instead of re-reading the graph
    "triple_diff" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val ledger = ev.select(
        concat(lit("u"), col("user_id")).as("subj"),
        lit("ENGAGED_WITH").as("pred"),
        concat(lit("k"), get_json_object(col("props"), "$.k")).as("obj"),
        when(col("event_type") === "error", lit("del"))
          .otherwise(lit("add")).as("op"),
        col("ts_us"), col("event_id"))
      val r = ev.agg(min("ts_us"), max("ts_us")).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      graft.materialize.Upsert.snapshotDiff(ledger,
          lo + (hi - lo) / 4, lo + 3L * (hi - lo) / 4)
        .orderBy("subj", "pred", "obj", "change")
    }),
    // SemDeDup-style semantic dedup: portable md5-ranked centroids →
    // Euclidean argmin clusters → within-cluster rank<=64 anchor pairs →
    // cosine >= tau drops the later vector; the oracle replays centroid
    // choice, assignment, anchor pairing and the smallest-anchor argmin.
    // tau = 0.40 sits where this fixture's diffuse embedding space has
    // duplicates to find (max within-cluster cosine 0.474; a real
    // embedding corpus runs the production 0.95+) — OracleMarginSpec
    // audits the tau and round-6 margins
    "semantic_dedup" -> ((s, dir) =>
      graft.ops.Dedup.semanticDedup(t(s, dir, "embeddings"), tau = 0.40)
        .orderBy("vec_id")),
    // fully DISTRIBUTED fixed-point Lloyd k-means (every vector in every
    // round — the "model is the output" fit, vs fitCentroids' bounded
    // sample): md5-ranked seeds, integer-argmin assignment, order-free
    // int64 centroid update; the oracle unrolls all 3 Lloyd rounds
    "kmeans_assign" -> ((s, dir) =>
      graft.ops.KMeans.assign(t(s, dir, "embeddings")).orderBy("vec_id")),
    "kmeans_centroids" -> ((s, dir) =>
      graft.ops.KMeans.centroidTable(s, t(s, dir, "embeddings"))
        .orderBy("cluster", "dim")),
    // DeepWalk-style random-walk corpus over the exact kNN graph:
    // per hop one frontier⋈edges equi-join + a min_by partial agg on
    // the md5-derandomized choice key; the oracle unrolls all 4 hops
    "walk_corpus" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.randomWalks(nodes, edges, steps = 4)
        .orderBy("walk_id", "step")
    }),
    // contrastive hard-negative mining: per anchor the top-5 most-
    // similar CROSS-label vectors from its portable hyperplane bucket
    // (rank-capped candidate side — linear, never all-pairs)
    "hard_negatives" -> ((s, dir) =>
      graft.ops.Contrastive.hardNegatives(t(s, dir, "embeddings"))
        .orderBy("vec_id", "rank")),
    // multi-pass sorted-neighborhood blocking (prefix + reversed-suffix
    // keys), explode-probe successor pairing, exact integer word-3-gram
    // Jaccard verify — the classic ER family next to the hash ones
    "snm_pairs" -> ((s, dir) =>
      graft.ops.Dedup.sortedNeighborhoodPairs(t(s, dir, "documents"))
        .orderBy("a", "b")),
    // greedy facility-location (max-coverage) selection: 8 exact greedy
    // rounds, argmax marginal distinct-3-gram gain, doc_id tie-break;
    // the oracle unrolls every round as chained CTEs
    "coverage_select" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      graft.ops.Selection.greedyCoverageSelect(t(s, dir, "documents"))
        .orderBy("round")
    }),
    // signed feature hashing (hashing-trick vectorizer) + exact integer
    // sparse-dot retrieval: broadcast query vector, bucket-keyed
    // multiply, partial-agg per-doc sum, TakeOrdered cut — no floats
    "hashtf_topk" -> ((s, dir) =>
      graft.ops.Retrieval.hashedTfTopK(t(s, dir, "documents"))),
    // Adamic-Adar link prediction over the exact kNN graph: top-50
    // non-adjacent pairs by integer-micro sum of 1/log2(deg) over
    // common neighbors — wedge join + anti-join + partial agg, every
    // weight the interpolated floor-log2 recipe the oracle replays
    "link_predict" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.adamicAdar(nodes, edges, k = 50)
    }),
    // top-50 positive-PMI collocations within the df-top-100 vocab:
    // presence counts, exact int64 milli-log2 scores, quadratic work
    // bounded by the broadcast vocabulary
    "pmi_pairs" -> ((s, dir) =>
      TextAnalysis.pmiPairs(t(s, dir, "documents"))),
    // deterministic stratified sample: EXACT ceil(n*0.2) docs per
    // source by (md5-bucket, doc_id) rank — the equal-allocation
    // complement to source_sample's in-expectation hash thresholding
    "stratified_sample" -> ((s, dir) =>
      graft.ops.Selection.stratifiedSample(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // k-core onion peel over the kNN graph: synchronous
    // Batagelj-Zaveršnik rounds at k=6 — layer = the round a vertex
    // fell out (1..4), 0 = survives; this fixture peels 207/250/43
    // across three rounds to an empty core, every round oracle-unrolled
    "kcore" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.kCorePeel(nodes, edges, k = 6, rounds = 4)
        .select(col("id").as("vec_id"), col("layer"))
        .orderBy("vec_id")
    }),
    // strict first-touch conversion funnel view→click→purchase within
    // 30-minute hops: two chained forward first(ignoreNulls) windows
    // over one (ts, step, event_id) total order — one shuffle, both
    // engines replay the identical attribution
    "funnel_counts" -> ((s, dir) =>
      graft.ops.Temporal.funnelCounts(t(s, dir, "events"))
        .orderBy("user_id")),
    // mergeable equi-width histogram quantiles (the deterministic
    // fixed-memory quantile sketch): per-lang p50/p90/p99 as bin lower
    // edges, ceil-threshold rank arithmetic in exact int64
    "hist_quantiles" -> ((s, dir) =>
      graft.ops.Sketches.histQuantiles(t(s, dir, "documents"))
        .orderBy("lang")),
    // Johnson-Lindenstrauss random projection onto 8 portable
    // md5-derived directions ('rp_' plane namespace) — map-only, no
    // fit; the oracle regenerates the planes and replays every inner
    // product (pca_reduce's exploded output shape)
    "rp_reduce" -> ((s, dir) =>
      SimilaritySearch.rpReduce(t(s, dir, "embeddings"))
        .orderBy("vec_id", "dim")),
    // multi-source BFS layers from the vec_id % 97 seed set over the
    // kNN graph: dist = first-reach round (0 seeds, -1 unreached at 4
    // rounds — label blocking keeps distant groups unreached), every
    // frontier expansion oracle-unrolled
    "bfs_dist" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.bfsLayers(nodes, edges,
          nodes.where(col("id") % 97 === 0), rounds = 4)
        .select(col("id").as("vec_id"), col("dist"))
        .orderBy("vec_id")
    }),
    // weighted shortest path over the kNN graph: portable integer edge
    // weights from the unordered endpoint pair, 4 Bellman-Ford sweeps —
    // exact ≤-4-hop distances, every relaxation replayed by the oracle
    "sssp_dist" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val edges = SimilaritySearch.neighborGraph(emb, k = 5, exact = true)
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .withColumn("w", lit(1L) + pmod(
          least(col("src"), col("dst")) * 31 +
            greatest(col("src"), col("dst")) * 17, lit(97L)))
      val nodes = emb.select(col("vec_id").cast("long").as("id"))
      graft.ops.GraphRank.ssspRounds(nodes, edges,
          nodes.where(col("id") % 97 === 0), rounds = 4)
        .select(col("id").as("vec_id"), col("dist"))
        .orderBy("vec_id")
    }),
    // per-source KL divergence from the corpus token mix, exact
    // token·milli-log2 integers via the signed interpolated floor-log2
    "source_kl" -> ((s, dir) =>
      graft.ops.Mixing.sourceKl(t(s, dir, "documents"))
        .orderBy("source")),
    // semi-structured extraction: the JSON props column parsed and
    // aggregated per event type (get_json_object ↔ json_extract_string)
    // the explicit salted join (hash-of-row salt on the skewed fact,
    // 8x replicated order side, join on (key, salt)) must produce the
    // EXACT plain-join rollup — the oracle runs the unsalted join, so a
    // hash match proves the salting machinery is semantics-neutral
    "salted_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey").as("okey"),
        col("l_extendedprice"), col("l_discount"))
      val ords = t(s, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.ops.SkewJoin.saltedJoin(li, ords, "okey", saltFactor = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * lit(100.0) + lit(0.5)).cast("long")).as("cents"))
        .orderBy("o_orderpriority")
    }),
    "q29_json_props" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),
    // PPS systematic weighted sampling: k grid points over the
    // cumulative weight axis (two-phase distributed prefix sum); the
    // oracle replays every pick count off its own window cumsum
    "weighted_sample" -> ((s, dir) =>
      graft.ops.Mixing.weightedSample(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // Z-order (Morton) layout: per-file min-max file-skipping stats +
    // the pruning verdict of the 2-D benchmark predicate — the oracle
    // replays quantization, bit interleave, file split and verdicts
    "zorder_stats" -> ((s, dir) =>
      graft.ops.Layout.zorderStats(t(s, dir, "events"))
        .orderBy("file_id")),
    // pruning effectiveness at equal file counts, z-order vs insertion
    // order: the 2-D predicate skips most z-ordered files and almost
    // no insertion-ordered ones — the reason to cluster at 100 TB
    "zorder_prune" -> ((s, dir) =>
      graft.ops.Layout.zorderPrune(t(s, dir, "events"))
        .orderBy("layout")),
    // bucketed co-located join (zero exchange / zero sort on the join,
    // LayoutSpec pins the plan) — hash-identical to the oracle's plain
    // join, so the bucketed layout is proven semantics-neutral
    "bucket_join" -> ((s, dir) =>
      graft.ops.Layout.bucketedRollup(s, t(s, dir, "orders"),
        t(s, dir, "customer"), tag = dir.replaceAll("[^A-Za-z0-9]", "_"))),
    // SCD2 dimension history folded from the purchase change stream:
    // no-change touches collapsed, inclusive interval chaining, NULL
    // open end on the current row
    "scd2_history" -> ((s, dir) =>
      graft.ops.Temporal.scd2History(t(s, dir, "events"))
        .orderBy("user_id", "valid_from_us", "cents"))
  )

  /** Shared CTE chain of the HLL oracles: register = first md5 hex byte
    * mod 64, rho = 1 + leading zero bits of the 120-bit suffix read off
    * hex digits (ASCII order: c >= '8' ⇔ top bit set) — ends at `regs`
    * (register, max_rho), the mergeable sketch state.
    */
  private val hllCtes =
    """WITH h AS (SELECT md5(text) AS h FROM documents),
      | rr AS (SELECT cast(concat('0x', substr(h, 1, 2)) as bigint) % 64 AS register,
      |     ltrim(substr(h, 3, 30), '0') AS t FROM h),
      | rho AS (SELECT register, CASE WHEN length(t) = 0 THEN 121
      |     ELSE 4 * (30 - length(t)) +
      |       (CASE WHEN substr(t, 1, 1) >= '8' THEN 0
      |             WHEN substr(t, 1, 1) >= '4' THEN 1
      |             WHEN substr(t, 1, 1) >= '2' THEN 2 ELSE 3 END) + 1 END AS rho
      |   FROM rr),
      | regs AS (SELECT register, cast(max(rho) as bigint) AS max_rho
      |   FROM rho GROUP BY register)""".stripMargin

  /** Shared CTE chain of the kNN-graph oracles (pagerank,
    * knn_triangles): the same exact kNN-within-label edge set
    * knn_graph gates — ends at `ed` (src, dst) and `nodes` (id).
    */
  private val knnEdgeCtes =
    """WITH e AS (SELECT vec_id, label, cast(embedding as double[]) AS v FROM embeddings),
      | p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |     row_number() OVER (PARTITION BY a.vec_id
      |       ORDER BY list_distance(a.v, b.v), cast(b.vec_id as varchar)) AS rn
      |   FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
      | ed AS (SELECT cast(src as bigint) AS src, cast(dst as bigint) AS dst FROM p WHERE rn <= 5),
      | nodes AS (SELECT cast(vec_id as bigint) AS id FROM embeddings)""".stripMargin

  /** pagerank oracle: the shared kNN edge CTE, then every fixed-point
    * iteration unrolled as chained CTEs with identical integer op
    * order — truncating `//` at the same three points (init, per-edge
    * contribution, damped sum) as the engine's `div`s.
    */
  private val pagerankOracleSql: String = {
    val S = 1000000000000L
    val head =
      s"""$knnEdgeCtes,
        | deg AS (SELECT src, cast(count(*) as bigint) AS deg FROM ed GROUP BY src),
        | nn AS (SELECT cast(count(*) as bigint) AS n FROM nodes),
        | r0 AS (SELECT id, $S // n AS r FROM nodes CROSS JOIN nn)""".stripMargin
    val its = (0 until 5).map { k =>
      s""",
        | m$k AS (SELECT ed.dst AS id, cast(sum(rk.r // deg.deg) as bigint) AS s
        |   FROM ed JOIN deg USING (src) JOIN r$k rk ON ed.src = rk.id
        |   GROUP BY ed.dst),
        | r${k + 1} AS (SELECT nodes.id,
        |     (15 * ($S // nn.n)) // 100 + (85 * coalesce(mk.s, 0)) // 100 AS r
        |   FROM nodes CROSS JOIN nn LEFT JOIN m$k mk ON nodes.id = mk.id)""".stripMargin
    }.mkString
    head + its +
      "\n SELECT id AS vec_id, cast(r as bigint) AS rank_fp FROM r5 ORDER BY vec_id"
  }

  /** ppr_scores oracle: pagerank's chained-CTE replay with the restart
    * mass confined to the id % 97 seed set — seeds start at S div |sd|
    * and alone receive the 15% base term each iteration.
    */
  private val pprOracleSql: String = {
    val S = 1000000000000L
    val head =
      s"""$knnEdgeCtes,
        | deg AS (SELECT src, cast(count(*) as bigint) AS deg FROM ed GROUP BY src),
        | sd AS (SELECT id FROM nodes WHERE id % 97 = 0),
        | nn AS (SELECT cast(count(*) as bigint) AS n FROM sd),
        | r0 AS (SELECT nodes.id,
        |     CASE WHEN sd.id IS NOT NULL THEN $S // nn.n ELSE 0 END AS r
        |   FROM nodes CROSS JOIN nn LEFT JOIN sd ON nodes.id = sd.id)""".stripMargin
    val its = (0 until 5).map { k =>
      s""",
        | m$k AS (SELECT ed.dst AS id, cast(sum(rk.r // deg.deg) as bigint) AS s
        |   FROM ed JOIN deg USING (src) JOIN r$k rk ON ed.src = rk.id
        |   GROUP BY ed.dst),
        | r${k + 1} AS (SELECT nodes.id,
        |     CASE WHEN sd.id IS NOT NULL THEN (15 * ($S // nn.n)) // 100 ELSE 0 END
        |       + (85 * coalesce(mk.s, 0)) // 100 AS r
        |   FROM nodes CROSS JOIN nn LEFT JOIN sd ON nodes.id = sd.id
        |   LEFT JOIN m$k mk ON nodes.id = mk.id)""".stripMargin
    }.mkString
    head + its +
      "\n SELECT id AS vec_id, cast(r as bigint) AS ppr_fp FROM r5 ORDER BY vec_id"
  }

  /** textrank_words oracle: rebuilds the adjacent-token co-occurrence
    * graph (least/greatest dedup, symmetrize), then the pagerank
    * iteration chain over STRING ids — identical integer op order.
    */
  private val textrankOracleSql: String = {
    val S = 1000000000000L
    val head =
      s"""WITH tok AS (SELECT string_split(text, ' ') AS w FROM documents),
        | pr AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |     i -> {'a': w[i], 'b': w[i + 1]})) AS s FROM tok),
        | p AS (SELECT DISTINCT least(s.a, s.b) AS x, greatest(s.a, s.b) AS y
        |   FROM pr WHERE s.a <> s.b AND length(s.a) > 0 AND length(s.b) > 0),
        | ed AS (SELECT x AS src, y AS dst FROM p UNION ALL SELECT y, x FROM p),
        | nodes AS (SELECT DISTINCT src AS id FROM ed),
        | deg AS (SELECT src, cast(count(*) as bigint) AS deg FROM ed GROUP BY src),
        | nn AS (SELECT cast(count(*) as bigint) AS n FROM nodes),
        | r0 AS (SELECT id, $S // n AS r FROM nodes CROSS JOIN nn)""".stripMargin
    val its = (0 until 5).map { k =>
      s""",
        | m$k AS (SELECT ed.dst AS id, cast(sum(rk.r // deg.deg) as bigint) AS s
        |   FROM ed JOIN deg USING (src) JOIN r$k rk ON ed.src = rk.id
        |   GROUP BY ed.dst),
        | r${k + 1} AS (SELECT nodes.id,
        |     (15 * ($S // nn.n)) // 100 + (85 * coalesce(mk.s, 0)) // 100 AS r
        |   FROM nodes CROSS JOIN nn LEFT JOIN m$k mk ON nodes.id = mk.id)""".stripMargin
    }.mkString
    head + its +
      """
        | SELECT id AS word, cast(r as bigint) AS rank_fp FROM r5
        | ORDER BY rank_fp DESC, word LIMIT 10""".stripMargin
  }

  /** hits_scores oracle: the shared kNN edge CTE, then every
    * UNNORMALIZED integer round unrolled — aʳ = per-dst sum of hʳ⁻¹,
    * hʳ = per-src sum of aʳ; pure order-free sums, no division, so the
    * replay is bit-exact by construction.
    */
  private val hitsOracleSql: String = {
    val head =
      s"""$knnEdgeCtes,
        | h0 AS (SELECT id, cast(1 as bigint) AS h FROM nodes)""".stripMargin
    val its = (0 until 4).map { k =>
      s""",
        | am$k AS (SELECT ed.dst AS id, cast(sum(hk.h) as bigint) AS s
        |   FROM ed JOIN h$k hk ON ed.src = hk.id GROUP BY ed.dst),
        | a${k + 1} AS (SELECT nodes.id, cast(coalesce(mk.s, 0) as bigint) AS a
        |   FROM nodes LEFT JOIN am$k mk ON nodes.id = mk.id),
        | hm$k AS (SELECT ed.src AS id, cast(sum(ak.a) as bigint) AS s
        |   FROM ed JOIN a${k + 1} ak ON ed.dst = ak.id GROUP BY ed.src),
        | h${k + 1} AS (SELECT nodes.id, cast(coalesce(mk2.s, 0) as bigint) AS h
        |   FROM nodes LEFT JOIN hm$k mk2 ON nodes.id = mk2.id)""".stripMargin
    }.mkString
    head + its +
      """
        | SELECT h4.id AS vec_id, h4.h AS hub_score, a4.a AS auth_score
        | FROM h4 JOIN a4 ON h4.id = a4.id ORDER BY vec_id""".stripMargin
  }

  /** label_prop oracle: the shared kNN edge CTE symmetrized, then all
    * 4 synchronous rounds unrolled — the same (count desc, label asc)
    * argmax via row_number the engine's window uses.
    */
  private val labelPropOracleSql: String = {
    val head =
      s"""$knnEdgeCtes,
        | und AS (SELECT DISTINCT src, dst FROM (
        |     SELECT src, dst FROM ed
        |     UNION ALL SELECT dst AS src, src AS dst FROM ed) u
        |   WHERE src <> dst),
        | l0 AS (SELECT id, id AS label FROM nodes)""".stripMargin
    val its = (0 until 4).map { k =>
      s""",
        | c$k AS (SELECT und.dst AS id, lk.label, count(*) AS c
        |   FROM und JOIN l$k lk ON und.src = lk.id GROUP BY und.dst, lk.label),
        | w$k AS (SELECT id, label,
        |     row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn FROM c$k),
        | l${k + 1} AS (SELECT nodes.id, coalesce(wk.label, nodes.id) AS label
        |   FROM nodes LEFT JOIN (SELECT id, label FROM w$k WHERE rn = 1) wk
        |   ON nodes.id = wk.id)""".stripMargin
    }.mkString
    head + its +
      "\n SELECT id AS vec_id, cast(label as bigint) AS community FROM l4 ORDER BY vec_id"
  }

  /** kcore oracle: the shared kNN edge CTE symmetrized, then every
    * peel round unrolled — alive-vertex degrees via LEFT JOIN (isolated
    * survivors count 0), drop at < k with the round as the layer.
    */
  private val kcoreOracleSql: String = {
    val K = 6; val R = 4
    val head =
      s"""$knnEdgeCtes,
        | u0 AS (SELECT DISTINCT src, dst FROM (
        |     SELECT src, dst FROM ed
        |     UNION ALL SELECT dst AS src, src AS dst FROM ed) x
        |   WHERE src <> dst),
        | v0 AS (SELECT id FROM nodes)""".stripMargin
    val its = (1 to R).map { r =>
      s""",
        | d$r AS (SELECT v.id, coalesce(c.d, 0) AS d FROM v${r - 1} v
        |   LEFT JOIN (SELECT dst AS id, cast(count(*) as bigint) AS d
        |     FROM u${r - 1} GROUP BY dst) c USING (id)),
        | drop$r AS (SELECT id, $r AS layer FROM d$r WHERE d < $K),
        | v$r AS (SELECT id FROM d$r WHERE d >= $K),
        | u$r AS (SELECT src, dst FROM u${r - 1}
        |   WHERE src IN (SELECT id FROM v$r) AND dst IN (SELECT id FROM v$r))""".stripMargin
    }.mkString
    head + its +
      s"""
        | SELECT id AS vec_id, cast(layer as bigint) AS layer FROM (
        |   ${(1 to R).map(r => s"SELECT id, layer FROM drop$r").mkString(" UNION ALL ")}
        |   UNION ALL SELECT id, 0 AS layer FROM v$R)
        | ORDER BY vec_id""".stripMargin
  }

  /** bfs_dist oracle: the shared kNN edge CTE symmetrized, seeds at
    * vec_id % 97 = 0, then every frontier round unrolled (reach = join
    * on the previous frontier, minus everything already settled).
    */
  private val bfsOracleSql: String = {
    val R = 4
    val head =
      s"""$knnEdgeCtes,
        | und AS (SELECT DISTINCT src, dst FROM (
        |     SELECT src, dst FROM ed
        |     UNION ALL SELECT dst AS src, src AS dst FROM ed) x
        |   WHERE src <> dst),
        | n0 AS (SELECT id, 0 AS dist FROM nodes WHERE id % 97 = 0),
        | a0 AS (SELECT id, dist FROM n0)""".stripMargin
    val its = (1 to R).map { r =>
      s""",
        | n$r AS (SELECT DISTINCT u.dst AS id, $r AS dist FROM und u
        |   WHERE u.src IN (SELECT id FROM n${r - 1})
        |     AND u.dst NOT IN (SELECT id FROM a${r - 1})),
        | a$r AS (SELECT id, dist FROM a${r - 1} UNION ALL SELECT id, dist FROM n$r)""".stripMargin
    }.mkString
    head + its +
      s"""
        | SELECT n.id AS vec_id, cast(coalesce(a.dist, -1) as bigint) AS dist
        | FROM nodes n LEFT JOIN a$R a ON n.id = a.id ORDER BY vec_id""".stripMargin
  }

  /** sssp_dist oracle: the shared kNN edge CTE symmetrized and weighted
    * (1 + (least·31 + greatest·17) mod 97 — the same direction-symmetric
    * integer recipe as the engine), seeds at vec_id % 97 = 0, then every
    * Bellman-Ford sweep unrolled: settled ∪ (settled ⋈ edges relax) →
    * per-vertex min.
    */
  private val ssspOracleSql: String = {
    val R = 4
    val head =
      s"""$knnEdgeCtes,
        | und AS (SELECT DISTINCT src, dst FROM (
        |     SELECT src, dst FROM ed
        |     UNION ALL SELECT dst AS src, src AS dst FROM ed) x
        |   WHERE src <> dst),
        | wed AS (SELECT src, dst,
        |     1 + (least(src, dst) * 31 + greatest(src, dst) * 17) % 97 AS w
        |   FROM und),
        | a0 AS (SELECT id, 0 AS dist FROM nodes WHERE id % 97 = 0)""".stripMargin
    val its = (1 to R).map { r =>
      s""",
        | a$r AS (SELECT id, min(dist) AS dist FROM (
        |     SELECT id, dist FROM a${r - 1}
        |     UNION ALL SELECT e.dst AS id, a.dist + e.w AS dist
        |     FROM a${r - 1} a JOIN wed e ON e.src = a.id) x GROUP BY id)""".stripMargin
    }.mkString
    head + its +
      s"""
        | SELECT n.id AS vec_id, cast(coalesce(a.dist, -1) as bigint) AS dist
        | FROM nodes n LEFT JOIN a$R a ON n.id = a.id ORDER BY vec_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "sssp_dist" -> ssspOracleSql,
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n,
        | cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as bigint)) as bigint) AS revenue_cents
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1995-09-01'
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_region_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        | cast(sum(cast(floor(c_acctbal * 100 + 0.5) as bigint)) as bigint) AS acct_cents
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q03_topk_orders" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q04_priority_topk" ->
      """SELECT o_orderpriority, o_orderkey, rn FROM (
        | SELECT o_orderpriority, o_orderkey,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q05_cust_orders" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | cast(coalesce(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)), 0) as bigint) AS spend_cents
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_cond_agg" ->
      """SELECT l_returnflag,
        | cast(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) as bigint) AS n_hi_disc,
        | cast(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) as bigint) AS n_hi_tax,
        | count(*) AS n_rows FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_value_bins" ->
      """SELECT cast(((floor(value / 30) * 30) % 360 + 360) % 360 as integer) AS bin,
        | count(*) AS n FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_user_argmax" ->
      """SELECT user_id, event_type, value FROM (
        | SELECT user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        | FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q09_semijoin" ->
      """SELECT c_custkey, c_name FROM customer c WHERE EXISTS (
        | SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        | ORDER BY c_custkey""".stripMargin,
    "q10_antijoin" ->
      """SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (
        | SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        | ORDER BY c_custkey""".stripMargin,
    "q11_union_distinct" ->
      """SELECT DISTINCT v FROM (
        | SELECT event_type AS v FROM events
        | UNION ALL SELECT o_orderpriority AS v FROM orders) t ORDER BY v""".stripMargin,
    "q12_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        | b AS (SELECT user_id, event_id, us,
        |   CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        | s AS (SELECT user_id,
        |   sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session
        |  FROM b),
        | g AS (SELECT user_id, session, count(*) AS cnt FROM s GROUP BY 1, 2)
        | SELECT user_id, count(*) AS n_sessions, cast(sum(cnt) as bigint) AS n_events, max(cnt) AS max_session
        | FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_running" ->
      """SELECT user_id, event_id,
        | cast(sum(cast(floor(value * 100 + 0.5) as bigint))
        |  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) as bigint) AS running_cents
        | FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,
    "q14_lang_stats" ->
      """SELECT lang, count(*) AS n, cast(sum(n_chars) as bigint) AS total_chars,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars
        | FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_exact_moments" ->
      """SELECT event_type, count(*) AS n, cast(sum(c) as bigint) AS sum_cents,
        | cast(sum(c * c) as bigint) AS sumsq_cents
        | FROM (SELECT event_type, cast(floor(value * 100 + 0.5) as bigint) AS c FROM events) t
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_distinct_count" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        | cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) as bigint) AS total_cents
        | FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        | ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q20_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        | FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_token_stats" ->
      s"""SELECT lang, cast(sum(tok) as bigint) AS total_tokens, min(tok) AS min_tokens, max(tok) AS max_tokens
         | FROM (SELECT lang, $tokSql AS tok FROM documents) t
         | GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_doc_quality" -> qualityOracleSql,
    "kg_scores" -> kgScoresOracleSql,
    "kg_depicts" -> kgDepictsOracleSql,
    "kg_ship_table" -> kgShipTableOracleSql,
    "kg_part_rollup" -> kgPartRollupOracleSql,
    "kg_topk_quality" ->
      s"""SELECT doc_id, round(((length(text) % 101) / 101.0) * 20.0 + ((($tokSql) % 97) / 97.0) * 30.0, 6) AS uciqe
         | FROM documents ORDER BY uciqe DESC, doc_id LIMIT 100""".stripMargin,
    "ann_cosine" ->
      """SELECT e.vec_id,
        | round(list_cosine_similarity(cast(e.embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 0)), 4) AS cosine
        | FROM embeddings e WHERE e.vec_id <> 0 ORDER BY e.vec_id""".stripMargin,
    "q18_heading_bins" ->
      """SELECT cast(((round((value - 77.0 + 180) / 30) * 30) % 360 + 360) % 360 as int) AS heading_bin,
        | count(*) AS n FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_bpe_tokens" ->
      """SELECT lang,
        | cast(sum(list_sum(list_transform(string_split(text, ' '),
        |   w -> greatest(cast(ceil(length(w) / 4.0) as bigint), 1)))) as bigint) AS bpe_tokens,
        | count(*) AS n_docs FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q23_jaccard_adj" ->
      """WITH g AS (SELECT doc_id,
        |   list_distinct(list_transform(
        |     generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
        |     i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS grams
        |  FROM documents)
        | SELECT a.doc_id AS a, b.doc_id AS b,
        |  len(list_intersect(a.grams, b.grams)) / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
        | FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 ORDER BY a""".stripMargin,
    "q24_det_sample" ->
      """SELECT doc_id, lang FROM documents
        | WHERE cast(concat('0x', substr(md5(text), 1, 8)) as bigint) % 1000000 < 300000
        | ORDER BY doc_id""".stripMargin,
    // full decode table: image rows mirror the PNG pixel formula (as in
    // multimodal_image_decode); audio rows mirror the WAV sample formula
    // (real decode — width carries the sample rate, nFrames the sample
    // count, mean_luma the mean |amplitude|); video rows mirror the
    // synthetic container header fields the stub decoder parses
    "multimodal_decode" ->
      """WITH d AS (SELECT i,
        |    CASE cast(i % 3 as int) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |  FROM generate_series(0, 999) t(i))
        | SELECT cast(i as bigint) AS media_id, kind,
        |  cast(CASE WHEN kind = 'image' THEN 8 + i % 16
        |            WHEN kind = 'audio' THEN 8000 + (i % 8) * 1000
        |            ELSE 64 + i % 256 END as int) AS width,
        |  cast(CASE WHEN kind = 'image' THEN 8 + (i // 16) % 16
        |            WHEN kind = 'audio' THEN 1
        |            ELSE 64 + (i // 7) % 256 END as int) AS height,
        |  cast(CASE WHEN kind = 'video' THEN 1 + i % 290
        |            WHEN kind = 'audio' THEN 256 + i % 512
        |            ELSE 1 END as int) AS n_frames,
        |  round(CASE WHEN kind = 'image'
        |    THEN cast(list_sum(list_transform(generate_series(0, (8 + i % 16) * (8 + (i // 16) % 16) - 1),
        |      p -> ((p % (8 + i % 16)) * 7 + (p // (8 + i % 16)) * 13 + i) % 256)) as double)
        |      / ((8 + i % 16) * (8 + (i // 16) % 16)) / 255.0
        |    WHEN kind = 'audio'
        |    THEN cast(list_sum(list_transform(generate_series(0, 255 + i % 512),
        |      j -> abs(((i * 131 + j * 37) % 65536) - 32768))) as double)
        |      / (256 + i % 512) / 32768.0
        |    ELSE cast(i % 251 as double) / 255.0 END, 6) AS mean_luma
        | FROM d ORDER BY media_id""".stripMargin,
    // replays the REAL WAV decode analytically: rate/count from the id
    // formulas, |amplitude| sum over the closed-form sample pattern —
    // all-integer outputs, truncating milli division
    "multimodal_audio_decode" ->
      """WITH a AS (SELECT i, 8000 + (i % 8) * 1000 AS sample_rate, 256 + i % 512 AS n
        |   FROM generate_series(0, 999) t(i) WHERE i % 3 = 1),
        | s AS (SELECT i, sample_rate, n, unnest(generate_series(0, n - 1)) AS j FROM a),
        | t AS (SELECT i, sample_rate, n,
        |     sum(abs(((i * 131 + j * 37) % 65536) - 32768)) AS amp_sum
        |   FROM s GROUP BY 1, 2, 3)
        | SELECT cast(i as bigint) AS media_id,
        |   cast(sample_rate as bigint) AS sample_rate,
        |   cast(n as bigint) AS n_samples,
        |   cast(amp_sum as bigint) AS amp_sum,
        |   (1000 * cast(amp_sum as bigint)) // (cast(n as bigint) * 32768) AS amp_milli
        | FROM t ORDER BY media_id""".stripMargin,
    // replays the dHash from the synthetic pixel formula: pixels →
    // 9-col × 8-row block cells keyed by (x*9//w, y*8//h) → exact
    // cross-multiplied brightness bits → two unsigned-32 halves →
    // min-media_id canon per fingerprint; all-integer throughout.
    // Empty ninth-column cells (w = 8) drop out of the join and the
    // engine's 0 > 0 compare is false — both contribute bit 0
    "image_dhash" ->
      """WITH d AS (SELECT i, cast(8 + i % 16 as int) AS w,
        |     cast(8 + (i // 16) % 16 as int) AS h
        |   FROM generate_series(0, 999) t(i) WHERE i % 3 = 0),
        | px AS (SELECT i, w, h, unnest(generate_series(0, w * h - 1)) AS p FROM d),
        | pv AS (SELECT i, w, h,
        |     ((p % w) * 9) // w AS ci, ((p // w) * 8) // h AS cj,
        |     ((p % w) * 7 + (p // w) * 13 + i) % 256 AS v
        |   FROM px),
        | c AS (SELECT i, w, h, ci, cj, sum(v) AS s, count(*) AS n
        |   FROM pv GROUP BY 1, 2, 3, 4, 5),
        | b AS (SELECT a.i, a.w, a.h, a.cj * 8 + a.ci AS k,
        |     CASE WHEN a.s * bb.n > bb.s * a.n THEN 1 ELSE 0 END AS bit
        |   FROM c a JOIN c bb ON a.i = bb.i AND a.cj = bb.cj AND bb.ci = a.ci + 1
        |   WHERE a.ci < 8),
        | hsh AS (SELECT i, w, h,
        |     cast(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END) as bigint) AS dhash_hi,
        |     cast(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END) as bigint) AS dhash_lo
        |   FROM b GROUP BY 1, 2, 3)
        | SELECT cast(i as bigint) AS media_id, w AS width, h AS height,
        |   dhash_hi, dhash_lo,
        |   cast(min(i) OVER (PARTITION BY dhash_hi, dhash_lo) as bigint) AS canon_id
        | FROM hsh ORDER BY media_id""".stripMargin,
    // same fingerprint CTE, then the banding/cap/popcount replay: 4×16-bit
    // bands, row_number rank ≤ 64 anchors ordered by media_id (identical
    // tie-free ordering both engines), popcount over both unsigned-32
    // halves, radius 6
    "image_neardup" ->
      """WITH d AS (SELECT i, cast(8 + i % 16 as int) AS w,
        |     cast(8 + (i // 16) % 16 as int) AS h
        |   FROM generate_series(0, 999) t(i) WHERE i % 3 = 0),
        | px AS (SELECT i, w, h, unnest(generate_series(0, w * h - 1)) AS p FROM d),
        | pv AS (SELECT i, w, h,
        |     ((p % w) * 9) // w AS ci, ((p // w) * 8) // h AS cj,
        |     ((p % w) * 7 + (p // w) * 13 + i) % 256 AS v
        |   FROM px),
        | c AS (SELECT i, ci, cj, sum(v) AS s, count(*) AS n
        |   FROM pv GROUP BY 1, 2, 3),
        | bb AS (SELECT a.i, a.cj * 8 + a.ci AS k,
        |     CASE WHEN a.s * r.n > r.s * a.n THEN 1 ELSE 0 END AS bit
        |   FROM c a JOIN c r ON a.i = r.i AND a.cj = r.cj AND r.ci = a.ci + 1
        |   WHERE a.ci < 8),
        | hsh AS (SELECT i,
        |     cast(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END) as bigint) AS hi,
        |     cast(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) ELSE 0 END) as bigint) AS lo
        |   FROM bb GROUP BY 1),
        | band AS (SELECT i, hi, lo, bd AS band,
        |     CASE bd WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
        |             WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bval
        |   FROM hsh CROSS JOIN (SELECT unnest(range(0, 4)) AS bd) bands),
        | rk AS (SELECT i, band, bval,
        |     row_number() OVER (PARTITION BY band, bval ORDER BY i) AS r FROM band),
        | cand AS (SELECT DISTINCT a.i AS a, b.i AS b
        |   FROM rk a JOIN band b USING (band, bval)
        |   WHERE a.r <= 64 AND a.i < b.i),
        | ham AS (SELECT c.a, c.b,
        |     cast(bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo)) as int) AS hamming
        |   FROM cand c JOIN hsh ha ON ha.i = c.a JOIN hsh hb ON hb.i = c.b)
        | SELECT cast(a as bigint) AS a, cast(b as bigint) AS b, hamming
        | FROM ham WHERE hamming <= 6 ORDER BY a, b""".stripMargin,
    // every 30th frame index of each video row, dims from the container
    // header formulas
    "multimodal_frame_sample" ->
      """WITH v AS (SELECT i, 1 + i % 290 AS nf FROM generate_series(0, 999) t(i) WHERE i % 3 = 2)
        | SELECT cast(i as bigint) AS media_id,
        |  cast(unnest(generate_series(0, nf - 1, 30)) as int) AS frame_index,
        |  cast(64 + i % 256 as int) AS width, cast(64 + (i // 7) % 256 as int) AS height
        | FROM v ORDER BY media_id, frame_index""".stripMargin,
    // mirrors Multimodal.syntheticMedia's pixel formula analytically:
    // pixel(x,y) = (x*7 + y*13 + id) % 256, integer sum then the same
    // double division chain as decodeImage — the engine decodes real PNG
    // bytes, the oracle never touches an image
    "multimodal_image_decode" ->
      """WITH d AS (SELECT i, cast(8 + i % 16 as int) AS width,
        |    cast(8 + (i // 16) % 16 as int) AS height
        |  FROM generate_series(0, 999) t(i) WHERE i % 3 = 0)
        | SELECT cast(i as bigint) AS media_id, width, height,
        |  round(cast(list_sum(list_transform(generate_series(0, width * height - 1),
        |    p -> ((p % width) * 7 + (p // width) * 13 + i) % 256)) as double)
        |    / (width * height) / 255.0, 6) AS mean_luma
        | FROM d ORDER BY media_id""".stripMargin,
    // grams are murmur-hashed on the Spark side, strings here: set SIZES
    // agree (the deterministic sf0.01 corpus has no colliding grams —
    // verified; a collision would fail the hash gate loudly, not silently)
    "ngram_jaccard" ->
      """WITH g AS (SELECT doc_id,
        |   list_distinct(list_transform(
        |     generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
        |     i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS grams
        |  FROM documents WHERE doc_id < 200)
        | SELECT a.doc_id AS a, b.doc_id AS b,
        |  len(list_intersect(a.grams, b.grams)) / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
        | FROM g a JOIN g b ON a.doc_id < b.doc_id ORDER BY a, b""".stripMargin,
    // replays the entire portable minhash pipeline: polynomial shingle
    // hash, 16 affine min-hashes mod 2^31-1, 4-slot band keys, the
    // rank<=64 hot-bucket cap, and the agreement count — stage for stage
    // the same arithmetic as Dedup.portableMinhashPairs
    "minhash_portable" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 5),
         |${portableMinhashCtes("d")}
         | SELECT a, b, cast(n_match as bigint) AS n_match
         | FROM scored WHERE n_match >= 13 ORDER BY a, b""".stripMargin,
    // replays the incremental probe: same signature/band arithmetic,
    // corpus-side-only rank cap, delta probes every bucket it lands in
    "delta_pairs" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 5),
         |${portableMinhashCtes("d")},
         |${deltaProbeCtes}
         | SELECT delta_id, corpus_id, cast(n_match as bigint) AS n_match
         | FROM vs WHERE n_match >= 13 ORDER BY delta_id, corpus_id""".stripMargin,
    // the admission verdict on the same split: corpus match beats
    // within-delta first-occurrence-keeps beats admit; short docs have
    // no signature rows and fall through to admit
    "delta_dedup" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 5),
         |${portableMinhashCtes("d")},
         |${deltaProbeCtes},
         | drk AS (SELECT doc_id, band, bkey,
         |  row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS r
         |  FROM band WHERE doc_id % 8 = 7),
         | dc AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM drk a JOIN band b USING (band, bkey)
         |  WHERE b.doc_id % 8 = 7 AND a.r <= 64 AND a.doc_id < b.doc_id),
         | ds AS (SELECT c.a, c.b,
         |  sum(CASE WHEN ha.h = hb.h THEN 1 ELSE 0 END) AS n_match
         |  FROM dc c JOIN hj ha ON ha.doc_id = c.a
         |  JOIN hj hb ON hb.doc_id = c.b AND hb.j = ha.j
         |  GROUP BY c.a, c.b),
         | dupc AS (SELECT DISTINCT delta_id AS doc_id FROM vs WHERE n_match >= 13),
         | dupd AS (SELECT DISTINCT b AS doc_id FROM ds WHERE n_match >= 13)
         | SELECT dd.doc_id,
         |  CASE WHEN dupc.doc_id IS NOT NULL THEN 'dup_corpus'
         |       WHEN dupd.doc_id IS NOT NULL THEN 'dup_delta'
         |       ELSE 'admit' END AS verdict
         | FROM (SELECT doc_id FROM documents WHERE doc_id % 8 = 7) dd
         | LEFT JOIN dupc USING (doc_id) LEFT JOIN dupd USING (doc_id)
         | ORDER BY doc_id""".stripMargin,
    // replays the substring-dedup span detection stage for stage (see
    // substringSpanCtes): any shared span of length L >= 10 is exactly
    // the island of its L-9 stride-1 gram hits
    "substring_spans" ->
      s"""$substringSpanCtes
        | SELECT doc_id, span_start, span_len, n_grams, other_doc
        | FROM spans ORDER BY doc_id, span_start""".stripMargin,
    // the same spans, then keep-first removal: non-canonical spans
    // (other_doc < doc_id) drop their word positions via the identical
    // nested-lambda filter the engine runs
    "substring_scrub" ->
      s"""$substringSpanCtes,
        | sp AS (SELECT doc_id,
        |     list(struct_pack(s := span_start, l := span_len)) AS rm
        |   FROM spans WHERE other_doc < doc_id GROUP BY doc_id)
        | SELECT d.doc_id,
        |   CASE WHEN sp.rm IS NULL THEN d.text
        |   ELSE coalesce(array_to_string(list_transform(
        |     list_filter(generate_series(1, len(string_split(d.text, ' '))),
        |       p -> NOT len(list_filter(sp.rm, x -> p >= x.s AND p < x.s + x.l)) > 0),
        |     p -> string_split(d.text, ' ')[p]), ' '), '') END AS text
        | FROM documents d LEFT JOIN sp USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "cc_sizes" ->
      """WITH o AS (SELECT doc_id, lang,
        |   CASE WHEN lag(lang) OVER w = lang AND lag(doc_id) OVER w = doc_id - 1
        |        THEN 0 ELSE 1 END AS brk
        |  FROM documents WINDOW w AS (ORDER BY doc_id)),
        | r AS (SELECT doc_id, sum(brk) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS grp FROM o),
        | c AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY grp) AS component,
        |       count(*) OVER (PARTITION BY grp) AS n FROM r)
        | SELECT doc_id AS id, component FROM c WHERE n >= 2 ORDER BY id""".stripMargin,
    "lang_id" -> langIdOracleSql,
    "fingerprints" -> fingerprintsOracleSql,
    "ann_topk" ->
      """SELECT e.vec_id,
        | round(list_cosine_similarity(cast(e.embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        | FROM embeddings e WHERE e.vec_id <> 0 ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin,
    // full-probe IVF reduces to brute force — same oracle as ann_topk
    "ann_ivf_full" ->
      """SELECT e.vec_id,
        | round(list_cosine_similarity(cast(e.embedding as double[]),
        |   (SELECT cast(embedding as double[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
        | FROM embeddings e WHERE e.vec_id <> 0 ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin,
    // full-probe LSH reduces to exact k-NN by L2; tie order inside the
    // engine's top-k ranker is (distance, dst as string) — mirrored by
    // the varchar cast (knn_graph precedent)
    "ann_lsh_full" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        | SELECT e.vec_id, round(list_distance(e.v, q.qv), 6) AS distance
        | FROM e, q WHERE e.vec_id <> 0
        | ORDER BY list_distance(e.v, q.qv), cast(e.vec_id as varchar) LIMIT 20""".stripMargin,
    // replays the PORTABLE IVF stage for stage: md5-ranked seed
    // centroids (cid = rank), Euclidean argmin assignment (ties by cid —
    // matching the engine's strict-< fold), nProbe=2 probe set, exact
    // cosine re-rank. Real probing: the candidate set is a strict
    // subset of the corpus, and the oracle must still match bit-for-bit.
    "ann_ivf_portable" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        | hb AS (SELECT vec_id, v,
        |    cast(concat('0x', substr(md5(cast(vec_id as varchar)), 1, 8)) as bigint) % 1000000 AS h
        |  FROM e WHERE vec_id <> 0),
        | cents AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v AS cv
        |   FROM hb ORDER BY h, vec_id LIMIT 8),
        | assign AS (SELECT t.vec_id, t.v, c.cid,
        |     row_number() OVER (PARTITION BY t.vec_id
        |       ORDER BY list_distance(t.v, c.cv), c.cid) AS rk
        |   FROM hb t CROSS JOIN cents c),
        | probe AS (SELECT c.cid FROM cents c, q
        |   ORDER BY list_distance(c.cv, q.qv), c.cid LIMIT 2)
        | SELECT a.vec_id, round(list_cosine_similarity(a.v, q.qv), 6) AS cosine
        | FROM assign a, q
        | WHERE a.rk = 1 AND a.cid IN (SELECT cid FROM probe)
        | ORDER BY cosine DESC, a.vec_id LIMIT 20""".stripMargin,
    // replays the PORTABLE sign-projection LSH: hyperplane coordinates
    // from the md5 of '<bit>_<dim>' (8-hex parse, % 2001 − 1000, /1000),
    // bucket = the 4-bit sign pattern of the dot products, query probes
    // only its own bucket, exact Euclidean re-rank
    "ann_lsh_portable" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | planes AS (SELECT b, list_transform(generate_series(0, 63),
        |     d -> ((cast(concat('0x', substr(md5(concat(b, '_', d)), 1, 8)) as bigint) % 2001) - 1000) / 1000.0) AS p
        |   FROM generate_series(0, 3) t(b)),
        | sigs AS (SELECT e.vec_id,
        |     string_agg(CASE WHEN list_inner_product(e.v, pl.p) >= 0 THEN '1' ELSE '0' END, '' ORDER BY pl.b) AS bucket
        |   FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        | q AS (SELECT e.v AS qv, s.bucket AS qbucket
        |   FROM e JOIN sigs s USING (vec_id) WHERE e.vec_id = 0)
        | SELECT e.vec_id, round(list_distance(e.v, q.qv), 6) AS distance
        | FROM e JOIN sigs s USING (vec_id), q
        | WHERE e.vec_id <> 0 AND s.bucket = q.qbucket
        | ORDER BY list_distance(e.v, q.qv), e.vec_id LIMIT 20""".stripMargin,
    // replays the PORTABLE embedding near-dup stage for stage: the 8
    // md5-derived hyperplanes (same '<bit>_<dim>' recipe as
    // ann_lsh_portable), sign-pattern buckets, the rank<=64 anchor
    // pairing (anchor < member, portableMinhashPairs shape), exact
    // cosine on every surviving candidate
    "embedding_neardup_portable" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | planes AS (SELECT b, list_transform(generate_series(0, 63),
        |     d -> ((cast(concat('0x', substr(md5(concat(b, '_', d)), 1, 8)) as bigint) % 2001) - 1000) / 1000.0) AS p
        |   FROM generate_series(0, 7) t(b)),
        | sigs AS (SELECT e.vec_id,
        |     string_agg(CASE WHEN list_inner_product(e.v, pl.p) >= 0 THEN '1' ELSE '0' END, '' ORDER BY pl.b) AS bucket
        |   FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        | anch AS (SELECT vec_id, bucket,
        |     row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rk FROM sigs),
        | pairs AS (SELECT DISTINCT a.vec_id AS a, m.vec_id AS b
        |   FROM anch a JOIN sigs m USING (bucket)
        |   WHERE a.rk <= 64 AND a.vec_id < m.vec_id)
        | SELECT p.a, p.b, round(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
        | FROM pairs p JOIN e ea ON p.a = ea.vec_id JOIN e eb ON p.b = eb.vec_id
        | ORDER BY a, b""".stripMargin,
    // replays the PQ stage for stage: md5-ranked codebook rows sliced
    // per block, per-(vec, block) argmin by (list_distance, cid), ADC
    // squared distances via a left-to-right dimension loop, then the
    // per-vector block fold as an explicit list_reduce over the
    // b-ordered list — summation order is part of the contract
    "ann_pq_topk" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        | hb AS (SELECT vec_id, v,
        |    cast(concat('0x', substr(md5(cast(vec_id as varchar)), 1, 8)) as bigint) % 1000000 AS h
        |  FROM e WHERE vec_id <> 0),
        | cents AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v AS cv
        |   FROM hb ORDER BY h, vec_id LIMIT 8),
        | bl AS (SELECT unnest(generate_series(0, 7)) AS b),
        | enc AS (SELECT t.vec_id, bl.b, c.cid,
        |     row_number() OVER (PARTITION BY t.vec_id, bl.b
        |       ORDER BY list_distance(list_slice(t.v, bl.b * 8 + 1, bl.b * 8 + 8),
        |                              list_slice(c.cv, bl.b * 8 + 1, bl.b * 8 + 8)),
        |         c.cid) AS rk
        |   FROM hb t CROSS JOIN bl CROSS JOIN cents c),
        | adc AS (SELECT bl.b, c.cid,
        |     list_sum(list_transform(generate_series(1, 8),
        |       d -> (q.qv[bl.b * 8 + d] - c.cv[bl.b * 8 + d])
        |          * (q.qv[bl.b * 8 + d] - c.cv[bl.b * 8 + d]))) AS sq
        |   FROM bl CROSS JOIN cents c, q),
        | per AS (SELECT n.vec_id,
        |     list_reduce(list(a.sq ORDER BY n.b), (x, y) -> x + y) AS s
        |   FROM enc n JOIN adc a ON n.b = a.b AND n.cid = a.cid
        |   WHERE n.rk = 1 GROUP BY n.vec_id)
        | SELECT vec_id, round(sqrt(s), 6) AS distance_approx
        | FROM per ORDER BY sqrt(s), vec_id LIMIT 20""".stripMargin,
    // composes the ann_ivf_portable and ann_pq_topk replays: the SAME
    // md5-ranked rows serve as IVF centroids and PQ codebook; the
    // candidate set is the nProbe=2 probed lists, then per-block
    // encode + ADC + the b-ordered left fold, exactly as ann_pq_topk
    "ann_ivfpq_topk" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        | hb AS (SELECT vec_id, v,
        |    cast(concat('0x', substr(md5(cast(vec_id as varchar)), 1, 8)) as bigint) % 1000000 AS h
        |  FROM e WHERE vec_id <> 0),
        | cents AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v AS cv
        |   FROM hb ORDER BY h, vec_id LIMIT 8),
        | assign AS (SELECT t.vec_id, t.v, c.cid,
        |     row_number() OVER (PARTITION BY t.vec_id
        |       ORDER BY list_distance(t.v, c.cv), c.cid) AS rk
        |   FROM hb t CROSS JOIN cents c),
        | probe AS (SELECT c.cid FROM cents c, q
        |   ORDER BY list_distance(c.cv, q.qv), c.cid LIMIT 2),
        | cand AS (SELECT a.vec_id, a.v FROM assign a
        |   WHERE a.rk = 1 AND a.cid IN (SELECT cid FROM probe)),
        | bl AS (SELECT unnest(generate_series(0, 7)) AS b),
        | enc AS (SELECT t.vec_id, bl.b, c.cid,
        |     row_number() OVER (PARTITION BY t.vec_id, bl.b
        |       ORDER BY list_distance(list_slice(t.v, bl.b * 8 + 1, bl.b * 8 + 8),
        |                              list_slice(c.cv, bl.b * 8 + 1, bl.b * 8 + 8)),
        |         c.cid) AS rk
        |   FROM cand t CROSS JOIN bl CROSS JOIN cents c),
        | adc AS (SELECT bl.b, c.cid,
        |     list_sum(list_transform(generate_series(1, 8),
        |       d -> (q.qv[bl.b * 8 + d] - c.cv[bl.b * 8 + d])
        |          * (q.qv[bl.b * 8 + d] - c.cv[bl.b * 8 + d]))) AS sq
        |   FROM bl CROSS JOIN cents c, q),
        | per AS (SELECT n.vec_id,
        |     list_reduce(list(a.sq ORDER BY n.b), (x, y) -> x + y) AS s
        |   FROM enc n JOIN adc a ON n.b = a.b AND n.cid = a.cid
        |   WHERE n.rk = 1 GROUP BY n.vec_id)
        | SELECT vec_id, round(sqrt(s), 6) AS distance_approx
        | FROM per ORDER BY sqrt(s), vec_id LIMIT 20""".stripMargin,
    // replays the int8 scalar quantization: per-vector max-abs scale,
    // floor(x*127/scale + 0.5) codes, exact integer dot, then the one
    // float product in the engine's exact order ((dot*qs)*vs)/16129
    "ann_sq_topk" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | q AS (SELECT v AS qv,
        |     CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
        |          THEN list_max(list_transform(v, x -> abs(x))) ELSE 1.0 END AS qs
        |   FROM e WHERE vec_id = 0),
        | qc AS (SELECT list_transform(qv, x -> cast(floor(x * 127.0 / qs + 0.5) as bigint)) AS qc, qs FROM q),
        | sc AS (SELECT t.vec_id,
        |     CASE WHEN list_max(list_transform(t.v, x -> abs(x))) > 0
        |          THEN list_max(list_transform(t.v, x -> abs(x))) ELSE 1.0 END AS vs, t.v
        |   FROM e t WHERE t.vec_id <> 0),
        | d AS (SELECT s.vec_id,
        |     list_sum(list_transform(generate_series(1, len(s.v)), i ->
        |       c.qc[i] * cast(floor(s.v[i] * 127.0 / s.vs + 0.5) as bigint))) AS idot,
        |     s.vs, c.qs
        |   FROM sc s, qc c)
        | SELECT vec_id,
        |   round(cast(idot as double) * qs * vs / 16129.0, 6) AS dot_approx
        | FROM d ORDER BY cast(idot as double) * qs * vs / 16129.0 DESC, vec_id
        | LIMIT 20""".stripMargin,
    "curation_exact" -> curationExactOracleSql,
    "curation_portable" -> curationPortableOracleSql,
    // tie order inside the engine's top-k aggregator is (distance, dst
    // as string) — mirrored by the varchar cast in the window order
    "knn_graph" ->
      """WITH e AS (SELECT vec_id, label, cast(embedding as double[]) AS v FROM embeddings),
        | p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |       round(list_distance(a.v, b.v), 6) AS distance,
        |       row_number() OVER (PARTITION BY a.vec_id
        |         ORDER BY list_distance(a.v, b.v), cast(b.vec_id as varchar)) AS rn
        |       FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
        | SELECT src, dst, distance FROM p WHERE rn <= 5 ORDER BY src, distance, dst""".stripMargin,
    // replays the positional-block linearized LSH stage for stage:
    // md5-derived planes (key '0_<bit>_<dim>' — table 0), 4 signature
    // sign bits + the order projection (plane 4), row_number bucket
    // positions ordered by (proj, id-as-varchar) exactly like the
    // engine, ±8-window pairing, both directions, top-5 per src with
    // the aggregator's (distance, dst-as-string) tie rule
    "knn_portable" ->
      """WITH e AS (SELECT cast(vec_id as varchar) AS id, cast(label as bigint) AS grp,
        |     cast(embedding as double[]) AS v FROM embeddings),
        | pl AS (SELECT b, list_transform(generate_series(0, 63),
        |     d -> ((cast(concat('0x', substr(md5(concat('0_', b, '_', d)), 1, 8)) as bigint) % 2001) - 1000) / 1000.0) AS p
        |   FROM generate_series(0, 4) t(b)),
        | sg AS (SELECT e.id,
        |     sum(CASE WHEN pl.b <= 3 AND list_inner_product(e.v, pl.p) >= 0
        |          THEN (1 << pl.b) ELSE 0 END) AS sig,
        |     max(CASE WHEN pl.b = 4 THEN list_inner_product(e.v, pl.p) END) AS proj
        |   FROM e CROSS JOIN pl GROUP BY e.id),
        | posed AS (SELECT e.id, e.grp, e.v, s.sig, s.proj,
        |     row_number() OVER (PARTITION BY e.grp, s.sig ORDER BY s.proj, e.id) AS pos
        |   FROM e JOIN sg s USING (id)),
        | pairs AS (SELECT a.id AS src, b.id AS dst, list_distance(a.v, b.v) AS distance
        |   FROM posed a JOIN posed b ON a.grp = b.grp AND a.sig = b.sig
        |    AND b.pos - a.pos BETWEEN 1 AND 8),
        | bidir AS (SELECT src, dst, distance FROM pairs
        |   UNION ALL SELECT dst AS src, src AS dst, distance FROM pairs),
        | ranked AS (SELECT src, dst, distance,
        |     row_number() OVER (PARTITION BY src ORDER BY distance, dst) AS rk
        |   FROM bidir)
        | SELECT cast(src as bigint) AS src, cast(dst as bigint) AS dst,
        |   round(distance, 6) AS distance
        | FROM ranked WHERE rk <= 5 ORDER BY src, dst""".stripMargin,
    // hash-min CC == min reachable vertex id; the closure is enumerable
    // at oracle scale via a recursive CTE over the symmetrized 3-NN graph
    "cc_components" ->
      """WITH RECURSIVE e AS (SELECT vec_id, label, cast(embedding as double[]) AS v FROM embeddings),
        | p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |       row_number() OVER (PARTITION BY a.vec_id
        |         ORDER BY list_distance(a.v, b.v), cast(b.vec_id as varchar)) AS rn
        |       FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
        | knn AS (SELECT src, dst FROM p WHERE rn <= 3),
        | edges AS (SELECT src, dst FROM knn UNION SELECT dst AS src, src AS dst FROM knn),
        | reach(a, b) AS (
        |   SELECT vec_id, vec_id FROM e
        |   UNION
        |   SELECT r.a, ed.dst FROM reach r JOIN edges ed ON r.b = ed.src)
        | SELECT cast(a as bigint) AS id, cast(min(b) as bigint) AS component
        | FROM reach GROUP BY a ORDER BY id""".stripMargin,
    "fuzzy_link" -> fuzzyLinkOracleSql,
    "pca_reduce" -> pcaReduceOracleSql,
    // grams are murmur-hashed Spark-side, strings here (ngram_jaccard
    // precedent: set sizes agree on the deterministic corpus)
    "decontaminate" ->
      """WITH g AS (SELECT doc_id, list_distinct(list_transform(
        |     generate_series(1, greatest(len(string_split(text, ' ')) - 7, 1)),
        |     i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS grams
        |   FROM documents),
        | bg AS (SELECT DISTINCT unnest(grams) AS g FROM g WHERE doc_id % 97 = 0),
        | ex AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS g FROM g),
        | m AS (SELECT e.doc_id, e.n_grams,
        |       cast(sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_contaminated
        |       FROM ex e LEFT JOIN bg ON e.g = bg.g GROUP BY 1, 2)
        | SELECT doc_id, cast(n_grams as int) AS n_grams, n_contaminated,
        |  round(n_contaminated / n_grams, 6) AS ratio
        | FROM m ORDER BY doc_id""".stripMargin,
    "pii_scrub" -> piiScrubOracleSql,
    "q28_length_quantiles" ->
      """SELECT lang, count(*) AS n,
        | round(quantile_cont(n_chars, 0.25), 6) AS p25,
        | round(quantile_cont(n_chars, 0.5), 6) AS p50,
        | round(quantile_cont(n_chars, 0.75), 6) AS p75
        | FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // same reachability-closure oracle shape as cc_components; grams
    // are murmur-hashed Spark-side, strings here (ngram_jaccard
    // precedent: distinct-set sizes agree on the deterministic corpus)
    "neardup_canon" ->
      """WITH RECURSIVE g AS (SELECT doc_id, list_distinct(list_transform(
        |     generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
        |     i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS grams
        |   FROM documents WHERE doc_id < 200),
        | e0 AS (SELECT a.doc_id AS a, b.doc_id AS b FROM g a JOIN g b
        |   ON a.doc_id < b.doc_id
        |   WHERE len(list_intersect(a.grams, b.grams)) /
        |     len(list_distinct(list_concat(a.grams, b.grams))) >= 0.1),
        | e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        | reach(s, d) AS (SELECT a, a FROM (SELECT a FROM e UNION SELECT b FROM e) u(a)
        |   UNION SELECT r.s, e.b FROM reach r JOIN e ON r.d = e.a),
        | comp AS (SELECT s AS doc_id, min(d) AS component FROM reach GROUP BY s)
        | SELECT d.doc_id, coalesce(c.component, d.doc_id) AS canonical_id,
        |  coalesce(c.component, d.doc_id) = d.doc_id AS is_keeper
        | FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
        | LEFT JOIN comp c ON d.doc_id = c.doc_id
        | ORDER BY d.doc_id""".stripMargin,
    "source_sample" ->
      """SELECT doc_id, source, lang FROM documents
        | WHERE source IN ('src0', 'src1', 'src2', 'src3')
        |  AND cast(concat('0x', substr(md5(text), 1, 8)) as bigint) % 1000000 <
        |   CASE source WHEN 'src0' THEN 900000 WHEN 'src1' THEN 500000
        |    WHEN 'src2' THEN 250000 ELSE 100000 END
        | ORDER BY doc_id""".stripMargin,
    // replays the α=½ temperature quotas: per-source ⌊√n⌋ weights,
    // integer 200·w div Σw quota, admission in (md5-hash, doc_id) order
    "temperature_mix" ->
      """WITH c AS (SELECT source, cast(count(*) as bigint) AS n
        |   FROM documents GROUP BY source),
        | w AS (SELECT source, cast(floor(sqrt(n)) as bigint) AS wt FROM c),
        | tq AS (SELECT source, (200 * wt) // (SELECT sum(wt) FROM w) AS quota FROM w),
        | rk AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |     ORDER BY cast(concat('0x', substr(md5(text), 1, 8)) as bigint), doc_id) AS rank
        |   FROM documents)
        | SELECT rk.doc_id, rk.source, cast(rk.rank as bigint) AS rank
        | FROM rk JOIN tq USING (source) WHERE rk.rank <= tq.quota
        | ORDER BY doc_id""".stripMargin,
    // replays the data-constrained epoch plan: quota div n full epochs
    // for every doc + a quota mod n hash-order top-up copy
    "epoch_mix" ->
      """WITH c AS (SELECT source, cast(count(*) as bigint) AS n
        |   FROM documents GROUP BY source),
        | w AS (SELECT source, n, cast(floor(sqrt(n)) as bigint) AS wt FROM c),
        | tq AS (SELECT source, n, (900 * wt) // (SELECT sum(wt) FROM w) AS quota FROM w),
        | fr AS (SELECT source, quota // n AS f, quota % n AS rem FROM tq),
        | rk AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |     ORDER BY cast(concat('0x', substr(md5(text), 1, 8)) as bigint), doc_id) AS rank
        |   FROM documents)
        | SELECT rk.doc_id, rk.source,
        |   cast(fr.f + CASE WHEN rk.rank <= fr.rem THEN 1 ELSE 0 END as bigint) AS n_copies
        | FROM rk JOIN fr USING (source)
        | WHERE fr.f + CASE WHEN rk.rank <= fr.rem THEN 1 ELSE 0 END > 0
        | ORDER BY doc_id""".stripMargin,
    // replays streaming first-seen bucket anchors: with a single-batch
    // source the anchor is the bucket MINIMUM, so the pair set is
    // (anchor, member) over the portable band buckets
    "streaming_neardup_portable" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 5),
         |${portableMinhashCtes("d")},
         | anchors AS (SELECT band, bkey, min(doc_id) AS anchor
         |  FROM band GROUP BY band, bkey),
         | pairs AS (SELECT DISTINCT least(b.doc_id, a.anchor) AS a,
         |     greatest(b.doc_id, a.anchor) AS b
         |  FROM band b JOIN anchors a USING (band, bkey)
         |  WHERE b.doc_id <> a.anchor)
         | SELECT a, b FROM pairs ORDER BY a, b""".stripMargin,
    "dataset_split" ->
      """WITH b AS (SELECT doc_id,
        |   cast(concat('0x', substr(md5(text), 1, 8)) as bigint) % 1000 AS bucket
        |  FROM documents)
        | SELECT doc_id, bucket,
        |  CASE WHEN bucket < 980 THEN 'train'
        |       WHEN bucket < 990 THEN 'validation'
        |       ELSE 'test' END AS split
        | FROM b ORDER BY doc_id""".stripMargin,
    // replays the NB quality classifier: md5-content train slice,
    // per-class add-one word likelihoods, interpolated milli-log2
    // ratio per token + prior — identical L(num, den) arithmetic
    "nb_quality" ->
      s"""WITH base AS (SELECT doc_id,
        |   CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1 ELSE 0 END AS label,
        |   CASE WHEN cast(concat('0x', substr(md5(text), 1, 8)) as bigint) % 1000 < 500
        |        THEN 1 ELSE 0 END AS is_train,
        |   string_split(text, ' ') AS words FROM documents),
        | occ AS (SELECT doc_id, label, is_train, unnest(words) AS w FROM base),
        | train AS (SELECT * FROM occ WHERE is_train = 1),
        | wc AS (SELECT w, cast(sum(label) as bigint) AS cpos,
        |     cast(sum(1 - label) as bigint) AS cneg FROM train GROUP BY w),
        | tot AS (SELECT cast(sum(label) as bigint) AS tpos,
        |     cast(sum(1 - label) as bigint) AS tneg,
        |     cast(count(DISTINCT w) as bigint) AS v FROM train),
        | dc AS (SELECT cast(sum(label) as bigint) AS dpos,
        |     cast(count(*) - sum(label) as bigint) AS dneg
        |   FROM base WHERE is_train = 1),
        | pr AS (SELECT CASE WHEN dpos >= dneg
        |     THEN ${lrmSql("dpos + 1", "dneg + 1")}
        |     ELSE -${lrmSql("dneg + 1", "dpos + 1")} END AS prior FROM dc),
        | j AS (SELECT o.doc_id, coalesce(c.cpos, 0) AS cpos,
        |     coalesce(c.cneg, 0) AS cneg, t.tpos, t.tneg, t.v
        |   FROM occ o LEFT JOIN wc c USING (w), tot t),
        | sc AS (SELECT doc_id,
        |     ${lrmSql("tneg + v", "cneg + 1")} - ${lrmSql("tpos + v", "cpos + 1")}
        |     AS s_milli FROM j)
        | SELECT doc_id, cast(count(*) as bigint) AS n_tokens,
        |   cast(sum(s_milli) + (SELECT prior FROM pr) as bigint) AS nb_milli,
        |   CASE WHEN sum(s_milli) + (SELECT prior FROM pr) >= 0 THEN 1 ELSE 0 END AS predicted
        | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays DSIR: hashed md5 bigram buckets, target-vs-raw add-one
    // milli log-likelihood ratio per gram occurrence
    "dsir_weights" ->
      s"""WITH d AS (SELECT doc_id,
        |   CASE WHEN source IN ('src0','src1','src2') THEN 1 ELSE 0 END AS is_target,
        |   string_split(text, ' ') AS ws FROM documents),
        | g0 AS (SELECT doc_id, is_target, ws,
        |     unnest(generate_series(1, len(ws) - 1)) AS i
        |   FROM d WHERE len(ws) >= 2),
        | g AS (SELECT doc_id, is_target,
        |   cast(concat('0x', substr(md5(concat(ws[i], ' ', ws[i+1])), 1, 8)) as bigint) % 64 AS b
        |   FROM g0),
        | prof AS (SELECT b, cast(sum(is_target) as bigint) AS ct,
        |     cast(count(*) as bigint) AS cr FROM g GROUP BY b),
        | tot AS (SELECT cast(sum(is_target) as bigint) AS tt,
        |     cast(count(*) as bigint) AS tr FROM g),
        | sc AS (SELECT doc_id,
        |     ${lrmSql("tr + 64", "cr + 1")} - ${lrmSql("tt + 64", "ct + 1")}
        |     AS s_milli
        |   FROM g JOIN prof USING (b), tot)
        | SELECT doc_id, cast(count(*) as bigint) AS n_grams,
        |   cast(sum(s_milli) as bigint) AS dsir_milli
        | FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays the deterministic shuffle as ONE global row_number over
    // the seed-keyed md5 order — equal to the engine's two-phase rank
    // because the first-hex-byte bucket order is a prefix of key order
    "corpus_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |   md5(concat('7', '_', cast(doc_id as varchar))) AS shuffle_key
        |  FROM documents)
        | SELECT doc_id, shuffle_key,
        |   cast(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 as bigint) AS pos
        | FROM k ORDER BY doc_id""".stripMargin,
    // replays the HLL register build digit for digit
    "hll_registers" ->
      s"""$hllCtes
        | SELECT register, max_rho FROM regs ORDER BY register""".stripMargin,
    // ... and the raw integer estimator: denom = Σ 2^(30 − min(ρ,30))
    // with absent registers contributing 2^30, one truncating divide
    "hll_distinct" ->
      s"""$hllCtes,
        | agg AS (SELECT cast(count(*) as bigint) AS observed_regs,
        |     cast(sum(1::BIGINT << cast(30 - least(max_rho, 30) as int)) as bigint) AS dsum
        |   FROM regs),
        | d AS (SELECT observed_regs,
        |     dsum + (64 - observed_regs) * 1073741824 AS denom FROM agg)
        | SELECT observed_regs, denom,
        |   ${graft.ops.Sketches.HllEstNumer} // (1000 * denom) AS est_distinct
        | FROM d""".stripMargin,
    // replays the Count-Min grid (salt 'cms<depth>_', 4×512) and the
    // min-over-depths point estimate from the same word-count table
    "cms_estimate" ->
      """WITH wc AS (SELECT word, cast(count(*) as bigint) AS true_n
        |   FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |   GROUP BY word),
        | wb AS (SELECT word, true_n, d.d AS depth,
        |     cast(concat('0x', substr(md5(concat('cms', d.d, '_', word)), 1, 8)) as bigint) % 512 AS bucket
        |   FROM wc CROSS JOIN generate_series(0, 3) d(d)),
        | ctr AS (SELECT depth, bucket, cast(sum(true_n) as bigint) AS cnt
        |   FROM wb GROUP BY depth, bucket)
        | SELECT w.word, w.true_n, cast(min(c.cnt) as bigint) AS est_n
        | FROM wb w JOIN ctr c USING (depth, bucket)
        | GROUP BY w.word, w.true_n ORDER BY w.word""".stripMargin,
    "pagerank" -> pagerankOracleSql,
    "hits_scores" -> hitsOracleSql,
    "ppr_scores" -> pprOracleSql,
    "textrank_words" -> textrankOracleSql,
    // one-hop neighbor mean in micro fixed point; DuckDB's // floors,
    // so the truncating-toward-zero div is replayed with a sign split
    "neighbor_agg" ->
      s"""$knnEdgeCtes,
        | und AS (SELECT DISTINCT src, dst FROM (
        |     SELECT src, dst FROM ed
        |     UNION ALL SELECT dst AS src, src AS dst FROM ed) u
        |   WHERE src <> dst),
        | f AS (SELECT cast(vec_id as bigint) AS id, cast(d as bigint) AS dim,
        |     cast(floor(v[d + 1] * 1000000 + 0.5) as bigint) AS q
        |   FROM e CROSS JOIN generate_series(0, 63) t(d)),
        | g AS (SELECT und.dst AS vec_id, f.dim,
        |     cast(count(*) as bigint) AS n_nbrs, cast(sum(f.q) as bigint) AS s
        |   FROM und JOIN f ON und.src = f.id
        |   GROUP BY und.dst, f.dim)
        | SELECT vec_id, dim, n_nbrs,
        |   CASE WHEN s >= 0 THEN s // n_nbrs
        |        ELSE -((-s) // n_nbrs) END AS mean_fp
        | FROM g ORDER BY vec_id, dim""".stripMargin,
    // replays the oriented triangle enumeration over the proven kNN
    // edge set: symmetrize a<b, wedge join, closing join, per-vertex
    // fan-out with zero-filled non-participants
    "knn_triangles" ->
      s"""$knnEdgeCtes,
        | und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |   FROM ed WHERE src <> dst),
        | tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |   FROM und e1 JOIN und e2 ON e1.b = e2.a
        |   JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        | pv AS (SELECT unnest([a, b, c]) AS id FROM tri),
        | cnt AS (SELECT id, cast(count(*) as bigint) AS n_triangles
        |   FROM pv GROUP BY id)
        | SELECT nodes.id AS vec_id, coalesce(cnt.n_triangles, 0) AS n_triangles
        | FROM nodes LEFT JOIN cnt ON nodes.id = cnt.id ORDER BY vec_id""".stripMargin,
    // replays the Bloom build (salt 'bloom<i>_', 8192 bits) and the
    // all-4-bits membership fold over the decontaminate gram CTEs
    "bloom_decontaminate" ->
      """WITH g AS (SELECT doc_id, list_distinct(list_transform(
        |     generate_series(1, greatest(len(string_split(text, ' ')) - 7, 1)),
        |     i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS grams
        |   FROM documents),
        | bg AS (SELECT DISTINCT unnest(grams) AS g FROM g WHERE doc_id % 97 = 0),
        | bits AS (SELECT DISTINCT
        |     cast(concat('0x', substr(md5(concat('bloom', d.d, '_', g)), 1, 8)) as bigint) % 8192 AS bit
        |   FROM bg CROSS JOIN generate_series(0, 3) d(d)),
        | ex AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS g FROM g),
        | pb AS (SELECT doc_id, n_grams, g,
        |     cast(concat('0x', substr(md5(concat('bloom', d.d, '_', g)), 1, 8)) as bigint) % 8192 AS bit
        |   FROM ex CROSS JOIN generate_series(0, 3) d(d)),
        | pg AS (SELECT pb.doc_id, pb.n_grams, pb.g,
        |     CASE WHEN sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 4
        |          THEN 1 ELSE 0 END AS m
        |   FROM pb LEFT JOIN bits b ON pb.bit = b.bit
        |   GROUP BY pb.doc_id, pb.n_grams, pb.g)
        | SELECT doc_id, cast(n_grams as int) AS n_grams,
        |   cast(sum(m) as bigint) AS bloom_hits
        | FROM pg GROUP BY doc_id, n_grams ORDER BY doc_id""".stripMargin,
    "bottomk_sample" ->
      """SELECT cast(concat('0x', substr(md5(text), 1, 8)) as bigint) AS h, doc_id
        | FROM documents ORDER BY h, doc_id LIMIT 100""".stripMargin,
    "bottomk_distinct" ->
      """WITH h AS (SELECT DISTINCT cast(concat('0x', substr(md5(text), 1, 8)) as bigint) AS h
        |   FROM documents),
        | k AS (SELECT h FROM h ORDER BY h LIMIT 64)
        | SELECT max(h) AS kth_hash,
        |   (63 * 4294967296) // greatest(max(h), 1) AS est_distinct
        | FROM k""".stripMargin,
    // brute-force all-pairs ground truth for the prefix-filtered
    // set-similarity join — a STRONGER check than replaying the filter:
    // it proves the prefix machinery loses no qualifying pair
    "ppjoin_pairs" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
        |   FROM documents WHERE doc_id < 1000),
        | s AS (SELECT doc_id, cast(len(ws) as bigint) AS n, ws FROM t),
        | p AS (SELECT a.doc_id AS a, b.doc_id AS b,
        |     cast(len(list_intersect(a.ws, b.ws)) as bigint) AS inter_n,
        |     a.n AS a_n, b.n AS b_n
        |   FROM s a JOIN s b ON a.doc_id < b.doc_id)
        | SELECT a, b, inter_n, a_n, b_n,
        |   (1000 * inter_n) // (a_n + b_n - inter_n) AS jaccard_milli
        | FROM p WHERE (1000 * inter_n) // (a_n + b_n - inter_n) >= 800
        | ORDER BY a, b""".stripMargin,
    "label_prop" -> labelPropOracleSql,
    // replays sequence packing: prefix-sum starts in doc_id order, each
    // doc exploded over the sequence ids it spans, segment arithmetic
    "seq_pack" ->
      s"""WITH t AS (SELECT doc_id, cast($tokSql as bigint) AS tokens FROM documents),
        | tt AS (SELECT * FROM t WHERE tokens > 0),
        | c AS (SELECT doc_id, tokens, cast(sum(tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens as bigint) AS start FROM tt),
        | e AS (SELECT doc_id, tokens, start,
        |   unnest(generate_series(start // 128, (start + tokens - 1) // 128)) AS seq_id
        |   FROM c)
        | SELECT seq_id, doc_id,
        |   greatest(seq_id * 128 - start, 0) AS doc_from,
        |   least((seq_id + 1) * 128 - start, tokens) - 1 AS doc_to,
        |   greatest(start - seq_id * 128, 0) AS seq_off
        | FROM e ORDER BY seq_id, doc_id""".stripMargin,
    "vocab_topk" ->
      """SELECT word, cast(count(*) as bigint) AS n
        | FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        | GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    // replays the bigram LM stage for stage: md5-content train slice,
    // add-one bigram/context counts, V = train vocab, per-bigram
    // integer surprisal length(bin((cc+V)//(c+1)))-1 (bin is unpadded
    // in both engines), order-free sums, truncating int division
    "lm_perplexity" ->
      s"""$lmScoreCtes
        | SELECT doc_id, is_train, n_bigrams, oov_bigrams, total_bits,
        |   (1000 * total_bits) // n_bigrams AS bpb_milli
        | FROM per ORDER BY doc_id""".stripMargin,
    // the scoring CTEs above, then CCNet's per-source head/middle/tail:
    // integer boundary 1000*rank <= permille*count, (bpb, doc_id) rank
    "lm_tiers" ->
      s"""$lmScoreCtes,
        | sc2 AS (SELECT p.doc_id, doc.source,
        |     (1000 * p.total_bits) // p.n_bigrams AS bpb_milli
        |   FROM per p JOIN documents doc USING (doc_id)),
        | rk AS (SELECT doc_id, source, bpb_milli,
        |     row_number() OVER (PARTITION BY source ORDER BY bpb_milli, doc_id) AS r,
        |     count(*) OVER (PARTITION BY source) AS cnt FROM sc2)
        | SELECT doc_id, source, bpb_milli,
        |   CASE WHEN 1000 * r <= 100 * cnt THEN 'head'
        |        WHEN 1000 * r <= 500 * cnt THEN 'middle'
        |        ELSE 'tail' END AS tier
        | FROM rk ORDER BY doc_id""".stripMargin,
    // window/stride slicing: Spark slice(arr, start, LENGTH) ==
    // DuckDB list_slice(arr, start, start+len-1) (inclusive end)
    "chunk_docs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | c AS (SELECT doc_id, w,
        |     unnest(generate_series(0, greatest(len(w) - 1, 0) // 12)) AS cid
        |   FROM d)
        | SELECT doc_id, cast(cid as bigint) AS chunk_id,
        |   cast(len(list_slice(w, cid * 12 + 1, cid * 12 + 16)) as bigint) AS n_tokens,
        |   array_to_string(list_slice(w, cid * 12 + 1, cid * 12 + 16), ' ') AS chunk
        | FROM c WHERE cid * 12 < len(w) ORDER BY doc_id, chunk_id""".stripMargin,
    // replays all 8 BPE iterations via the code-generated CTE chain —
    // identical argmax order and replace semantics both engines
    "bpe_merges" -> bpeMergesOracleSql(8),
    "bpe_tokenize" -> bpeTokenizeOracleSql(8),
    // replays the quantized BM25: floor-log2 idf on the exact rational
    // (2(N-df)+1)/(2df+1) with the milli interpolation fraction,
    // Lucene-style clamp at df > N/2, milli tf saturation with the
    // identical truncating division points, (score desc, doc_id) top-k
    "bm25_topk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | st AS (SELECT count(*) AS n, (1000 * sum(len(w))) // count(*) AS avgmilli FROM d),
        | hits AS (SELECT doc_id, len(w) AS len, unnest(w) AS t FROM d),
        | h AS (SELECT * FROM hits WHERE t IN ('dup', 'key', 'merge', 'vector')),
        | tf AS (SELECT doc_id, t, max(len) AS len, count(*) AS tf FROM h GROUP BY 1, 2),
        | dfs AS (SELECT t, count(DISTINCT doc_id) AS df FROM h GROUP BY 1),
        | sc AS (SELECT f.doc_id, f.tf, f.len, 2 * (st.n - x.df) + 1 AS aa,
        |     2 * x.df + 1 AS bb, st.avgmilli
        |   FROM tf f JOIN dfs x USING (t), st),
        | q AS (SELECT *, CASE WHEN aa >= bb THEN length(bin(aa // bb)) - 1
        |     ELSE -1 END AS bits FROM sc),
        | i AS (SELECT *, CASE WHEN bits < 0 THEN 0 ELSE bits * 1000
        |     + (1000 * aa) // (bb * (1 << bits)) - 1000 END AS idf_milli FROM q),
        | z AS (SELECT doc_id, idf_milli *
        |     ((1000 * tf * (100 + 120)) //
        |      (100 * tf + (120 * (1000 - 10 * 75
        |        + (75 * ((1000000 * len) // avgmilli)) // 100)) // 1000)) AS contrib
        |   FROM i)
        | SELECT doc_id, cast(sum(contrib) as bigint) AS score_micro
        | FROM z GROUP BY doc_id ORDER BY score_micro DESC, doc_id LIMIT 15""".stripMargin,
    // hybrid-retrieval fusion: the bm25_topk integer chain (corpus
    // minus doc 0, pool 50) ranked, the dense leg ranked on the RAW
    // double cosine (bit-identical fold both engines, vec_id
    // tie-break), then the integer 1000000 // (60 + rank) RRF sum
    "rrf_fusion" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |   WHERE doc_id <> 0),
        | st AS (SELECT count(*) AS n, (1000 * sum(len(w))) // count(*) AS avgmilli FROM d),
        | hits AS (SELECT doc_id, len(w) AS len, unnest(w) AS t FROM d),
        | h AS (SELECT * FROM hits WHERE t IN ('dup', 'key', 'merge', 'vector')),
        | tf AS (SELECT doc_id, t, max(len) AS len, count(*) AS tf FROM h GROUP BY 1, 2),
        | dfs AS (SELECT t, count(DISTINCT doc_id) AS df FROM h GROUP BY 1),
        | sc AS (SELECT f.doc_id, f.tf, f.len, 2 * (st.n - x.df) + 1 AS aa,
        |     2 * x.df + 1 AS bb, st.avgmilli
        |   FROM tf f JOIN dfs x USING (t), st),
        | qq AS (SELECT *, CASE WHEN aa >= bb THEN length(bin(aa // bb)) - 1
        |     ELSE -1 END AS bits FROM sc),
        | i AS (SELECT *, CASE WHEN bits < 0 THEN 0 ELSE bits * 1000
        |     + (1000 * aa) // (bb * (1 << bits)) - 1000 END AS idf_milli FROM qq),
        | z AS (SELECT doc_id, idf_milli *
        |     ((1000 * tf * (100 + 120)) //
        |      (100 * tf + (120 * (1000 - 10 * 75
        |        + (75 * ((1000000 * len) // avgmilli)) // 100)) // 1000)) AS contrib
        |   FROM i),
        | bs AS (SELECT doc_id, cast(sum(contrib) as bigint) AS score_micro
        |   FROM z GROUP BY doc_id ORDER BY score_micro DESC, doc_id LIMIT 50),
        | sr AS (SELECT doc_id,
        |     row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank FROM bs),
        | e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings
        |   WHERE vec_id <> 0),
        | qv AS (SELECT cast(embedding as double[]) AS q FROM embeddings WHERE vec_id = 0),
        | dn AS (SELECT vec_id AS doc_id,
        |     list_inner_product(v, q) /
        |       (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(q, q))) AS cos
        |   FROM e CROSS JOIN qv ORDER BY cos DESC, doc_id LIMIT 50),
        | dr AS (SELECT doc_id,
        |     row_number() OVER (ORDER BY cos DESC, doc_id) AS rank FROM dn),
        | u AS (SELECT doc_id, rank FROM sr UNION ALL SELECT doc_id, rank FROM dr)
        | SELECT doc_id, cast(count(*) as int) AS n_legs,
        |   cast(sum(1000000 // (60 + rank)) as bigint) AS rrf_micro
        | FROM u GROUP BY doc_id ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin,
    // full replay of the portable simhash: md5-nibble token values,
    // bit-majority vote per doc, nibble band buckets with the rank<=64
    // cap, Hamming verify on the 16-bit signatures
    "simhash_portable" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        | tv AS (SELECT doc_id,
        |  (strpos('0123456789abcdef', substr(md5(tok),1,1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(tok),2,1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(tok),3,1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(tok),4,1)) - 1) AS v
        | FROM tok),
        | bits AS (SELECT doc_id, b, sum(CASE WHEN (v // (1 << b)) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM tv CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bs
        |  GROUP BY doc_id, b),
        | sig AS (SELECT doc_id, cast(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) as bigint) AS sig
        |  FROM bits GROUP BY doc_id),
        | band AS (SELECT doc_id, sig, bd AS band, (sig >> cast(bd * 4 as int)) & 15 AS bval
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bd) bands),
        | rk AS (SELECT doc_id, band, bval,
        |  row_number() OVER (PARTITION BY band, bval ORDER BY doc_id) AS r FROM band),
        | cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM rk a JOIN band b USING (band, bval)
        |  WHERE a.r <= 64 AND a.doc_id < b.doc_id),
        | ham AS (SELECT c.a, c.b, cast(bit_count(xor(sa.sig, sb.sig)) as int) AS hamming
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b)
        | SELECT a, b, hamming FROM ham WHERE hamming <= 3 ORDER BY a, b""".stripMargin,
    "shard_pack" ->
      s"""WITH t AS (SELECT doc_id, cast($tokSql as bigint) AS tokens FROM documents),
         | c AS (SELECT doc_id, tokens, sum(tokens) OVER (ORDER BY doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
         | SELECT doc_id, tokens, cast((cum - tokens) // 2000 as bigint) AS shard_id,
         |   cast((cum - tokens) % 2000 as bigint) AS pack_offset
         | FROM c ORDER BY doc_id""".stripMargin,
    // per-word floor(1e6/df) is IEEE division + floor (no transcendental),
    // then everything stays int64 (order-free sum, truncating mean) —
    // bit-exact both engines with NO rounding boundary
    "idf_score" ->
      """WITH occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        | df AS (SELECT word, count(DISTINCT doc_id) AS df FROM occ GROUP BY 1),
        | j AS (SELECT o.doc_id, cast(floor(1000000.0 / d.df) as bigint) AS idf_micro
        |       FROM occ o JOIN df d ON o.word = d.word),
        | a AS (SELECT doc_id, count(*) AS n_words,
        |       cast(sum(idf_micro) as bigint) AS s FROM j GROUP BY 1)
        | SELECT doc_id, n_words, cast(s // n_words as bigint) AS idf_micro_mean
        | FROM a ORDER BY doc_id""".stripMargin,
    // both engines work on the segment/gram STRINGS (no hash), so these
    // are bit-exact cross-engine; integer counts, one rounded division
    // replays the per-doc unigram entropy: (doc, word) counts, doc
    // totals, c·milliLog2(T/c) order-free sums, truncating div by T
    "entropy_score" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | t2 AS (SELECT doc_id, w FROM tok WHERE length(w) > 0),
        | c AS (SELECT doc_id, w, cast(count(*) as bigint) AS c
        |   FROM t2 GROUP BY 1, 2),
        | tt AS (SELECT doc_id, c,
        |     cast(sum(c) OVER (PARTITION BY doc_id) as bigint) AS t,
        |     cast(count(*) OVER (PARTITION BY doc_id) as bigint) AS nd FROM c),
        | b AS (SELECT doc_id, c, t, nd, ${lrmSql("t", "c")} AS bm FROM tt)
        | SELECT doc_id, min(t) AS n_tokens, min(nd) AS n_distinct,
        |   cast(sum(c * bm) as bigint) AS h_milli_tokens,
        |   cast(sum(c * bm) // min(t) as bigint) AS entropy_milli
        | FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "repetition_stats" ->
      """WITH d AS (SELECT doc_id, len(text) AS n_chars,
        |     string_split(text, ' ') AS words FROM documents),
        | w AS (SELECT doc_id, len(words) AS n_words,
        |     len(list_distinct(words)) AS n_distinct FROM d),
        | g2 AS (SELECT doc_id, n_chars, unnest(list_transform(
        |     generate_series(1, greatest(len(words) - 1, 1)),
        |     i -> array_to_string(words[i:i+1], ' '))) AS g FROM d),
        | c2 AS (SELECT doc_id, n_chars, g, count(*) AS cnt FROM g2 GROUP BY 1, 2, 3),
        | t2 AS (SELECT doc_id, g AS top_2gram,
        |     round(cnt * len(g) / n_chars, 6) AS top2gram_frac,
        |     row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g DESC) AS rn
        |     FROM c2),
        | g5 AS (SELECT doc_id, unnest(list_transform(
        |     generate_series(1, greatest(len(words) - 4, 1)),
        |     i -> array_to_string(words[i:i+4], ' '))) AS g FROM d),
        | c5 AS (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY 1, 2),
        | d5 AS (SELECT doc_id,
        |     round(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) / sum(cnt), 6)
        |       AS dup_5gram_frac FROM c5 GROUP BY 1)
        | SELECT w.doc_id, cast(n_words as int) AS n_words,
        |  round(cast(n_words - n_distinct as double) / n_words, 6) AS dup_word_frac,
        |  t2.top_2gram, t2.top2gram_frac, d5.dup_5gram_frac
        | FROM w JOIN t2 ON w.doc_id = t2.doc_id AND t2.rn = 1
        | JOIN d5 ON w.doc_id = d5.doc_id ORDER BY w.doc_id""".stripMargin,
    "segment_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        | i AS (SELECT doc_id, words, unnest(generate_series(1,
        |     cast(ceil(len(words) / 10.0) as bigint))) AS i FROM d),
        | s AS (SELECT doc_id, i - 1 AS pos,
        |     array_to_string(words[(i-1)*10+1:(i-1)*10+10], ' ') AS seg FROM i),
        | r AS (SELECT doc_id, row_number() OVER
        |     (PARTITION BY seg ORDER BY doc_id, pos) AS occ FROM s)
        | SELECT doc_id, count(*) AS n_segments,
        |  cast(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) as bigint) AS n_dup_segments,
        |  round(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) / count(*), 6) AS dup_frac
        | FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // all integers: distinct shared segments per source pair + permille
    // Jaccard with a truncating div — bit-exact cross-engine
    "source_overlap" ->
      """WITH d AS (SELECT source, string_split(text, ' ') AS words FROM documents),
        | i AS (SELECT source, words, unnest(generate_series(1,
        |     cast(ceil(len(words) / 10.0) as bigint))) AS i FROM d),
        | seg AS (SELECT DISTINCT source,
        |     array_to_string(words[(i-1)*10+1:(i-1)*10+10], ' ') AS seg FROM i),
        | sizes AS (SELECT source, count(*) AS n FROM seg GROUP BY 1),
        | sh AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |   FROM seg a JOIN seg b ON a.seg = b.seg AND a.source < b.source
        |   GROUP BY 1, 2)
        | SELECT sh.src_a, sh.src_b, sh.n_shared, sa.n AS n_a, sb.n AS n_b,
        |  cast(sh.n_shared * 1000 // (sa.n + sb.n - sh.n_shared) as bigint)
        |    AS jaccard_permille
        | FROM sh JOIN sizes sa ON sh.src_a = sa.source
        | JOIN sizes sb ON sh.src_b = sb.source
        | ORDER BY 1, 2""".stripMargin,
    // segment first-occurrence rank (segment_dedup's keeper rule) →
    // per-50-doc-batch counts → running sums; integers only
    "dedup_growth" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        | i AS (SELECT doc_id, words, unnest(generate_series(1,
        |     cast(ceil(len(words) / 10.0) as bigint))) AS i FROM d),
        | s AS (SELECT doc_id, i - 1 AS pos,
        |     array_to_string(words[(i-1)*10+1:(i-1)*10+10], ' ') AS seg FROM i),
        | r AS (SELECT doc_id, CASE WHEN row_number() OVER
        |     (PARTITION BY seg ORDER BY doc_id, pos) = 1 THEN 1 ELSE 0 END AS f FROM s),
        | b AS (SELECT doc_id // 50 AS bucket, count(*) AS ns,
        |     sum(f) AS nf FROM r GROUP BY 1),
        | c AS (SELECT bucket, sum(ns) OVER (ORDER BY bucket) AS segs_cum,
        |     sum(nf) OVER (ORDER BY bucket) AS uniq_cum FROM b)
        | SELECT bucket, cast(segs_cum as bigint) AS segs_cum,
        |  cast(uniq_cum as bigint) AS uniq_cum,
        |  cast((segs_cum - uniq_cum) * 1000 // segs_cum as bigint) AS dup_permille
        | FROM c ORDER BY bucket""".stripMargin,
    // strings + int64 counts, no rounding anywhere
    "inverted_index" ->
      """WITH occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |   FROM documents),
        | p AS (SELECT term, doc_id, count(*) AS tf FROM occ GROUP BY 1, 2)
        | SELECT term, doc_id, tf, count(*) OVER (PARTITION BY term) AS df
        | FROM p ORDER BY term, doc_id""".stripMargin,
    "ann_mmr" -> annMmrOracleSql(10, 24),
    // replays the two-tier matryoshka serve: prefix-16 cosine pool on
    // raw doubles (identical fold), full-dim round-6 re-rank
    "ann_matryoshka" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings
        |   WHERE vec_id <> 0),
        | qv AS (SELECT cast(embedding as double[]) AS q FROM embeddings WHERE vec_id = 0),
        | c AS (SELECT vec_id, v,
        |     list_inner_product(v[1:16], q[1:16]) /
        |       (sqrt(list_inner_product(v[1:16], v[1:16]))
        |        * sqrt(list_inner_product(q[1:16], q[1:16]))) AS pcos
        |   FROM e CROSS JOIN qv ORDER BY pcos DESC, vec_id LIMIT 50)
        | SELECT c.vec_id, round(list_inner_product(c.v, qv.q) /
        |     (sqrt(list_inner_product(c.v, c.v))
        |      * sqrt(list_inner_product(qv.q, qv.q))), 6) AS cosine
        | FROM c CROSS JOIN qv ORDER BY cosine DESC, c.vec_id LIMIT 20""".stripMargin,
    // regenerates the 32 bq_ hyperplanes from md5, recodes every vector
    // to its 32 sign bits, ranks by popcount(xor) — all-integer replay
    "ann_hamming" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | planes AS (SELECT b, list_transform(generate_series(0, 63),
        |     d -> ((cast(concat('0x', substr(md5(concat('bq_', b, '_', d)), 1, 8)) as bigint) % 2001) - 1000) / 1000.0) AS p
        |   FROM generate_series(0, 31) t(b)),
        | codes AS (SELECT e.vec_id,
        |     cast(sum(CASE WHEN list_inner_product(e.v, pl.p) >= 0
        |       THEN cast(1 as bigint) << pl.b ELSE 0 END) as bigint) AS code
        |   FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        | q AS (SELECT code AS qc FROM codes WHERE vec_id = 0)
        | SELECT c.vec_id, cast(bit_count(xor(c.code, q.qc)) as int) AS hamming
        | FROM codes c CROSS JOIN q WHERE c.vec_id <> 0
        | ORDER BY hamming, c.vec_id LIMIT 20""".stripMargin,
    // element-order list_sum mirrors sq_dist's index-order accumulation;
    // 1.25*1.25 is exact in binary on both engines
    "q26_dbscan" ->
      """WITH RECURSIVE e AS (SELECT vec_id AS id, cast(label as bigint) AS grp,
        |     cast(embedding as double[]) AS v FROM embeddings),
        | nbr AS (SELECT a.id AS src, b.id AS dst
        |         FROM e a JOIN e b ON a.grp = b.grp AND a.id <> b.id
        |         WHERE list_sum(list_transform(generate_series(1, len(a.v)),
        |           i -> (a.v[i] - b.v[i]) ** 2)) <= 1.25 * 1.25),
        | core AS (SELECT src AS id FROM nbr GROUP BY src HAVING count(*) >= 3),
        | ce AS (SELECT n.src, n.dst FROM nbr n
        |        JOIN core c1 ON n.src = c1.id JOIN core c2 ON n.dst = c2.id),
        | reach(a, b) AS (SELECT id, id FROM core
        |   UNION SELECT r.a, ce.dst FROM reach r JOIN ce ON r.b = ce.src),
        | comp AS (SELECT a AS id, min(b) AS component FROM reach GROUP BY a),
        | border AS (SELECT n.src AS id, min(cp.component) AS component
        |    FROM nbr n JOIN comp cp ON n.dst = cp.id
        |    WHERE n.src NOT IN (SELECT id FROM core) GROUP BY n.src),
        | assigned AS (SELECT * FROM comp UNION ALL SELECT * FROM border),
        | pts AS (SELECT e.id, e.grp, a.component FROM e LEFT JOIN assigned a ON e.id = a.id),
        | num AS (SELECT id, grp, cast(dense_rank() OVER (
        |     PARTITION BY grp ORDER BY component) - 1 as bigint) AS cluster
        |   FROM pts WHERE component IS NOT NULL)
        | SELECT cast(id as bigint) AS id, grp AS "group", cluster FROM num
        | UNION ALL
        | SELECT cast(id as bigint) AS id, grp AS "group", cast(-1 as bigint) AS cluster
        |   FROM pts WHERE component IS NULL
        | ORDER BY id""".stripMargin,
    // union coverage 1-prod(1-cov) as exp(sum(ln(...))) — agrees with the
    // sequential product to ~1e-12, far inside the round-to-6 contract
    "q25_mosaic_sessions" ->
      """WITH e AS (SELECT user_id AS inspection_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_type, value) AS framenumber,
        |    ((value * 7.3) % 360.0 + 360.0) % 360.0 AS heading,
        |    ((value % 25.0 + 25.0) % 25.0) / 10.0 AS depth,
        |    ((value % 1.0 + 1.0) % 1.0) * 0.9 AS cov
        |  FROM events),
        | b AS (SELECT inspection_id, framenumber, depth, cov,
        |    CASE WHEN lag(heading) OVER w IS NULL THEN 1
        |         WHEN least(abs(heading - lag(heading) OVER w),
        |                    360.0 - abs(heading - lag(heading) OVER w)) > 45.0 THEN 1
        |         WHEN abs(depth - lag(depth) OVER w) > 2.0 THEN 1
        |         ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY inspection_id ORDER BY framenumber)),
        | s AS (SELECT *, sum(brk) OVER (PARTITION BY inspection_id ORDER BY framenumber) AS session FROM b),
        | m AS (SELECT inspection_id, cast(session as bigint) AS session,
        |    count(*) AS n_frames,
        |    1.0 + max(depth) - min(depth) AS size_raw,
        |    1.0 - exp(sum(ln(greatest(1.0 - least(greatest(cov, 0.0), 1.0), 1e-300)))) AS uc
        |  FROM s GROUP BY 1, 2)
        | SELECT inspection_id, session, n_frames, round(size_raw, 6) AS size_increase,
        |   round(uc, 6) AS union_cov
        | FROM m WHERE n_frames >= 3 OR size_raw >= 1.5
        | ORDER BY inspection_id, session""".stripMargin,
    "streaming_dedup" ->
      """SELECT cast(min(doc_id) as bigint) AS doc_id, md5(text) AS hash
        | FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "q27_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings)
        | SELECT a.vec_id AS a, b.vec_id AS b,
        |   round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        | FROM e a JOIN e b ON a.vec_id < b.vec_id
        | WHERE list_cosine_similarity(a.v, b.v) >= 0.45
        | ORDER BY a, b""".stripMargin,
    // session_window merges events with gap < 30 min; a new session opens
    // when the inter-event gap is >= the gap duration (half-open window)
    "streaming_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        | b AS (SELECT user_id,
        |   CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 1800000000
        |        THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us))
        | SELECT user_id, cast(sum(brk) as bigint) AS n_sessions
        | FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "telemetry_interp" ->
      """WITH raw AS (
        |  SELECT user_id AS inspection_id, cast(epoch_us(ts) as double) AS ts,
        |         event_type AS channel, value,
        |         row_number() OVER (PARTITION BY user_id, event_type, epoch_us(ts) ORDER BY value) AS rn
        |  FROM events),
        | d AS (SELECT inspection_id, channel, ts, value AS v FROM raw WHERE rn = 1),
        | b AS (SELECT inspection_id, channel, min(ts) AS t0, max(ts) AS t1 FROM d GROUP BY 1, 2),
        | g AS (SELECT inspection_id, channel, cast(i as int) AS frame_index,
        |              t0 + i * (t1 - t0) / 63 AS gts
        |       FROM b CROSS JOIN generate_series(0, 63) AS t(i)),
        | seg AS (SELECT inspection_id, channel, ts AS pt, v AS pv,
        |                lead(ts) OVER w AS nt, lead(v) OVER w AS nv
        |         FROM d WINDOW w AS (PARTITION BY inspection_id, channel ORDER BY ts))
        | SELECT g.inspection_id, g.frame_index, g.channel,
        |   CASE WHEN seg.nv IS NULL THEN seg.pv
        |        WHEN seg.nt = seg.pt THEN seg.pv
        |        ELSE seg.pv + (seg.nv - seg.pv) * (g.gts - seg.pt) / (seg.nt - seg.pt) END AS value
        | FROM g JOIN seg ON g.inspection_id = seg.inspection_id AND g.channel = seg.channel
        |   AND g.gts >= seg.pt AND (g.gts < seg.nt OR seg.nt IS NULL)
        | ORDER BY g.inspection_id, g.channel, g.frame_index""".stripMargin,

    // replays the as-of total order exactly: union-tag, the
    // (ts_us, side, event_id) keyed sort, running last(IGNORE NULLS)
    "asof_join" ->
      """WITH u AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS side,
        |     cast(floor(value * 100 + 0.5) as bigint) AS cents
        |   FROM events WHERE event_type IN ('click', 'view')),
        | c AS (SELECT *,
        |     last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w AS asof_event_id,
        |     last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS) OVER w AS asof_ts_us,
        |     last_value(CASE WHEN side = 0 THEN cents END IGNORE NULLS) OVER w AS asof_cents
        |   FROM u WINDOW w AS (PARTITION BY user_id
        |     ORDER BY ts_us, side, event_id ROWS UNBOUNDED PRECEDING))
        | SELECT event_id, user_id, ts_us, asof_event_id,
        |   ts_us - asof_ts_us AS gap_us, asof_cents
        | FROM c WHERE side = 1 ORDER BY event_id""".stripMargin,
    // the NAIVE closed-interval overlap join — deliberately NOT a replay
    // of the engine's bucketization, so the hash gate proves the
    // bucket-explode/equi-join/anchor machinery equals the semantics
    "interval_join" ->
      """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS s,
        |     epoch_us(ts) + 21600000000 AS e
        |   FROM events WHERE event_type = 'view'),
        | r AS (SELECT event_id, user_id, epoch_us(ts) AS s,
        |     epoch_us(ts) + 21600000000 AS e
        |   FROM events WHERE event_type = 'click')
        | SELECT l.event_id AS l_event_id, r.event_id AS r_event_id,
        |   l.user_id AS user_id,
        |   least(l.e, r.e) - greatest(l.s, r.s) AS overlap_us
        | FROM l JOIN r ON l.user_id = r.user_id
        |   AND l.s <= r.e AND r.s <= l.e
        | ORDER BY l_event_id, r_event_id""".stripMargin,
    // ledger replay at the integer-midpoint timestamp: latest op per
    // (subj, pred, obj) at-or-before T wins (ts desc, event_id desc),
    // and only a winning 'add' is in the snapshot
    "triple_snapshot" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
        |     event_type, props FROM events),
        | led AS (SELECT 'u' || user_id AS subj, 'ENGAGED_WITH' AS pred,
        |     'k' || json_extract_string(props, '$.k') AS obj,
        |     CASE WHEN event_type = 'error' THEN 'del' ELSE 'add' END AS op,
        |     ts_us, event_id FROM e),
        | rk AS (SELECT *, row_number() OVER (PARTITION BY subj, pred, obj
        |     ORDER BY ts_us DESC, event_id DESC) AS rn
        |   FROM led
        |   WHERE ts_us <= (SELECT (min(ts_us) + max(ts_us)) // 2 FROM e))
        | SELECT subj, pred, obj, ts_us AS since_us, event_id AS last_event_id
        | FROM rk WHERE rn = 1 AND op = 'add' ORDER BY subj, obj""".stripMargin,
    // replays both snapshots (latest-op-wins windows at the 25%/75%
    // cuts) and the two anti-joins as NOT EXISTS
    "triple_diff" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
        |     event_type, props FROM events),
        | led AS (SELECT 'u' || user_id AS subj, 'ENGAGED_WITH' AS pred,
        |     'k' || json_extract_string(props, '$.k') AS obj,
        |     CASE WHEN event_type = 'error' THEN 'del' ELSE 'add' END AS op,
        |     ts_us, event_id FROM e),
        | b AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM e),
        | s1 AS (SELECT subj, pred, obj FROM (
        |     SELECT *, row_number() OVER (PARTITION BY subj, pred, obj
        |       ORDER BY ts_us DESC, event_id DESC) AS rn
        |     FROM led WHERE ts_us <= (SELECT lo + (hi - lo) // 4 FROM b)) x
        |   WHERE rn = 1 AND op = 'add'),
        | s2 AS (SELECT subj, pred, obj FROM (
        |     SELECT *, row_number() OVER (PARTITION BY subj, pred, obj
        |       ORDER BY ts_us DESC, event_id DESC) AS rn
        |     FROM led WHERE ts_us <= (SELECT lo + (3 * (hi - lo)) // 4 FROM b)) x
        |   WHERE rn = 1 AND op = 'add')
        | SELECT subj, pred, obj, 'added' AS change FROM s2
        | WHERE NOT EXISTS (SELECT 1 FROM s1
        |   WHERE s1.subj = s2.subj AND s1.pred = s2.pred AND s1.obj = s2.obj)
        | UNION ALL
        | SELECT subj, pred, obj, 'removed' AS change FROM s1
        | WHERE NOT EXISTS (SELECT 1 FROM s2
        |   WHERE s2.subj = s1.subj AND s2.pred = s1.pred AND s2.obj = s1.obj)
        | ORDER BY subj, pred, obj, change""".stripMargin,
    "range_rolling" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        | cast(count(*) OVER w as bigint) AS n_window,
        | cast(sum(cast(floor(value * 100 + 0.5) as bigint)) OVER w as bigint) AS cents_window
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        | ORDER BY event_id""".stripMargin,
    // replays SemDeDup stage for stage: md5-ranked seed centroids
    // (ann_ivf_portable's recipe, over ALL vectors), Euclidean argmin
    // assignment, within-cluster rank<=64 anchor pairs, cosine >= tau,
    // smallest-anchor argmin per dropped vector
    "semantic_dedup" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | hb AS (SELECT vec_id, v,
        |    cast(concat('0x', substr(md5(cast(vec_id as varchar)), 1, 8)) as bigint) % 1000000 AS h
        |  FROM e),
        | cents AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v AS cv
        |   FROM hb ORDER BY h, vec_id LIMIT 8),
        | assign AS (SELECT t.vec_id, t.v, c.cid,
        |     row_number() OVER (PARTITION BY t.vec_id
        |       ORDER BY list_distance(t.v, c.cv), c.cid) AS rk
        |   FROM hb t CROSS JOIN cents c),
        | cl AS (SELECT vec_id, v, cast(cid as bigint) AS cluster FROM assign WHERE rk = 1),
        | rkd AS (SELECT vec_id, v, cluster,
        |     row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS rk FROM cl),
        | hits AS (SELECT m.vec_id, m.cluster, a.vec_id AS anchor,
        |     list_cosine_similarity(a.v, m.v) AS cos
        |   FROM rkd a JOIN rkd m ON a.cluster = m.cluster AND a.vec_id < m.vec_id
        |   WHERE a.rk <= 64),
        | best AS (SELECT vec_id, cluster, anchor, cos,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY anchor) AS rn
        |   FROM hits WHERE cos >= 0.40)
        | SELECT vec_id, cluster, anchor AS dup_of, round(cos, 6) AS cosine
        | FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // replays the distributed Lloyd fit end-to-end (kmeansCtes: encode,
    // md5 seeds, 3 unrolled rounds), then one final integer-argmin
    // assignment against the fitted centroids with the exact distance
    "kmeans_assign" ->
      s"""${kmeansCtes(8, 3, 64)},
        | a4 AS (SELECT t.vec_id, c.cid,
        |     cast(list_inner_product(t.xq, t.xq) + list_inner_product(c.cv, c.cv)
        |       - 2 * list_inner_product(t.xq, c.cv) as bigint) AS dist,
        |     row_number() OVER (PARTITION BY t.vec_id
        |       ORDER BY list_inner_product(t.xq, t.xq) + list_inner_product(c.cv, c.cv)
        |         - 2 * list_inner_product(t.xq, c.cv), c.cid) AS rk
        |   FROM hb t CROSS JOIN c3 c)
        | SELECT vec_id, cast(cid as bigint) AS cluster, dist AS dist_fixed
        | FROM a4 WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    // the fitted model itself, dim-exploded — C*D = 512 exact int64 cells
    "kmeans_centroids" ->
      s"""${kmeansCtes(8, 3, 64)}
        | SELECT cast(cid as bigint) AS cluster, cast(d as bigint) AS dim,
        |   cast(cv[d + 1] as bigint) AS c_fixed
        | FROM c3 CROSS JOIN (SELECT unnest(range(0, 64)) AS d) dims
        | ORDER BY cluster, dim""".stripMargin,
    // replays every hop of the derandomized walk: the shared kNN edge
    // CTE, then per hop the md5("walk_t_dst") % 10^6 choice key and the
    // (h, dst) row_number argmin — identical to the engine's min_by
    "walk_corpus" -> {
      def hop(t: Int) =
        s""",
          | s$t AS (SELECT f.walk_id, e.dst,
          |     cast(concat('0x', substr(md5(concat(cast(f.walk_id as varchar), '_${t}_', cast(e.dst as varchar))), 1, 8)) as bigint) % 1000000 AS h
          |   FROM f${t - 1} f JOIN ed e ON f.node = e.src),
          | f$t AS (SELECT walk_id, dst AS node FROM (
          |     SELECT walk_id, dst, row_number() OVER (PARTITION BY walk_id ORDER BY h, dst) AS rn
          |     FROM s$t) WHERE rn = 1)""".stripMargin
      s"""$knnEdgeCtes,
        | f0 AS (SELECT id AS walk_id, id AS node FROM nodes)${(1 to 4).map(hop).mkString}
        | SELECT walk_id, cast(st as bigint) AS step, node FROM (
        |   SELECT walk_id, 0 AS st, node FROM f0
        |   UNION ALL SELECT walk_id, 1, node FROM f1
        |   UNION ALL SELECT walk_id, 2, node FROM f2
        |   UNION ALL SELECT walk_id, 3, node FROM f3
        |   UNION ALL SELECT walk_id, 4, node FROM f4)
        | ORDER BY walk_id, step""".stripMargin
    },
    // the embedding_neardup_portable plane/bucket replay, kept per-label:
    // capped candidate side, cross-label filter, per-anchor top-5 by
    // (cosine DESC, neg_id) — ordering on the raw doubles both engines
    // compute in the same op order, round-6 only at output
    "hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, cast(embedding as double[]) AS v FROM embeddings),
        | planes AS (SELECT b, list_transform(generate_series(0, 63),
        |     d -> ((cast(concat('0x', substr(md5(concat(b, '_', d)), 1, 8)) as bigint) % 2001) - 1000) / 1000.0) AS p
        |   FROM generate_series(0, 7) t(b)),
        | sigs AS (SELECT e.vec_id,
        |     string_agg(CASE WHEN list_inner_product(e.v, pl.p) >= 0 THEN '1' ELSE '0' END, '' ORDER BY pl.b) AS bucket
        |   FROM e CROSS JOIN planes pl GROUP BY e.vec_id),
        | sv AS (SELECT s.vec_id, s.bucket, e.label, e.v FROM sigs s JOIN e USING (vec_id)),
        | cand AS (SELECT vec_id, bucket, label, v,
        |     row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rk FROM sv),
        | scored AS (SELECT a.vec_id, c.vec_id AS neg_id,
        |     list_cosine_similarity(a.v, c.v) AS cos_raw
        |   FROM sv a JOIN cand c USING (bucket)
        |   WHERE c.rk <= 64 AND a.label <> c.label),
        | rk AS (SELECT vec_id, neg_id, cos_raw,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY cos_raw DESC, neg_id) AS rnk
        |   FROM scored)
        | SELECT vec_id, neg_id, cast(rnk as bigint) AS rank, round(cos_raw, 6) AS cosine
        | FROM rk WHERE rnk <= 5 ORDER BY vec_id, rank""".stripMargin,
    // both SNM passes (prefix / reversed-suffix keys), the per-(pass,
    // block) rank, the w=2 successor window, first-pass pair dedup, and
    // the exact integer gram counts + truncating permille
    "snm_pairs" ->
      """WITH nrm AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nt, text FROM documents),
        | keyed AS (
        |   SELECT doc_id, 1 AS pass, substr(nt, 1, 16) AS key FROM nrm
        |   UNION ALL
        |   SELECT doc_id, 2 AS pass, substr(reverse(nt), 1, 16) AS key FROM nrm),
        | ranked AS (SELECT doc_id, pass, key, substr(key, 1, 8) AS block,
        |     row_number() OVER (PARTITION BY pass, substr(key, 1, 8) ORDER BY key, doc_id) AS rk
        |   FROM keyed),
        | pairs AS (SELECT p.pass, least(p.doc_id, q.doc_id) AS a, greatest(p.doc_id, q.doc_id) AS b
        |   FROM ranked p JOIN ranked q
        |     ON p.pass = q.pass AND p.block = q.block
        |    AND q.rk > p.rk AND q.rk <= p.rk + 2),
        | uniq AS (SELECT pass, a, b,
        |     row_number() OVER (PARTITION BY a, b ORDER BY pass) AS pn FROM pairs),
        | grams AS (SELECT doc_id, list_distinct(list_transform(
        |     range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
        |     i -> array_to_string(string_split(text, ' ')[i + 1: i + 3], ' '))) AS g FROM nrm),
        | sel AS (SELECT u.pass, u.a, u.b,
        |     len(list_intersect(ga.g, gb.g)) AS inter_grams,
        |     len(list_distinct(list_concat(ga.g, gb.g))) AS union_grams
        |   FROM uniq u JOIN grams ga ON u.a = ga.doc_id JOIN grams gb ON u.b = gb.doc_id
        |   WHERE u.pn = 1)
        | SELECT cast(pass as bigint) AS pass, a, b,
        |   cast(inter_grams as bigint) AS inter_grams,
        |   cast(union_grams as bigint) AS union_grams,
        |   cast((1000 * inter_grams) // union_grams as bigint) AS jac_permille
        | FROM sel ORDER BY a, b""".stripMargin,
    // every greedy round unrolled: marginal gain = distinct 3-grams not
    // yet covered by earlier picks, argmax by (gain DESC, doc_id)
    "coverage_select" -> {
      val head =
        """WITH g AS (SELECT doc_id, unnest(list_distinct(list_transform(
          |     range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
          |     i -> array_to_string(string_split(text, ' ')[i + 1: i + 3], ' ')))) AS gram
          |   FROM documents),
          | m1 AS (SELECT doc_id, count(*) AS gain FROM g GROUP BY doc_id),
          | p1 AS (SELECT 1 AS round, doc_id, gain FROM m1 ORDER BY gain DESC, doc_id LIMIT 1),
          | s1 AS (SELECT DISTINCT gram FROM g JOIN p1 USING (doc_id)),
          | d1 AS (SELECT doc_id FROM p1)""".stripMargin
      val rounds = (2 to 8).map { i =>
        s""",
          | m$i AS (SELECT g.doc_id, count(*) AS gain FROM g
          |   WHERE g.doc_id NOT IN (SELECT doc_id FROM d${i - 1})
          |     AND g.gram NOT IN (SELECT gram FROM s${i - 1})
          |   GROUP BY g.doc_id),
          | p$i AS (SELECT $i AS round, doc_id, gain FROM m$i ORDER BY gain DESC, doc_id LIMIT 1),
          | s$i AS (SELECT gram FROM s${i - 1} UNION
          |   SELECT gram FROM g JOIN p$i USING (doc_id)),
          | d$i AS (SELECT doc_id FROM d${i - 1} UNION SELECT doc_id FROM p$i)""".stripMargin
      }.mkString
      val union = (1 to 8).map(i => s"SELECT * FROM p$i").mkString(" UNION ALL ")
      s"""$head$rounds
        | SELECT cast(round as bigint) AS round, doc_id,
        |   cast(gain as bigint) AS marginal_gain
        | FROM ($union) ORDER BY round""".stripMargin
    },
    // the hashing-trick vectorizer replayed from DuckDB's own md5:
    // bucket = md5(token) % 256, sign = md5('s_'+token) % 2, exact
    // integer sparse dot against the doc-0 query vector
    "hashtf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        | tf0 AS (SELECT doc_id,
        |     cast(concat('0x', substr(md5(token), 1, 8)) as bigint) % 256 AS bucket,
        |     sum(CASE WHEN cast(concat('0x', substr(md5(concat('s_', token)), 1, 8)) as bigint) % 2 = 1
        |       THEN 1 ELSE -1 END) AS v
        |   FROM tok GROUP BY doc_id, bucket),
        | tf AS (SELECT * FROM tf0 WHERE v <> 0),
        | q AS (SELECT bucket, v AS qv FROM tf WHERE doc_id = 0)
        | SELECT t.doc_id, cast(sum(t.v * q.qv) as bigint) AS dot
        | FROM tf t JOIN q USING (bucket) WHERE t.doc_id <> 0
        | GROUP BY t.doc_id ORDER BY dot DESC, doc_id LIMIT 20""".stripMargin,
    // the shared kNN edge CTE symmetrized, then wedge enumeration,
    // existing-edge exclusion, and the integer 1000000//milliLog2(deg)
    // Adamic-Adar weights — identical arithmetic to the engine
    "link_predict" ->
      s"""$knnEdgeCtes,
        | und AS (SELECT DISTINCT src, dst FROM (
        |     SELECT src, dst FROM ed
        |     UNION ALL SELECT dst AS src, src AS dst FROM ed) u
        |   WHERE src <> dst),
        | degs AS (SELECT dst AS z, cast(count(*) as bigint) AS deg FROM und GROUP BY dst),
        | inv AS (SELECT z, 1000000 // (${lrmSql("deg", "1")}) AS inv_micro
        |   FROM degs WHERE deg >= 2),
        | wed AS (SELECT e1.src AS a, e2.dst AS b, e1.dst AS z
        |   FROM und e1 JOIN und e2 ON e1.dst = e2.src AND e1.src < e2.dst),
        | cand AS (SELECT a, b, z FROM wed
        |   WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.src = wed.a AND u.dst = wed.b))
        | SELECT a, b, cast(count(*) as bigint) AS n_common,
        |   cast(sum(inv_micro) as bigint) AS aa_micro
        | FROM cand JOIN inv USING (z)
        | GROUP BY a, b ORDER BY aa_micro DESC, a, b LIMIT 50""".stripMargin,
    // presence-based PMI: distinct (doc, word), df-top-100 vocab with
    // the (df desc, word) cut, per-doc pair enumeration, the exact
    // interpolated milli-log2 of the integer rational
    "pmi_pairs" ->
      s"""WITH dw AS (SELECT DISTINCT doc_id, w FROM (
        |     SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) u
        |   WHERE length(w) > 0),
        | voc AS (SELECT w, cast(count(*) as bigint) AS df FROM dw GROUP BY w
        |   ORDER BY count(*) DESC, w LIMIT 100),
        | dv AS (SELECT doc_id, w, df FROM dw JOIN voc USING (w)),
        | pr AS (SELECT a.w AS w1, b.w AS w2, cast(count(*) as bigint) AS n_co,
        |     min(a.df) AS c1, min(b.df) AS c2
        |   FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.w < b.w
        |   GROUP BY a.w, b.w),
        | n AS (SELECT cast(count(*) as bigint) AS n FROM documents)
        | SELECT w1, w2, n_co,
        |   cast(${lrmSql("n_co * n", "c1 * c2")} as bigint) AS pmi_milli
        | FROM pr, n WHERE n_co * n >= c1 * c2
        | ORDER BY pmi_milli DESC, w1, w2 LIMIT 50""".stripMargin,
    "stratified_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |     cast(concat('0x', substr(md5(cast(doc_id as varchar)), 1, 8)) as bigint) % 1000000 AS h
        |   FROM documents),
        | r AS (SELECT doc_id, source,
        |     row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk,
        |     count(*) OVER (PARTITION BY source) AS n
        |   FROM d)
        | SELECT doc_id, source FROM r
        | WHERE rk <= (n * 200 + 999) // 1000 ORDER BY doc_id""".stripMargin,
    "kcore" -> kcoreOracleSql,
    "bfs_dist" -> bfsOracleSql,
    // regenerates the 'rp_' md5 planes (ann_lsh_portable's coordinate
    // recipe) and replays every inner product
    "rp_reduce" ->
      """WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
        | planes AS (SELECT b, list_transform(generate_series(0, 63),
        |     d -> ((cast(concat('0x', substr(md5(concat('rp_', b, '_', d)), 1, 8)) as bigint) % 2001) - 1000) / 1000.0) AS p
        |   FROM generate_series(0, 7) t(b))
        | SELECT e.vec_id, cast(pl.b as bigint) AS dim,
        |   round(list_inner_product(e.v, pl.p), 6) AS value
        | FROM e CROSS JOIN planes pl ORDER BY vec_id, dim""".stripMargin,
    // per-source KL: (source, word) token counts, corpus word totals,
    // the signed interpolated milli-log2 of c_sw·T / t_w·T_s, summed
    // token-weighted — identical integer arithmetic to the engine
    "source_kl" ->
      s"""WITH t AS (SELECT source, w FROM (
        |     SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) u
        |   WHERE length(w) > 0),
        | sw AS (SELECT source, w, cast(count(*) as bigint) AS csw FROM t GROUP BY 1, 2),
        | tw AS (SELECT w, cast(count(*) as bigint) AS tw FROM t GROUP BY 1),
        | ts AS (SELECT source, cast(sum(csw) as bigint) AS tsrc FROM sw GROUP BY 1),
        | n AS (SELECT cast(count(*) as bigint) AS total FROM t),
        | j AS (SELECT sw.source, sw.csw,
        |     CASE WHEN sw.csw * total >= tw.tw * ts.tsrc
        |       THEN ${lrmSql("sw.csw * total", "tw.tw * ts.tsrc")}
        |       ELSE -(${lrmSql("tw.tw * ts.tsrc", "sw.csw * total")}) END AS slm
        |   FROM sw JOIN tw USING (w) JOIN ts USING (source) CROSS JOIN n)
        | SELECT source, cast(sum(csw) as bigint) AS n_tokens,
        |   cast(sum(csw * slm) as bigint) AS kl_milli_tokens
        | FROM j GROUP BY source ORDER BY source""".stripMargin,
    // replays the funnel's two chained forward windows: first purchase
    // at/after every row, then the first click's (ts, purchase-ts) —
    // both CASEs non-null on the same first click row — and the
    // identical window-bound CASE arithmetic
    "funnel_counts" ->
      """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |     CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS step
        |   FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        | p1 AS (SELECT *,
        |     first_value(CASE WHEN step = 2 THEN ts_us END IGNORE NULLS) OVER w AS p_ts
        |   FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, step, event_id
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        | p2 AS (SELECT *,
        |     first_value(CASE WHEN step = 1 THEN ts_us END IGNORE NULLS) OVER w AS c_ts,
        |     first_value(CASE WHEN step = 1 THEN p_ts END IGNORE NULLS) OVER w AS c_pts
        |   FROM p1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, step, event_id
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        | SELECT user_id, count(*) AS n_views,
        |   cast(sum(CASE WHEN c_ts - ts_us <= 1800000000 THEN 1 ELSE 0 END) as bigint) AS n_clicked,
        |   cast(sum(CASE WHEN c_ts - ts_us <= 1800000000
        |     AND c_pts - c_ts <= 1800000000 THEN 1 ELSE 0 END) as bigint) AS n_converted
        | FROM p2 WHERE step = 0 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "hist_quantiles" ->
      """WITH b AS (SELECT lang, n_chars // 50 AS bin FROM documents),
        | c AS (SELECT lang, bin, cast(count(*) as bigint) AS c FROM b GROUP BY 1, 2),
        | m AS (SELECT lang, bin, c,
        |     sum(c) OVER (PARTITION BY lang ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
        |     sum(c) OVER (PARTITION BY lang) AS n FROM c)
        | SELECT lang,
        |   min(CASE WHEN cum * 100 >= n * 50 THEN bin * 50 END) AS p50_lo,
        |   min(CASE WHEN cum * 100 >= n * 90 THEN bin * 50 END) AS p90_lo,
        |   min(CASE WHEN cum * 100 >= n * 99 THEN bin * 50 END) AS p99_lo
        | FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    // the plain (unsalted) join — q01's integer-cents recipe, same
    // arithmetic op order both engines
    "salted_rollup" ->
      """SELECT o.o_orderpriority, count(*) AS n,
        | cast(sum(cast(floor(((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0) + 0.5) as bigint)) as bigint) AS cents
        | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_json_props" ->
      """SELECT event_type, count(*) AS n,
        | cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS sum_k,
        | min(cast(json_extract_string(props, '$.k') as bigint)) AS min_k,
        | max(cast(json_extract_string(props, '$.k') as bigint)) AS max_k
        | FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // PPS systematic sampling replayed off the window cumsum: every
    // division has a CASE-guarded nonnegative numerator, where
    // DuckDB's // and Spark's div agree exactly
    "weighted_sample" ->
      """WITH w AS (SELECT doc_id, cast(n_chars as bigint) AS weight
        |   FROM documents WHERE n_chars > 0),
        | c AS (SELECT doc_id, weight, coalesce(sum(weight) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off FROM w),
        | p AS (SELECT sum(weight) // 100 AS step, (sum(weight) // 100) // 2 AS phase FROM w)
        |SELECT doc_id, weight, cast(start_off as bigint) AS start_off,
        |  cast(n_picks as bigint) AS n_picks FROM (
        | SELECT doc_id, weight, start_off,
        |   greatest(least(CASE WHEN start_off + weight <= phase THEN 0
        |       ELSE (start_off + weight - 1 - phase) // step + 1 END, 100)
        |     - CASE WHEN start_off <= phase THEN 0
        |       ELSE (start_off - phase + step - 1) // step END, 0) AS n_picks
        | FROM c, p) q WHERE n_picks > 0 ORDER BY doc_id""".stripMargin,
    "zorder_stats" -> zorderStatsOracleSql,
    "zorder_prune" -> zorderPruneOracleSql,
    // the plain (unbucketed) join — the hash match proves the bucketed
    // co-located layout on the Spark side is semantics-neutral
    "bucket_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | cast(sum(cast(floor((o_totalprice * 100.0) + 0.5) as bigint)) as bigint) AS cents
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    // SCD2: WHERE filters the touch rows BEFORE the lead window runs
    // (standard SQL evaluation order) — identical to the Spark plan's
    // filter-then-window
    "scd2_history" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |     cast(floor((value * 100.0) + 0.5) as bigint) AS cents
        |   FROM events WHERE event_type = 'purchase'),
        | d AS (SELECT *, lag(cents) OVER (PARTITION BY user_id
        |     ORDER BY ts_us, event_id) AS prev FROM p)
        |SELECT user_id, cents, valid_from_us, valid_to_us,
        |  CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM (SELECT user_id, cents, ts_us AS valid_from_us,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) - 1 AS valid_to_us
        |  FROM d WHERE prev IS NULL OR prev <> cents) h
        |ORDER BY user_id, valid_from_us, cents""".stripMargin
  )

  /** Shared z-order oracle CTEs: quantize both dimensions to 6 bits off
    * the fitted min/span frame, interleave with explicit shift/mask
    * terms, split the curve into files of 16 z-values, and derive the
    * integer-percent pruning bounds — the exact arithmetic of
    * [[graft.ops.Layout]].
    */
  private def zorderCtes: String =
    """WITH b AS (SELECT cast(event_id as bigint) AS event_id,
      |    cast(user_id as bigint) AS user_id, epoch_us(ts) AS ts_us FROM events),
      | f AS (SELECT min(user_id) AS fmin_u, max(user_id) - min(user_id) + 1 AS span_u,
      |    min(ts_us) AS fmin_t, max(ts_us) - min(ts_us) + 1 AS span_t,
      |    min(event_id) AS fmin_e, max(event_id) - min(event_id) + 1 AS span_e FROM b),
      | q AS (SELECT event_id, user_id, ts_us,
      |    ((user_id - fmin_u) * 64) // span_u AS qx,
      |    ((ts_us - fmin_t) * 64) // span_t AS qy FROM b, f),
      | z AS (SELECT user_id, ts_us,
      |    ((((qx >> 0) & 1) << 0) + (((qy >> 0) & 1) << 1)
      |     + (((qx >> 1) & 1) << 2) + (((qy >> 1) & 1) << 3)
      |     + (((qx >> 2) & 1) << 4) + (((qy >> 2) & 1) << 5)
      |     + (((qx >> 3) & 1) << 6) + (((qy >> 3) & 1) << 7)
      |     + (((qx >> 4) & 1) << 8) + (((qy >> 4) & 1) << 9)
      |     + (((qx >> 5) & 1) << 10) + (((qy >> 5) & 1) << 11)) >> 4 AS file_id
      |   FROM q),
      | g AS (SELECT fmin_u + (span_u * 40) // 100 AS u_lo,
      |    fmin_u + (span_u * 50) // 100 AS u_hi,
      |    fmin_t + (span_t * 30) // 100 AS t_lo,
      |    fmin_t + (span_t * 45) // 100 AS t_hi FROM f),
      | zs AS (SELECT file_id, count(*) AS n, min(user_id) AS min_u,
      |    max(user_id) AS max_u, min(ts_us) AS min_t, max(ts_us) AS max_t
      |   FROM z GROUP BY 1)""".stripMargin

  private def zorderStatsOracleSql: String =
    zorderCtes +
      """
        |SELECT cast(file_id as bigint) AS file_id, cast(n as bigint) AS n,
        |  min_u, max_u, min_t, max_t,
        |  CASE WHEN max_u < u_lo OR min_u > u_hi OR max_t < t_lo OR min_t > t_hi
        |    THEN 0 ELSE 1 END AS survives
        |FROM zs, g ORDER BY file_id""".stripMargin

  private def zorderPruneOracleSql: String =
    zorderCtes +
      """,
        | l AS (SELECT ((event_id - fmin_e) * 256) // span_e AS file_id,
        |    user_id, ts_us FROM b, f),
        | ls AS (SELECT file_id, count(*) AS n, min(user_id) AS min_u,
        |    max(user_id) AS max_u, min(ts_us) AS min_t, max(ts_us) AS max_t
        |   FROM l GROUP BY 1),
        | zv AS (SELECT n, CASE WHEN max_u < u_lo OR min_u > u_hi
        |     OR max_t < t_lo OR min_t > t_hi THEN 0 ELSE 1 END AS sv FROM zs, g),
        | lv AS (SELECT n, CASE WHEN max_u < u_lo OR min_u > u_hi
        |     OR max_t < t_lo OR min_t > t_hi THEN 0 ELSE 1 END AS sv FROM ls, g)
        |SELECT layout, files_total, files_scanned, rows_total, rows_scanned FROM (
        |  SELECT 'zorder' AS layout, cast(count(*) as bigint) AS files_total,
        |    cast(sum(sv) as bigint) AS files_scanned, cast(sum(n) as bigint) AS rows_total,
        |    cast(sum(CASE WHEN sv = 1 THEN n ELSE 0 END) as bigint) AS rows_scanned FROM zv
        |  UNION ALL
        |  SELECT 'linear', cast(count(*) as bigint), cast(sum(sv) as bigint),
        |    cast(sum(n) as bigint), cast(sum(CASE WHEN sv = 1 THEN n ELSE 0 END) as bigint) FROM lv
        |) u ORDER BY layout""".stripMargin

  /** fingerprints oracle: the same base-31 polynomial k-gram hash
    * (k = 8, window = 4) as TextAnalysis.fingerprints, spelled out as
    * list-lambda SQL (character positions are 1-based in DuckDB).
    */
  private def fingerprintsOracleSql: String = {
    val k = 8; val window = 4
    val pow = Iterator.iterate(1L)(_ * 31L).take(k).toArray // 31^0..31^(k-1)
    val gram = (0 until k)
      .map(j => s"cast(unicode(text[i+$j:i+$j]) as bigint) * ${pow(k - 1 - j)}")
      .mkString(" + ")
    s"""WITH h AS (SELECT doc_id,
       |   list_transform(generate_series(1, greatest(length(text) - ${k - 1}, 0)),
       |     i -> $gram) AS hs
       |  FROM documents),
       | f AS (SELECT doc_id,
       |   list_distinct(list_transform(generate_series(1, greatest(len(hs) - ${window - 1}, 0)),
       |     w -> list_min(hs[w:w+${window - 1}]))) AS fps FROM h)
       | SELECT doc_id, unnest(fps) AS fingerprint FROM f
       | ORDER BY doc_id, fingerprint""".stripMargin
  }

  /** lang_id oracle: per-language n-gram hit counts via `contains`,
    * argmax in the same fixed order as TextAnalysis.langProfiles
    * (ties → earlier language, zero hits → 'und').
    */
  private def langIdOracleSql: String = {
    val scores = TextAnalysis.langProfiles.map { case (l, ps) =>
      l -> ps.map(p => s"CASE WHEN contains(text, '$p') THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
    }
    val scoreCols = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
    val m = scores.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val pick = scores.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    s"""SELECT doc_id, CASE WHEN m = 0 THEN 'und' $pick END AS lang_pred,
       | cast(m as int) AS lang_votes
       | FROM (SELECT doc_id, $m AS m, ${scores.map(s => "s_" + s._1).mkString(", ")}
       |       FROM (SELECT doc_id, $scoreCols FROM documents) s0) s1
       | ORDER BY doc_id""".stripMargin
  }

  /** The rounded quality-score expression (TextAnalysis.qualityScore
    * arithmetic, mirrored exactly) — shared by q22 and curation_exact.
    */
  private def qualityExprSql: String = {
    val tok = s"($tokSql)"
    val meanWordLen = s"(cast(length(text) - $tok + 1 as double) / $tok)"
    val stopHits = s"((length(text) - length(replace(text, 'the', ''))) / 3 + " +
      s"(length(text) - length(replace(text, ' a ', ''))) / 3)"
    val stopRatio = s"(cast($stopHits as double) / $tok)"
    val lenScore = s"(1.0 - least(abs($meanWordLen - 5.5) / 5.5, 1.0))"
    val stopScore = s"(1.0 - least(abs($stopRatio - 0.1) * 5.0, 1.0))"
    s"round($lenScore * 0.6 + $stopScore * 0.4, 6)"
  }

  /** q22 oracle: mirrors TextAnalysis.qualityScore arithmetic exactly. */
  private def qualityOracleSql: String =
    s"SELECT doc_id, $qualityExprSql AS quality FROM documents ORDER BY doc_id"

  /** curation_exact oracle: exact dedup (q20's min-doc_id-per-md5 rule) →
    * token floor → quality gate on the ROUNDED score (both engines decide
    * the boundary on the same 1e-6 grid) → hash-threshold token budget
    * with the engine's exact `trunc(budget/total · 10^6)` arithmetic
    * (integer bucket vs integer threshold — no float boundary).
    */
  private def curationExactOracleSql: String = {
    val budget = 20000L; val minTokens = 5; val minQuality = "0.1"
    s"""WITH exact AS (
       |  SELECT doc_id, lang, text,
       |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM documents),
       | g AS (
       |  SELECT doc_id, lang, text, $tokSql AS tokens, $qualityExprSql AS quality
       |  FROM exact WHERE rn = 1),
       | gated AS (SELECT * FROM g WHERE tokens >= $minTokens AND quality >= $minQuality),
       | tot AS (SELECT sum(tokens) AS total FROM gated)
       | SELECT doc_id, lang, cast(tokens as int) AS tokens, quality
       | FROM gated, tot
       | WHERE total <= $budget OR
       |   (cast(concat('0x', substr(md5(text), 1, 8)) as bigint) % 1000000)
       |     < cast(trunc(cast($budget as double) / total * 1000000) as bigint)
       | ORDER BY doc_id""".stripMargin
  }

  /** The portable-minhash CTE chain over an input relation
    * `src(doc_id, text)` (rows already length-filtered): positions →
    * polynomial shingle hashes → 16 affine min-hashes mod 2³¹−1 →
    * 4-slot band keys → rank ≤ 64 hot-bucket cap → candidate pairs →
    * `scored(a, b, n_match)`. One definition feeds both the standalone
    * minhash_portable oracle and the curation composite's near-dup
    * stage so the two cannot drift apart.
    */
  /** The delta-vs-corpus probe CTEs shared by the delta_pairs and
    * delta_dedup oracles: corpus rows (doc_id % 8 ≠ 7) get the rank≤64
    * bucket cap, delta rows (doc_id % 8 = 7) probe uncapped, agreement
    * is counted over the same 16 per-doc hash slots. Assumes
    * portableMinhashCtes' hj/band CTEs are in scope.
    */
  private val deltaProbeCtes: String =
    """ crk AS (SELECT doc_id, band, bkey,
      |  row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS r
      |  FROM band WHERE doc_id % 8 <> 7),
      | vc AS (SELECT DISTINCT db.doc_id AS delta_id, c.doc_id AS corpus_id
      |  FROM band db JOIN crk c USING (band, bkey)
      |  WHERE db.doc_id % 8 = 7 AND c.r <= 64),
      | vs AS (SELECT v.delta_id, v.corpus_id,
      |  sum(CASE WHEN ha.h = hb.h THEN 1 ELSE 0 END) AS n_match
      |  FROM vc v JOIN hj ha ON ha.doc_id = v.delta_id
      |  JOIN hj hb ON hb.doc_id = v.corpus_id AND hb.j = ha.j
      |  GROUP BY v.delta_id, v.corpus_id)""".stripMargin

  private def portableMinhashCtes(src: String): String =
    s""" pos AS (SELECT doc_id, text, unnest(range(1, length(text) - 3)) AS i FROM $src),
       | gr AS (SELECT doc_id,
       |  (((((cast(ord(substr(text, cast(i as int), 1)) as bigint)) * 131
       |     + ord(substr(text, cast(i as int)+1, 1))) * 131
       |     + ord(substr(text, cast(i as int)+2, 1))) * 131
       |     + ord(substr(text, cast(i as int)+3, 1))) * 131
       |     + ord(substr(text, cast(i as int)+4, 1))) % 2147483647 AS g
       |  FROM pos),
       | hj AS (SELECT doc_id, j,
       |  min(((7919 * (j + 1)) % 2147483647 * g + (104729 * (j + 1)) % 2147483647) % 2147483647) AS h
       |  FROM gr CROSS JOIN (SELECT unnest(range(0, 16)) AS j) seeds
       |  GROUP BY doc_id, j),
       | band AS (SELECT doc_id, j // 4 AS band, string_agg(h::VARCHAR, ',' ORDER BY j) AS bkey
       |  FROM hj GROUP BY doc_id, j // 4),
       | rk AS (SELECT doc_id, band, bkey,
       |  row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS r FROM band),
       | cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM rk a JOIN band b USING (band, bkey)
       |  WHERE a.r <= 64 AND a.doc_id < b.doc_id),
       | scored AS (SELECT c.a, c.b,
       |  sum(CASE WHEN ha.h = hb.h THEN 1 ELSE 0 END) AS n_match
       |  FROM cand c
       |  JOIN hj ha ON ha.doc_id = c.a
       |  JOIN hj hb ON hb.doc_id = c.b AND hb.j = ha.j
       |  GROUP BY c.a, c.b)""".stripMargin

  /** curation_portable oracle: curationExactOracleSql's stages PLUS the
    * near-dup drop, whose candidate pairs the oracle recomputes with the
    * same portable minhash pipeline as the standalone minhash_portable
    * oracle — run over the exact-dedup SURVIVORS, exactly as the engine
    * does. minMatch 14/16 ≈ the production 0.85 Jaccard threshold.
    */
  private def curationPortableOracleSql: String = {
    val budget = 20000L; val minTokens = 5; val minQuality = "0.1"
    val minMatch = 14
    s"""WITH exact AS (
       |  SELECT doc_id, lang, text,
       |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM documents),
       | surv AS (SELECT doc_id, lang, text FROM exact WHERE rn = 1),
       | d5 AS (SELECT doc_id, text FROM surv WHERE length(text) >= 5),
       |${portableMinhashCtes("d5")},
       | losers AS (SELECT DISTINCT b AS doc_id FROM scored WHERE n_match >= $minMatch),
       | kept AS (SELECT s.doc_id, s.lang, s.text FROM surv s
       |  LEFT JOIN losers l ON s.doc_id = l.doc_id WHERE l.doc_id IS NULL),
       | g AS (SELECT doc_id, lang, text, $tokSql AS tokens, $qualityExprSql AS quality FROM kept),
       | gated AS (SELECT * FROM g WHERE tokens >= $minTokens AND quality >= $minQuality),
       | tot AS (SELECT sum(tokens) AS total FROM gated)
       | SELECT doc_id, lang, cast(tokens as int) AS tokens, quality
       | FROM gated, tot
       | WHERE total <= $budget OR
       |   (cast(concat('0x', substr(md5(text), 1, 8)) as bigint) % 1000000)
       |     < cast(trunc(cast($budget as double) / total * 1000000) as bigint)
       | ORDER BY doc_id""".stripMargin
  }

  /** kg_scores oracle: per-label fused score via substring counting. */
  private def kgScoresOracleSql: String = {
    val cols = docDict.map { case (label, term) => s"${scoreSql(term)} AS $label" }
    s"SELECT doc_id, ${cols.mkString(", ")} FROM documents ORDER BY doc_id"
  }

  /** kg_depicts oracle: one UNION ALL branch per dictionary label,
    * emitting (doc_id, visCode, classification, segmentation) for
    * score > 0 — the reference's emit rule (frame.py:65-73).
    */
  private def kgDepictsOracleSql: String = {
    val dictTerms = docDict.toMap
    val branches = Ontology.linkDict.toSeq.sortBy(_._1).map { case (label, vis) =>
      val term = dictTerms(label)
      val c = cntSql(term)
      s"""SELECT doc_id, '$vis' AS vis_code,
         | least($c / 8.0, 1.0) AS classification,
         | $c * ${term.length} / length(text) AS segmentation
         | FROM documents WHERE ${scoreSql(term)} > 0""".stripMargin
    }
    s"SELECT * FROM (${branches.mkString(" UNION ALL ")}) t ORDER BY doc_id, vis_code"
  }

  private def kgShipTableOracleSql: String = {
    val dictTerms = docDict.toMap
    val cols = tableDefectLabels.map { l =>
      s"cast(sum(CASE WHEN ${scoreSql(dictTerms(l))} >= 1 THEN 1 ELSE 0 END) as bigint) AS ${l}_docs"
    }
    s"SELECT source, ${cols.mkString(", ")}, count(*) AS n_docs " +
      "FROM documents GROUP BY 1 ORDER BY 1"
  }

  /** fuzzy_link oracle: LSH blocking is a candidate-generation
    * optimization — at oracle scale its candidates contain the global
    * best entity, so exact argmax trigram Jaccard over the whole
    * (broadcast-sized) ontology states the intended semantics directly.
    */
  private def fuzzyLinkOracleSql: String = {
    val vals = Ontology.entries.sortBy(_.visCode)
      .map(e => s"('${e.visCode}', '${e.name.replace("'", "''")}')").mkString(", ")
    s"""WITH ent AS (SELECT entity_id,
       |    lower(regexp_replace(name, '[^a-zA-Z0-9]+', ' ', 'g')) AS e_norm
       |  FROM (VALUES $vals) t(entity_id, name)),
       | m AS (SELECT doc_id AS mention_id, 'propeler arangement' AS m_norm
       |       FROM documents WHERE doc_id < 200),
       | eg AS (SELECT entity_id, list_distinct(list_transform(
       |    generate_series(1, greatest(length(e_norm) - 2, 1)), i -> e_norm[i:i+2])) AS eg FROM ent),
       | mg AS (SELECT mention_id, list_distinct(list_transform(
       |    generate_series(1, greatest(length(m_norm) - 2, 1)), i -> m_norm[i:i+2])) AS mg FROM m),
       | scored AS (SELECT mention_id, entity_id,
       |    cast(len(list_intersect(mg, eg)) as double)
       |      / len(list_distinct(list_concat(mg, eg))) AS score
       |  FROM mg CROSS JOIN eg),
       | best AS (SELECT mention_id, entity_id, score,
       |    row_number() OVER (PARTITION BY mention_id ORDER BY score DESC, entity_id) AS rn
       |  FROM scored WHERE score >= 0.4)
       | SELECT cast(mention_id as bigint) AS mention_id, entity_id,
       |   round(score, 6) AS score, 'minhash_lsh' AS method
       | FROM best WHERE rn = 1 ORDER BY mention_id""".stripMargin
  }

  /** pii_scrub oracle: the same planting CASEs and the same regexes
    * (chosen inside the Java-regex ∩ RE2-compatible subset, so Spark's
    * regexp_replace and DuckDB's agree match-for-match).
    */
  private def piiScrubOracleSql: String = {
    // DuckDB standard strings keep backslashes literal — the Scala
    // constants interpolate verbatim
    val e = TextAnalysis.emailRe
    val p = TextAnalysis.phoneRe
    s"""WITH p1 AS (SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0
       |         THEN text || ' contact user' || cast(doc_id as varchar) || '@example.com soon'
       |         ELSE text END AS t1
       |  FROM documents),
       | p2 AS (SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 0 THEN t1 || ' call 555-867-5309 today' ELSE t1 END AS text
       |  FROM p1),
       | s1 AS (SELECT doc_id,
       |    cast(len(string_split_regex(text, '$e')) - 1 as int) AS n_emails,
       |    regexp_replace(text, '$e', '<EMAIL>', 'g') AS te
       |  FROM p2)
       | SELECT doc_id,
       |  regexp_replace(te, '$p', '<PHONE>', 'g') AS text_scrubbed, n_emails,
       |  cast(len(string_split_regex(te, '$p')) - 1 as int) AS n_phones
       | FROM s1 ORDER BY doc_id""".stripMargin
  }

  /** pca_reduce oracle: mirrors Reduce.pcaDet operation-for-operation.
    * Integer-quantized sums make mean/std/covariance bit-identical
    * across engines (exact, summation-order-free); the fixed-iteration
    * power method + deflation then runs in a recursive CTE with the
    * same index-order float arithmetic (list_reduce folds left-to-right
    * like the Scala loops), so the sign-canonicalized projections agree
    * exactly — not just to a tolerance.
    */
  private def pcaReduceOracleSql: String = {
    val D = 64; val K = 8; val T = 100
    def dot(a: String, b: String): String =
      s"list_reduce(list_transform(generate_series(1, $D), dj -> $a[dj] * $b[dj]), (ax, ay) -> ax + ay)"
    val muExpr = s"cast(s1 as double) / 1e7 / n"
    s"""WITH RECURSIVE
       | raw AS (SELECT cast(vec_id as varchar) AS id, cast(embedding as double[]) AS v FROM embeddings),
       | cnt AS (SELECT cast(count(*) as bigint) AS n FROM raw),
       | rq AS (SELECT id, list_transform(v, x -> cast(round(x * 1e7, 0) as bigint)) AS r FROM raw),
       | st AS (SELECT j, sum(r[j]) AS s1, sum(r[j] * r[j]) AS s2
       |        FROM rq CROSS JOIN generate_series(1, $D) t(j) GROUP BY j),
       | stm AS (SELECT j, $muExpr AS mu,
       |    sqrt(greatest((cast(s2 as double) / 1e14 - ($muExpr) * ($muExpr) * n) / (n - 1), 0.0)) AS sd
       |  FROM st, cnt),
       | stl AS (SELECT list(mu ORDER BY j) AS mus,
       |         list(CASE WHEN sd > 1e-12 THEN sd ELSE 1.0 END ORDER BY j) AS sds FROM stm),
       | svt AS (SELECT id, list_transform(generate_series(1, $D), j -> (v[j] - mus[j]) / sds[j]) AS s
       |         FROM raw, stl),
       | qv AS (SELECT id, list_transform(s, x -> cast(round(x * 1e6, 0) as bigint)) AS q FROM svt),
       | ex AS (SELECT id, j, q[j] AS x FROM qv CROSS JOIN generate_series(1, $D) t(j)),
       | cv AS (SELECT a.j AS i, b.j AS j2, cast(sum(a.x * b.x) as double) / 1e12 / (n - 1) AS val
       |        FROM ex a JOIN ex b USING (id), cnt GROUP BY a.j, b.j, n),
       | cm AS (SELECT list(rl ORDER BY i) AS m FROM
       |         (SELECT i, list(val ORDER BY j2) AS rl FROM cv GROUP BY i)),
       | it(comp, iter, m, v) AS (
       |   SELECT 1, 0, (SELECT m FROM cm),
       |     (SELECT list_transform(r0, x -> x / sqrt(${dot("r0", "r0")})) FROM
       |       (SELECT list_transform(generate_series(1, $D),
       |          j -> cast((j * 2654435761 + 97) % 1000 + 1 as double)) AS r0))
       |   UNION ALL
       |   SELECT CASE WHEN iter < $T THEN comp ELSE comp + 1 END,
       |          CASE WHEN iter < $T THEN iter + 1 ELSE 0 END,
       |          CASE WHEN iter < $T THEN m ELSE
       |            list_transform(generate_series(1, $D), di ->
       |              list_transform(generate_series(1, $D), dj2 -> m[di][dj2] - lam * v[di] * v[dj2])) END,
       |          CASE WHEN iter < $T THEN list_transform(w, x -> x / wn)
       |               ELSE list_transform(r0, x -> x / rn0) END
       |   FROM (
       |     SELECT comp, iter, m, v, w, r0,
       |            sqrt(${dot("w", "w")}) AS wn, ${dot("v", "w")} AS lam,
       |            sqrt(${dot("r0", "r0")}) AS rn0
       |     FROM (
       |       SELECT comp, iter, m, v,
       |         list_transform(m, mr -> ${dot("mr", "v")}) AS w,
       |         list_transform(generate_series(1, $D),
       |           j -> cast((j * 2654435761 + (comp + 1) * 97) % 1000 + 1 as double)) AS r0
       |       FROM it WHERE iter < $T OR comp < $K) s0) s1),
       | comps AS (SELECT comp, v FROM it WHERE iter = $T),
       | canon AS (SELECT comp,
       |    CASE WHEN v[list_position(list_transform(v, x -> abs(x)),
       |                list_max(list_transform(v, x -> abs(x))))] < 0
       |         THEN list_transform(v, x -> -x) ELSE v END AS v
       |   FROM comps)
       | SELECT s.id, cast(c.comp - 1 as int) AS dim,
       |   round(${dot("s.s", "c.v")}, 6) AS value
       | FROM svt s CROSS JOIN canon c ORDER BY id, dim""".stripMargin
  }

  private def kgPartRollupOracleSql: String = {
    val dictTerms = docDict.toMap
    val branches = Ontology.linkDict.toSeq.sortBy(_._1).map { case (label, vis) =>
      s"SELECT doc_id, '${ontologyRoot(vis)}' AS root_vis FROM documents " +
        s"WHERE ${scoreSql(dictTerms(label))} > 0"
    }
    s"SELECT root_vis, count(*) AS n_mentions FROM (${branches.mkString(" UNION ALL ")}) t " +
      "GROUP BY 1 ORDER BY 1"
  }
}
