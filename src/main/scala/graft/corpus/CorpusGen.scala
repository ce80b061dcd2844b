package graft.corpus

import graft.core.{CorpusRow, Ontology, Rng}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code corpus in the exact
  * BASELINE.json `input_hint` shape:
  * `corpus(repo, path, commit, lang, content)`.
  *
  * Every field derives from the row id alone (splitmix64 keyed by id),
  * so the corpus is byte-identical across partition counts — required
  * for the local[8]-vs-local[32] scaling protocol and the resume test.
  *
  * `content` is a token stream that embeds the reference's finding
  * labels (data/inspection/image_node.py:33) with planted per-row
  * frequencies, so the two scoring channels (classifier-analog > 0.5,
  * segmenter-analog > 0.01; image_node.py:36,41) produce known scores.
  * Hot-key skew: the ubiquitous classes (`ship_hull`, `marine_growth`)
  * appear in ~90% of rows — the skew axis the north rule calls out.
  */
object CorpusGen {

  final case class Config(
      rows: Long,
      nRepos: Int = 20,
      seed: Long = 42L,
      partitions: Int = 32,
      // per-row probability a given label is mentioned at all
      hotLabelProb: Double = 0.90,
      coldLabelProb: Double = 0.25
  )

  private val langs = Array("scala", "java", "python", "md", "txt")
  private val hotLabels = Set("ship_hull", "marine_growth")

  // precomputed filler vocabulary — the hot loop must not run a
  // java.util.Formatter per token (GC throughput caps scaling at
  // high thread counts)
  private val fillerVocab: Array[String] =
    Array.tabulate(1000)(i => "w" + (if (i < 10) "00" else if (i < 100) "0" else "") + i)

  /** Datasets produced by [[corpus]], keyed by logical plan (weakly, so
    * plans die with their Datasets): lets consumers that only need the
    * corpus SPEC — e.g. the distinct-repo dimension, a pure function of
    * `nRepos` — skip a full content-generation scan. Only the exact
    * Dataset instance returned by [[corpus]] matches; any transformation
    * produces a different plan and falls back to the generic scan.
    */
  private val cfgRegistry = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Any, Config]())

  def configOf(ds: Dataset[_]): Option[Config] =
    Option(cfgRegistry.get(ds.queryExecution.logical))

  def corpus(spark: SparkSession, cfg: Config): Dataset[CorpusRow] = {
    import spark.implicits._
    val parts = cfg.partitions
    val ds = spark.range(0L, cfg.rows, 1L, parts).map(id => genRow(id, cfg))
    cfgRegistry.put(ds.queryExecution.logical, cfg)
    ds
  }

  /** repo index for a row: uniform round-robin; frame ordinal within repo. */
  def repoIdx(id: Long, cfg: Config): Int = (id % cfg.nRepos).toInt
  def frameNumber(id: Long, cfg: Config): Long = id / cfg.nRepos

  def repoName(idx: Int): String = f"vessel_$idx%05d"

  /** path encodes the frame ordinal; MentionExtractor parses it back. */
  def pathFor(frameNo: Long, ext: String): String = s"src/inspection/f_$frameNo.$ext"

  def genRow(id: Long, cfg: Config): CorpusRow = {
    val rng = new Rng(Rng.mix(cfg.seed, id))
    val rIdx = repoIdx(id, cfg)
    val frameNo = frameNumber(id, cfg)
    val lang = langs(rng.nextInt(langs.length))

    // planted mention counts per label
    val labels = Ontology.allLabels
    val counts = new Array[Int](labels.length)
    var i = 0
    while (i < labels.length) {
      val p = if (hotLabels(labels(i))) cfg.hotLabelProb else cfg.coldLabelProb
      counts(i) = if (rng.nextDouble() < p) 1 + rng.nextInt(12) else 0
      i += 1
    }

    // filler tokens from a disjoint vocabulary (w###: never collides with
    // any label substring); single pre-sized array + one StringBuilder —
    // no per-token Formatter, no O(n²) inserts
    val nFiller = 30 + rng.nextInt(120)
    val tokens = new Array[String](nFiller)
    i = 0
    while (i < nFiller) { tokens(i) = fillerVocab(rng.nextInt(1000)); i += 1 }
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    buf.sizeHint(nFiller + 32)
    buf ++= tokens
    i = 0
    while (i < labels.length) {
      var c = counts(i)
      while (c > 0) {
        buf.insert(rng.nextInt(buf.length + 1), labels(i))
        c -= 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(buf.length * 8)
    i = 0
    while (i < buf.length) {
      if (i > 0) sb.append(' ')
      sb.append(buf(i))
      i += 1
    }
    val content = sb.toString

    val h1 = rng.nextLong(); val h2 = rng.nextLong()
    // manual zero-padded hex == format("%016x%016x", h1, h2) duplicated
    // and cut to 40 — java.util.Formatter was ~10% of row generation
    val hx = new java.lang.StringBuilder(32)
    var hi = 0
    while (hi < 2) {
      val s = java.lang.Long.toHexString(if (hi == 0) h1 else h2)
      var p = s.length
      while (p < 16) { hx.append('0'); p += 1 }
      hx.append(s); hi += 1
    }
    val s32 = hx.toString
    val commit = s32 + s32.substring(0, 8)
    CorpusRow(repoName(rIdx), pathFor(frameNo, lang), commit, lang, content)
  }

  /** Single-threaded generator for golden-oracle tests (no Spark). */
  def localRows(cfg: Config): Seq[CorpusRow] =
    (0L until cfg.rows).map(genRow(_, cfg))
}
