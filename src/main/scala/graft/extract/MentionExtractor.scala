package graft.extract

import graft.core.{CorpusRow, Rng}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-frame features after the extract stage (stage 1). Label-indexed
  * arrays use the fixed label order of the dictionary passed to
  * [[MentionExtractor.extract]] — arrays, not maps, to keep the shuffled
  * payload compact at 10^12-row scale.
  */
final case class FrameFeatures(
    repo: String,
    path: String,
    lang: String,
    framenumber: Long,
    contentLen: Int,
    tokenCount: Int,
    // telemetry analog (A21 feature source + B3/B13 heading queries)
    depth: Double,
    heading: Double,
    pitch: Double,
    roll: Double,
    cameraTilt: Double,
    rangefinder: Double,
    counts: Array[Int],
    cls: Array[Double],
    cov: Array[Double],
    score: Array[Int]
)

/** Stage 1 — batched mention detection (reference A6/A8 analog):
  * a map-only `mapPartitions` pass; the dictionary automaton is compiled
  * once per partition (north_star requirement), rows stream through it.
  * No shuffle is introduced: downstream stages join on broadcast dims.
  */
object MentionExtractor {

  def extract(corpus: Dataset[CorpusRow], dict: Seq[(String, String)])(
      implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    corpus.mapPartitions { rows =>
      val compiled = CompiledDict(dict) // compiled once per partition
      rows.map { r =>
        val counts = compiled.countAll(r.content)
        val n = counts.length
        val cls = new Array[Double](n)
        val cov = new Array[Double](n)
        val score = new Array[Int](n)
        var i = 0
        while (i < n) {
          cls(i) = DictAnalyzer.classifierProb(counts(i))
          cov(i) = DictAnalyzer.coverage(counts(i), compiled.terms(i).length, r.content.length)
          score(i) = DictAnalyzer.score(cls(i), cov(i))
          i += 1
        }
        val fno = frameNumberOf(r.path)
        val tel = telemetry(r.repo, fno)
        FrameFeatures(r.repo, r.path, r.lang, fno, r.content.length,
          tokenCountOf(r.content), tel(0), tel(1), tel(2), tel(3), tel(4), tel(5),
          counts, cls, cov, score)
      }
    }
  }

  /** Frame ordinal: first digit run in the path (CorpusGen plants it),
    * else a deterministic hash fallback.
    */
  def frameNumberOf(path: String): Long = {
    var i = 0
    while (i < path.length && !path.charAt(i).isDigit) i += 1
    if (i == path.length) math.abs(Rng.hashString(path)) % 1000000000L
    else {
      var v = 0L; var j = i
      while (j < path.length && path.charAt(j).isDigit && v < 100000000000L) {
        v = v * 10 + (path.charAt(j) - '0'); j += 1
      }
      v
    }
  }

  def tokenCountOf(content: String): Int = {
    var n = 1; var i = 0
    while (i < content.length) { if (content.charAt(i) == ' ') n += 1; i += 1 }
    if (content.isEmpty) 0 else n
  }

  /** Deterministic telemetry analog of the interpolated channels
    * (ass_telemetry_reader.py:59-83) — pure function of
    * (repo, framenumber), but *smooth* in framenumber like real ROV
    * telemetry: heading drifts at a per-repo rate with occasional
    * maneuvers (so mosaic sessionization sees realistic runs), depth
    * follows a slow dive profile.
    */
  def telemetry(repo: String, framenumber: Long): Array[Double] = {
    val repoH = Rng.hashString(repo)
    val base = new Rng(repoH)
    val baseHeading = base.nextDouble() * 360.0
    val driftRate = base.nextDouble() * 4.0 - 2.0 // deg/frame
    val diveDepth = 5.0 + base.nextDouble() * 20.0
    // occasional maneuver: every ~40 frames the heading jumps
    val leg = framenumber / 40
    val legRng = new Rng(Rng.mix(repoH, leg))
    val legOffset = legRng.nextDouble() * 360.0
    val rng = new Rng(Rng.mix(repoH, framenumber))
    val noise = rng.nextDouble() * 6.0 - 3.0
    val heading = (((baseHeading + legOffset + (framenumber % 40) * driftRate + noise) % 360.0) + 360.0) % 360.0
    Array(
      diveDepth + 3.0 * math.sin(framenumber / 50.0) + rng.nextDouble() * 0.4, // Depth
      heading,
      rng.nextDouble() * 20.0 - 10.0,   // Pitch
      rng.nextDouble() * 20.0 - 10.0,   // Roll
      rng.nextDouble() * 30.0 - 15.0,   // Camera Tilt
      rng.nextDouble() * 10.0           // Rangefinder
    )
  }

  /** Flatten features into the wide `frames` table (reference Frame node
    * property set, SURVEY.md §1.1): one typed column per hot property so
    * query-surface filters push down to the parquet scan. `shipsDim` is a
    * small dimension (one row per repo) joined with an explicit broadcast.
    */
  def frames(features: Dataset[FrameFeatures], labels: Seq[String],
             shipsDim: DataFrame): DataFrame = {
    val labelCols = labels.zipWithIndex.flatMap { case (l, i) =>
      Seq(
        col("score")(i).as(l),
        col("cls")(i).as(s"${l}_classification"),
        col("cov")(i).as(s"${l}_segmentation")
      )
    }
    // quality-metric analog (A10, image_quality.py:19-61): deterministic
    // arithmetic statistic of the content — portable to the SQL oracle.
    val uciqe =
      (pmod(col("contentLen"), lit(101)) / 101.0) * 20.0 +
        (pmod(col("tokenCount"), lit(97)) / 97.0) * 30.0

    features
      .join(broadcast(shipsDim), Seq("repo"))
      .select(
        Seq(
          concat(col("inspection_id"), lit("."), col("framenumber")).as("frame_id"),
          // reference Frame.thumbnail = "{frame_id}.jpg" (pipeline/
          // pipeline.py:116) — the B3 coalesce falls back to this
          concat(col("inspection_id"), lit("."), col("framenumber"), lit(".jpg"))
            .as("thumbnail"),
          col("repo"), col("path"), col("lang"),
          col("imo"), col("ship_id"), col("ship_name"),
          col("inspection_id"), col("inspection_date"), col("ship_heading"),
          col("framenumber"), col("framenumber").as("frame_index"),
          col("contentLen").as("n_chars"), col("tokenCount").as("n_tokens"),
          uciqe.as("uciqe"),
          col("depth").as("Depth"), col("heading").as("Heading"),
          col("pitch").as("Pitch"), col("roll").as("Roll"),
          col("cameraTilt").as("CameraTilt"),
          col("rangefinder").as("Rangefinder")
        ) ++ labelCols: _*
      )
  }
}
