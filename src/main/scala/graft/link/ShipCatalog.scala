package graft.link

import graft.core.{CorpusRow, GraftHash, Rng}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Ship/inspection dimension, one row per `repo` (the repo scopes rows
  * the way a ship/inspection scopes frames — FIXTURES.md §1).
  *
  * In the reference this metadata comes from a per-video JSON
  * (`InspectionMetadata.read_or_ask`, inspection_video_input.py:42-63);
  * here it is a pure deterministic function of the repo name, shared by
  * the engine and the golden oracle as part of the corpus *specification*.
  * The ids reproduce `detid` exactly (inspection_video_input.py:56-58).
  */
object ShipCatalog {

  final case class ShipRow(
      repo: String,
      ship_name: String,
      imo: String,
      inspection_date: String,
      ship_id: Long,
      inspection_id: Long,
      ship_heading: Option[Double]
  )

  def shipFor(repo: String): ShipRow = {
    val imoNum = 1000000L + java.lang.Long.remainderUnsigned(Rng.hashString("imo:" + repo), 9000000L)
    val imo = s"IMO$imoNum"
    val date = "2023-01-15"
    // per-inspection ship heading, sometimes absent — the reference reads
    // `coalesce(insp.ship_heading, 0)` (data_manager.py:36,205), so B3/B13
    // must be parameterized per inspection, nulls included
    val heading =
      if (java.lang.Long.remainderUnsigned(Rng.hashString("shiphdg:" + repo), 4L) == 0L) None
      else Some(java.lang.Long.remainderUnsigned(Rng.hashString("hdgval:" + repo), 3600L) / 10.0)
    ShipRow(repo, repo, imo, date,
      ship_id = GraftHash.detid(repo),
      inspection_id = GraftHash.detid(imo + date),
      ship_heading = heading)
  }

  /** A29 (inspection_video_input.py:66-70): deterministic name
    * anonymization — seeded pick from a fixed substitution list
    * (seeded, so re-runs and resume produce identical graphs).
    */
  private val pseudonyms = Vector("Skarv", "Havörn", "Terna", "Lunde", "Alke",
    "Teist", "Krykkje", "Mase", "Stormfugl", "Lomvi")

  def anonymizeName(name: String): String = {
    val h = java.lang.Long.remainderUnsigned(Rng.hashString("anon:" + name), pseudonyms.size.toLong)
    s"${pseudonyms(h.toInt)}-${GraftHash.detid(name) % 1000}"
  }

  /** Distinct-repo scan → dimension. Tiny (|repos| rows): always the
    * broadcast side of downstream joins.
    */
  def dim(corpus: Dataset[CorpusRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.corpus.CorpusGen.configOf(corpus) match {
      case Some(cfg) =>
        // the generator assigns repo = repoName(id % nRepos) round-robin,
        // so the distinct-repo set is exactly repoName(0 until
        // min(nRepos, rows)) — derive the dimension from the corpus SPEC
        // instead of re-generating every row's content just to distinct
        // one column (the dim scan was a full second corpus generation
        // per pipeline run; guide §1.2 "don't compute things you throw
        // away"). Identical output set; only applies to the untransformed
        // Dataset [[graft.corpus.CorpusGen.corpus]] returned.
        val n = math.min(cfg.nRepos.toLong, cfg.rows)
        spark.range(0L, n).map(i =>
          shipFor(graft.corpus.CorpusGen.repoName(i.toInt))).toDF()
      case None =>
        corpus.select("repo").as[String].distinct().map(shipFor).toDF()
    }
  }
}
