import graft.corpus.CorpusGen
import graft.extract.MentionExtractor
import graft.link.ShipCatalog
import graft.extract.CompiledDict
object Dbg {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[dbg] $name: ${(System.nanoTime()-t0)/1e9}%.1fs"); r
  }
  def main(a: Array[String]): Unit = {
    val cores = a(0).toInt
    implicit val spark = graft.core.GraftSession(cores, "dbg")
    val cfg = CorpusGen.Config(400000, 267, partitions = cores * 2)
    val corpus = CorpusGen.corpus(spark, cfg)
    time("corpus count")(corpus.count())
    val feats = MentionExtractor.extract(corpus, CompiledDict.selfNamed)
    time("extract count")(feats.count())
    val frames = MentionExtractor.frames(feats, graft.core.Ontology.allLabels, ShipCatalog.dim(corpus))
    time("frames count")(frames.count())
    time("frames write")(frames.write.mode("overwrite").parquet("/tmp/dbg_frames"))
    spark.stop()
  }
}
