package graft

import graft.corpus.CorpusGen
import graft.extract.{CompiledDict, MentionExtractor}
import graft.link.ShipCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extra-measurement harness (guide §1.4): times individual pipeline
  * stages in isolation with a noop sink, so the optimization round can
  * attribute wall seconds to operators without touching the frozen
  * [[Bench]] protocol. Not part of the driver contract.
  *
  * Usage: runMain graft.BenchExtra <rows> <cores> [stage...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 800000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val stages: Set[String] =
      if (args.length > 2) args.drop(2).toSet else Set("all")
    def want(s: String): Boolean = stages.contains("all") || stages.contains(s)

    implicit val spark: org.apache.spark.sql.SparkSession =
      Bench.session(cores)
    import graft.canon.{Dbscan, KnnJoin, SimilarityPipeline => SP}

    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) taskMs.addAndGet(te.taskMetrics.executorRunTime)
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime(); val m0 = taskMs.get()
      val r = f
      // small sleep so straggler task-end events land in the window
      Thread.sleep(150)
      println(f"[bench-extra] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  task=${(taskMs.get() - m0) / 1000.0}%8.1f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    val nRepos = math.max((rows / 1500).toInt, 1)
    val corpus = CorpusGen.corpus(spark,
      CorpusGen.Config(rows, nRepos, partitions = cores * 2))
    val labels = CompiledDict.selfNamed.map(_._1)

    if (want("corpus")) timed("corpus_gen")(noop(corpus.toDF()))

    val ships = ShipCatalog.dim(corpus)
    val features = MentionExtractor.extract(corpus, CompiledDict.selfNamed)
    if (want("extract")) timed("extract")(noop(features.toDF()))

    val frames = timed("frames_checkpoint") {
      MentionExtractor.frames(features, labels, ships).localCheckpoint(true)
    }

    if (want("phase1")) timed("phase1_triples") {
      import graft.materialize.TripleBuilder
      import graft.link.EntityLinker
      noop(TripleBuilder.hasOntology(ships)
        .unionByName(TripleBuilder.hasInspection(ships))
        .unionByName(TripleBuilder.hasFrame(frames))
        .unionByName(EntityLinker.depicts(frames, labels)))
    }

    if (want("mosaics")) timed("mosaics") {
      val (t, n) = graft.materialize.Mosaics.build(frames, labels)
      noop(t); noop(n)
    }

    val tele = SP.telemetryFeatures(frames)
    val cont = SP.contentFeatures(frames, labels)

    if (want("std")) {
      timed("standardize_tele")(noop(SP.standardize(tele, SP.TeleDims)))
      timed("standardize_content")(noop(SP.standardize(cont, SP.contentDims(labels))))
    }

    if (want("knn")) {
      val stdTele = SP.standardize(tele, SP.TeleDims)
      val stdCont = SP.standardize(cont, SP.contentDims(labels))
      timed("knn_tele_total")(noop(KnnJoin.approxTopK(stdTele, SP.K, selfRank = true)))
      timed("knn_content_total")(noop(KnnJoin.approxTopK(stdCont, SP.K, selfRank = true)))
    }

    if (want("knncand")) {
      val stdTele = SP.standardize(tele, SP.TeleDims)
      val stdCont = SP.standardize(cont, SP.contentDims(labels))
      timed("knn_tele_cands")(noop(KnnJoin.lshCandidates(stdTele, SP.K, selfRank = true)))
      timed("knn_content_cands")(noop(KnnJoin.lshCandidates(stdCont, SP.K, selfRank = true)))
    }

    if (want("dbscan")) timed("dbscan_approx") {
      val stdTele = SP.standardize(tele, SP.TeleDims)
      noop(Dbscan.clusterApprox(stdTele, 1.0, 5, maxDegree = 16))
    }

    if (want("simall")) timed("similarity_run_total") {
      val (t, n) = SP.run(frames, labels, exact = false)
      noop(t); noop(n)
    }

    // runFull with a noop sink — pipe minus this ≈ the write cost
    if (want("pipenoop")) timed("pipeline_run_noop") {
      val r = graft.pipeline.KgPipeline.runFull(
        CorpusGen.corpus(spark, CorpusGen.Config(rows, nRepos,
          partitions = cores * 2)), exactKnn = false)
      noop(r.triples); noop(r.frames); noop(r.nodes)
    }

    // full pipelineRun (corpus → runFull → partitioned write), the exact
    // timed region of a scaling leg, as one attributable block
    if (want("pipe")) timed("pipeline_run_write") {
      graft.pipeline.KgPipeline.write(
        graft.pipeline.KgPipeline.runFull(
          CorpusGen.corpus(spark, CorpusGen.Config(rows, nRepos,
            partitions = cores * 2)), exactKnn = false),
        "/tmp/graft_extra_pipe")
    }

    spark.stop()
  }
}
