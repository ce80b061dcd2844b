package graft

import graft.ops.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the float-equality contract of the value-gated oracles.
  *
  * The driver's comparer requires bit-exact float equality, while three
  * oracles compute their values via different-but-equivalent arithmetic
  * on the two engines (q25: sequential product vs exp·sum·ln, ~1e-12
  * apart; q26: sq_dist multiplication vs DuckDB `**` at the eps²
  * boundary; q27: threshold + round-4). Those gates only stay stable if
  * every value keeps a margin from its rounding/threshold boundary that
  * is orders of magnitude above the cross-engine arithmetic noise. This
  * spec asserts those margins on the gate corpus (sf0.01), so a future
  * corpus regeneration that lands a value near a boundary fails HERE
  * with a diagnosable message instead of flipping the driver gate.
  */
class OracleMarginSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  val dir = "/root/testdata/sf0.01"

  // distance of x's scaled fraction from the round-half-up boundary:
  // round(x, digits) flips when frac(x·10^digits) crosses 0.5
  private def roundMargin(c: org.apache.spark.sql.Column, digits: Int) =
    abs(pmod(c * math.pow(10, digits), lit(1.0)) - 0.5)

  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))

  test("temperature_mix: floor(sqrt(n)) agrees with exact integer isqrt on fixture counts") {
    // the quota weight is floor of the IEEE double sqrt — safe for
    // n < 2^51 (a non-square's sqrt can't round ONTO an integer); this
    // audits the actual per-source counts against an exact isqrt
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty)
    for (n <- counts) {
      val viaDouble = math.floor(math.sqrt(n.toDouble)).toLong
      var k = math.max(viaDouble - 2, 0L)
      while ((k + 1) * (k + 1) <= n) k += 1
      assert(viaDouble === k, s"floor(sqrt($n)): double says $viaDouble, exact isqrt $k")
    }
  }

  test("q27: all-pairs cosine keeps margin from the 0.45 threshold and round-4 grid") {
    val a = emb.select(col("vec_id").as("a"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("v").as("vb"))
    val cos = a.join(b, col("a") < col("b"))
      .select(SimilaritySearch.cosine(col("va"), col("vb")).as("c"))
      .localCheckpoint(true)
    val thr = cos.agg(min(abs(col("c") - 0.45))).collect()(0).getDouble(0)
    info(f"min |cosine - 0.45| over all pairs: $thr%.2e")
    assert(thr > 1e-4, f"a pair's cosine sits $thr%.2e from the q27 threshold")
    val r4 = cos.where(col("c") >= 0.45)
      .agg(min(roundMargin(col("c"), 4))).collect()(0).getDouble(0)
    info(f"min round-4 boundary margin of kept cosines: $r4%.2e")
    assert(r4 > 1e-6, f"a kept cosine sits $r4%.2e from a round-4 boundary")
  }

  test("q26: same-group squared distances keep margin from eps^2 = 1.5625") {
    val a = emb.select(col("vec_id").as("a"), col("label").as("g"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("label").as("g"), col("v").as("vb"))
    val m = a.join(b, Seq("g")).where(col("a") < col("b"))
      .select(graft.core.VectorExprs.sq_dist(col("va"), col("vb")).as("d2"))
      .agg(min(abs(col("d2") - 1.25 * 1.25))).collect()(0).getDouble(0)
    info(f"min |d2 - eps2| over same-group pairs: $m%.2e")
    assert(m > 1e-6, f"a pair's squared distance sits $m%.2e from the DBSCAN eps boundary")
  }

  test("q25: union coverage arithmetic paths agree and keep round-6 margin") {
    import org.apache.spark.sql.expressions.Window
    // same frame synthesis as SparkEntry's q25 (events -> telemetry analog)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_type"), col("value"))
    val frames = spark.read.parquet(s"$dir/events.parquet").select(
      col("user_id").as("inspection_id"),
      row_number().over(w).as("framenumber"),
      pmod(col("value") * 7.3, lit(360.0)).as("Heading"),
      (pmod(col("value"), lit(25.0)) / 10.0).as("Depth"),
      (pmod(col("value"), lit(1.0)) * 0.9).as("cov"))
    val clamped = greatest(lit(1.0) - least(greatest(col("cov"), lit(0.0)), lit(1.0)),
      lit(1e-300))
    val sessions = graft.materialize.Mosaics.withSessions(frames)
      .groupBy("inspection_id", "session")
      .agg(
        graft.materialize.Mosaics.unionCoverage(col("cov")).as("uc"),
        (lit(1.0) - exp(sum(log(clamped)))).as("uc_ln"),
        (lit(1.0) + max("Depth") - min("Depth")).as("size_raw"),
        count(lit(1)).as("n"))
      .localCheckpoint(true)
    val pathDiff = sessions.agg(max(abs(col("uc") - col("uc_ln"))))
      .collect()(0).getDouble(0)
    info(f"max |product - expSumLn| union coverage: $pathDiff%.2e")
    assert(pathDiff < 1e-9, f"arithmetic paths diverge by $pathDiff%.2e")
    val r6 = sessions.agg(min(roundMargin(col("uc"), 6))).collect()(0).getDouble(0)
    info(f"min round-6 boundary margin of union coverage: $r6%.2e")
    // What stability requires is RELATIVE: the boundary margin must
    // dominate the cross-engine path divergence, or the two engines can
    // round the same session to different 6-digit values. Measured on
    // this corpus: margin 4.7e-10 (a dyadic cov sum lands near a .5
    // grid point) vs divergence 2.2e-16 — 3 orders of magnitude spare.
    assert(r6 > math.max(1e-12, 1000 * pathDiff),
      f"a union coverage sits $r6%.2e from a round-6 boundary " +
        f"(cross-engine divergence $pathDiff%.2e) — regenerated corpus would flake the q25 gate")
    // No margin assertion for the 1.5 size_increase gate arm: it is
    // computed with IDENTICAL arithmetic on both engines (pmod/div/max/
    // min in the same op order), so even a boundary hit or a 1-ulp
    // near-miss — this corpus has both — decides identically on both
    // sides; the driver's q25 hash gate itself proves that bit-equality
    // every round. Margin guards are only meaningful above, where the
    // two engines reach the value via DIFFERENT arithmetic.
    val gm = sessions.agg(min(abs(col("size_raw") - 1.5))).collect()(0).getDouble(0)
    info(f"min |size_raw - 1.5| gate distance (identical-arithmetic, informational): $gm%.2e")
  }

  test("portable ANN twins keep decision margins and round-6 grid clearance") {
    // ann_ivf_portable / ann_lsh_portable reach every intermediate value
    // via the same IEEE op order on both engines, but the COMPARISONS
    // (argmin over centroids, the nProbe cut, the sign of a projection)
    // ride library code that differs (sqrt∘sq_dist vs list_distance,
    // vec_dot vs list_inner_product) — a 1-ulp divergence at a decision
    // boundary would flip a bucket on one engine only. Margins must
    // dominate that noise; the final round-6 grid margin guards the
    // Spark-BigDecimal vs DuckDB-float rounding split (CLAUDE.md).
    val query = emb.where(col("vec_id") === 0)
      .select(col("v")).collect()(0).getSeq[Double](0).toArray
    val rest = emb.where(col("vec_id") =!= 0).localCheckpoint(true)

    val cents = SimilaritySearch.portableSeedCentroids(
      spark.read.parquet(s"$dir/embeddings.parquet").where(col("vec_id") =!= 0), 8)
    val dcols = array(cents.map(c =>
      sqrt(graft.core.VectorExprs.sq_dist(col("v"), lit(c)))).toIndexedSeq: _*)
    val gap = rest.select(sort_array(dcols).as("d"))
      .select((element_at(col("d"), 2) - element_at(col("d"), 1)).as("g"))
      .agg(min("g")).collect()(0).getDouble(0)
    info(f"IVF min best-vs-second centroid gap: $gap%.2e")
    assert(gap > 1e-9, f"a vector's two nearest centroids sit $gap%.2e apart")

    val qd = cents.map(c =>
      math.sqrt(c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)).sorted
    info(f"IVF probe cut (2nd vs 3rd centroid to query): ${qd(2) - qd(1)}%.2e")
    assert(qd(2) - qd(1) > 1e-9, "the nProbe=2 cut sits on a distance tie")

    val planes = SimilaritySearch.portablePlanes(4, query.length)
    val adots = array(planes.map(p =>
      abs(graft.core.VectorExprs.vec_dot(col("v"), lit(p)))).toIndexedSeq: _*)
    val minDot = rest.select(array_min(adots).as("m"))
      .agg(min("m")).collect()(0).getDouble(0)
    val qMinDot = planes.map(p =>
      math.abs(p.zip(query).map { case (a, b) => a * b }.sum)).min
    info(f"LSH min |projection| (corpus $minDot%.2e, query $qMinDot%.2e)")
    assert(minDot > 1e-9 && qMinDot > 1e-9,
      "a sign projection sits at the hyperplane — bucket could flip cross-engine")

    val qlit = lit(query)
    val r6cos = rest
      .select(SimilaritySearch.cosine(col("v"), qlit).as("c"))
      .agg(min(roundMargin(col("c"), 6))).collect()(0).getDouble(0)
    val r6dist = rest
      .select(sqrt(graft.core.VectorExprs.sq_dist(col("v"), qlit)).as("d"))
      .agg(min(roundMargin(col("d"), 6))).collect()(0).getDouble(0)
    info(f"round-6 margins: cosine $r6cos%.2e, distance $r6dist%.2e")
    assert(r6cos > 1e-9 && r6dist > 1e-9,
      "an emitted ANN value sits on the round-6 grid boundary")
  }

  test("ann_matryoshka: pool full-dim cosines keep round-6 margins") {
    // stage 1 orders on RAW prefix-cosine doubles (bit-identical fold
    // both engines — no margin needed); only the stage-2 OUTPUT cosine
    // is rounded, so the audit is the round-6 grid over the pool
    val query = emb.where(col("vec_id") === 0)
      .select(col("v")).collect()(0).getSeq[Double](0).toArray
    val pv = expr("transform(slice(v, 1, 16), x -> x)")
    val pool = emb.where(col("vec_id") =!= 0)
      .withColumn("pcos",
        SimilaritySearch.cosine(pv, lit(query.take(16))))
      .orderBy(desc("pcos"), asc("vec_id")).limit(50)
    val m = pool
      .select(SimilaritySearch.cosine(col("v"), lit(query)).as("c"))
      .agg(min(roundMargin(col("c"), 6))).collect()(0).getDouble(0)
    info(f"min round-6 margin of matryoshka pool cosines: $m%.2e")
    assert(m > 1e-9, f"a pool cosine sits $m%.2e from a round-6 boundary")
  }

  test("ann_mmr: candidate-pool cosines keep round-6 margins; greedy is arithmetic-identical") {
    // The MMR gate's cross-engine inputs are the round-6 relevances
    // (covered by the portable-ANN r6 cosine audit over the whole
    // corpus) and the round-6 PAIRWISE pool cosines — audited here.
    // Everything downstream (0.7·rel − 0.3·maxsim, argmax, vec_id
    // ties) is IDENTICAL IEEE arithmetic over those rounded doubles on
    // both engines, so no score/tie margin is needed (q25's
    // identical-arithmetic argument); the pool cut itself is safe even
    // on a rounded-rel tie because both engines break it by vec_id.
    val query = emb.where(col("vec_id") === 0)
      .select(col("v")).collect()(0).getSeq[Double](0).toArray
    val pool = emb.where(col("vec_id") =!= 0)
      .withColumn("rel", round(SimilaritySearch.cosine(col("v"), lit(query)), 6))
      .orderBy(desc("rel"), asc("vec_id")).limit(24)
      .select(col("vec_id"), col("v")).localCheckpoint(true)
    val m = pool.select(col("vec_id").as("a"), col("v").as("va"))
      .join(pool.select(col("vec_id").as("b"), col("v").as("vb")), col("a") < col("b"))
      .select(SimilaritySearch.cosine(col("va"), col("vb")).as("c"))
      .agg(min(roundMargin(col("c"), 6))).collect()(0).getDouble(0)
    info(f"min round-6 margin of MMR pool pairwise cosines: $m%.2e")
    assert(m > 1e-9, f"a pool pair's cosine sits $m%.2e from a round-6 boundary")
  }

  test("PQ encode argmins and the ADC round-6 grid keep cross-engine margins") {
    // per-(vector, block) code assignment compares sqrt'd block
    // distances across engine library code (sqrt(sq_dist) vs
    // list_distance) — a tie or 1-ulp gap would flip a code on one
    // engine only; the emitted round(approx, 6) must clear the grid
    val query = emb.where(col("vec_id") === 0)
      .select(col("v")).collect()(0).getSeq[Double](0).toArray
    val rest = emb.where(col("vec_id") =!= 0).localCheckpoint(true)
    val seeds = SimilaritySearch.portableSeedCentroids(
      spark.read.parquet(s"$dir/embeddings.parquet").where(col("vec_id") =!= 0), 8)
    val blockLen = query.length / 8
    val gaps = (0 until 8).map { b =>
      val dcols = array(seeds.map(c => sqrt(graft.core.VectorExprs.sq_dist(
        expr(s"slice(v, ${b * blockLen + 1}, $blockLen)"),
        lit(c.slice(b * blockLen, (b + 1) * blockLen))))).toIndexedSeq: _*)
      rest.select(sort_array(dcols).as("d"))
        .select((element_at(col("d"), 2) - element_at(col("d"), 1)).as("g"))
        .agg(min("g")).collect()(0).getDouble(0)
    }
    info(f"PQ min per-block best-vs-second codeword gap: ${gaps.min}%.2e")
    assert(gaps.min > 1e-9, s"a block's two nearest codewords tie (gaps $gaps)")
    val m = SimilaritySearch.pqApproxRaw(
        spark.read.parquet(s"$dir/embeddings.parquet").where(col("vec_id") =!= 0),
        query)
      .agg(min(roundMargin(col("approx"), 6))).collect()(0).getDouble(0)
    info(f"PQ raw approx-distance round-6 margin: $m%.2e")
    assert(m > 1e-9, "a PQ approx distance sits on the round-6 grid boundary")

    // SQ int8: the floor(x*127/scale + 0.5) chain is PURE IEEE
    // primitives (*, /, +, floor) — correctly rounded and therefore
    // bit-identical on both engines even exactly ON the .5 grid (the
    // max-abs element always lands on 127.5), so no code-boundary
    // audit is needed; what still splits cross-engine is the final
    // round(score, 6) (Spark BigDecimal vs DuckDB float — CLAUDE.md)
    val rawEmb = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") =!= 0)
    val sqm = SimilaritySearch.sqApproxRaw(rawEmb, query)
      .agg(min(roundMargin(col("approx_dot"), 6))).collect()(0).getDouble(0)
    info(f"SQ raw score round-6 margin: $sqm%.2e")
    assert(sqm > 1e-9, "an SQ score sits on the round-6 grid boundary")
  }

  test("round-6 boundaries of the corpus-ratio oracles decide identically cross-engine") {
    // These oracles compute their ratio with IDENTICAL IEEE arithmetic
    // on both engines, but the final round(x, 6) is implemented
    // differently: Spark rounds HALF_UP on x's EXACT decimal expansion
    // (BigDecimal), DuckDB rounds the FLOAT product x·10⁶ half away
    // from zero. The two agree except in a sliver: a non-dyadic x whose
    // float product lands exactly on k+0.5 (or within a ulp of it)
    // while the exact expansion sits on the other side. A value is safe
    // iff it is EXACTLY on the boundary in BOTH views (dyadic x — both
    // engines see precisely .5 and round up together; this corpus has
    // such values) or keeps clear margin in both. Regenerated corpora
    // that violate this fail HERE, not in the driver gate.
    import java.math.{BigDecimal => JBD, RoundingMode}
    def audit(name: String, vals: Seq[Double]): Unit = {
      var exactHalves = 0
      val bad = vals.filter { x =>
        val bd = new JBD(x).movePointRight(6)
        val bdFrac = bd.subtract(bd.setScale(0, RoundingMode.FLOOR))
        val exactHalf = bdFrac.compareTo(new JBD("0.5")) == 0
        val fl = (x * 1e6) % 1.0
        if (exactHalf) exactHalves += 1
        val bothOnBoundary = exactHalf && fl == 0.5
        val bothClear = math.abs(bdFrac.doubleValue - 0.5) > 1e-9 &&
          math.abs(fl - 0.5) > 1e-9
        !(bothOnBoundary || bothClear)
      }
      info(s"$name: ${vals.size} values, $exactHalves exact-boundary dyadics, ${bad.size} unsafe")
      assert(bad.isEmpty,
        s"$name: round-6 decision could differ cross-engine for ${bad.take(3).mkString(", ")}")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rep = graft.ops.Repetition.repetitionStatsRaw(docs)
      .select("dup_word_frac", "top2gram_frac", "dup_5gram_frac").collect()
    audit("repetition dup_word_frac", rep.map(_.getDouble(0)).toSeq)
    audit("repetition top2gram_frac", rep.map(_.getDouble(1)).toSeq)
    audit("repetition dup_5gram_frac", rep.map(_.getDouble(2)).toSeq)
    audit("segment_dedup dup_frac",
      graft.ops.Repetition.segmentDedupRaw(docs)
        .select("dup_frac").collect().map(_.getDouble(0)).toSeq)
    // idf_score needs no audit: this guard caught its original rounded
    // float mean sitting EXACTLY on round-6 boundaries (2564.5 micro
    // etc.), so the operator was moved to pure int64 micro units.
    audit("decontaminate ratio",
      graft.ops.Decontaminate.contamination(docs,
          docs.where(col("doc_id") % 97 === 0), n = 8)
        .select("ratio").collect().map(_.getDouble(0)).toSeq)
  }

  test("rp_reduce: projection values keep margin from the round-6 grid") {
    val m = graft.ops.SimilaritySearch.rpReduce(
        spark.read.parquet(s"$dir/embeddings.parquet"))
      .select((col("value") * 1e6).as("s")) // already rounded; audit the raw twin
    // recompute unrounded to audit the boundary the rounding crossed
    val planes = (0 until 8).map(b => Array.tabulate(64)(d =>
      graft.ops.SimilaritySearch.portablePlaneCoef(s"rp_${b}_${d}")))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(expr("transform(embedding, x -> cast(x as double))").as("vec"))
    val raw = e.select(array(planes.map(p =>
        graft.ops.SimilaritySearch.dot(col("vec"), lit(p))): _*).as("vs"))
      .select(explode(col("vs")).as("v"))
    val margin = raw.agg(min(roundMargin(col("v"), 6))).collect()(0).getDouble(0)
    info(f"min round-6 boundary margin of rp projections: $margin%.2e")
    assert(margin > 1e-9, f"an rp projection sits $margin%.2e from a round-6 boundary")
    assert(m.limit(1).count() === 1) // sanity: the gated shape materializes
  }

  test("semantic_dedup: anchor-pair cosines keep margin from tau 0.40 and round-6") {
    // the same portable pipeline as the gate query, unthresholded:
    // every anchor-pair cosine must sit clear of the tau boundary, and
    // the kept (dropped-vector) cosines clear of the round-6 grid
    import org.apache.spark.sql.expressions.Window
    val cents = graft.ops.SimilaritySearch.portableSeedCentroids(
      spark.read.parquet(s"$dir/embeddings.parquet"), 8)
    val assigned = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"))
      .withColumn("cluster",
        graft.ops.SimilaritySearch.nearestCentroidL2(col("vec"), cents))
      .localCheckpoint(true)
    val ranked = assigned.withColumn("rk",
      row_number().over(Window.partitionBy("cluster").orderBy("vec_id")))
    val cos = ranked.where(col("rk") <= 64)
      .select(col("cluster"), col("vec_id").as("anchor"), col("vec").as("va"))
      .join(ranked.select(col("cluster"), col("vec_id"), col("vec")), Seq("cluster"))
      .where(col("anchor") < col("vec_id"))
      .select(SimilaritySearch.cosine(col("va"), col("vec")).as("c"))
      .localCheckpoint(true)
    val thr = cos.agg(min(abs(col("c") - 0.40))).collect()(0).getDouble(0)
    info(f"min |cosine - 0.40| over anchor pairs: $thr%.2e")
    assert(thr > 1e-4, f"an anchor pair's cosine sits $thr%.2e from the tau boundary")
    val r6 = cos.where(col("c") >= 0.40)
      .agg(min(roundMargin(col("c"), 6))).collect()(0).getDouble(0)
    info(f"min round-6 boundary margin of dropped-vector cosines: $r6%.2e")
    assert(r6 > 1e-6, f"a dropped cosine sits $r6%.2e from a round-6 boundary")
  }

  test("hard_negatives: emitted cosines keep round-6 margin, rank cut is untied") {
    // selection is rank-based on RAW doubles (identical cross-engine),
    // so the only portability surface is the round-6 output column —
    // plus the rank-5/6 boundary, which must not be decided by a
    // cosine TIE between different neg_ids (the neg_id tie-break is
    // deterministic, but a tie AT the cut would make the emitted SET
    // depend on it, worth pinning on the fixture)
    val raw = graft.ops.Contrastive.hardNegativesRaw(emb
        .select(col("vec_id"), col("label"), col("v").as("embedding")), k = 6)
      .localCheckpoint(true)
    val r6 = raw.where(col("rank") <= 5)
      .agg(min(roundMargin(col("cos_raw"), 6))).collect()(0).getDouble(0)
    info(f"min round-6 boundary margin of emitted cosines: $r6%.2e")
    assert(r6 > 1e-6, f"an emitted cosine sits $r6%.2e from a round-6 boundary")
    val cut = raw.groupBy("vec_id")
      .agg(min(when(col("rank") === 5, col("cos_raw"))).as("c5"),
        min(when(col("rank") === 6, col("cos_raw"))).as("c6"))
      .where(col("c6").isNotNull && col("c5") === col("c6")).count()
    assert(cut === 0, s"$cut anchors have a cosine tie exactly at the rank-5 cut")
  }
}
