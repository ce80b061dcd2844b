package graft

import graft.ops.GraphRank
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank: known-graph values, rank-mass conservation,
  * and exact partition invariance (the integer determinism contract).
  */
class GraphRankSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    iters: Int = 5): Map[Long, Long] =
    GraphRank.pageRank(nodes.toDF("id"), edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cycle: symmetric graph keeps the uniform fixed point") {
    val r = ranks(Seq(0L, 1L, 2L, 3L), Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(r.values.toSet.size === 1, s"cycle ranks diverged: $r")
    val v = r(0L)
    // uniform fixed point = scale/4, minus a few integer-div dust units
    assert(math.abs(v - Scale / 4) <= 100L, s"cycle rank $v")
  }

  test("star: the vertex every edge points at outranks the leaves") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
    val r = ranks(Seq(1L, 2L, 3L, 4L, 5L), edges)
    assert(r(1L) > r(2L) && r(1L) > r(3L), s"center should dominate: $r")
    // 3,4,5 are structurally identical → identical integer ranks
    assert(r(3L) === r(4L) && r(4L) === r(5L))
    // leaf 2 receives the center's whole contribution → above 3..5
    assert(r(2L) > r(3L))
  }

  test("rank mass is conserved up to truncation dust (no dangling vertices)") {
    val nodes = (0L until 50L).toSeq
    val edges = nodes.flatMap(i => Seq((i, (i + 1) % 50), (i, (i * 7 + 3) % 50)))
    val r = ranks(nodes, edges)
    val total = r.values.sum
    assert(total <= Scale, s"total $total exceeds scale")
    assert(total >= (Scale * 95L) / 100L, s"total $total lost too much mass")
  }

  test("neighborMean: hand-computed micro fixed point over the symmetrized path") {
    import spark.implicits._
    // path 1–2–3 (given directed, symmetrized inside), 1-dim features
    val feats = Seq((1L, Seq(1.0)), (2L, Seq(0.5)), (3L, Seq(-0.25)))
      .toDF("id", "vec")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphRank.neighborMean(feats, edges).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    // q: 1000000, 500000, -250000 (all dyadic → exact)
    assert(r(1L) === ((1L, 500000L)))             // nbr {2}
    assert(r(2L) === ((2L, 375000L)))             // (1000000 - 250000) div 2
    assert(r(3L) === ((1L, 500000L)))             // nbr {2}
  }

  test("textRank: the shared hub word dominates a star co-occurrence graph") {
    import spark.implicits._
    val docs = Seq((0L, "hub a"), (1L, "hub b"), (2L, "hub c"))
      .toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.textRank(docs, k = 4).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.head._1 === "hub", s"hub should rank first: ${r.toSeq}")
    // the three leaves are structurally identical → identical ranks
    val leaves = r.filter(_._1 != "hub").map(_._2).toSet
    assert(r.length === 4 && leaves.size === 1, s"leaf ranks differ: ${r.toSeq}")
  }

  test("personalized PageRank: mass decays with distance from the seed, unreachable stays 0") {
    import spark.implicits._
    // directed path 1→2→3, plus isolated 4; seed = {1}
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphRank.personalizedPageRank(nodes, edges, Seq(1L).toDF("id"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L),
      s"rank should decay along the path: $r")
    assert(r(4L) === 0L, s"unreachable vertex must hold zero mass: $r")
    // the seed's floor is its restart mass: 15% of scale (|seeds| = 1)
    assert(r(1L) === 150000000000L, s"seed floor off: ${r(1L)}")
  }

  test("HITS round 1: co-cited authority collects the hub mass, hubs tie exactly") {
    import spark.implicits._
    // 1→2, 3→2 (2 is the co-cited authority), 2→4
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val r = GraphRank.hits(nodes, edges, iters = 1).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // a¹(2) = h⁰(1)+h⁰(3) = 2, a¹(4) = h⁰(2) = 1, others 0
    assert(r(2L)._2 === 2L && r(4L)._2 === 1L && r(1L)._2 === 0L && r(3L)._2 === 0L)
    // h¹(1) = h¹(3) = a¹(2) = 2, h¹(2) = a¹(4) = 1, h¹(4) = 0
    assert(r(1L)._1 === 2L && r(3L)._1 === 2L && r(2L)._1 === 1L && r(4L)._1 === 0L)
  }

  test("HITS is partition-invariant (pure integer sums)") {
    import spark.implicits._
    val nodes = (0L until 40L).toDF("id")
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i + 1) % 40), (i, (i * 11 + 5) % 40)))
    val a = GraphRank.hits(nodes, edges.toDF("src", "dst"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val b = GraphRank.hits(nodes.repartition(7), edges.toDF("src", "dst").repartition(3))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(a === b)
  }

  test("triangles: K4 vertices sit in 3 each, a pendant vertex in 0") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    // K4 over 1..4 plus a pendant 4–5; one duplicate reversed edge to
    // prove the symmetrize-dedup (2,1) == (1,2)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (2L, 1L)).toDF("src", "dst")
    val r = GraphRank.triangleCounts(nodes, edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_) == 3L), s"K4 counts off: $r")
    assert(r(5L) === 0L)
  }

  test("label propagation: disjoint cliques converge to their min ids") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("src", "dst")
    val r = GraphRank.labelPropagation(nodes, edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(r(_) == 1L), s"first clique: $r")
    assert(Seq(4L, 5L, 6L).forall(r(_) == 4L), s"second clique: $r")
  }

  test("label propagation: a single bridge edge does not merge two K4s") {
    val nodes = (1L to 8L).toDF("id")
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    val edges = (k4a ++ k4b :+ (4L, 5L)).toDF("src", "dst")
    val r = GraphRank.labelPropagation(nodes, edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.toSet.size === 2, s"expected two communities: $r")
    assert(Seq(1L, 2L, 3L, 4L).map(r).toSet.size === 1)
    assert(Seq(5L, 6L, 7L, 8L).map(r).toSet.size === 1)
  }

  test("ranks are bit-identical across partitionings") {
    val nodes = (0L until 40L).toSeq
    val edges = nodes.flatMap(i => Seq((i, (i + 1) % 40), (i, (i * 11 + 5) % 40)))
    val a = GraphRank.pageRank(nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphRank.pageRank(nodes.toDF("id").repartition(9),
        edges.toDF("src", "dst").repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  private def aa(nodes: Seq[Long], edges: Seq[(Long, Long)]) =
    GraphRank.adamicAdar(nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

  test("adamic-adar: path endpoints score via the shared hub, exact integers") {
    // path 1-2-3: only candidate (1,3); hub deg 2 -> milliLog2 = 1000
    // -> weight 1000000 div 1000 = 1000. Degree-1 endpoints never feed
    // the divisor (the ANSI div-by-zero guard).
    val got = aa(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
    assert(got === Map((1L, 3L) -> ((1L, 1000L))))
  }

  test("adamic-adar: rare hubs outweigh busy hubs; existing edges excluded") {
    // hub 0 has deg 6 -> milliLog2 = 2000 + 6000//4 - 1000 = 2500 ->
    // weight 1000000 div 2500 = 400; hub 9 (and every deg-2 vertex)
    // weighs 1000 — rare shared neighbors count more.
    val star = Seq(1L, 2L, 3L, 4L, 7L, 8L).map(i => (0L, i)) ++
      Seq((9L, 3L), (9L, 4L), (1L, 2L)) // 1-2 adjacent -> excluded
    val got = aa(0L to 9L, star)
    assert(!got.contains((1L, 2L)))
    assert(got((3L, 4L)) === ((2L, 1400L))) // hubs 0 (400) + 9 (1000)
    assert(got((3L, 7L)) === ((1L, 400L)))  // via the busy hub only
    assert(got((0L, 9L)) === ((2L, 2000L))) // via deg-2 hubs 3 and 4
  }

  test("k-core peel: the chain cascades outside-in, the clique survives") {
    // path 1-2-3-4-5 at k=2: endpoints fall round 1, then 2 and 4,
    // then the stranded middle; K4 over 6..9 keeps degree 3 forever;
    // isolated vertex 10 (degree 0) falls immediately
    val nodes = (1L to 10L).toDF("id")
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++
      (for (a <- 6L to 9L; b <- a + 1 to 9L) yield (a, b))).toDF("src", "dst")
    val got = GraphRank.kCorePeel(nodes, edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 2L -> 2L, 4L -> 2L,
      3L -> 3L, 6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 0L))
  }

  test("bfs layers: path distances, horizon cutoff, multi-seed minimum") {
    // path 1-2-3-4-5-6 seeded at 1: dist = hops, 6 beyond 4 rounds -> -1
    val nodes = (1L to 6L).toDF("id")
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val one = GraphRank.bfsLayers(nodes, edges, Seq(1L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> -1L))
    // a second seed at 6 pulls the far end in: every vertex <= 2 hops
    val two = GraphRank.bfsLayers(nodes, edges, Seq(1L, 6L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
  }

  test("sssp: weighted relaxation beats the direct edge, horizon and -1 hold") {
    // 0-1 w1, 1-2 w1, 0-2 w5 (indirect 2-hop path wins), 2-3 w1;
    // 9 is isolated. Seed {0}, 4 rounds.
    val nodes = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 5L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val got = GraphRank.ssspRounds(nodes, edges, Seq(0L).toDF("id"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 9L -> -1L))
    // one round only: the direct w5 edge is the best 1-hop answer and a
    // second sweep improves it — the Bellman-Ford signature
    val r1 = GraphRank.ssspRounds(nodes, edges, Seq(0L).toDF("id"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(2L) === 5L && r1(3L) === -1L)
  }
}
