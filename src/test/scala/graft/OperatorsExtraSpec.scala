package graft

import graft.algos.{Cliques, Dominators}
import graft.core.{GraphOps, LinkGraph, Mode}
import graft.ops.Extras
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for complementer/compose/rewire (test_operators.py,
  * test_games.py), dominator trees (test_structural.py:775-893), and the
  * independent-set family (test_cliques.py:106-157).
  */
class OperatorsExtraSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def edgeSet(g: LinkGraph): Set[(Long, Long)] =
    g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("complementer: Full(3) default = self-loops only; disjoint Full(3)+Full(2) no-loops = cross edges (test_operators.py:12-23)") {
    val g = LinkGraph.full(spark, 3)
    val c = Extras.complementer(g)
    assert(c.vcount() == 3)
    assert(edgeSet(c) == Set((0L, 0L), (1L, 1L), (2L, 2L)))
    val g2 = GraphOps.disjointUnion(LinkGraph.full(spark, 3), LinkGraph.full(spark, 2))
    val c2 = Extras.complementer(g2, loops = false)
    assert(edgeSet(c2) == Set((0L, 3L), (0L, 4L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
  }

  test("compose: relational composition via one join") {
    // g1: 0->1, g2: 1->2  =>  0->2
    val g1 = LinkGraph(spark, 3, Seq((0L, 1L)), directed = true)
    val g2 = LinkGraph(spark, 3, Seq((1L, 2L)), directed = true)
    assert(edgeSet(Extras.compose(g1, g2)) == Set((0L, 2L)))
    // undirected: both orientations of each edge participate in the relation
    val u1 = LinkGraph(spark, 3, Seq((0L, 1L)), directed = false)
    val u2 = LinkGraph(spark, 3, Seq((1L, 2L)), directed = false)
    assert(edgeSet(Extras.compose(u1, u2)) == Set((0L, 2L)))
    // 0-1 composed with itself: (0,1)(1,0) -> loop at 0, (1,0)(0,1) -> loop at 1
    assert(edgeSet(Extras.compose(u1, u1)) == Set((0L, 0L), (1L, 1L)))
  }

  test("rewire preserves the degree sequence and simplicity (test_games.py:146-159)") {
    val rnd = new scala.util.Random(5)
    val n = 20
    val edges = (for {
      i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.25
    } yield (i.toLong, j.toLong)).toSeq
    val g = LinkGraph(spark, n.toLong, edges, directed = false)
    def degs(x: LinkGraph): Map[Long, Long] =
      TestSession.longVector(GraphOps.degrees(x, Mode.All), "degree")
        .zipWithIndex.map { case (d, i) => i.toLong -> d }.toMap
    val before = degs(g)
    val r = Extras.rewire(g, 5000, seed = 7L)
    assert(degs(r) == before)
    val re = edgeSet(r)
    assert(re.forall { case (a, b) => a != b }, "simple mode must not create loops")
    assert(re.size == edges.size, "no multi-edges")
    assert(re != edges.toSet, "5000 trials should move at least one edge")
    // determinism: same seed, same result
    assert(edgeSet(Extras.rewire(g, 5000, seed = 7L)) == re)
  }

  test("to_prufer / fromPrufer: goldens, bijection round-trip, tree requirement (graphobject.c:1910)") {
    import graft.core.Generators
    // star K1,3 (center 0): remove leaves 1,2 -> [0, 0]
    val star = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (0L, 3L)), directed = false)
    assert(Extras.toPrufer(star) == Seq(0, 0))
    // path 0-1-2-3: remove 0 (-> 1), then 1 (-> 2) -> [1, 2]
    val path = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (2L, 3L)), directed = false)
    assert(Extras.toPrufer(path) == Seq(1, 2))
    // bijection: decode then encode is the identity on random codes
    val rnd = new scala.util.Random(13)
    (0 until 5).foreach { _ =>
      val seq = Seq.fill(7)(rnd.nextInt(9))
      assert(Extras.toPrufer(Generators.fromPrufer(spark, seq)) == seq)
    }
    // treeGame trees round-trip through their code
    val t = Generators.treeGame(spark, 12, seed = 4L)
    assert(edgeSet(Generators.fromPrufer(spark, Extras.toPrufer(t))) == edgeSet(t))
    // non-trees are rejected
    val cyc = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L), (2L, 0L)), directed = false)
    intercept[IllegalArgumentException](Extras.toPrufer(cyc))
  }

  test("unfold_tree: cycles unfold into forests with a valid new->old mapping (graphobject.c:9995)") {
    // undirected triangle from root 0: tree edges (0,1),(0,2); the chord
    // (1,2) points to a fresh copy of 2
    val tri = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L), (0L, 2L)), directed = false)
    val (f1, m1) = Extras.unfoldTree(tri, Seq(0L), mode = "all")
    assert(m1 == Seq(0L, 1L, 2L, 2L))
    assert(edgeSet(f1) == Set((0L, 1L), (0L, 2L), (1L, 3L)))
    // directed 3-cycle, mode=out: back edge duplicates its head
    val dcyc = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L), (2L, 0L)), directed = true)
    val (f2, m2) = Extras.unfoldTree(dcyc, Seq(0L), mode = "out")
    assert(m2 == Seq(0L, 1L, 2L, 0L))
    assert(edgeSet(f2) == Set((0L, 1L), (1L, 2L), (2L, 3L)))
    // random graph: edge count preserved, result acyclic (union-find never
    // sees a redundant union), every output edge projects onto an original
    val rnd = new scala.util.Random(17)
    val n = 12
    val edges = (for {
      i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.3
    } yield (i.toLong, j.toLong)).toSeq
    val g = LinkGraph(spark, n.toLong, edges, directed = false)
    val (f, m) = Extras.unfoldTree(g, Seq(3L), mode = "all")
    val fe = f.weighted.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fe.length == edges.length, "edge count preserved")
    val par = Array.tabulate(m.length)(identity)
    def find(x: Int): Int = if (par(x) == x) x else { par(x) = find(par(x)); par(x) }
    fe.foreach { case (a, b) =>
      assert(find(a.toInt) != find(b.toInt), "unfolded graph must be acyclic")
      par(find(a.toInt)) = find(b.toInt)
    }
    val orig = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val proj = fe.map { case (a, b) => (m(a.toInt), m(b.toInt)) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(proj == orig, "projected edges must equal the original multiset")
  }

  test("rewire_edges: distributed and simple-kernel semantics (graphobject.c:5532)") {
    val n = 40
    val ring = LinkGraph(spark, n.toLong,
      (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)), directed = false)
    // prob = 0: identity
    assert(edgeSet(Extras.rewireEdges(ring, 0.0, multiple = true)) == edgeSet(ring))
    // distributed path, prob = 1, no loops: edge count preserved, all
    // endpoints in range, no self-loops, deterministic in the seed
    val r1 = Extras.rewireEdges(ring, 1.0, loops = false, multiple = true, seed = 9L)
    val e1 = r1.weighted.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e1.length == n)
    assert(e1.forall { case (a, b) => a != b && a >= 0 && a < n && b >= 0 && b < n })
    assert(edgeSet(Extras.rewireEdges(ring, 1.0, loops = false, multiple = true, seed = 9L))
      == edgeSet(r1))
    assert(edgeSet(Extras.rewireEdges(ring, 1.0, loops = false, multiple = true, seed = 10L))
      != edgeSet(r1), "different seed should rewire differently")
    // parallelism invariance: the rewiring is a pure function of (seed, edge)
    val rep = LinkGraph(ring.weighted.repartition(7), ring.directed, Some(n.toLong))
    assert(edgeSet(Extras.rewireEdges(rep, 1.0, loops = false, multiple = true, seed = 9L))
      == edgeSet(r1))
    // prob = 0.5: an edge survives untouched iff both coins miss (p = 0.25)
    // -> expect ~10 of 40 original edges retained; assert a generous CI
    val half = Extras.rewireEdges(ring, 0.5, loops = true, multiple = true, seed = 11L)
    val retained = (edgeSet(half) intersect edgeSet(ring)).size
    assert(retained >= 2 && retained <= 22, s"retained=$retained of 40 at prob=0.5")
    // multiple = false kernel: result stays simple, count preserved
    val rs = Extras.rewireEdges(ring, 1.0, loops = false, multiple = false, seed = 3L)
    val es = edgeSet(rs)
    assert(es.size == n, "simplicity kernel keeps the edge count and no multi-edges")
    assert(es.forall { case (a, b) => a != b })
    assert(edgeSet(Extras.rewireEdges(ring, 1.0, loops = false, multiple = false, seed = 3L)) == es)
  }

  test("feedback_arc_set: removal leaves a DAG; DAG -> empty; cycle -> 1; GR bound (graphobject.c:4833)") {
    import org.apache.spark.sql.functions._
    def assertFasValid(g: LinkGraph, fas: Array[(Long, Long)]): Unit = {
      // remove ONE instance per FAS row (multigraph-safe: counts, not sets)
      val fasCnt = fas.groupBy(identity).map { case (k, v) => k -> v.size }
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val seen = scala.collection.mutable.Map.empty[(Long, Long), Int].withDefaultValue(0)
      g.weighted.select("src", "dst").collect().foreach { r =>
        val e = (r.getLong(0), r.getLong(1))
        if (seen(e) < fasCnt.getOrElse(e, 0)) seen(e) += 1 else kept += e
      }
      val rest = LinkGraph(spark, g.vcount(), kept.toSeq, directed = true)
      assert(graft.algos.Distances.isDag(rest), s"FAS removal must leave a DAG (|fas|=${fas.length})")
    }
    def collectFas(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
    // DAG: both variants return empty
    val dag = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)), directed = true)
    assert(Extras.feedbackArcSet(dag).isEmpty && Extras.feedbackArcSetEades(dag).isEmpty)
    // 3-cycle: Eades removes exactly 1 arc; distributed removes >=1, stays acyclic
    val cyc = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L), (2L, 0L)), directed = true)
    val ec = collectFas(Extras.feedbackArcSetEades(cyc))
    assert(ec.length == 1); assertFasValid(cyc, ec)
    assertFasValid(cyc, collectFas(Extras.feedbackArcSet(cyc)))
    // self-loop is always in the FAS
    val lp = LinkGraph(spark, 2, Seq((0L, 1L), (1L, 1L)), directed = true)
    assert(collectFas(Extras.feedbackArcSet(lp)).contains((1L, 1L)))
    assert(collectFas(Extras.feedbackArcSetEades(lp)).contains((1L, 1L)))
    // random digraphs: acyclic after removal; Eades FAS <= m/2
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 5) {
      val n = 12
      val edges = (for {
        i <- 0 until n; j <- 0 until n
        if i != j && rnd.nextDouble() < 0.25
      } yield (i.toLong, j.toLong)).toSeq
      val g = LinkGraph(spark, n, edges, directed = true)
      val ef = collectFas(Extras.feedbackArcSetEades(g))
      assert(ef.length <= edges.length / 2, s"GR bound: ${ef.length} > ${edges.length}/2")
      assertFasValid(g, ef)
      assertFasValid(g, collectFas(Extras.feedbackArcSet(g)))
    }
    // undirected rejected
    intercept[IllegalArgumentException](
      Extras.feedbackArcSet(LinkGraph(spark, 2, Seq((0L, 1L)), directed = false)))
  }

  test("motifs_randesu_estimate: sampleFrac=1 exact; sampled within tolerance (graphobject.c:14341)") {
    val rnd = new scala.util.Random(17)
    val n = 30
    val edges = (for {
      i <- 0 until n; j <- 0 until n if i != j && rnd.nextDouble() < 0.12
    } yield (i.toLong, j.toLong)).toSeq
    val g = LinkGraph(spark, n, edges, directed = true)
    val exact = graft.algos.Motifs.motifs4DirectedCount(g).toDouble
    assert(graft.algos.Motifs.motifs4DirectedEstimate(g, 1.0) == exact)
    // mean of independent-seed estimates approaches exact (unbiased estimator)
    val est = (1 to 8).map(s =>
      graft.algos.Motifs.motifs4DirectedEstimate(g, 0.5, seed = s.toLong)).sum / 8.0
    assert(math.abs(est - exact) / exact < 0.35, s"est $est vs exact $exact")
    intercept[IllegalArgumentException](graft.algos.Motifs.motifs4DirectedEstimate(g, 0.0))
  }

  test("dominator tree goldens: forward, flipped (mode=IN), disconnected (test_structural.py:775-893)") {
    def domMap(g: LinkGraph, root: Long, mode: Mode = Mode.Out): Map[Long, Long] =
      Dominators.dominator(g, root, mode).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g1 = LinkGraph(spark, 13, Seq(
      (0L, 1L), (0L, 7L), (0L, 10L), (1L, 2L), (1L, 5L), (2L, 3L), (3L, 4L), (4L, 3L),
      (4L, 0L), (5L, 3L), (5L, 6L), (6L, 3L), (7L, 8L), (7L, 10L), (7L, 11L), (8L, 9L),
      (9L, 4L), (9L, 8L), (10L, 11L), (11L, 12L), (12L, 9L)), directed = true)
    val want1 = Map(0L -> -1L, 1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 1L,
      6L -> 5L, 7L -> 0L, 8L -> 0L, 9L -> 0L, 10L -> 0L, 11L -> 0L, 12L -> 11L)
    assert(domMap(g1, 0L) == want1)
    val g2 = LinkGraph(spark, 13, Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (1L, 2L), (4L, 2L), (5L, 2L), (6L, 3L),
      (7L, 3L), (12L, 4L), (8L, 5L), (9L, 6L), (9L, 7L), (10L, 7L), (5L, 8L), (11L, 8L),
      (11L, 9L), (9L, 10L), (9L, 11L), (0L, 11L), (8L, 12L)), directed = true)
    val want2 = Map(0L -> -1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 3L, 7L -> 3L, 8L -> 0L, 9L -> 0L, 10L -> 7L, 11L -> 0L, 12L -> 4L)
    assert(domMap(g2, 0L, Mode.In) == want2)
    val g3 = LinkGraph(spark, 20, Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (2L, 1L), (2L, 4L), (2L, 8L), (3L, 9L),
      (3L, 10L), (4L, 15L), (8L, 11L), (9L, 12L), (10L, 12L), (10L, 13L), (11L, 8L),
      (11L, 14L), (12L, 14L), (13L, 12L), (14L, 12L), (14L, 0L), (15L, 11L)), directed = true)
    val want3 = Map(0L -> -1L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 8L -> 0L,
      9L -> 3L, 10L -> 3L, 11L -> 0L, 12L -> 0L, 13L -> 10L, 14L -> 0L, 15L -> 4L)
    assert(domMap(g3, 0L) == want3) // unreachable 5,6,7,16-19 absent
  }

  private def sets(df: org.apache.spark.sql.DataFrame): Set[Seq[Long]] =
    df.select("vset").collect().map(_.getSeq[Long](0).toSeq).toSet

  test("independent vertex sets on Tree(5,2) + maximal/largest/alpha on Tree(10,2) (test_cliques.py:106-157)") {
    val t5 = LinkGraph.tree(spark, 5, 2)
    assert(sets(Cliques.independentVertexSets(t5, 4)).isEmpty)
    assert(sets(Cliques.independentVertexSets(t5, 2, 2)) == Set(
      Seq(0L, 3L), Seq(0L, 4L), Seq(1L, 2L), Seq(2L, 3L), Seq(2L, 4L), Seq(3L, 4L)))
    assert(sets(Cliques.independentVertexSets(t5)).size == 13)
    assert(sets(Cliques.largestIndependentVertexSets(t5)) ==
      Set(Seq(0L, 3L, 4L), Seq(2L, 3L, 4L)))
    val t10 = LinkGraph.tree(spark, 10, 2)
    assert(sets(Cliques.maximalIndependentVertexSets(t10)) == Set(
      Seq(0L, 3L, 4L, 5L, 6L), Seq(0L, 3L, 5L, 6L, 9L), Seq(0L, 4L, 5L, 6L, 7L, 8L),
      Seq(0L, 5L, 6L, 7L, 8L, 9L), Seq(1L, 2L, 7L, 8L, 9L), Seq(1L, 5L, 6L, 7L, 8L, 9L),
      Seq(2L, 3L, 4L), Seq(2L, 3L, 9L), Seq(2L, 4L, 7L, 8L)))
    assert(Cliques.independenceNumber(t10) == 6)
  }
}
