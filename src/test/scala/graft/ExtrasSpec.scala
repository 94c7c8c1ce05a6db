package graft

import graft.core.LinkGraph
import graft.ops.Extras
import org.scalatest.funsuite.AnyFunSuite

/** Line graph / bridges / matrix views / power-law / random-walk goldens. */
class ExtrasSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("line graph golden (test_structural.py:570-576; edge ids in (src,dst) order)") {
    val g = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L)), directed = false)
    val lg = Extras.lineGraph(g)
    val el = lg.edges.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(el == Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("bridges goldens (test_structural.py:499-505)") {
    def pairs(g: LinkGraph) =
      Extras.bridges(g).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val g1 = LinkGraph(spark, 5, Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 4L)), directed = false)
    assert(pairs(g1) == Seq((0L, 3L), (3L, 4L)))
    val g2 = LinkGraph(spark, 7,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 6L), (1L, 3L), (1L, 4L), (3L, 5L), (4L, 5L)), directed = false)
    assert(pairs(g2) == Seq((1L, 6L)))
    val g3 = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (2L, 3L)), directed = false)
    assert(pairs(g3) == Seq((0L, 1L), (1L, 2L), (2L, 3L)))
  }

  test("laplacian: row sums are zero; adjacency COO collapses multi-edges") {
    val g = LinkGraph(spark, 3, Seq((0L, 1L), (0L, 1L), (1L, 2L)), directed = false)
    val adj = Extras.adjacencyCoo(g).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(adj((0L, 1L)) == 2.0 && adj((1L, 2L)) == 1.0)
    val rowSums = Extras.laplacianCoo(g).groupBy("row")
      .agg(org.apache.spark.sql.functions.sum("value").as("s")).collect()
    rowSums.foreach(r => assert(math.abs(r.getDouble(1)) < 1e-12))
  }

  test("power-law fit recovers a steep exponent on the synthetic web graph") {
    val edges = Bench.synthEdges(spark, 20000, 10, 8)
    val g = LinkGraph(edges, directed = true, Some(20000L))
    val fit = Extras.powerLawFit(g, xmin = 5.0)
    assert(fit.alpha > 1.2 && fit.alpha < 6.0, s"alpha=${fit.alpha}")
    assert(fit.n > 0)
  }

  test("random walk is valid (every hop is an edge) and deterministic (test_walks.py:7-14)") {
    val g = LinkGraph(spark, 5, Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L)), directed = true)
    val adj = g.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w1 = Extras.randomWalk(g, 0L, 12, seed = 7L)
    val w2 = Extras.randomWalk(g, 0L, 12, seed = 7L)
    assert(w1 == w2)
    w1.sliding(2).foreach { case Seq(a, b) => assert(adj.contains((a, b))) }
  }

  test("bridges: a parallel edge is never a bridge (multigraph semantics)") {
    val g = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 3L)), directed = false)
    val pairs = Extras.bridges(g).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs == Seq((1L, 2L), (2L, 3L)))
  }

  test("bridges: distributed XOR-tag sweep == gated Hopcroft-Tarjan kernel") {
    // smallThreshold = 0 pins the DISTRIBUTED sweep (the default takes the
    // gated kernel on fixtures this size)
    for (seed <- 1 to 4) {
      val g = graft.core.Generators.erdosRenyiGnm(spark, 50, 40, seed = seed.toLong)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(pairs(Extras.bridges(g, smallThreshold = 0L)) == pairs(Extras.bridges(g)),
        s"mismatch at seed $seed")
    }
  }

  test("batched random walks: 1000 walkers, every hop is an edge, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val g = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L), (4L, 5L)), directed = true)
    val adj = g.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val starts = spark.range(1000).select(col("id").as("walk_id"), (col("id") % 6).as("start"))
    val walks = Extras.randomWalks(g, starts, steps = 8, seed = 11L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(walks.size == 1000)
    walks.values.foreach { p =>
      p.sliding(2).foreach { case Seq(a, b) => assert(adj.contains((a, b))); case _ => }
    }
    // walker 5 starts at vertex 5 (a sink): must halt in place, path length 1
    assert(walks(5L) == Seq(5L))
    val again = Extras.randomWalks(g, starts, steps = 8, seed = 11L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == walks)
  }
}
