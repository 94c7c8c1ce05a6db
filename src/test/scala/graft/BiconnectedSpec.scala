package graft

import graft.algos.Biconnected
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** Biconnected/articulation goldens (test_structural.py:212-233). */
class BiconnectedSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("Full(10): one biconnected component, no articulation points") {
    val r = Biconnected.run(LinkGraph.full(spark, 10))
    assert(r.components == Seq((0L until 10L).toSet))
    assert(r.articulationPoints.isEmpty)
  }

  test("path graph: every inner vertex is a cut vertex") {
    val g2 = LinkGraph(spark, 5, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), directed = false)
    assert(Biconnected.articulationPoints(g2) == Seq(1L, 2L, 3L))
  }

  test("square + triangle sharing vertex 2: two components, ap == [2]") {
    val g3 = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (2L, 4L), (2L, 5L), (4L, 5L)), directed = false)
    val r = Biconnected.run(g3)
    assert(r.components.map(_.toSeq.sorted).toSet ==
      Set(Seq(2L, 4L, 5L), Seq(0L, 1L, 2L, 3L)))
    assert(r.articulationPoints == Seq(2L))
  }

  private def asSets(r: Biconnected.Result): (Set[Set[Long]], Set[Long]) =
    (r.components.toSet, r.articulationPoints.toSet)

  test("Tarjan-Vishkin parity vs Hopcroft-Tarjan kernel on random graphs") {
    for (seed <- 1 to 6) {
      val g = graft.core.Generators.erdosRenyiGnm(spark, 40, 55, seed = seed.toLong)
      // smallThreshold = 0 pins the DISTRIBUTED Tarjan-Vishkin path (the
      // default gate would route run() to the same sequential kernel)
      assert(asSets(Biconnected.run(g, smallThreshold = 0L)) == asSets(Biconnected.runSequential(g)),
        s"mismatch at seed $seed")
    }
    // sparse / forest-heavy regime: many bridges and singleton blocks
    for (seed <- 7 to 10) {
      val g = graft.core.Generators.erdosRenyiGnm(spark, 50, 35, seed = seed.toLong)
      assert(asSets(Biconnected.run(g, smallThreshold = 0L)) == asSets(Biconnected.runSequential(g)),
        s"mismatch at sparse seed $seed")
    }
  }

  test("Tarjan-Vishkin parity: multigraph noise, barbell, disconnected") {
    // parallel edges + self loops must behave as the simple view
    val noisy = LinkGraph(spark, 7, Seq(
      (0L, 1L), (1L, 0L), (2L, 2L), (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (4L, 5L), (5L, 6L)), directed = false)
    assert(asSets(Biconnected.run(noisy, smallThreshold = 0L)) == asSets(Biconnected.runSequential(noisy)))
    // two 5-cliques joined by a bridge (classic articulation pair)
    val cliqueEdges = for { i <- 0L until 5L; j <- i + 1 until 5L } yield (i, j)
    val barbell = LinkGraph(spark, 10,
      cliqueEdges ++ cliqueEdges.map { case (a, b) => (a + 5, b + 5) } ++ Seq((4L, 5L)),
      directed = false)
    val r = Biconnected.run(barbell, smallThreshold = 0L)
    assert(r.components.toSet == Set((0L until 5L).toSet, (5L until 10L).toSet, Set(4L, 5L)))
    assert(r.articulationPoints == Seq(4L, 5L))
    assert(asSets(r) == asSets(Biconnected.runSequential(barbell)))
  }
}
