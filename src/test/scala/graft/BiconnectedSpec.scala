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
}
