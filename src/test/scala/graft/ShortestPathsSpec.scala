package graft

import graft.algos.ShortestPaths
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** Weighted shortest-path goldens from
  * /root/reference/tests/test_structural.py:585-644 (incl. 0-weight edges).
  */
class ShortestPathsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  val inf = Double.PositiveInfinity
  val edges = Seq(
    (0, 1, 0.0), (0, 2, 2.0), (0, 3, 1.0), (1, 2, 0.0), (1, 4, 5.0), (1, 5, 2.0),
    (2, 3, 1.0), (2, 6, 1.0), (3, 2, 0.0), (3, 6, 2.0), (4, 5, 2.0), (4, 7, 8.0),
    (5, 6, 1.0), (5, 8, 1.0), (5, 9, 3.0), (7, 5, 1.0), (7, 8, 1.0), (8, 9, 4.0),
    (5, 2, 2.0), (2, 1, 1.0)).map(t => (t._1.toLong, t._2.toLong, t._3))

  val expected: Seq[Seq[Double]] = Seq[Seq[Double]](
    Seq(0, 0, 0, 1, 5, 2, 1, 13, 3, 5),
    Seq(inf, 0, 0, 1, 5, 2, 1, 13, 3, 5),
    Seq(inf, 1, 0, 1, 6, 3, 1, 14, 4, 6),
    Seq(inf, 1, 0, 0, 6, 3, 1, 14, 4, 6),
    Seq(inf, 5, 4, 5, 0, 2, 3, 8, 3, 5),
    Seq(inf, 3, 2, 3, 8, 0, 1, 16, 1, 3),
    Seq(inf, inf, inf, inf, inf, inf, 0, inf, inf, inf),
    Seq(inf, 4, 3, 4, 9, 1, 2, 0, 1, 4),
    Seq(inf, inf, inf, inf, inf, inf, inf, inf, 0, 4),
    Seq(inf, inf, inf, inf, inf, inf, inf, inf, inf, 0))

  test("10x10 weighted distance matrix with 0-weight edges (test_structural.py:585-631)") {
    val g = LinkGraph.weighted(spark, 10, edges, directed = true)
    val m = ShortestPaths.matrix(g, 0L until 10L)
    val got = Array.fill(10, 10)(inf)
    m.collect().foreach(r => got(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
    for (i <- 0 until 10; j <- 0 until 10)
      assert(got(i)(j) == expected(i)(j), s"d($i,$j)=${got(i)(j)} want ${expected(i)(j)}")
  }

  test("get_shortest_paths vpath golden (test_structural.py:633-644)") {
    val g = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 3L), (3L, 2L), (2L, 1L)), directed = true)
    assert(ShortestPaths.path(g, 0L, 0L) == Seq(0L))
    assert(ShortestPaths.path(g, 0L, 1L) == Seq(0L, 1L))
    assert(ShortestPaths.path(g, 0L, 2L) == Seq(0L, 2L))
    assert(ShortestPaths.path(g, 0L, 3L) == Seq(0L, 1L, 3L))
  }
}
