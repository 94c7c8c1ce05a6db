package graft

import graft.algos.PageRank
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** The three physical PageRank strategies must agree to float tolerance on
  * the same graph (byte-identical plans are not required — north_star §6
  * re-validation of the CSR/salting paths against the slice-0 results).
  */
class StrategySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def randomGraph(n: Int, m: Int): LinkGraph = {
    val edges = (0 until m).map { k =>
      val a = graft.ingest.Pages.mix64(42L + k)
      val s = java.lang.Long.remainderUnsigned(a, n.toLong)
      val d = java.lang.Long.remainderUnsigned(graft.ingest.Pages.mix64(a), n.toLong)
      (s, d)
    }
    LinkGraph(spark, n, edges, directed = true)
  }

  test("CSR-block and hub-broadcast PageRank match edge-join to 1e-9") {
    val g = randomGraph(300, 2500)
    val base = TestSession.vector(PageRank.run(g, tol = 1e-12, maxIter = 40).ranks, "rank")
    val csr = TestSession.vector(
      PageRank.run(g, tol = 1e-12, maxIter = 40, strategy = PageRank.CsrBlocks(8)).ranks, "rank")
    val hub = TestSession.vector(
      PageRank.run(g, tol = 1e-12, maxIter = 40, strategy = PageRank.HubBroadcast(20)).ranks, "rank")
    base.indices.foreach { i =>
      assert(math.abs(base(i) - csr(i)) < 1e-9, s"csr differs at $i")
      assert(math.abs(base(i) - hub(i)) < 1e-9, s"hub differs at $i")
    }
  }

  test("CSR strategy reproduces the Star(11) golden") {
    val g = LinkGraph.star(spark, 11)
    val v = TestSession.vector(
      PageRank.run(g, tol = 1e-10, maxIter = 200, strategy = PageRank.CsrBlocks(4)).ranks, "rank")
    assert(math.abs(v.max - 0.4668) < 5e-4)
    assert(v.indexOf(v.max) == 0)
  }
}
