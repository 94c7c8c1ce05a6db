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

  test("grid-CSR PageRank matches edge-join to 1e-9 (directed, with dangling)") {
    val g = randomGraph(300, 2500) // remainderUnsigned leaves some ids dangling
    val base = TestSession.vector(PageRank.run(g, tol = 1e-12, maxIter = 40).ranks, "rank")
    val grid = TestSession.vector(
      PageRank.run(g, tol = 1e-12, maxIter = 40, strategy = PageRank.GridBlocks(7)).ranks, "rank")
    base.indices.foreach { i =>
      assert(math.abs(base(i) - grid(i)) < 1e-9, s"grid differs at $i")
    }
  }

  test("grid-CSR matches edge-join on a weighted graph and personalized reset") {
    import spark.implicits._
    val edges = (0 until 500).map { k =>
      val a = graft.ingest.Pages.mix64(7L + k)
      (java.lang.Long.remainderUnsigned(a, 60L),
        java.lang.Long.remainderUnsigned(graft.ingest.Pages.mix64(a), 60L),
        1.0 + (java.lang.Long.remainderUnsigned(a, 5L)).toDouble)
    }
    val g = LinkGraph.weighted(spark, 60, edges, directed = true)
    val reset = Some((0 until 60).map(i => (i.toLong, if (i % 7 == 0) 1.0 else 0.0)).toDF("id", "reset"))
    val base = TestSession.vector(
      PageRank.run(g, damping = 0.5, tol = 1e-12, maxIter = 60, reset = reset).ranks, "rank")
    val grid = TestSession.vector(
      PageRank.run(g, damping = 0.5, tol = 1e-12, maxIter = 60, reset = reset,
        strategy = PageRank.GridBlocks(5)).ranks, "rank")
    base.indices.foreach { i =>
      assert(math.abs(base(i) - grid(i)) < 1e-9, s"grid differs at $i")
    }
  }

  test("grid-CSR fixed-iteration mode matches edge-join fixed mode exactly-ish") {
    val g = randomGraph(200, 1500)
    val base = TestSession.vector(PageRank.run(g, fixedIters = Some(15)).ranks, "rank")
    val grid = TestSession.vector(
      PageRank.run(g, fixedIters = Some(15), strategy = PageRank.GridBlocks(0)).ranks, "rank")
    base.indices.foreach { i =>
      assert(math.abs(base(i) - grid(i)) < 1e-12, s"grid differs at $i")
    }
  }

  test("grid-CSR handles tiny graphs where most blocks are empty") {
    val g = LinkGraph(spark, 5, Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)), directed = true)
    val base = TestSession.vector(PageRank.run(g, tol = 1e-12, maxIter = 80).ranks, "rank")
    val grid = TestSession.vector(
      PageRank.run(g, tol = 1e-12, maxIter = 80, strategy = PageRank.GridBlocks(0)).ranks, "rank")
    base.indices.foreach(i => assert(math.abs(base(i) - grid(i)) < 1e-9))
  }

  test("grid-CSR reproduces the Star(11) golden (undirected bidirected view)") {
    val g = LinkGraph.star(spark, 11)
    val v = TestSession.vector(
      PageRank.run(g, tol = 1e-10, maxIter = 200, strategy = PageRank.GridBlocks(3)).ranks, "rank")
    assert(math.abs(v.max - 0.4668) < 5e-4)
    assert(v.indexOf(v.max) == 0)
  }

  test("CSR strategy reproduces the Star(11) golden") {
    val g = LinkGraph.star(spark, 11)
    val v = TestSession.vector(
      PageRank.run(g, tol = 1e-10, maxIter = 200, strategy = PageRank.CsrBlocks(4)).ranks, "rank")
    assert(math.abs(v.max - 0.4668) < 5e-4)
    assert(v.indexOf(v.max) == 0)
  }
}
