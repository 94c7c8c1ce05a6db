package graft

import graft.algos.PageRank
import graft.core.LinkGraph
import org.apache.spark.sql.functions.{col, lit, when}
import org.scalatest.funsuite.AnyFunSuite

/** Goldens from /root/reference/tests/test_structural.py:389-404. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("Star(11): hub is max with score ~0.4668 (test_structural.py:389-393)") {
    val g = LinkGraph.star(spark, 11)
    val r = PageRank.run(g, damping = 0.85, tol = 1e-10, maxIter = 200)
    val v = TestSession.vector(r.ranks, "rank")
    assert(v.indexOf(v.max) == 0)
    assert(math.abs(v.max - 0.4668) < 5e-4, s"hub=${v.max}")
    assert(math.abs(v.sum - 1.0) < 1e-9)
  }

  test("personalized: Star(11) damping 0.5 reset v1 -> 0.3333/0.5166/0.0166 (test_structural.py:395-404)") {
    val g = LinkGraph.star(spark, 11)
    val reset = Seq((1L, 10.0)).toDF("id", "reset")
    val r = PageRank.run(g, damping = 0.5, tol = 1e-12, maxIter = 300, reset = Some(reset))
    val v = TestSession.vector(r.ranks, "rank")
    assert(v.indexOf(v.max) == 1)
    assert(math.abs(v(0) - 0.3333) < 5e-4)
    assert(math.abs(v(1) - 0.5166) < 5e-4)
    assert(math.abs(v(2) - 0.0166) < 5e-4)
  }

  test("all-zero reset is an error (test_structural.py:396)") {
    val g = LinkGraph.star(spark, 5)
    val reset = Seq((1L, 0.0)).toDF("id", "reset")
    assertThrows[IllegalArgumentException] {
      PageRank.run(g, reset = Some(reset))
    }
  }

  test("dangling mass: directed star points inward; scores sum to 1") {
    // leaves -> hub: hub is the only non-dangling-free vertex; all leaves dangle
    val g = LinkGraph(spark, 5, Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)), directed = true)
    val r = PageRank.run(g, tol = 1e-12, maxIter = 300)
    val v = TestSession.vector(r.ranks, "rank")
    assert(math.abs(v.sum - 1.0) < 1e-9)
    assert(v(0) > v(1))
    assert((1 to 4).forall(i => math.abs(v(i) - v(1)) < 1e-12)) // symmetric leaves
  }

  test("weighted: two-target split proportional to weights") {
    // 0 -> 1 (w 3), 0 -> 2 (w 1): v1 receives 3x v2's share from 0
    val g = LinkGraph.weighted(spark, 3,
      Seq((0L, 1L, 3.0), (0L, 2L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0)), directed = true)
    val r = PageRank.run(g, tol = 1e-12, maxIter = 500)
    val v = TestSession.vector(r.ranks, "rank")
    val base = (1.0 - 0.85) / 3
    val from0to1 = v(1) - base - 0.0 // v1 only receives from 0
    val from0to2 = v(2) - base
    assert(math.abs(from0to1 / from0to2 - 3.0) < 1e-6)
  }

  test("fixed-iter mode: gated driver kernel == distributed loop at 1e-9") {
    // three regimes: undirected star (bidirected view), a directed graph
    // WITH dangling vertices, and a weighted multigraph with a self-loop —
    // smallThreshold = 0 pins the distributed superstep loop as the
    // reference for the r6 gated kernel (same posture as the Brandes /
    // fixed-sweep Louvain parity specs)
    val graphs = Seq(
      LinkGraph.star(spark, 11),
      LinkGraph(spark, 6, Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (4L, 0L)),
        directed = true), // 3 and 5 dangling, 5 isolated
      LinkGraph.weighted(spark, 5,
        Seq((0L, 1L, 2.0), (0L, 1L, 1.0), (1L, 2L, 5.0), (2L, 2L, 1.0), (3L, 0L, 0.5)),
        directed = true))
    for (g <- graphs; iters <- Seq(1, 7); pers <- Seq(false, true)) {
      // personalized mode too: reset mass on even ids (plus an id outside
      // the vertex set, which must count in the normalizer only)
      val reset =
        if (!pers) None
        else Some(g.vertices.select(col("id"),
          when(col("id") % 2 === 0, lit(2.0)).otherwise(lit(0.0)).as("reset"))
          .unionByName(Seq((999L, 1.0)).toDF("id", "reset")))
      val kern = PageRank.run(g, damping = 0.85, fixedIters = Some(iters),
          reset = reset)
        .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dist = PageRank.run(g, damping = 0.85, fixedIters = Some(iters),
          reset = reset, smallThreshold = 0L)
        .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(kern.keySet == dist.keySet)
      val maxDiff = kern.map { case (k, v) => math.abs(v - dist(k)) }.max
      assert(maxDiff < 1e-9,
        s"kernel vs distributed drift $maxDiff (iters=$iters, pers=$pers)")
    }
  }

  test("invariance under vertex relabeling (property)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L), (1L, 3L))
    val g1 = LinkGraph(spark, 5, edges, directed = true)
    val perm = Map(0L -> 3L, 1L -> 0L, 2L -> 4L, 3L -> 1L, 4L -> 2L)
    val g2 = LinkGraph(spark, 5, edges.map { case (s, d) => (perm(s), perm(d)) }, directed = true)
    val v1 = TestSession.vector(PageRank.run(g1, tol = 1e-12).ranks, "rank")
    val v2 = TestSession.vector(PageRank.run(g2, tol = 1e-12).ranks, "rank")
    perm.foreach { case (o, n) => assert(math.abs(v1(o.toInt) - v2(n.toInt)) < 1e-9) }
  }

  test("checkpoint + resume reproduces the uninterrupted run (north_rule resumability)") {
    val g = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (2L, 4L), (4L, 5L), (5L, 2L)), directed = true)
    val full = PageRank.run(g, tol = 1e-10, maxIter = 100)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val store1 = new graft.core.CheckpointStore(dir, "run1")
    // interrupted run: only 5 iterations, durably checkpointed
    PageRank.run(g, tol = 1e-10, maxIter = 100, fixedIters = Some(5), store = Some(store1))
    assert(store1.latestIter(spark).contains(5))
    // resume to convergence
    val resumed = PageRank.resume(g, store1, tol = 1e-10, maxIter = 100)
    val vFull = TestSession.vector(full.ranks, "rank")
    val vRes = TestSession.vector(resumed.ranks, "rank")
    vFull.indices.foreach(i => assert(math.abs(vFull(i) - vRes(i)) < 1e-8))
    // lineage/metrics rows exist for every checkpointed iteration
    val iters = store1.metrics(spark).select("iter").distinct().count()
    assert(iters >= 5)
  }
}
