package graft

import graft.algos.{CommunityKernels, Modularity}
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from the reference `tests/test_decomposition.py`:
  * fastgreedy (Clauset) :190-220, edge betweenness (GN) :222-238,
  * leading eigenvector :240-248, walktrap :428-434.
  */
class CommunityKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def memb(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).map(_._2).toSeq

  private def twoCliques: LinkGraph = {
    val edges = (for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)) ++
      (for (i <- 5L to 9L; j <- i + 1 to 9L) yield (i, j)) :+ (0L, 5L)
    LinkGraph(spark, 10, edges, directed = false)
  }

  test("fastgreedy: two cliques (test_decomposition.py:190-196)") {
    val d = CommunityKernels.fastgreedy(twoCliques)
    val cl = d.asClustering
    assert(TestSession.reindex(cl.map(_.toLong)) === Seq(0, 0, 0, 0, 0, 1, 1, 1, 1, 1))
    assert(math.abs(d.q.max - 0.4523) < 5e-4, s"q=${d.q.max}")
  }

  test("fastgreedy: weighted lollipop, two weightings (:198-210)") {
    // Full(4)+Full(2), bridge (3,4); edge order (0,1)(0,2)(0,3)(1,2)(1,3)(2,3)(4,5)(3,4)
    val e1 = Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0), (1L, 2L, 1.0),
      (1L, 3L, 1.0), (2L, 3L, 1.0), (4L, 5L, 10.0), (3L, 4L, 10.0))
    val d1 = CommunityKernels.fastgreedy(LinkGraph.weighted(spark, 6, e1, directed = false))
    assert(TestSession.reindex(d1.asClustering.map(_.toLong)) === Seq(0, 0, 0, 1, 1, 1))
    assert(math.abs(d1.q.max - 0.1708) < 5e-4, s"q=${d1.q.max}")

    val e2 = e1.map { case (u, v, _) => (u, v, 3.0) }
    val d2 = CommunityKernels.fastgreedy(LinkGraph.weighted(spark, 6, e2, directed = false))
    assert(TestSession.reindex(d2.asClustering.map(_.toLong)) === Seq(0, 0, 0, 0, 1, 1))
    assert(math.abs(d2.q.max - 0.1796) < 5e-4, s"q=${d2.q.max}")
  }

  test("fastgreedy: disconnected and empty graphs (:212-220)") {
    val parts = Seq(0 until 4, 4 until 8, 8 until 11, 11 until 13)
    val edges = parts.flatMap(r => for (i <- r; j <- r if i < j) yield (i.toLong, j.toLong))
    val d = CommunityKernels.fastgreedy(LinkGraph(spark, 13, edges, directed = false))
    assert(TestSession.reindex(d.asClustering.map(_.toLong)) ===
      Seq(0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 3, 3))

    val empty = CommunityKernels.fastgreedy(LinkGraph(spark, 20, Seq.empty, directed = false))
    assert(empty.asClustering.toSeq === (0 until 20))
  }

  test("edge betweenness communities: Full(5) unweighted + weighted n=2 (:222-238)") {
    val full5 = LinkGraph(spark, 5,
      for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j), directed = false)
    val d = CommunityKernels.edgeBetweennessCommunities(full5)
    assert(d.asClustering.toSeq === Seq(0, 0, 0, 0, 0))

    // weights: edges (0,1),(1,2),(2,0),(3,4) get 10, rest 1
    val heavy = Set((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L))
    val we = for (i <- 0L to 4L; j <- i + 1 to 4L)
      yield (i, j, if (heavy((i, j))) 10.0 else 1.0)
    val g2 = LinkGraph.weighted(spark, 5, we, directed = false)
    val d2 = CommunityKernels.edgeBetweennessCommunities(g2)
    val cl2 = d2.cutToCount(2)
    assert(TestSession.reindex(cl2.map(_.toLong)) === Seq(0, 0, 0, 1, 1))
    val q = Modularity.modularity(g2,
      { import spark.implicits._
        cl2.zipWithIndex.map { case (l, i) => (i.toLong, l.toLong) }.toSeq.toDF("id", "label") })
    assert(math.abs(q - 0.2750) < 5e-4, s"q=$q")
  }

  test("leading eigenvector: two cliques, free and clusters=2 (:240-248)") {
    val cl = memb(CommunityKernels.leadingEigenvector(twoCliques))
    assert(TestSession.reindex(cl) === Seq(0, 0, 0, 0, 0, 1, 1, 1, 1, 1))
    val cl2 = memb(CommunityKernels.leadingEigenvector(twoCliques, clusters = 2))
    assert(TestSession.reindex(cl2) === Seq(0, 0, 0, 0, 0, 1, 1, 1, 1, 1))
  }

  test("walktrap: ring of three 5-cliques, default and steps=3 (:428-434)") {
    val cliq = for (c <- 0 until 3; i <- 0 until 5; j <- i + 1 until 5)
      yield ((c * 5 + i).toLong, (c * 5 + j).toLong)
    val edges = cliq ++ Seq((0L, 5L), (5L, 10L), (10L, 0L))
    val g = LinkGraph(spark, 15, edges, directed = false)
    val expected = Seq(0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2)
    assert(TestSession.reindex(CommunityKernels.walktrap(g).asClustering.map(_.toLong)) === expected)
    assert(TestSession.reindex(CommunityKernels.walktrap(g, steps = 3).asClustering.map(_.toLong)) === expected)
  }

  test("spinglass: ring of three 5-cliques (test_decomposition.py:399-426, three seeds allowed)") {
    val cliq = for (c <- 0 until 3; i <- 0 until 5; j <- i + 1 until 5)
      yield ((c * 5 + i).toLong, (c * 5 + j).toLong)
    val edges = cliq ++ Seq((0L, 5L), (5L, 10L), (10L, 0L))
    val g = LinkGraph(spark, 15, edges, directed = false)
    val expected = Seq(0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2)
    // the reference test itself retries spinglass three times (it's an
    // anneal); we do the same over three fixed seeds
    val ok = (0L to 2L).exists { s =>
      TestSession.reindex(CommunityKernels.spinglass(g, seed = s).map(_.toLong)) == expected
    }
    assert(ok, "spinglass failed to find the 3-clique partition in 3 seeded runs")
    // determinism: same seed, same membership
    assert(CommunityKernels.spinglass(g, seed = 1L).toSeq ==
      CommunityKernels.spinglass(g, seed = 1L).toSeq)
  }
}
