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

  private def paths(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
    df.select("path").collect().map(_.getSeq[Long](0).toSeq).toSeq
      .sortBy(_.mkString(","))

  test("get_all_shortest_paths goldens (test_structural.py:646-685)") {
    val g = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)), directed = true)
    assert(paths(ShortestPaths.allShortestPaths(g, 0L, Seq(0L))) == Seq(Seq(0L)))
    assert(paths(ShortestPaths.allShortestPaths(g, 0L, Seq(5L))).toSet ==
      Set(Seq(0L, 1L, 2L, 4L, 5L), Seq(0L, 1L, 3L, 4L, 5L)))
    assert(paths(ShortestPaths.allShortestPaths(g, 1L, Seq(4L))).toSet ==
      Set(Seq(1L, 2L, 4L), Seq(1L, 3L, 4L)))
    // Lattice([5,5]): six monotone staircase paths 0 -> 12
    val lat = LinkGraph.lattice(spark, Seq(5, 5))
    assert(paths(ShortestPaths.allShortestPaths(lat, 0L, Seq(12L), mode = graft.core.Mode.All)).toSet == Set(
      Seq(0L, 1L, 2L, 7L, 12L), Seq(0L, 1L, 6L, 7L, 12L), Seq(0L, 1L, 6L, 11L, 12L),
      Seq(0L, 5L, 6L, 7L, 12L), Seq(0L, 5L, 6L, 11L, 12L), Seq(0L, 5L, 10L, 11L, 12L)))
    // multi-target includes the trivial [0] (reference: to=[0, 202] analog)
    assert(paths(ShortestPaths.allShortestPaths(lat, 0L, Seq(0L, 12L), mode = graft.core.Mode.All)).size == 7)
  }

  test("get_all_shortest_paths weighted ties (test_structural.py:690-694)") {
    // weights 0.5/0.5/1: [0,1,2] (1.0) ties [0,2] (1.0) — both enumerated
    val g = LinkGraph.weighted(spark, 3,
      Seq((0L, 1L, 0.5), (1L, 2L, 0.5), (0L, 2L, 1.0)), directed = false)
    val got = paths(ShortestPaths.allShortestPaths(g, 0L, Seq(0L, 1L, 2L), mode = graft.core.Mode.All))
    assert(got.toSet == Set(Seq(0L), Seq(0L, 1L), Seq(0L, 1L, 2L), Seq(0L, 2L)))
  }

  test("get_all_simple_paths goldens: Ring(20) directed modes (test_structural.py:707-724)") {
    val ringU = LinkGraph.ring(spark, 20)
    assert(paths(ShortestPaths.allSimplePaths(ringU, 0L, Seq(10L), mode = graft.core.Mode.All)).toSet == Set(
      Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L),
      Seq(0L, 19L, 18L, 17L, 16L, 15L, 14L, 13L, 12L, 11L, 10L)))
    val ringD = LinkGraph(spark, 20, (0 until 20).map(i => (i.toLong, (i + 1) % 20L)), directed = true)
    assert(paths(ShortestPaths.allSimplePaths(ringD, 0L, Seq(10L))).toSet ==
      Set(Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)))
    assert(paths(ShortestPaths.allSimplePaths(ringD, 0L, Seq(10L), mode = graft.core.Mode.In)).toSet ==
      Set(Seq(0L, 19L, 18L, 17L, 16L, 15L, 14L, 13L, 12L, 11L, 10L)))
    assert(paths(ShortestPaths.allSimplePaths(ringD, 0L, Seq(10L), mode = graft.core.Mode.All)).size == 2)
  }

  test("get_all_simple_paths: DAG-ified Lattice([4,4]) has 20 paths 0 -> 15 (test_structural.py:726-739)") {
    val lat = LinkGraph.lattice(spark, Seq(4, 4))
    val dag = LinkGraph(lat.edges
      .select(org.apache.spark.sql.functions.least(
        org.apache.spark.sql.functions.col("src"), org.apache.spark.sql.functions.col("dst")).as("src"),
        org.apache.spark.sql.functions.greatest(
          org.apache.spark.sql.functions.col("src"), org.apache.spark.sql.functions.col("dst")).as("dst")),
      directed = true, Some(16L))
    val got = paths(ShortestPaths.allSimplePaths(dag, 0L, Seq(15L)))
    assert(got.size == 20)
    assert(got.forall(p => p.head == 0L && p.last == 15L))
  }

  test("allShortestPaths: distributed per-hop loop == gated driver walk") {
    // smallThreshold = 0 pins the DISTRIBUTED loop (the default takes the
    // gated driver enumeration on fixtures this size)
    val g = LinkGraph(spark, 8, (0 until 8).map(i => (i.toLong, (i + 1) % 8L)), directed = false)
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Long])] =
      df.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSet
    val gated = norm(ShortestPaths.allShortestPaths(g, 0L, Seq(4L), graft.core.Mode.All))
    val dist = norm(ShortestPaths.allShortestPaths(g, 0L, Seq(4L), graft.core.Mode.All,
      smallThreshold = 0L))
    assert(gated == dist)
    assert(gated.size == 2, "antipodal ring vertex has exactly two shortest paths")
  }

  test("allShortestPaths explosion gate fails loudly") {
    // complete bipartite ladder: K2,2 chain gives 2^k shortest paths
    val k = 12
    val edges = (0 until k).flatMap { lvl =>
      val a = lvl * 2 + 1; val b = lvl * 2 + 2; val p = if (lvl == 0) Seq(0L) else Seq(lvl * 2 - 1L, lvl * 2L)
      p.flatMap(u => Seq((u, a.toLong), (u, b.toLong)))
    } :+ (k * 2 - 1L, k * 2 + 1L) :+ (k * 2.toLong, k * 2 + 1L)
    val g = LinkGraph(spark, k * 2 + 2L, edges, directed = true)
    val e = intercept[IllegalArgumentException](
      ShortestPaths.allShortestPaths(g, 0L, Seq(k * 2 + 1L), maxPaths = 100L).count())
    assert(e.getMessage.contains("maxPaths"))
  }
}
