package graft

import graft.algos.Flow
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** Max-flow / min-cut goldens from /root/reference/tests/test_flow.py. */
class FlowSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** The reference fixture: 4 vertices, caps [4, 2, 10, 2, 2]. */
  def fixture: LinkGraph = LinkGraph.weighted(spark, 4, Seq(
    (0L, 1L, 4.0), (0L, 2L, 2.0), (1L, 2L, 10.0), (1L, 3L, 2.0), (2L, 3L, 2.0)),
    directed = false)

  test("maxflow value + flow + cut + partition (test_flow.py:36-56)") {
    val unit = Flow.maxflow(fixture, 0L, 3L)
    assert(unit.value == 2.0)
    val uf = unit.flow.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(uf((0L, 1L))) == 1.0 && math.abs(uf((0L, 2L))) == 1.0 &&
      uf((1L, 2L)) == 0.0 && math.abs(uf((1L, 3L))) == 1.0 && math.abs(uf((2L, 3L))) == 1.0)
    val cap = Flow.maxflow(fixture, 0L, 3L, useWeights = true)
    assert(cap.value == 4.0)
    assert(cap.cutEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 3L)))
    val sides = cap.partition.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sides == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("mincut value/global + directional (test_flow.py:72-134)") {
    assert(Flow.maxflowValue(fixture, 0L, 3L) == 2.0)
    assert(Flow.maxflowValue(fixture, 0L, 3L, useWeights = true) == 4.0)
    assert(Flow.mincutValue(fixture) == 2.0)
    val mc = Flow.mincut(fixture, useWeights = true)
    assert(mc.value == 4.0)
    // st_mincut(2, 0, capacity): cut = edges (0,1), (0,2), value 6
    val m20 = Flow.stMincut(fixture, 2L, 0L, useWeights = true)
    assert(m20.value == 6.0)
    assert(m20.cutEdges.collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet ==
      Set(Set(0L, 1L), Set(0L, 2L)))
  }

  test("edge connectivity / adhesion (test_flow.py:17-23)") {
    assert(Flow.edgeConnectivity(fixture, 0L, 3L) == 2L)
    assert(Flow.adhesion(fixture) == 2L)
    assert(Flow.adhesion(LinkGraph.tree(spark, 10, 3)) == 1L)
    // directed out-tree: some pair unreachable -> adhesion 0
    val out = LinkGraph(spark, 10,
      (1 until 10).map(i => ((i - 1) / 3).toLong -> i.toLong), directed = true)
    assert(Flow.adhesion(out) == 0L)
    // preferential-attachment-like graph with a degree-1 vertex -> 1
    val pa = LinkGraph(spark, 8,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L), (3L, 1L), (4L, 1L), (4L, 2L),
        (5L, 3L), (5L, 4L), (6L, 0L), (6L, 4L), (7L, 5L)), directed = false)
    assert(Flow.adhesion(pa) == 1L)
  }

  test("vertex connectivity / cohesion (test_flow.py:25-34)") {
    assert(Flow.vertexConnectivity(fixture, 0L, 3L) == 2L)
    assert(Flow.cohesion(fixture) == 2L)
    assert(Flow.cohesion(LinkGraph.tree(spark, 10, 3)) == 1L)
    val out = LinkGraph(spark, 10,
      (1 until 10).map(i => ((i - 1) / 3).toLong -> i.toLong), directed = true)
    assert(Flow.cohesion(out) == 0L)
    // adjacent endpoints: neighbors policy (reference: error / nodes / negative)
    intercept[IllegalArgumentException](Flow.vertexConnectivity(fixture, 0L, 1L))
    assert(Flow.vertexConnectivity(fixture, 0L, 1L, neighbors = "nodes") == 4L)
    assert(Flow.vertexConnectivity(fixture, 0L, 1L, neighbors = "negative") == -1L)
    // complete graph: n - 1
    assert(Flow.cohesion(LinkGraph.full(spark, 5)) == 4L)
  }

  test("gomory_hu_tree: n-1 edges; min tree-path edge == maxflow for every pair (test_flow.py:205-256)") {
    val g = LinkGraph.weighted(spark, 6, Seq(
      (0L, 1L, 1.0), (0L, 2L, 7.0), (1L, 2L, 1.0), (1L, 3L, 3.0), (1L, 4L, 2.0),
      (2L, 4L, 4.0), (3L, 4L, 1.0), (3L, 5L, 6.0), (4L, 5L, 2.0)), directed = false)
    val t = Flow.gomoryHu(g, useWeights = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(t.length == 5)
    // tree path min == maxflow for all 15 pairs
    val adj = scala.collection.mutable.Map.empty[Long, List[(Long, Double)]].withDefaultValue(Nil)
    t.foreach { case (a, b, f) => adj(a) ::= (b, f); adj(b) ::= (a, f) }
    def pathMin(s: Long, d: Long): Double = {
      def dfs(u: Long, prev: Long, m: Double): Option[Double] = {
        if (u == d) return Some(m)
        adj(u).iterator.filter(_._1 != prev)
          .flatMap { case (v, f) => dfs(v, u, math.min(m, f)) }.toSeq.headOption
      }
      dfs(s, -1L, Double.MaxValue).get
    }
    for (i <- 0L until 6L; j <- i + 1 until 6L)
      assert(pathMin(i, j) == Flow.maxflowValue(g, i, j, useWeights = true),
        s"pair ($i,$j)")
    // directed graphs rejected (reference raises InternalError)
    intercept[IllegalArgumentException](
      Flow.gomoryHu(LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = true)))
    // empty graph -> empty tree
    assert(Flow.gomoryHu(LinkGraph(spark, 0, Seq.empty, directed = false)).count() == 0)
  }

  test("gomory_hu_tree property on a random graph with random capacities (test_flow.py:224-229)") {
    val rnd = new scala.util.Random(31)
    val n = 9
    val edges = (for {
      i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.4
    } yield (i.toLong, j.toLong, (rnd.nextInt(10) + 1).toDouble)).toSeq
    val g = LinkGraph.weighted(spark, n.toLong, edges, directed = false)
    val t = Flow.gomoryHu(g, useWeights = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(t.length == n - 1)
    val adj = scala.collection.mutable.Map.empty[Long, List[(Long, Double)]].withDefaultValue(Nil)
    t.foreach { case (a, b, f) => adj(a) ::= (b, f); adj(b) ::= (a, f) }
    def pathMin(s: Long, d: Long): Double = {
      def dfs(u: Long, prev: Long, m: Double): Option[Double] = {
        if (u == d) return Some(m)
        adj(u).iterator.filter(_._1 != prev)
          .flatMap { case (v, f) => dfs(v, u, math.min(m, f)) }.toSeq.headOption
      }
      dfs(s, -1L, Double.MaxValue).get
    }
    for (i <- 0L until n.toLong; j <- i + 1 until n.toLong)
      assert(pathMin(i, j) == Flow.maxflowValue(g, i, j, useWeights = true), s"pair ($i,$j)")
  }

  test("allPairsMinCut == gomoryHuAllPairs == brute-force subset enumeration") {
    val rnd = new scala.util.Random(73)
    for (trial <- 0 until 4) {
      val n = 8
      val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong, (rnd.nextInt(4) + 1).toDouble))
      val extra = for {
        i <- 0 until n; j <- i + 2 until n if rnd.nextDouble() < 0.3
      } yield (i.toLong, j.toLong, (rnd.nextInt(4) + 1).toDouble)
      val edges = ring ++ extra
      val g = LinkGraph.weighted(spark, n.toLong, edges, directed = false)
      val canon = edges.map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
        .groupBy(e => (e._1, e._2)).map { case (k, es) => (k._1, k._2, es.map(_._3).sum) }.toSeq
      // brute force: min over all subsets S with s in S, t not in S
      def brute(s: Long, t: Long): Double = {
        val others = (0L until n.toLong).filterNot(v => v == s || v == t)
        (0 until (1 << others.length)).map { m =>
          val inS = others.zipWithIndex.collect { case (v, k) if ((m >> k) & 1) == 1 => v }.toSet + s
          canon.collect { case (a, b, w) if inS(a) != inS(b) => w }.sum
        }.min
      }
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val direct = toMap(Flow.allPairsMinCut(g, useWeights = true))
      val viaTree = toMap(Flow.gomoryHuAllPairs(g, useWeights = true))
      assert(direct.keySet == viaTree.keySet && direct.size == n * (n - 1) / 2)
      direct.foreach { case ((s, t), v) =>
        assert(v == brute(s, t), s"trial $trial direct ($s,$t)")
        assert(viaTree((s, t)) == v, s"trial $trial tree ($s,$t)")
      }
    }
    // gates: all-pairs Dinic capped at 64 vertices, directed rejected
    intercept[IllegalArgumentException](Flow.allPairsMinCut(
      LinkGraph(spark, 65, Seq((0L, 1L)), directed = false)))
    intercept[IllegalArgumentException](Flow.allPairsMinCut(
      LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = true)))
  }

  test("deep path graph: iterative Dinic survives 50k levels") {
    import org.apache.spark.sql.functions._
    val n = 50000L
    val edges = spark.range(0L, n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val g = LinkGraph(edges, directed = true, Some(n))
    assert(Flow.maxflowValue(g, 0L, n - 1) == 1.0)
  }
}
