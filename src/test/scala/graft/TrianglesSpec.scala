package graft

import graft.algos.Triangles
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** Transitivity goldens from /root/reference/tests/test_structural.py:67-98. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  def g5 = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L)), directed = false)

  test("global transitivity: Full(10)=1.0, Tree(14,3)=0.0, g5=0.75") {
    assert(math.abs(Triangles.transitivityGlobal(LinkGraph.full(spark, 10)) - 1.0) < 1e-9)
    assert(Triangles.transitivityGlobal(LinkGraph.tree(spark, 14, 3)) == 0.0)
    assert(math.abs(Triangles.transitivityGlobal(g5) - 0.75) < 1e-9)
  }

  test("triangle counts: Full(n) has C(n,3); per-vertex counts") {
    assert(Triangles.count(LinkGraph.full(spark, 10)) == 120)
    assert(Triangles.count(g5) == 2)
    val pv = TestSession.longVector(Triangles.perVertex(g5), "triangles").toSeq
    assert(pv == Seq(2L, 2L, 1L, 1L))
  }

  test("local transitivity [2/3, 2/3, 1, 1] (test_structural.py:81-91)") {
    val local = TestSession.vector(Triangles.transitivityLocal(g5, zeroMode = true), "cc")
    val expected = Seq(2.0 / 3, 2.0 / 3, 1.0, 1.0)
    local.toSeq.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("avg local transitivity 5/6 (test_structural.py:93-98)") {
    assert(math.abs(Triangles.transitivityAvgLocal(g5) - 5.0 / 6) < 1e-9)
    assert(math.abs(Triangles.transitivityAvgLocal(LinkGraph.full(spark, 10)) - 1.0) < 1e-9)
  }

  test("weighted local (Barrat) golden 0.25 (test_structural.py:82-91)") {
    // Full(4) + one extra vertex attached to 0 with weight 5
    val g = LinkGraph.weighted(spark, 5,
      Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0), (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (0L, 4L, 5.0)),
      directed = false)
    val cc = TestSession.vector(Triangles.transitivityLocalWeighted(g), "cc")
    assert(math.abs(cc(0) - 0.25) < 1e-6, s"got ${cc(0)}")
  }

  test("gated driver kernel == distributed count/perVertex (seeded random graph)") {
    // multi-edges, self-loops, isolated vertices (explicit n) — simpleEdges
    // canonicalizes; smallThreshold = 0 pins the distributed orientation/
    // intersect pipeline as the reference for the r6 integer kernel
    val rnd = new scala.util.Random(11)
    val es = (0 until 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val g = LinkGraph(spark, 45, es, directed = true)
    assert(Triangles.count(g) == Triangles.count(g, smallThreshold = 0L))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m(Triangles.perVertex(g)) == m(Triangles.perVertex(g, smallThreshold = 0L)))
  }

  test("triangle count invariant under edge order & direction (property)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L), (1L, 3L))
    val a = LinkGraph(spark, 5, edges, directed = false)
    val b = LinkGraph(spark, 5, scala.util.Random.shuffle(edges.map { case (s, d) => (d, s) }), directed = true)
    assert(Triangles.count(a) == Triangles.count(b))
  }
}
