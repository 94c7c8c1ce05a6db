package graft

import graft.core.{GraphOps, LinkGraph, Mode}
import org.scalatest.funsuite.AnyFunSuite

/** Degree/strength/density/knn/transitivity goldens from
  * /root/reference/tests/test_structural.py.
  */
class StructuralSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // fixtures (test_structural.py:9-16, FIXTURES.md §2)
  def g5 = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L)), directed = false)
  def gLoop = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L), (0L, 0L)), directed = false)
  def gdir = LinkGraph(spark, 4,
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 1L), (0L, 3L), (1L, 3L), (3L, 0L)), directed = true)
  def gfull = LinkGraph.full(spark, 10)
  def tree14 = LinkGraph.tree(spark, 14, 3)

  test("density goldens (test_structural.py:18-25)") {
    assert(math.abs(GraphOps.density(gfull) - 1.0) < 1e-9)
    assert(math.abs(GraphOps.density(g5) - 5.0 / 6) < 1e-9)
    assert(math.abs(GraphOps.density(g5, loops = true) - 0.5) < 1e-9)
    assert(math.abs(GraphOps.density(gdir) - 7.0 / 12) < 1e-9)
    assert(math.abs(GraphOps.density(gdir, loops = true) - 7.0 / 16) < 1e-9)
    assert(math.abs(GraphOps.density(tree14) - 1.0 / 7) < 1e-9)
  }

  test("degree goldens incl. loop double-count (test_structural.py:142-155)") {
    assert(TestSession.longVector(GraphOps.degrees(gfull), "degree").toSeq == Seq.fill(10)(9L))
    assert(TestSession.longVector(GraphOps.degrees(gLoop, loops = false), "degree").toSeq == Seq(3L, 3L, 2L, 2L))
    assert(TestSession.longVector(GraphOps.degrees(gLoop), "degree").toSeq == Seq(5L, 3L, 2L, 2L))
    assert(TestSession.longVector(GraphOps.degrees(gdir, Mode.In), "degree").toSeq == Seq(1L, 2L, 2L, 2L))
    assert(TestSession.longVector(GraphOps.degrees(gdir, Mode.Out), "degree").toSeq == Seq(3L, 2L, 1L, 1L))
    assert(TestSession.longVector(GraphOps.degrees(gdir, Mode.All), "degree").toSeq == Seq(4L, 4L, 3L, 3L))
  }

  test("maxdegree (test_structural.py:156-163)") {
    assert(GraphOps.maxDegree(gfull) == 9)
    assert(GraphOps.maxDegree(gLoop) == 3)
    assert(GraphOps.maxDegree(gLoop, loops = true) == 5)
    assert(GraphOps.maxDegree(gdir, Mode.In) == 2)
    assert(GraphOps.maxDegree(gdir, Mode.Out) == 3)
    assert(GraphOps.maxDegree(gdir, Mode.All) == 4)
  }

  test("strength goldens (test_structural.py:164-187)") {
    val wLoop = LinkGraph.weighted(spark, 4,
      Seq((0L, 1L, 1.0), (0L, 2L, 2.0), (1L, 2L, 3.0), (0L, 3L, 4.0), (1L, 3L, 5.0), (0L, 0L, 6.0)),
      directed = false)
    assert(TestSession.vector(GraphOps.strength(wLoop, loops = false), "strength").toSeq == Seq(7.0, 9.0, 5.0, 9.0))
    assert(TestSession.vector(GraphOps.strength(wLoop), "strength").toSeq == Seq(19.0, 9.0, 5.0, 9.0))
    val wdir = LinkGraph.weighted(spark, 4,
      Seq((0L, 1L, 1.0), (0L, 2L, 2.0), (1L, 2L, 3.0), (2L, 1L, 4.0), (0L, 3L, 5.0), (1L, 3L, 6.0), (3L, 0L, 7.0)),
      directed = true)
    assert(TestSession.vector(GraphOps.strength(wdir, Mode.In), "strength").toSeq == Seq(7.0, 5.0, 5.0, 11.0))
    assert(TestSession.vector(GraphOps.strength(wdir, Mode.Out), "strength").toSeq == Seq(8.0, 9.0, 4.0, 7.0))
    assert(TestSession.vector(GraphOps.strength(wdir, Mode.All), "strength").toSeq == Seq(15.0, 14.0, 9.0, 18.0))
  }

  test("knn goldens (test_structural.py:123-140)") {
    val knnFull = TestSession.vector(GraphOps.knn(gfull), "knn")
    assert(knnFull.toSeq == Seq.fill(10)(9.0))
    val knn5 = TestSession.vector(GraphOps.knn(g5), "knn")
    val expected = Seq(7.0 / 3, 7.0 / 3, 3.0, 3.0)
    knn5.toSeq.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    val knnk = GraphOps.knnk(g5).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(knnk(2L) - 3.0) < 1e-9)
    assert(math.abs(knnk(3L) - 7.0 / 3) < 1e-9)
  }

  test("simplify collapses multi-edges and loops (graphobject.c:5907)") {
    val multi = LinkGraph.weighted(spark, 3,
      Seq((0L, 1L, 1.0), (1L, 0L, 2.0), (0L, 1L, 3.0), (1L, 1L, 9.0), (1L, 2L, 1.0)), directed = false)
    val s = GraphOps.simplify(multi)
    val got = s.edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq((0L, 1L, 6.0), (1L, 2L, 1.0)))
    assert(GraphOps.isSimple(s))
    assert(!GraphOps.isSimple(multi))
  }

  test("reciprocity: fraction of mutual arcs") {
    // arcs: 0->1, 1->0 (mutual), 1->2 (not)
    val g = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 0L), (1L, 2L)), directed = true)
    assert(math.abs(GraphOps.reciprocity(g) - 2.0 / 3) < 1e-9)
  }

  test("set ops: union / intersection / difference / disjointUnion (operators.py)") {
    val a = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = false)
    val b = LinkGraph(spark, 3, Seq((1L, 2L), (0L, 2L)), directed = false)
    assert(GraphOps.union(a, b).ecount() == 3)
    assert(GraphOps.intersection(a, b).ecount() == 1)
    assert(GraphOps.difference(a, b).ecount() == 1)
    val du = GraphOps.disjointUnion(LinkGraph.full(spark, 5), LinkGraph.full(spark, 5))
    assert(du.vcount() == 10 && du.ecount() == 20)
  }

  test("neighborhood sizes on Ring(10, non-circular) (test_structural.py:493-495)") {
    val g = LinkGraph.ring(spark, 10, circular = false)
    val s1 = TestSession.longVector(GraphOps.neighborhoodSize(g, 1), "size")
    assert(s1.toSeq == Seq(2L, 3L, 3L, 3L, 3L, 3L, 3L, 3L, 3L, 2L))
    val s3 = TestSession.longVector(GraphOps.neighborhoodSize(g, 3), "size")
    assert(s3.toSeq == Seq(4L, 5L, 6L, 7L, 7L, 7L, 7L, 6L, 5L, 4L))
    val s3m2 = TestSession.longVector(GraphOps.neighborhoodSize(g, 3, mindist = 2), "size")
    assert(s3m2.toSeq == Seq(2L, 2L, 3L, 4L, 4L, 4L, 4L, 3L, 2L, 2L))
  }

  test("induced subgraph + contract (cluster_graph)") {
    val g = LinkGraph.full(spark, 5)
    import spark.implicits._
    val sub = GraphOps.inducedSubgraph(g, Seq(0L, 1L, 2L).toDF("id"))
    assert(sub.ecount() == 3)
    // contract two 5-cliques + bridge into the 2-community quotient
    val two = GraphOps.disjointUnion(LinkGraph.full(spark, 5), LinkGraph.full(spark, 5))
    val bridged = LinkGraph(two.weighted.union(Seq((0L, 5L, 1.0)).toDF("src", "dst", "weight")),
      directed = false, Some(10L))
    val membership = spark.range(10).selectExpr("id", "cast(id >= 5 as long) as label")
    val q = GraphOps.contractVertices(bridged, membership).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(q((0L, 0L)) == 10L && q((1L, 1L)) == 10L && q((0L, 1L)) == 1L)
  }

  test("weighted knn: strength replaces degree (graphobject.c:13660-13677 docstring)") {
    // simplified DegreeTests.g with weights [1,2,3,4,5] by edge:
    // s = [7, 9, 5, 9]; knn_w = [(1*9+2*5+4*9)/7, (1*7+3*5+5*9)/9,
    //                            (2*7+3*9)/5, (4*7+5*9)/9]
    val gw = LinkGraph.weighted(spark, 4,
      Seq((0L, 1L, 1.0), (0L, 2L, 2.0), (1L, 2L, 3.0), (0L, 3L, 4.0), (1L, 3L, 5.0)),
      directed = false)
    val knnW = TestSession.vector(GraphOps.knn(gw, weighted = true), "knn")
    val want = Seq(55.0 / 7, 67.0 / 9, 41.0 / 5, 73.0 / 9)
    knnW.toSeq.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // the degree column (knnk binning) stays the ORDINARY degree
    assert(TestSession.longVector(GraphOps.knn(gw, weighted = true), "degree").toSeq
      == Seq(3L, 3L, 2L, 2L))
    // uniform weights degenerate to... strength == degree, so knn_w uses
    // degree values again but weighted by 1: equals unweighted knn
    val knnU = TestSession.vector(GraphOps.knn(g5), "knn")
    val knnW1 = TestSession.vector(GraphOps.knn(g5, weighted = true), "knn")
    knnU.toSeq.zip(knnW1.toSeq).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("similarity minCommon pushdown + per-vertex top-k (web-path variants)") {
    // g5: jaccard full emits every pair with >=1 common neighbor
    val full = GraphOps.similarityJaccard(g5).collect()
    val thresh = GraphOps.similarityJaccard(g5, minCommon = 2L).collect()
    // pairs with >= 2 common neighbors form a strict subset with identical scores
    assert(thresh.length < full.length && thresh.nonEmpty)
    val fullMap = full.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    thresh.foreach { r =>
      assert(math.abs(fullMap((r.getLong(0), r.getLong(1))) - r.getDouble(2)) < 1e-12)
    }
    // cocitation minCommon agrees with a post-filter of the full result
    val cocFull = GraphOps.cocitation(gdir).where(org.apache.spark.sql.functions.col("common") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cocMin = GraphOps.cocitation(gdir, minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cocFull == cocMin)
    // ILW minCommon: subset with identical scores
    val ilwFull = GraphOps.similarityInverseLogWeighted(g5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ilwMin = GraphOps.similarityInverseLogWeighted(g5, minCommon = 2L).collect()
    assert(ilwMin.length < ilwFull.size && ilwMin.nonEmpty)
    ilwMin.foreach { r =>
      assert(math.abs(ilwFull((r.getLong(0), r.getLong(1))) - r.getDouble(2)) < 1e-12)
    }
    // top-k: every vertex keeps at most k partners, and they are its best
    val pairs = GraphOps.similarityJaccard(g5)
    val topk = GraphOps.topKSimilar(pairs, "jaccard", 2).collect()
    val perV = topk.groupBy(_.getLong(0))
    assert(perV.values.forall(_.length <= 2))
    val sym = full.flatMap(r => Seq((r.getLong(0), r.getLong(1), r.getDouble(2)),
      (r.getLong(1), r.getLong(0), r.getDouble(2))))
    perV.foreach { case (v, rows) =>
      val best = sym.filter(_._1 == v).sortBy(t => (-t._3, t._2)).take(2).map(t => (t._2, t._3)).toSet
      assert(rows.map(r => (r.getLong(1), r.getDouble(2))).toSet == best, s"vertex $v top-k mismatch")
    }
  }
}
