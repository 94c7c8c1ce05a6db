package graft

import graft.algos.{Components, Paths}
import graft.core.{GraphOps, LinkGraph, Mode}
import graft.ops.{Extras, Select}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-API surface: neighbors/incident/get_eid/are_connected, find,
  * predicates, nominal assortativity, decompose, dfsiter, matrix
  * constructors, callable simplify combiners.
  */
class GraphApiSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def g = LinkGraph(spark, 5,
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)), directed = true)

  test("neighbors / successors / predecessors / incident (graphobject.c:12336-12401)") {
    assert(GraphOps.successors(g, 0L).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(GraphOps.predecessors(g, 2L).collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
    assert(GraphOps.neighbors(g, 2L, Mode.All).collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 3L))
    assert(GraphOps.incident(g, 2L, Mode.Out).count() == 1)
  }

  test("are_connected / get_eid (graphobject.c:12358-12400, 13008)") {
    assert(GraphOps.areConnected(g, 0L, 1L))
    assert(!GraphOps.areConnected(g, 1L, 0L)) // directed
    val und = LinkGraph(g.weighted.select("src", "dst"), directed = false, Some(5L))
    assert(GraphOps.areConnected(und, 1L, 0L))
    assert(GraphOps.getEid(g, 0L, 1L) == 0L) // (0,1) first in (src,dst) order
    assert(GraphOps.getEid(g, 2L, 3L) == 3L)
    assert(GraphOps.getEid(g, 3L, 0L) == -1L)
    // undirected graph storing BOTH orientations of a pair: single and
    // batch lookups must agree on the (deterministic) min matching eid
    val both = LinkGraph(spark, 2, Seq((0L, 1L), (1L, 0L)), directed = false)
    assert(GraphOps.getEid(both, 0L, 1L) == 0L)
    assert(GraphOps.getEids(both, Seq((0L, 1L), (1L, 0L)))
      .collect().map(_.getLong(3)).toSeq == Seq(0L, 0L))
  }

  test("vs.find / es.find / findByName (__init__.py:4375-4424)") {
    val names = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e")).toDF("id", "name")
    assert(Select.vs(g).degree("gt", 1, Mode.Out).find().map(_.getLong(0)) == Some(0L))
    assert(Select.vs(g).findByName(names, "c") == Some(2L))
    assert(Select.vs(g).findByName(names, "zz").isEmpty)
    assert(Select.es(g).source(Seq(2L)).find().map(r => (r.getLong(0), r.getLong(1))) == Some((2L, 3L)))
  }

  test("predicates: is_connected / is_tree / is_mutual / is_bipartite") {
    // g has an isolated vertex 4 -> not connected; its 4-vertex core is
    val core = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)), directed = true)
    assert(GraphOps.isConnected(core)) // weakly
    assert(!GraphOps.isConnected(core, strong = true))
    assert(!GraphOps.isConnected(g)) // vertex 4 isolated
    val tree = LinkGraph.tree(spark, 7, 2)
    assert(GraphOps.isTree(tree) && !GraphOps.isTree(g))
    val mut = LinkGraph(spark, 2, Seq((0L, 1L), (1L, 0L)), directed = true)
    assert(GraphOps.isMutual(mut) && !GraphOps.isMutual(g))
    assert(GraphOps.isBipartite(LinkGraph.star(spark, 5)))
    assert(GraphOps.isBipartite(LinkGraph.ring(spark, 6)))
    assert(!GraphOps.isBipartite(LinkGraph.ring(spark, 5))) // odd cycle
    assert(!GraphOps.isBipartite(LinkGraph.full(spark, 3)))
  }

  test("nominal assortativity: perfect mixing -> 1, anti-mixing negative (graphobject.c:13027)") {
    val types = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1)).toDF("id", "type")
    val assortative = LinkGraph(spark, 4, Seq((0L, 1L), (2L, 3L)), directed = false)
    val r1 = GraphOps.assortativityNominal(assortative, types).head.getDouble(0)
    assert(math.abs(r1 - 1.0) < 1e-12)
    val disassortative = LinkGraph(spark, 4, Seq((0L, 2L), (1L, 3L)), directed = false)
    val r2 = GraphOps.assortativityNominal(disassortative, types).head.getDouble(0)
    assert(r2 < 0.0)
  }

  test("decompose with maxcompno/minelements (graphobject.c:13258-13271)") {
    val three = GraphOps.disjointUnion(GraphOps.disjointUnion(
      LinkGraph.full(spark, 4), LinkGraph.full(spark, 3)), LinkGraph.full(spark, 2))
    val all = Components.decompose(three)
    assert(all.map(_.vcount()).sorted == Seq(2L, 3L, 4L))
    assert(Components.decompose(three, maxCompNo = 2).map(_.vcount()) == Seq(4L, 3L))
    assert(Components.decompose(three, minElements = 3).map(_.vcount()).sorted == Seq(3L, 4L))
  }

  test("dfsiter: preorder with smallest-first tie-break (dfsiter.c)") {
    // 0 -> {1, 2}, 1 -> {3}: preorder 0,1,3,2
    val dg = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 3L)), directed = true)
    assert(Paths.dfsIter(dg, 0L) == Seq(0L, 1L, 3L, 2L))
    assert(Paths.dfsIter(dg, 0L, Mode.All) == Seq(0L, 1L, 3L, 2L))
  }

  test("Weighted_Adjacency / Incidence / get_incidence round-trip") {
    val coo = Seq((0L, 1L, 2.5), (1L, 0L, 0.0), (1L, 2L, 1.0)).toDF("row", "col", "value")
    val wa = Extras.weightedAdjacency(coo)
    assert(wa.ecount() == 2) // zero cell dropped
    val inc = Seq((0L, 0L), (0L, 1L), (1L, 1L)).toDF("row", "col")
    val (bg, types) = Extras.bipartiteFromIncidence(inc, 2, 2)
    assert(bg.ecount() == 3 && GraphOps.isBipartite(bg))
    assert(types.where(col("type") === 1).count() == 2)
    val back = Extras.getIncidence(bg, types).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == Set((0L, 0L), (0L, 1L), (1L, 1L)))
  }

  test("simplify with a CUSTOM Aggregator combiner (convert.c:269-291 callable)") {
    // geometric mean as a user-defined Aggregator, registered via udaf
    val geo = new org.apache.spark.sql.expressions.Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(b: (Double, Long)) = math.exp(b._1 / b._2)
      def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong)
      def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
    }
    val geoUdaf = udaf(geo)
    val mg = LinkGraph.weighted(spark, 2, Seq((0L, 1L, 2.0), (0L, 1L, 8.0)), directed = false)
    val s = GraphOps.simplifyWith(mg, w => geoUdaf(w))
    val w = s.weighted.head.getDouble(2)
    assert(math.abs(w - 4.0) < 1e-12) // sqrt(2*8)
  }

  test("bipartite_projection: Full_Bipartite(10,5) -> Full(10) w=5 / Full(5) w=10 (test_bipartite.py:171-202)") {
    val g = graft.core.Generators.fullBipartite(spark, 10, 5)
    val types = spark.range(15).select(col("id"), when(col("id") < 10, 0).otherwise(1).as("type"))
    val p0 = GraphOps.bipartiteProjection(g, types, 0)
    val p1 = GraphOps.bipartiteProjection(g, types, 1)
    assert(p0.ecount() === 45L) // Full(10)
    assert(p1.ecount() === 10L) // Full(5)
    assert(p0.weighted.collect().forall(_.getDouble(2) == 5.0))
    assert(p1.weighted.collect().forall(_.getDouble(2) == 10.0))
    assert(GraphOps.bipartiteProjectionSize(g, types) === ((10L, 45L, 5L, 10L)))
    // multiplicity=false drops the weight column
    assert(!GraphOps.bipartiteProjection(g, types, 0, multiplicity = false)
      .edges.columns.contains("weight"))
    // non-bipartite types rejected
    val bad = spark.range(15).select(col("id"), lit(0).as("type"))
    assertThrows[IllegalArgumentException] { GraphOps.bipartiteProjection(g, bad, 0) }
  }

  test("constraint: K3=1.125, star center 1/k, path [1,0.5,1] (graphobject.c:13113)") {
    def c(g: LinkGraph): Map[Long, Double] =
      GraphOps.constraint(g).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val k3 = c(LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L), (0L, 2L)), directed = false))
    (0L to 2L).foreach(v => assert(math.abs(k3(v) - 1.125) < 1e-9, s"$v ${k3(v)}"))
    val star = c(LinkGraph.star(spark, 5))
    assert(math.abs(star(0L) - 0.25) < 1e-9) // center: 1/k
    (1L to 4L).foreach(v => assert(math.abs(star(v) - 1.0) < 1e-9))
    // P3: endpoints have one contact (p=1, no shared third party) -> 1.0;
    // middle: two contacts at p=0.5, unconnected to each other -> 0.5
    val p3 = c(LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = false))
    assert(math.abs(p3(0L) - 1.0) < 1e-9 && math.abs(p3(1L) - 0.5) < 1e-9)
    // isolated vertex -> NaN (reference convention)
    val iso = c(LinkGraph(spark, 3, Seq((0L, 1L)), directed = false))
    assert(iso(2L).isNaN)
  }

  test("constraint maxPivotDegree: exact when cap >= max degree; hub-capped approximation bounded") {
    // lollipop: K4 on 0-3 plus a hub 0 wired to 4 leaves — hub degree 7
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)) ++
      (4L to 7L).map(v => (0L, v))
    val g = LinkGraph(spark, 8, edges, directed = false)
    val exact = GraphOps.constraint(g).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val same = GraphOps.constraint(g, maxPivotDegree = Some(10))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    exact.foreach { case (v, c) => assert(math.abs(same(v) - c) < 1e-12, s"cap>=maxdeg changed $v") }
    // cap below the hub's degree: only indirect paths THROUGH the hub are
    // dropped -> capped constraint <= exact everywhere, K4-internal pivots
    // (degree 4 <= cap) still counted
    val capped = GraphOps.constraint(g, maxPivotDegree = Some(4))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    exact.foreach { case (v, c) => assert(capped(v) <= c + 1e-12, s"capped exceeded exact at $v") }
    assert(capped(1L) < exact(1L)) // K4 members lose the hub pivot's contribution
  }

  test("has_multiple: undirected collapse, loops not multi (graphobject.c:12299)") {
    assert(!GraphOps.hasMultiple(LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = false)))
    // (0,1) and (1,0) are the SAME undirected edge -> multi
    assert(GraphOps.hasMultiple(LinkGraph(spark, 3, Seq((0L, 1L), (1L, 0L)), directed = false)))
    // a loop alone is not a multi-edge
    assert(!GraphOps.hasMultiple(LinkGraph(spark, 2, Seq((0L, 0L), (0L, 1L)), directed = false)))
    // directed: repeated arc is multi, opposite arcs are not
    assert(GraphOps.hasMultiple(LinkGraph(spark, 2, Seq((0L, 1L), (0L, 1L)), directed = true)))
    assert(!GraphOps.hasMultiple(LinkGraph(spark, 2, Seq((0L, 1L), (1L, 0L)), directed = true)))
  }

  test("set operators: directed edge-set semantics (operators.py:84-451)") {
    val a = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (2L, 3L)), directed = true)
    val b = LinkGraph(spark, 4, Seq((1L, 2L), (3L, 2L)), directed = true)
    def es(g: LinkGraph) = g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es(GraphOps.union(a, b)) == Set((0L, 1L), (1L, 2L), (2L, 3L), (3L, 2L)))
    assert(es(GraphOps.intersection(a, b)) == Set((1L, 2L)))
    assert(es(GraphOps.difference(a, b)) == Set((0L, 1L), (2L, 3L)))
  }

  test("set operators: undirected graphs match edges regardless of stored orientation") {
    val a = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L)), directed = false)
    val b = LinkGraph(spark, 4, Seq((1L, 0L), (2L, 3L)), directed = false) // (1,0) == (0,1)
    def es(g: LinkGraph) = g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es(GraphOps.intersection(a, b)) == Set((0L, 1L)))
    assert(es(GraphOps.union(a, b)) == Set((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(es(GraphOps.difference(a, b)) == Set((1L, 2L)))
  }

  test("add_vertices / add_edges (graphobject.c:12203,12218)") {
    val g2 = GraphOps.addVertices(g, 2L)
    assert(g2.vcount() == 7L && g2.ecount() == g.ecount())
    val g3 = GraphOps.addEdges(g2, Seq((5L, 6L), (0L, 1L))) // duplicate kept
    assert(g3.ecount() == g.ecount() + 2)
    assert(g3.weighted.where(col("src") === 0L && col("dst") === 1L).count() == 2)
    intercept[IllegalArgumentException] { GraphOps.addEdges(g, Seq((0L, 9L))) }
    intercept[IllegalArgumentException] { GraphOps.addVertices(g, -1L) }
  }

  test("delete_edges: every matching instance, both orientations when undirected (graphobject.c:12227)") {
    val g3 = GraphOps.addEdges(g, Seq((0L, 1L))) // (0,1) now has multiplicity 2
    val d = GraphOps.deleteEdges(g3, Seq((0L, 1L)))
    assert(d.ecount() == g.ecount() - 1) // both instances removed
    assert(d.weighted.where(col("src") === 0L && col("dst") === 1L).count() == 0)
    // directed: the reverse pair does not match
    assert(GraphOps.deleteEdges(g, Seq((1L, 0L))).ecount() == g.ecount())
    // undirected: it does
    val und = LinkGraph(g.weighted.select("src", "dst"), directed = false, Some(5L))
    assert(GraphOps.deleteEdges(und, Seq((1L, 0L))).ecount() == g.ecount() - 1)
  }

  test("delete_vertices: incident edges drop, survivors renumber densely in order (graphobject.c:12210)") {
    // delete 1 from 0..4: old 2,3,4 -> new 1,2,3; edges via 1 disappear
    val d = GraphOps.deleteVertices(g, Seq(1L))
    assert(d.vcount() == 4L)
    val es = d.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((0L, 1L), (1L, 2L))) // was (0,2) and (2,3)
    // deleting a nonexistent vertex is a no-op renumber
    assert(GraphOps.deleteVertices(g, Seq(99L)).vcount() == 5L)
  }
}
