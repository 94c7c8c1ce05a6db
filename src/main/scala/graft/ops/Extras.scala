package graft.ops

import graft.algos.Components
import graft.core.{GraphOps, LinkGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Assorted P2 operators: line graph, matrix views, power-law fit, random
  * walk, bridges.
  */
object Extras {

  /** Line graph L(G): vertices of L = edges of G (dense edge ids assigned by
    * deterministic (src, dst) order), edges of L connect G-edges sharing an
    * endpoint (`graphobject.c:13687`; goldens `test_structural.py:570-581`).
    * Classic self-join on the shared endpoint.
    */
  def lineGraph(g: LinkGraph): LinkGraph = {
    val eid = g.weighted.select("src", "dst").distinct()
      .withColumn("eid", row_number().over(Window.orderBy("src", "dst")).cast("long") - 1)
      .localCheckpoint(true)
    // undirected semantics: two edges adjacent iff they share any endpoint
    val ends = eid.select(col("eid"), explode(array(col("src"), col("dst"))).as("v")).distinct()
    val adj = ends.alias("x").join(ends.alias("y"), Seq("v"))
      .where(col("x.eid") < col("y.eid"))
      .select(col("x.eid").as("src"), col("y.eid").as("dst"))
      .distinct()
    LinkGraph(adj, directed = false, Some(eid.count()))
  }

  /** Sparse adjacency view in COO form (the edge table IS the matrix):
    * (row, col, value) with multi-edges collapsed by sum
    * (`get_adjacency`, `__init__.py:653-754`).
    */
  def adjacencyCoo(g: LinkGraph): DataFrame = {
    val e = if (g.directed) g.weighted else g.bidirected
    e.groupBy(col("src").as("row"), col("dst").as("col")).agg(sum("weight").as("value"))
  }

  /** Graph Laplacian L = D - A in COO form (`laplacian`, `graphobject.c:14854`);
    * unnormalized, undirected view.
    */
  def laplacianCoo(g: LinkGraph): DataFrame = {
    val a = LinkGraph(g.bidirected, directed = true, g.numVertices)
    val adj = a.weighted.where(col("src") =!= col("dst"))
      .groupBy(col("src").as("row"), col("dst").as("col"))
      .agg((-sum("weight")).as("value"))
    val deg = GraphOps.strength(g, graft.core.Mode.All, loops = false)
      .select(col("id").as("row"), col("id").as("col"), col("strength").as("value"))
      .where(col("value") =!= 0.0)
    deg.union(adj)
  }

  /** Continuous power-law MLE over the degree distribution (Clauset-Shalizi-
    * Newman alpha-hat = 1 + n / sum ln(x_i / xmin)), computed from the
    * (small) degree histogram collected to the driver — the reference's
    * `power_law_fit` (`statistics.py:21-106`).
    */
  final case class PowerLawFit(alpha: Double, xmin: Double, n: Long)

  def powerLawFit(g: LinkGraph, xmin: Double = 1.0): PowerLawFit = {
    val hist = GraphOps.degreeDistribution(g).collect()
      .map(r => (r.getLong(0).toDouble, r.getLong(1)))
      .filter(_._1 >= xmin)
    val n = hist.map(_._2).sum
    val s = hist.map { case (x, c) => c * math.log(x / (xmin - 0.5)) }.sum
    PowerLawFit(1.0 + n / s, xmin, n)
  }

  /** Seeded random walk from `start`: deterministic pure-hash choice among
    * out-neighbors per step (`graphobject.c:16176-16190` — the reference
    * routes RNG through Python; we route it through splitmix64(seed, step)).
    * Driver-side loop over point lookups: a walk is inherently sequential;
    * each hop is a pushed-down point filter on the bucketed edge table.
    */
  def randomWalk(g: LinkGraph, start: Long, steps: Int, seed: Long = 42L): Seq[Long] = {
    val adj = g.outView.select("src", "dst").persist()
    val path = scala.collection.mutable.ArrayBuffer(start)
    var cur = start
    var k = 0
    var stuck = false
    while (k < steps && !stuck) {
      val nbrs = adj.where(col("src") === cur).select("dst").collect().map(_.getLong(0)).sorted
      if (nbrs.isEmpty) stuck = true
      else {
        val pick = java.lang.Long.remainderUnsigned(
          graft.ingest.Pages.mix64(seed ^ (k.toLong << 32) ^ cur), nbrs.length.toLong).toInt
        cur = nbrs(pick)
        path += cur
        k += 1
      }
    }
    adj.unpersist()
    path.toSeq
  }

  /** Bridges: edges whose removal increases the component count
    * (`graphobject.c:13169`; goldens `test_structural.py:499-505`).
    * Distributed rule: an edge (u,v) is a bridge iff u and v fall in
    * different components of the graph with all *cycle* edges... simplest
    * exact formulation at moderate scale: edge (u,v) is NOT a bridge iff it
    * lies on a cycle — tested by checking u~v connectivity in G minus that
    * edge, batched: remove each candidate once via component labels of
    * G \ {e}. For scale, candidates are first limited to edges not inside
    * any triangle (triangle edges are never bridges).
    */
  def bridges(g: LinkGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val simple = GraphOps.simplify(g, multiple = true, loops = true, combine = "first")
    val e = simple.edges.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    // triangle edges can't be bridges: prune
    val triEdges = graft.algos.Triangles.triangleTriples(simple)
      .select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("a").as("x"), col("c").as("y")),
        struct(col("b").as("x"), col("c").as("y")))).as("p"))
      .select(col("p.x"), col("p.y")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = e.filter { case (u, v) =>
      val k = (math.min(u, v), math.max(u, v)); !triEdges.contains(k)
    }
    val found = candidates.filter { case (u, v) =>
      val rest = simple.edges.where(!(col("src") === u && col("dst") === v) &&
        !(col("src") === v && col("dst") === u))
      val comp = Components.wcc(LinkGraph(rest, directed = false, g.numVertices))
      val cu = comp.where(col("id") === u).head.getLong(1)
      val cv = comp.where(col("id") === v).head.getLong(1)
      cu != cv
    }
    found.toSeq.toDF("src", "dst")
  }
}
