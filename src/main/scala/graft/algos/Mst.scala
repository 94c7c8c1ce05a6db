package graft.algos

import graft.core.{Lineage, LinkGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum spanning tree / forest (`spanning_tree`, `graphobject.c:13996`;
  * Py wrapper `__init__.py:1031-1052`). The reference runs Prim; Prim is
  * inherently sequential, so the distributed expression is Borůvka: each
  * round every component selects its minimum outgoing edge (one groupBy),
  * selected edges merge components via pointer jumping, and the component
  * count at least halves — O(log n) rounds of joins/aggregations, the
  * classic parallel-MST shape.
  *
  * Ties are broken by the total order (weight, src, dst), which makes the
  * MST unique and the output deterministic; with all weights equal this
  * degenerates to AN arbitrary spanning forest, exactly the reference's
  * unweighted behavior.
  */
object Mst {

  /** @return the spanning-forest edges (src, dst, weight) — n − #components
    *         edges, minimum total weight per component.
    */
  def spanningForest(g: LinkGraph, maxRounds: Int = 64): DataFrame = {
    val spark = g.spark
    // canonical undirected simple view, keeping the MINIMUM weight of any
    // parallel bundle (a heavier parallel edge can never enter the MST)
    val canon = g.weighted.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("weight"))
      .groupBy("src", "dst").agg(min("weight").as("weight"))
      .persist()
    if (canon.isEmpty) { canon.unpersist(); return canon }

    var comp = g.vertices.select(col("id"), col("id").as("comp")).transform(Lineage.cut)
    var chosen: DataFrame = null
    var round = 0
    var remaining = 1L
    while (remaining > 0 && round < maxRounds) {
      // edges between distinct components, labelled with both component ids
      val lab = canon
        .join(comp.select(col("id").as("src"), col("comp").as("ca")), Seq("src"))
        .join(comp.select(col("id").as("dst"), col("comp").as("cb")), Seq("dst"))
        .where(col("ca") =!= col("cb"))
      remaining = lab.limit(1).count()
      if (remaining > 0) {
        // min outgoing edge per component (total order breaks ties)
        val out = lab.select(col("ca").as("c"), struct(col("weight"), col("src"), col("dst")).as("e"))
          .union(lab.select(col("cb").as("c"), struct(col("weight"), col("src"), col("dst")).as("e")))
        val sel = out.groupBy("c").agg(min("e").as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.weight").as("weight"))
          .distinct()
          .transform(Lineage.cut)
        chosen = if (chosen == null) sel else chosen.union(sel).distinct().transform(Lineage.cut)
        // merge: each selected edge unions two components. Resolving the new
        // labels is exactly WCC over the (component, component) selection
        // graph — reuse the tested min-label + pointer-jumping kernel
        // (naive "parent = min neighbor" pointer jumping alone is WRONG:
        // a local-min component with all-larger neighbors becomes a false
        // root and splits its merge group)
        val selC = sel
          .join(comp.select(col("id").as("src"), col("comp").as("ca")), Seq("src"))
          .join(comp.select(col("id").as("dst"), col("comp").as("cb")), Seq("dst"))
          .select(col("ca").as("src"), col("cb").as("dst"))
        val merged = Components.wcc(LinkGraph(selC, directed = false, None))
          .select(col("id").as("comp0"), col("comp").as("newc"))
        comp = comp.join(merged, col("comp") === col("comp0"), "left")
          .select(col("id"), coalesce(col("newc"), col("comp")).as("comp"))
          .transform(Lineage.cut)
      }
      round += 1
    }
    require(remaining == 0, s"Borůvka did not converge in $maxRounds rounds")
    canon.unpersist()
    if (chosen == null) canon.limit(0) else chosen
  }

  /** `spanning_tree` as a graph (matches the reference's return type). */
  def spanningTree(g: LinkGraph): LinkGraph =
    LinkGraph(spanningForest(g), directed = false, g.numVertices)
}
