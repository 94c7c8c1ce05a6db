package graft.algos

import graft.core.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition: per-vertex coreness and the k-core subgraph.
  *
  * Reference: `coreness(mode)` / `k_core(k)` (`graphobject.c:15871-15885`,
  * `__init__.py:1512-1548`); goldens coreness [3,3,3,3,1,1,1,2,1,2,2] and
  * k_core(3) == K4 (`test_decomposition.py:47-73`,
  * `test_structural.py:435-437`).
  *
  * Distributed peel: for k = 1,2,...: repeatedly remove vertices with
  * degree < k (anti-join), assigning coreness k-1... every vertex removed
  * while peeling to k has coreness k-1? No — vertices that survive peeling at
  * level k have coreness >= k; those removed during level-k peeling have
  * coreness k-1 == (k-1). Implemented as nested fixpoint loops of
  * degree-aggregate + anti-join, lineage cut per pass.
  */
object KCore {

  /** (id, coreness) for every vertex (isolated vertices get 0). */
  def coreness(g: LinkGraph): DataFrame = {
    val spark = g.spark
    var edges = g.bidirected.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().transform(graft.core.Lineage.cut)
    var vertices = g.vertices.transform(graft.core.Lineage.cut)
    var result = spark.range(0).select(col("id"), lit(0L).as("coreness")).limit(0)
    var k = 1L
    while (vertices.count() > 0) {
      // peel everything with degree < k; repeat until stable
      var peeling = true
      while (peeling) {
        val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        val degAll = vertices.join(deg, Seq("id"), "left")
          .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
        val doomed = degAll.where(col("deg") < k).select("id").transform(graft.core.Lineage.cut)
        val nDoomed = doomed.count()
        if (nDoomed == 0) peeling = false
        else {
          result = result.union(doomed.select(col("id"), lit(k - 1).as("coreness"))).transform(graft.core.Lineage.cut)
          vertices = vertices.join(doomed, Seq("id"), "left_anti").transform(graft.core.Lineage.cut)
          edges = edges
            .join(doomed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
            .join(doomed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
            .transform(graft.core.Lineage.cut)
        }
      }
      k += 1
    }
    result
  }

  /** Vertex set of the k-core (max subgraph with min degree >= k). */
  def kCoreVertices(g: LinkGraph, k: Int): DataFrame =
    coreness(g).where(col("coreness") >= k).select("id")

  /** Edge set of the k-core subgraph (ids preserved). */
  def kCore(g: LinkGraph, k: Int): LinkGraph =
    graft.core.GraphOps.inducedSubgraph(g, kCoreVertices(g, k))
}
