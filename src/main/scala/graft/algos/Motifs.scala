package graft.algos

import graft.core.{Catalog, LinkGraph}
import org.apache.spark.sql.functions._

/** `motifs_randesu(size=3, cut_prob=None)` (`graphobject.c:6375`,
  * `doc/source/analysis.rst:228`): counts of induced 3-vertex subgraphs per
  * isomorphism class, with `None` for the disconnected classes (the
  * reference returns NaN there). Indexing follows this engine's
  * `Graph.Isoclass(3, i, directed)` canonical enumeration
  * ([[graft.core.Catalog]]) — self-consistent the same way the reference's
  * motif vector is indexed by its own isoclass tables.
  *
  * No sampling machinery is needed at full census (cut_prob = None, the
  * default): the directed counts are a re-indexing of the distributed triad
  * census ([[Triads.triadCensus]] — closed-form dyadic classes, one wedge
  * join, no O(n³)), and the undirected counts come from two existing
  * distributed aggregations (induced paths = Σ C(deg,2) − 3·triangles, and
  * the degree-ordered triangle count) — both the 100 TB shape already.
  */
object Motifs {

  /** Size-3 motif census. Vector length = #isoclasses on 3 vertices
    * (16 directed / 4 undirected); entry i counts induced subgraphs in
    * class `Graph.Isoclass(3, i, directed)`, None where that class is
    * disconnected.
    */
  def motifs3(g: LinkGraph): Seq[Option[Long]] = {
    val spark = g.spark
    if (g.directed) {
      val census = Triads.triadCensus(g)
      val out = Array.fill[Option[Long]](Catalog.isoclassCount(3, directed = true))(None)
      Triads.reps.zipWithIndex.foreach { case (edges, man) =>
        if (connected3(edges)) {
          val rep = LinkGraph(spark, 3L,
            edges.map { case (a, b) => (a.toLong, b.toLong) }, directed = true)
          out(Catalog.isoclassOf(rep)) = Some(census(man))
        }
      }
      out.toSeq
    } else {
      val de = g.weighted.where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val deg = de.select(col("a").as("v")).union(de.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val wedgeRow = deg.agg(sum(col("d") * (col("d") - 1) / 2).as("w")).head
      val wedges = if (wedgeRow.isNullAt(0)) 0L else wedgeRow.getAs[Number](0).longValue
      val tri = Triangles.count(g)
      val out = Array.fill[Option[Long]](Catalog.isoclassCount(3, directed = false))(None)
      val pathIso = Catalog.isoclassOf(LinkGraph(spark, 3L, Seq((0L, 1L), (1L, 2L)), directed = false))
      val triIso = Catalog.isoclassOf(LinkGraph(spark, 3L, Seq((0L, 1L), (1L, 2L), (0L, 2L)), directed = false))
      out(pathIso) = Some(wedges - 3 * tri)
      out(triIso) = Some(tri)
      out.toSeq
    }
  }

  /** `motifs_randesu_no(size=3)` (`graphobject.c:6441`): total number of
    * connected 3-vertex induced subgraphs = the sum over the defined
    * entries of [[motifs3]].
    */
  def motifs3Count(g: LinkGraph): Long = motifs3(g).flatten.sum

  /** A 3-vertex edge list is (weakly) connected iff all of 0,1,2 merge
    * under union of its endpoints.
    */
  private def connected3(edges: Seq[(Int, Int)]): Boolean = {
    val p = Array(0, 1, 2)
    def find(x: Int): Int = if (p(x) == x) x else { p(x) = find(p(x)); p(x) }
    edges.foreach { case (a, b) => p(find(a)) = find(b) }
    Seq(0, 1, 2).map(find).distinct.size == 1
  }
}
