package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A single directed/undirected edge with weight (default 1.0).
  *
  * Mirrors the reference's edge model: (source, target) integer pairs with
  * optional `weight` edge attribute (reference: `__init__.py:237-339`,
  * weight convention `__init__.py:848-860`). Multi-edges and self-loops are
  * allowed, exactly as in the reference (`graphobject.c:12275-12335`).
  */
final case class Edge(src: Long, dst: Long, weight: Double)

/** Immutable property-graph handle: an edge DataFrame plus directedness.
  *
  * Columns required on `edges`: `src: Long`, `dst: Long`; `weight: Double`
  * is added as 1.0 when absent (matching the reference's "default weight 1"
  * coercion at the C boundary, `graphobject.c:5384-5391`).
  *
  * Vertices are dense longs `0..n-1` when `numVertices` is given (the
  * reference's implicit vertex set, `__init__.py:243-249`); otherwise the
  * vertex set is the distinct endpoints of `edges`.
  *
  * Design: this is a *view pair*, never a materialized adjacency structure —
  * Catalyst plans each operator over the lazily-derived DataFrames, so
  * filters/projections push down into the parquet scan and joins pick
  * broadcast vs shuffle per stats. At 100 TB the edge table is expected to be
  * bucketed/partitioned by `src` at rest so per-iteration joins co-locate.
  */
final case class LinkGraph(
    edges: DataFrame,
    directed: Boolean,
    numVertices: Option[Long] = None,
    /** Builder-asserted problem knowledge the optimizer cannot derive
      * (guide §8): `edges` is already a SIMPLE canonical edge set — distinct
      * rows, no self-loops, and src < dst when undirected. Lets operators
      * that need the simple view (triangles, transitivity, knn) skip a full
      * re-canonicalization shuffle (filter + least/greatest + distinct over
      * the whole edge table). Only set it where the construction guarantees
      * it (e.g. the co-part build ends in exactly that distinct).
      */
    canonicalSimple: Boolean = false
) {
  def spark: SparkSession = edges.sparkSession

  /** Edge DataFrame guaranteed to carry a `weight` column. */
  lazy val weighted: DataFrame =
    if (edges.columns.contains("weight")) edges.select(col("src"), col("dst"), col("weight").cast("double"))
    else edges.select(col("src"), col("dst"), lit(1.0).as("weight"))

  /** Vertex id DataFrame, column `id: Long`. Includes isolated vertices when
    * `numVertices` is set (reference keeps explicit n, `__init__.py:243-249`).
    */
  lazy val vertices: DataFrame = numVertices match {
    case Some(n) => spark.range(n).toDF("id")
    case None =>
      edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
        .distinct()
  }

  /** Both-direction view for undirected semantics: each stored edge
    * (u,v), u != v appears as (u,v) and (v,u); self-loops appear twice (the
    * reference counts a loop twice in ALL-degree, `test_structural.py:145-149`).
    * For an already-directed graph this unions reversed edges (mode=ALL view).
    */
  def bidirected: DataFrame =
    weighted.union(weighted.select(col("dst").as("src"), col("src").as("dst"), col("weight")))

  /** Message-passing view: directed graphs keep edge direction; undirected
    * graphs message both ways. Used by PageRank/LPA/WCC kernels.
    */
  def outView: DataFrame = if (directed) weighted else bidirected

  def vcount(): Long = numVertices.getOrElse(vertices.count())
  def ecount(): Long = edges.count()
}

object LinkGraph {

  /** Build from a literal edge list, the reference's `Graph(n, edges, directed)`
    * constructor (`__init__.py:237-339`). n auto-extends to max endpoint + 1.
    */
  def apply(spark: SparkSession, n: Long, edgeList: Seq[(Long, Long)], directed: Boolean): LinkGraph = {
    import spark.implicits._
    val maxId = if (edgeList.isEmpty) -1L else edgeList.map(e => math.max(e._1, e._2)).max
    val nn = math.max(n, maxId + 1)
    val df = edgeList.toDF("src", "dst")
    LinkGraph(df, directed, Some(nn))
  }

  /** Weighted literal constructor (edge order preserved as given, mirroring
    * the reference's dense edge ids in insertion order).
    */
  def weighted(
      spark: SparkSession,
      n: Long,
      edgeList: Seq[(Long, Long, Double)],
      directed: Boolean
  ): LinkGraph = {
    import spark.implicits._
    val maxId = if (edgeList.isEmpty) -1L else edgeList.map(e => math.max(e._1, e._2)).max
    val nn = math.max(n, maxId + 1)
    val df = edgeList.toDF("src", "dst", "weight")
    LinkGraph(df, directed, Some(nn))
  }

  // --- deterministic generators used by the reference's golden tests -------
  // (reference registrations: graphobject.c:12415-12979)

  /** Star(n): edges (0, i) for i in 1..n-1 (`graphobject.c:12751`). */
  def star(spark: SparkSession, n: Int, directed: Boolean = false): LinkGraph = {
    val df = spark.range(1, n).select(lit(0L).as("src"), col("id").as("dst"))
    LinkGraph(df, directed, Some(n.toLong))
  }

  /** Full(n): all pairs i<j, undirected (`graphobject.c:12613`). */
  def full(spark: SparkSession, n: Int): LinkGraph = {
    val v = spark.range(n)
    val df = v.toDF("src").crossJoin(v.toDF("dst")).where(col("src") < col("dst"))
    LinkGraph(df, directed = false, Some(n.toLong))
  }

  /** Tree(n, children): vertex i's parent is (i-1)/children
    * (`graphobject.c:12890`; golden shapes `test_structural.py:16`).
    */
  def tree(spark: SparkSession, n: Int, children: Int): LinkGraph = {
    val df = spark.range(1, n)
      .select(((col("id") - 1) / children).cast("long").as("src"), col("id").as("dst"))
    LinkGraph(df, directed = false, Some(n.toLong))
  }

  /** Ring(n, circular): path 0-1-...-(n-1) plus closing edge if circular
    * (`graphobject.c:12824`; neighborhood goldens `test_structural.py:441-495`).
    */
  def ring(spark: SparkSession, n: Int, circular: Boolean = true): LinkGraph = {
    val path = spark.range(0, n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val df = if (circular) path.union(spark.range(1).select(lit(n - 1L).as("src"), lit(0L).as("dst"))) else path
    LinkGraph(df, directed = false, Some(n.toLong))
  }

  /** Lattice(dims, circular): d-dimensional grid, row-major vertex ids
    * (`graphobject.c:12761`; betweenness golden `test_structural.py:245-247`
    * uses Lattice([3,3])). Closed-form: one edge expression per dimension —
    * vertex v connects to v + stride(d) unless at the boundary; circular
    * adds the wrap edge for dims of size > 2.
    */
  def lattice(spark: SparkSession, dims: Seq[Int], circular: Boolean = false): LinkGraph = {
    val n = dims.product.toLong
    val v = spark.range(n)
    // stride of dimension d (row-major): product of sizes after d
    val strides = dims.indices.map(d => dims.drop(d + 1).product.toLong)
    val parts = dims.indices.map { d =>
      val size = dims(d).toLong
      val stride = strides(d)
      val coord = (col("id") / stride) % size // coordinate along dimension d
      val inner = v.where(coord < size - 1)
        .select(col("id").as("src"), (col("id") + stride).as("dst"))
      if (circular && size > 2)
        inner.union(v.where(coord === size - 1)
          .select(col("id").as("src"), (col("id") - (size - 1) * stride).as("dst")))
      else inner
    }
    LinkGraph(parts.reduce(_ union _), directed = false, Some(n))
  }
}
