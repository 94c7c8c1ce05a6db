package graft.algos

import graft.core.{Lineage, LinkGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => cnt}

/** Clique enumeration: `cliques(min, max)`, `maximal_cliques(min, max)`,
  * `largest_cliques()`, `clique_number()` (reference
  * `graphobject.c:15738-15776`, goldens `tests/test_cliques.py:13-106`).
  * Direction is ignored (the reference warns and treats the graph as
  * undirected); loops/multi-edges dropped.
  *
  * Scale design — neither entry point is a driver kernel:
  *
  *  - [[cliques]] is level-wise k-clique listing over the degree-ordered
  *    orientation (the same (degree, id) order [[Triangles]] uses): state is
  *    (members, cand) where cand = the higher-ordered common neighbors of
  *    all members; each level is one explode + one co-keyed join +
  *    `array_intersect`. Every clique is produced exactly once (members
  *    ascend in the order), per-vertex fan-out is arboricity-bounded, and
  *    rows stream through shuffles — nothing is collected.
  *
  *  - [[maximalCliques]] is the Eppstein–Löffler–Strash decomposition: each
  *    vertex v owns the subproblem BK(R = {v}, P = later neighbors,
  *    X = earlier neighbors), which emits exactly the maximal cliques whose
  *    order-minimum is v — the union over v is every maximal clique exactly
  *    once. The adjacency each subproblem needs (edges among N(v)) is the
  *    triangle list through v, built by the same two distributed joins as
  *    triangle counting and grouped per v; the pivoting Bron–Kerbosch then
  *    runs task-local per group. Subproblem size is bounded by triangles
  *    through v, not degree² — and a `maxSubproblem` gate refuses (with the
  *    fix spelled out) rather than letting one hub OOM an executor.
  */
object Cliques {

  /** Per-subproblem bound: rows = triangles through v (the local adjacency)
    * plus deg(v). Above this a single task would hold a multi-GB group —
    * refuse loudly; the caller can delete top hubs first (the standard
    * web-graph prep) or raise the bound on a fat-executor cluster.
    */
  val maxSubproblem = 2000000L

  /** Undirected simple edges canonicalized to a < b. */
  private def simpleEdges(g: LinkGraph): DataFrame =
    g.edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** Edges oriented low (deg, id) -> high (deg, id): (lo, hi). */
  private def oriented(e: DataFrame): DataFrame = {
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(cnt(lit(1)).as("deg"))
    e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "adeg"), Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "bdeg"), Seq("b"))
      .select(
        when(col("adeg") < col("bdeg") || (col("adeg") === col("bdeg") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("adeg") < col("bdeg") || (col("adeg") === col("bdeg") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
  }

  /** All cliques with `min <= size <= max` as (clique array<long>, size),
    * arrays sorted by vertex id, each clique exactly once. `max = 0` means
    * unbounded (reference `cliques(min, max)` semantics with -1); min
    * defaults to singletons like the reference.
    */
  def cliques(g: LinkGraph, min: Int = 1, max: Int = 0): DataFrame = {
    val spark = g.spark
    val lo = math.max(min, 1)
    val e = simpleEdges(g).transform(Lineage.cut)
    val ori = oriented(e).transform(Lineage.cut)
    // higher-ordered adjacency as an array per vertex (sorted for
    // array_intersect determinism)
    val adjHi = ori.groupBy(col("lo").as("v")).agg(sort_array(collect_list(col("hi"))).as("nbrs"))
      .transform(Lineage.cut).persist()
    adjHi.count()
    var state = g.vertices
      .join(adjHi.withColumnRenamed("v", "id"), Seq("id"), "left")
      .select(array(col("id")).as("members"),
        coalesce(col("nbrs"), array().cast("array<long>")).as("cand"))
      .transform(Lineage.cut)
    var out = if (lo <= 1) state.select(sort_array(col("members")).as("clique")) else null
    var k = 1
    val hi = if (max <= 0) Int.MaxValue else max
    while (k < hi && !state.isEmpty) {
      // extend every clique by each candidate w; the new candidate set is
      // the intersection with w's higher-ordered neighborhood
      val ext = state.select(col("members"), explode(col("cand")).as("w"), col("cand"))
      state = ext.join(adjHi.withColumnRenamed("v", "w"), Seq("w"), "left")
        .select(
          concat(col("members"), array(col("w"))).as("members"),
          array_intersect(col("cand"), coalesce(col("nbrs"), array().cast("array<long>"))).as("cand"))
        .transform(Lineage.cut)
      k += 1
      if (k >= lo) {
        val level = state.select(sort_array(col("members")).as("clique"))
        out = if (out == null) level else out.union(level)
      }
    }
    adjHi.unpersist()
    val res = if (out == null) spark.emptyDataFrame
      .withColumn("clique", array().cast("array<long>")).limit(0) else out
    res.select(col("clique"), size(col("clique")).as("size"))
  }

  /** All MAXIMAL cliques with `min <= size <= max` (0 = unbounded) as
    * (clique array<long>, size), each exactly once. Isolated vertices are
    * themselves maximal cliques of size 1 (reference semantics).
    */
  def maximalCliques(g: LinkGraph, min: Int = 0, max: Int = 0,
                     maxSub: Long = maxSubproblem): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val e = simpleEdges(g).transform(Lineage.cut)
    val ori = oriented(e).transform(Lineage.cut).persist()
    // neighbor lists split by order side: P = later (lo -> hi), X = earlier
    val pSide = ori.groupBy(col("lo").as("v")).agg(collect_list(col("hi")).as("p"))
    val xSide = ori.groupBy(col("hi").as("v")).agg(collect_list(col("lo")).as("x"))
    // triangles through v in the ORIENTED order (v = order-minimum pivot is
    // not required here: the subproblem needs ALL adjacent pairs among N(v),
    // so enumerate common-neighbor closures from both sides)
    val biadj = ori.select(col("lo").as("v"), col("hi").as("n"))
      .union(ori.select(col("hi").as("v"), col("lo").as("n")))
    val n1 = biadj.select(col("v"), col("n").as("ta"))
    val n2 = biadj.select(col("v"), col("n").as("tb"))
    val nbrPairs = n1.join(n2, Seq("v")).where(col("ta") < col("tb"))
      .join(e, col("ta") === e("a") && col("tb") === e("b"), "left_semi")
    val triByV = nbrPairs.groupBy("v")
      .agg(collect_list(struct(col("ta"), col("tb"))).as("tri"), cnt(lit(1)).as("ntri"))
    val subs = g.vertices.select(col("id").as("v"))
      .join(pSide, Seq("v"), "left")
      .join(xSide, Seq("v"), "left")
      .join(triByV, Seq("v"), "left")
      .select(col("v"),
        coalesce(col("p"), array().cast("array<long>")).as("p"),
        coalesce(col("x"), array().cast("array<long>")).as("x"),
        coalesce(col("tri"), array().cast("array<struct<ta:long,tb:long>>")).as("tri"),
        coalesce(col("ntri"), lit(0L)).as("ntri"))
    val over = subs.where(col("ntri") + size(col("p")) + size(col("x")) > maxSub)
      .select("v", "ntri").limit(1).collect()
    require(over.isEmpty, {
      val r = over.head
      s"maximal_cliques: vertex ${r.getLong(0)} has ${r.getLong(1)} triangles through it " +
        s"(> maxSubproblem = $maxSub); one task would hold the whole hub neighborhood. " +
        "Delete/defer top hubs first (k_core / induced_subgraph) or raise Cliques.maxSubproblem " +
        "where executors have the memory."
    })
    val cliquesDs = subs.as[(Long, Seq[Long], Seq[Long], Seq[(Long, Long)], Long)]
      .flatMap { case (v, p, x, tri, _) =>
        val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
        def link(a: Long, b: Long): Unit = {
          adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
          adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
        }
        (p ++ x).foreach(link(v, _))
        tri.foreach { case (a, b) => link(a, b) }
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        def nbrs(u: Long): scala.collection.Set[Long] =
          adj.getOrElse(u, scala.collection.mutable.Set.empty)
        // pivoting Bron–Kerbosch on (R, P, X); every emitted clique contains
        // v and has no earlier-ordered extension (X tracks those)
        def bk(r: List[Long], pp: Set[Long], xx: Set[Long]): Unit = {
          if (pp.isEmpty && xx.isEmpty) { out += r; return }
          val pivot = (pp ++ xx).maxBy(u => (pp & nbrs(u)).size)
          var pRem = pp
          var xCur = xx
          (pp -- nbrs(pivot)).foreach { u =>
            bk(u :: r, pRem & nbrs(u), xCur & nbrs(u))
            pRem -= u
            xCur += u
          }
        }
        bk(List(v), p.toSet, x.toSet)
        out.map(_.sorted)
      }.toDF("clique")
    ori.unpersist()
    val sized = cliquesDs.select(col("clique"), size(col("clique")).as("size"))
    val loF = if (min > 0) sized.where(col("size") >= min) else sized
    if (max > 0) loF.where(col("size") <= max) else loF
  }

  /** `clique_number()` / `omega()`: size of the largest clique. */
  def cliqueNumber(g: LinkGraph): Int = {
    val r = maximalCliques(g).agg(max(col("size"))).head
    if (r.isNullAt(0)) 0 else r.getInt(0)
  }

  /** `largest_cliques()`: all maximum-size cliques. */
  def largestCliques(g: LinkGraph): DataFrame = {
    val all = maximalCliques(g).persist()
    val top = all.agg(max(col("size")).as("size"))
    val res = all.join(broadcast(top), Seq("size")).select("clique", "size")
    res
  }

  // ---------------------------------------------------------- independent sets
  // The reference family (`graphobject.c:15792-15830`, goldens
  // `test_cliques.py:106-157`) is clique enumeration on the complement
  // graph. The complement is Θ(n²), so these are gated much tighter than
  // the clique entry points — the blow-up is the complement itself.

  private def complementFor(g: LinkGraph, what: String): LinkGraph = {
    require(g.vcount() <= 20000,
      s"$what enumerates cliques of the COMPLEMENT graph (Θ(n²) edges) — capped at 20000 vertices")
    graft.ops.Extras.complementer(g, loops = false)
  }

  /** `independent_vertex_sets(min, max)`: (set array<long>, size) rows. */
  def independentVertexSets(g: LinkGraph, min: Int = 1, max: Int = 0): DataFrame =
    cliques(complementFor(g, "independent_vertex_sets"), min, max)
      .withColumnRenamed("clique", "vset")

  /** `maximal_independent_vertex_sets()`. */
  def maximalIndependentVertexSets(g: LinkGraph): DataFrame =
    maximalCliques(complementFor(g, "maximal_independent_vertex_sets"))
      .withColumnRenamed("clique", "vset")

  /** `largest_independent_vertex_sets()`. */
  def largestIndependentVertexSets(g: LinkGraph): DataFrame =
    largestCliques(complementFor(g, "largest_independent_vertex_sets"))
      .withColumnRenamed("clique", "vset")

  /** `independence_number()` / `alpha()`. */
  def independenceNumber(g: LinkGraph): Int =
    cliqueNumber(complementFor(g, "independence_number"))
}
