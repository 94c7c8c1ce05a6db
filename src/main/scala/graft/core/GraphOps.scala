package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree mode, mirroring igraph's IN/OUT/ALL (`graphobject.c:12238`). */
sealed trait Mode
object Mode {
  case object In extends Mode
  case object Out extends Mode
  case object All extends Mode
}

/** Structural per-vertex / whole-graph statistics and graph transforms.
  *
  * All operators are declarative DataFrame pipelines: one `groupBy` per
  * degree-like aggregate (map-side partial aggregation is automatic), joins
  * against the vertex frame to keep zero-degree vertices (the reference
  * returns 0 for isolated vertices, `test_structural.py:146`).
  */
object GraphOps {

  /** Per-vertex degree (id, degree). Reference semantics
    * (`graphobject.c:12238`; goldens `test_structural.py:142-163`):
    * a self-loop adds 2 to ALL/undirected degree, 1 to IN and 1 to OUT;
    * `loops=false` ignores self-loops entirely.
    */
  def degrees(g: LinkGraph, mode: Mode = Mode.All, loops: Boolean = true): DataFrame =
    degreeLike(g, mode, loops, weightedSum = false)

  /** Weighted degree (id, strength) — `graphobject.c:12254`,
    * goldens `test_structural.py:164-187`.
    */
  def strength(g: LinkGraph, mode: Mode = Mode.All, loops: Boolean = true): DataFrame =
    degreeLike(g, mode, loops, weightedSum = true)

  private def degreeLike(g: LinkGraph, mode: Mode, loops: Boolean, weightedSum: Boolean): DataFrame = {
    val base = if (loops) g.weighted else g.weighted.where(col("src") =!= col("dst"))
    val v = if (weightedSum) col("weight") else lit(1.0)
    // endpoint stream: for undirected or mode=ALL every edge contributes at
    // both endpoints (loops therefore count twice via the two endpoints).
    val effMode = if (g.directed) mode else Mode.All
    val ends = effMode match {
      case Mode.Out => base.select(col("src").as("id"), v.as("v"))
      case Mode.In  => base.select(col("dst").as("id"), v.as("v"))
      case Mode.All =>
        base.select(col("src").as("id"), v.as("v"))
          .union(base.select(col("dst").as("id"), v.as("v")))
    }
    val agg = ends.groupBy("id").agg(sum("v").as("s"))
    val out = g.vertices.join(agg, Seq("id"), "left")
      .select(col("id"), coalesce(col("s"), lit(0.0)).as("s"))
    if (weightedSum) out.withColumnRenamed("s", "strength")
    else out.select(col("id"), col("s").cast("long").as("degree"))
  }

  /** Max degree over all vertices (`graphobject.c:13702`). */
  def maxDegree(g: LinkGraph, mode: Mode = Mode.All, loops: Boolean = false): Long = {
    val d = degrees(g, mode, loops)
    if (d.isEmpty) 0L else d.agg(max("degree")).head.getLong(0)
  }

  /** Degree histogram (degree, n_vertices) — `__init__.py:624-634`. */
  def degreeDistribution(g: LinkGraph, mode: Mode = Mode.All): DataFrame =
    degrees(g, mode).groupBy("degree").agg(count(lit(1)).as("n_vertices"))

  /** Graph density (`graphobject.c:13317`; goldens `test_structural.py:18-25`):
    * undirected: 2m/(n(n-1)); with loops: m/(n(n+1)/2);
    * directed: m/(n(n-1)); with loops: m/n^2. Multi-edges counted as-is.
    */
  def density(g: LinkGraph, loops: Boolean = false): Double = {
    val n = g.vcount().toDouble
    val m = g.ecount().toDouble
    if (n <= 0) return Double.NaN
    val possible =
      if (g.directed) { if (loops) n * n else n * (n - 1) }
      else { if (loops) n * (n + 1) / 2.0 else n * (n - 1) / 2.0 }
    if (possible == 0) Double.NaN else m / possible
  }

  /** Collapse multi-edges / drop loops (`graphobject.c:5907-5932`).
    * `combine`: any Spark SQL aggregate over `weight` — "sum", "min", "max",
    * "avg"/"mean", "first", "count" (the reference's combiner table,
    * `convert.c:269-291`). Undirected edges are canonicalized to
    * (min, max) before grouping so (u,v) and (v,u) collapse together.
    */
  def simplify(
      g: LinkGraph,
      multiple: Boolean = true,
      loops: Boolean = true,
      combine: String = "sum"
  ): LinkGraph = {
    var e = g.weighted
    if (loops) e = e.where(col("src") =!= col("dst"))
    if (multiple) {
      val canon =
        if (g.directed) e
        else e.select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"), col("weight"))
      val comb = combine.toLowerCase match {
        case "sum"            => sum(col("weight"))
        case "min"            => min(col("weight"))
        case "max"            => max(col("weight"))
        case "avg" | "mean"   => avg(col("weight"))
        case "first"          => first(col("weight"))
        case "count"          => count(lit(1)).cast("double")
        case "ignore"         => lit(1.0)
        case other            => throw new IllegalArgumentException(s"unknown combiner: $other")
      }
      e = canon.groupBy("src", "dst").agg(comb.as("weight"))
    }
    LinkGraph(e, g.directed, g.numVertices)
  }

  /** Collapse multi-edges with a CALLER-SUPPLIED aggregate over `weight` —
    * the reference's callable combiner hook (`convert.c:269-291`
    * COMBINE_FUNCTION). Pass any Column aggregate, including a custom
    * `Aggregator` registered via `functions.udaf` (see GraphApiSpec).
    */
  def simplifyWith(g: LinkGraph, combine: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                   loops: Boolean = true): LinkGraph = {
    var e = g.weighted
    if (loops) e = e.where(col("src") =!= col("dst"))
    val canon =
      if (g.directed) e
      else e.select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"), col("weight"))
    LinkGraph(canon.groupBy("src", "dst").agg(combine(col("weight")).as("weight")),
      g.directed, g.numVertices)
  }

  // ---- adjacency lookups (`graphobject.c:12336-12401, 13008`) -----------

  /** `neighbors(v, mode)`: adjacent vertex ids — a pushed-down point filter
    * on the (bucketed-at-rest) edge table.
    */
  def neighbors(g: LinkGraph, v: Long, mode: Mode = Mode.All): DataFrame = {
    val e = g.weighted
    val out = e.where(col("src") === v).select(col("dst").as("id"))
    val in = e.where(col("dst") === v).select(col("src").as("id"))
    val effMode = if (g.directed) mode else Mode.All
    effMode match {
      case Mode.Out => out
      case Mode.In  => in
      case Mode.All => out.union(in)
    }
  }

  def successors(g: LinkGraph, v: Long): DataFrame = neighbors(g, v, Mode.Out)
  def predecessors(g: LinkGraph, v: Long): DataFrame = neighbors(g, v, Mode.In)

  /** `incident(v, mode)`: the incident edge rows themselves. */
  def incident(g: LinkGraph, v: Long, mode: Mode = Mode.All): DataFrame = {
    val e = g.weighted
    val effMode = if (g.directed) mode else Mode.All
    effMode match {
      case Mode.Out => e.where(col("src") === v)
      case Mode.In  => e.where(col("dst") === v)
      case Mode.All => e.where(col("src") === v || col("dst") === v)
    }
  }

  /** `are_connected(u, v)` (`graphobject.c:13008`): direct edge exists. */
  def areConnected(g: LinkGraph, u: Long, v: Long): Boolean = {
    val e = g.weighted
    val fwd = !e.where(col("src") === u && col("dst") === v).isEmpty
    if (g.directed) fwd
    else fwd || !e.where(col("src") === v && col("dst") === u).isEmpty
  }

  /** `get_eid(u, v)`: dense edge id in canonical (src, dst) order, mirroring
    * [[graft.ops.Extras.lineGraph]]'s edge numbering; -1 when absent.
    */
  def getEid(g: LinkGraph, u: Long, v: Long): Long = {
    val eid = Ids.assignDense(g.weighted.select(struct(col("src"), col("dst")).as("sd")), "sd")
      .select(col("id").as("eid"), col("sd.src").as("src"), col("sd.dst").as("dst"))
    val hit = eid.where(
      if (g.directed) col("src") === u && col("dst") === v
      else (col("src") === u && col("dst") === v) || (col("src") === v && col("dst") === u))
      .select("eid").orderBy("eid").limit(1).collect()
    if (hit.isEmpty) -1L else hit.head.getLong(0)
  }

  /** `get_eids(pairs)` (`graphobject.c:12383`): dense edge id per requested
    * pair under the same canonical numbering as [[getEid]], -1 when absent —
    * ONE join for the whole batch instead of a lookup per pair.
    */
  def getEids(g: LinkGraph, pairs: Seq[(Long, Long)]): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val req = pairs.zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) }
      .toDF("ord", "u", "v")
    val eid = Ids.assignDense(g.weighted.select(struct(col("src"), col("dst")).as("sd")), "sd")
      .select(col("id").as("eid"), col("sd.src").as("src"), col("sd.dst").as("dst"))
    val cond =
      if (g.directed) col("src") === col("u") && col("dst") === col("v")
      else (col("src") === col("u") && col("dst") === col("v")) ||
        (col("src") === col("v") && col("dst") === col("u"))
    // heavy side (edge ids) streams against the broadcast request set; the
    // final left join only reconciles two request-sized frames
    val matched = eid.join(broadcast(req), cond)
      .groupBy("ord").agg(min(col("eid")).as("eid"))
    req.join(matched, Seq("ord"), "left")
      .select(col("ord"), col("u"), col("v"), coalesce(col("eid"), lit(-1L)).as("eid"))
  }

  /** `diversity(weights)` (`graphobject.c:775`; igraph_diversity): per-vertex
    * Shannon entropy of incident edge weights normalized by ln(degree) —
    * H(v) = ln(S) − Σ w·ln(w) / S with S = Σ w, diversity = H / ln(deg).
    * Undirected SIMPLE graphs only (the reference errors on loops and
    * multi-edges); degree-0 vertices → NaN, degree-1 → 0. One bidirected
    * explode + one aggregate — scales as a degree computation.
    */
  def diversity(g: LinkGraph): DataFrame = {
    require(!g.directed, "diversity is defined for undirected graphs (reference parity)")
    require(isSimple(g), "diversity requires a simple graph (reference parity)")
    // log(w) is NULL for w <= 0 and sum() skips NULLs, so a zero/negative
    // weight would silently vanish from the entropy term — fail loudly like
    // the loop/multi-edge gates above (the reference requires positive
    // weights too)
    val minW = g.weighted.agg(min(col("weight").cast("double"))).head()
    require(minW.isNullAt(0) || minW.getDouble(0) > 0.0,
      "diversity requires strictly positive edge weights (reference parity)")
    val inc = g.bidirected.select(col("src").as("id"), col("weight").cast("double").as("w"))
    val agg = inc.groupBy("id").agg(
      sum("w").as("sw"), count(lit(1)).as("d"),
      sum(col("w") * log(col("w"))).as("swlw"))
    g.vertices.join(agg, Seq("id"), "left")
      .select(col("id"),
        when(col("d").isNull, lit(Double.NaN))
          .when(col("d") === 1, lit(0.0))
          .otherwise((log(col("sw")) - col("swlw") / col("sw")) / log(col("d")))
          .as("diversity"))
  }

  // ---- predicates (`graphobject.c:12162-13679`) --------------------------

  /** `is_connected(mode)`: one component (weak by default, like the
    * reference's default on undirected graphs).
    */
  def isConnected(g: LinkGraph, strong: Boolean = false): Boolean = {
    val comp = if (strong) graft.algos.Components.scc(g) else graft.algos.Components.wcc(g)
    comp.select("comp").distinct().count() <= 1
  }

  /** `is_tree`: connected with exactly n-1 edges (`graphobject.c:12187`). */
  def isTree(g: LinkGraph): Boolean =
    g.ecount() == g.vcount() - 1 && isConnected(g)

  /** `is_mutual`: every arc is reciprocated (`graphobject.c:12308`). */
  def isMutual(g: LinkGraph): Boolean = {
    val e = g.weighted.select("src", "dst").where(col("src") =!= col("dst")).distinct()
    e.except(e.select(col("dst").as("src"), col("src").as("dst"))).isEmpty
  }

  /** `is_bipartite` (`graphobject.c:13641`): BFS-layer 2-coloring from each
    * component's min-id root; bipartite iff no edge joins same-parity
    * layers. One multi-source BFS + one join — no per-component work.
    */
  def isBipartite(g: LinkGraph): Boolean = {
    val und = LinkGraph(g.bidirected, directed = false, g.numVertices)
    if (!g.weighted.where(col("src") === col("dst")).isEmpty) return false // loop
    val comp = graft.algos.Components.wcc(und)
    val roots = comp.where(col("id") === col("comp")).select(col("id"))
    val dist = graft.algos.Distances.multiBfs(und, Mode.All, Some(roots))
      .select(col("v").as("id"), (col("dist") % 2).as("side"))
    val e = und.weighted.where(col("src") =!= col("dst")).select("src", "dst")
    e.join(dist.select(col("id").as("src"), col("side").as("s1")), Seq("src"))
      .join(dist.select(col("id").as("dst"), col("side").as("s2")), Seq("dst"))
      .where(col("s1") === col("s2")).isEmpty
  }

  /** Nominal (categorical) assortativity — Newman 2003 eq. 2:
    * r = (Σ e_ii − Σ a_i b_i) / (1 − Σ a_i b_i) over the mixing matrix of
    * edge-endpoint types (`assortativity_nominal`, `graphobject.c:13027`).
    * `types`: (id, type). Undirected edges counted in both directions.
    */
  def assortativityNominal(g: LinkGraph, types: DataFrame): DataFrame = {
    val e = (if (g.directed) g.weighted else g.bidirected).select("src", "dst")
    val typed = e
      .join(types.select(col("id").as("src"), col("type").as("ts")), Seq("src"))
      .join(types.select(col("id").as("dst"), col("type").as("td")), Seq("dst"))
    val m = typed.count().toDouble
    val eii = typed.where(col("ts") === col("td")).count().toDouble / m
    val marg = typed.groupBy("ts").agg(count(lit(1)).as("na"))
      .join(typed.groupBy(col("td").as("ts")).agg(count(lit(1)).as("nb")), Seq("ts"), "full")
      .select((coalesce(col("na"), lit(0L)) / m * coalesce(col("nb"), lit(0L)) / m).as("ab"))
      .agg(sum("ab")).head.getDouble(0)
    val r = if (marg == 1.0) Double.NaN else (eii - marg) / (1.0 - marg)
    val spark = g.spark
    import spark.implicits._
    Seq(r).toDF("assortativity")
  }

  /** True iff no multi-edges and no loops (`graphobject.c:12179`). */
  def isSimple(g: LinkGraph): Boolean = {
    val canon =
      if (g.directed) g.weighted
      else g.weighted.select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
    val hasLoop = !g.edges.where(col("src") === col("dst")).isEmpty
    if (hasLoop) return false
    canon.groupBy("src", "dst").count().where(col("count") > 1).isEmpty
  }

  /** `bipartite_projection(types, which)` (`graphobject.c:13198`; Py
    * `__init__.py:3378-3442`; goldens `tests/test_bipartite.py:171-202`):
    * connect two same-side vertices iff they share an opposite-side
    * neighbor; `weight` = number of shared neighbors (multiplicity). The
    * classic co-occurrence self-join — the same shape as the engine's
    * lineitem co-part graph. Vertex ids are preserved (the reference
    * renumbers; documented difference).
    */
  def bipartiteProjection(g: LinkGraph, types: DataFrame, which: Int,
                          multiplicity: Boolean = true): LinkGraph = {
    val t = types.select(col("id"), col("type").cast("int").as("t"))
    val e = g.weighted
      .join(t.select(col("id").as("src"), col("t").as("ts")), Seq("src"))
      .join(t.select(col("id").as("dst"), col("t").as("td")), Seq("dst"))
    require(e.where(col("ts") === col("td")).isEmpty,
      "graph is not bipartite w.r.t. the given types (same-type edge found)")
    // (projected vertex u, pivot p) incidence, deduped
    val side = e.where(col("ts") === which).select(col("src").as("u"), col("dst").as("p"))
      .union(e.where(col("td") === which).select(col("dst").as("u"), col("src").as("p")))
      .distinct()
    val pairs = side.alias("a").join(side.alias("b"), Seq("p"))
      .where(col("a.u") < col("b.u"))
      .groupBy(col("a.u").as("src"), col("b.u").as("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
    val edges = if (multiplicity) pairs else pairs.select("src", "dst")
    LinkGraph(edges, directed = false, None)
  }

  /** `bipartite_projection_size` → (n0, m0, n1, m1). */
  def bipartiteProjectionSize(g: LinkGraph, types: DataFrame): (Long, Long, Long, Long) = {
    val t = types.select(col("id"), col("type").cast("int").as("t"))
    val n0 = t.where(col("t") === 0).count()
    val n1 = t.where(col("t") === 1).count()
    (n0, bipartiteProjection(g, types, 0).ecount(),
      n1, bipartiteProjection(g, types, 1).ecount())
  }

  /** Burt's `constraint` (`graphobject.c:13113-13160`; smoke test
    * `test_structural.py:507-509`): c_i = Σ_j (p_ij + Σ_q p_iq·p_qj)² where
    * p_ij is the symmetrized proportional tie strength
    * (w_ij + w_ji) / Σ_q (w_iq + w_qi), q ranging over shared contacts.
    * Shape: one symmetrize-aggregate, one self-join on the shared contact,
    * one squared-sum aggregate — all shuffles on vertex keys.
    */
  /** @param maxPivotDegree web-scale path: exclude shared contacts q with
    *        degree above the cap from the indirect-strength self-join — the
    *        p⋈p pivot fan-out is quadratic in pivot degree, and a super-hub's
    *        per-edge proportional strengths p_qj ≈ 1/deg(q) contribute
    *        negligibly to Σ_q p_iq·p_qj. Approximation; the drop is logged.
    *        None (default) = Burt's exact formula.
    */
  def constraint(g: LinkGraph, maxPivotDegree: Option[Int] = None): DataFrame = {
    val e = g.weighted.where(col("src") =!= col("dst"))
    val sym = e.select(col("src").as("i"), col("dst").as("j"), col("weight"))
      .union(e.select(col("dst").as("i"), col("src").as("j"), col("weight")))
      .groupBy("i", "j").agg(sum("weight").as("w"))
    val si = sym.groupBy("i").agg(sum("w").as("s"))
    val p = sym.join(si, Seq("i")).select(col("i"), col("j"), (col("w") / col("s")).as("p"))
      .persist()
    p.count()
    // indirect strength via shared contact q: Σ_q p_iq · p_qj  (q != i, j by
    // construction: p has no self rows; exclude j == i)
    val pivotSide = maxPivotDegree match {
      case None => p
      case Some(cap) =>
        val deg = p.groupBy("i").agg(count(lit(1)).as("d"))
        val dropped = deg.where(col("d") > cap).count()
        if (dropped > 0)
          org.slf4j.LoggerFactory.getLogger("graft.core.GraphOps").warn(
            s"constraint: $dropped pivot vertex(es) with degree > $cap excluded " +
              "from the indirect-strength join (approximation, drop logged per the no-silent-caps rule)")
        p.join(deg.where(col("d") <= cap).select("i"), Seq("i"), "left_semi")
    }
    // fixed-width repartition on the pivot: the indirect-strength join
    // expands each shared contact q to deg(q)² rows AFTER the exchange
    // (AQE byte-based coalescing would serialize it onto 1-2 tasks)
    val ind = p.repartition(g.spark.sparkContext.defaultParallelism, col("j")).alias("a")
      .join(pivotSide.alias("b"), col("a.j") === col("b.i"))
      .where(col("a.i") =!= col("b.j"))
      .groupBy(col("a.i").as("i"), col("b.j").as("j"))
      .agg(sum(col("a.p") * col("b.p")).as("ind"))
    // Burt's sum runs over DIRECT contacts j only — indirect paths modify
    // c_ij for existing contacts, they do not add new j terms (a star leaf
    // has constraint exactly 1): left join, not full outer
    val pair = p.select(col("i"), col("j"), col("p"))
      .join(ind, Seq("i", "j"), "left")
      .select(col("i"),
        (col("p") + coalesce(col("ind"), lit(0.0))).as("t"))
    val out = g.vertices.join(
      pair.groupBy(col("i").as("id")).agg(sum(col("t") * col("t")).as("constraint")),
      Seq("id"), "left")
      .select(col("id"), when(col("constraint").isNull, lit(Double.NaN))
        .otherwise(col("constraint")).as("constraint"))
    p.unpersist(blocking = false)
    out
  }

  /** True iff any (src, dst) pair repeats (`has_multiple`,
    * `graphobject.c:12299`); loops are not multi-edges by themselves.
    */
  def hasMultiple(g: LinkGraph): Boolean = {
    val canon =
      if (g.directed) g.edges.select("src", "dst")
      else g.edges.select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
    !canon.groupBy("src", "dst").count().where(col("count") > 1).isEmpty
  }

  /** to_undirected(mode=collapse|each) — `graphobject.c:14838`. */
  def toUndirected(g: LinkGraph, collapse: Boolean = true, combine: String = "sum"): LinkGraph = {
    val und = LinkGraph(g.weighted, directed = false, g.numVertices)
    if (collapse) simplify(und, multiple = true, loops = false, combine) else und
  }

  /** to_directed(mutual=true): each undirected edge becomes two arcs
    * (`graphobject.c:14824`).
    */
  def toDirected(g: LinkGraph, mutual: Boolean = true): LinkGraph =
    if (g.directed) g
    else if (mutual) LinkGraph(g.bidirected, directed = true, g.numVertices)
    else LinkGraph(g.weighted, directed = true, g.numVertices)

  /** Vertex-induced subgraph, ids preserved (not re-densified; callers can
    * relabel with [[Ids.relabel]]) — `graphobject.c:13620-13640`.
    * Uses semi-joins on both endpoints (broadcast when the set is small).
    */
  def inducedSubgraph(g: LinkGraph, vertexSet: DataFrame): LinkGraph = {
    val s = vertexSet.select(col(vertexSet.columns.head).as("id"))
    val e = g.weighted
      .join(s.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(s.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst", "weight")
    LinkGraph(e, g.directed, None)
  }

  /** `add_vertices(k)` (`graphobject.c:12203`; the singular `add_vertex`
    * is k = 1): k new isolated vertices. Immutable-snapshot semantics —
    * the edge table is shared, only the explicit vertex count grows (the
    * reference's implicit 0..n-1 set).
    */
  def addVertices(g: LinkGraph, k: Long): LinkGraph = {
    require(k >= 0, s"add_vertices: k must be >= 0, got $k")
    LinkGraph(g.edges, g.directed, Some(g.vcount() + k))
  }

  /** `add_edges(pairs)` (`graphobject.c:12218`; the singular `add_edge`
    * is a 1-pair call): append edge instances (multi-edges allowed,
    * exactly like the reference); endpoints must be in range when the
    * vertex count is explicit (the reference raises). Pure union — the
    * new snapshot shares the old edge table's lineage.
    */
  def addEdges(g: LinkGraph, pairs: Seq[(Long, Long)]): LinkGraph = {
    val spark = g.spark
    import spark.implicits._
    g.numVertices.foreach { n =>
      val bad = pairs.find(p => p._1 < 0 || p._1 >= n || p._2 < 0 || p._2 >= n)
      require(bad.isEmpty, s"add_edges: endpoint out of range 0..${n - 1}: ${bad.get}")
    }
    val add = pairs.toDF("src", "dst").withColumn("weight", lit(1.0))
    LinkGraph(g.weighted.unionByName(add), g.directed, g.numVertices)
  }

  /** `delete_edges(pairs)` (`graphobject.c:12227`): remove every edge
    * instance matching the given pairs (both orientations when
    * undirected). The reference deletes by edge id; this engine's
    * canonical edge ids are per-(src,dst) pair ([[getEids]]), under which
    * pair-delete and id-delete coincide. One broadcast anti-join.
    */
  def deleteEdges(g: LinkGraph, pairs: Seq[(Long, Long)]): LinkGraph = {
    val spark = g.spark
    import spark.implicits._
    val del = pairs.toDF("u", "v")
    val cond =
      if (g.directed) col("src") === col("u") && col("dst") === col("v")
      else (col("src") === col("u") && col("dst") === col("v")) ||
        (col("src") === col("v") && col("dst") === col("u"))
    LinkGraph(g.weighted.join(broadcast(del), cond, "left_anti"),
      g.directed, g.numVertices)
  }

  /** `delete_vertices(vs)` (`graphobject.c:12210`): drop the vertices and
    * every incident edge, then RENUMBER the survivors densely preserving
    * relative order — the reference's re-indexing semantics (deleting
    * vertex 3 of 0..5 leaves 0..4 with old 4,5 -> new 3,4). The dense
    * renumbering is the repo's standard distributed rank
    * ([[Ids.assignDense]]: range partition + per-partition offsets, no
    * global Window); incident-edge removal falls out of the inner remap
    * joins.
    */
  def deleteVertices(g: LinkGraph, vs: Seq[Long]): LinkGraph = {
    val spark = g.spark
    import spark.implicits._
    val del = vs.toDF("vid")
    val survivors = g.vertices
      .join(broadcast(del), col("id") === col("vid"), "left_anti")
    val mapping = Ids.assignDense(survivors.select(col("id").as("old")), "old")
      .select(col("old"), col("id").as("nid"))
    val n = mapping.count()
    val e = g.weighted
      .join(mapping.withColumnRenamed("old", "src"), Seq("src"))
      .withColumnRenamed("nid", "nsrc")
      .join(mapping.withColumnRenamed("old", "dst"), Seq("dst"))
      .select(col("nsrc").as("src"), col("nid").as("dst"), col("weight"))
    LinkGraph(e, g.directed, Some(n))
  }

  /** Quotient graph by a membership mapping (id -> label):
    * `contract_vertices` + `simplify` = the reference's `cluster_graph`
    * (`graphobject.c:13272-13296`, `clustering.py:308-336`).
    */
  def contractVertices(g: LinkGraph, membership: DataFrame): DataFrame = {
    val m = membership.select(col("id"), col("label"))
    g.weighted
      .join(m.withColumnRenamed("id", "src").withColumnRenamed("label", "csrc"), Seq("src"))
      .join(m.withColumnRenamed("id", "dst").withColumnRenamed("label", "cdst"), Seq("dst"))
      .groupBy(col("csrc").as("src"), col("cdst").as("dst"))
      .agg(sum("weight").as("weight"), count(lit(1)).as("n_edges"))
  }

  /** Fraction of reciprocated arcs among non-loop distinct arcs
    * (`graphobject.c:13869`). Defined on the simple digraph view.
    */
  def reciprocity(g: LinkGraph): Double = {
    val e = g.weighted.where(col("src") =!= col("dst")).select("src", "dst").distinct()
    val m = e.count()
    if (m == 0) return Double.NaN
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val mutual = e.intersect(rev).count()
    mutual.toDouble / m.toDouble
  }

  /** Average-neighbor-degree (knn) per vertex and per degree class (knnk) —
    * `graphobject.c:13660`, goldens `test_structural.py:123-140`.
    * Simple graphs only (like the reference). Returns (id, degree, knn).
    *
    * `weighted = true` follows the reference's `knn(weights=...)` docstring
    * (`graphobject.c:13660-13677`, igraph
    * `igraph_avg_nearest_neighbor_degree`): vertex STRENGTH replaces degree
    * in the calculation — knn(v) = Σ_u w_vu·s_u / s_v — while the returned
    * `degree` column (which bins knnk) stays the ordinary degree.
    */
  def knn(g: LinkGraph, weighted: Boolean = false): DataFrame = {
    val deg = degrees(g, Mode.All, loops = false)
    if (!weighted) {
      val adj = g.bidirected.select(col("src").as("id"), col("dst").as("nbr"))
      adj.join(deg.withColumnRenamed("id", "nbr").withColumnRenamed("degree", "nbr_deg"), Seq("nbr"))
        .groupBy("id").agg(avg("nbr_deg").as("knn"))
        .join(deg, Seq("id"))
        .select("id", "degree", "knn")
    } else {
      val adj = g.bidirected.where(col("src") =!= col("dst"))
        .select(col("src").as("id"), col("dst").as("nbr"), col("weight").as("w"))
      val s = adj.groupBy("id").agg(sum("w").as("s"))
      adj.join(s.select(col("id").as("nbr"), col("s").as("s_nbr")), Seq("nbr"))
        .groupBy("id").agg(sum(col("w") * col("s_nbr")).as("num"))
        .join(s, Seq("id"))
        .select(col("id"), (col("num") / col("s")).as("knn"))
        .join(deg, Seq("id"))
        .select("id", "degree", "knn")
    }
  }

  /** knnk: average knn per degree class (degree, knnk). */
  def knnk(g: LinkGraph, weighted: Boolean = false): DataFrame =
    knn(g, weighted).groupBy("degree").agg(avg("knn").as("knnk"))

  /** Number of common in-neighbors (cocitation, `graphobject.c:14195`) or
    * out-neighbors (bibcoupling, `14187`) for each vertex pair that shares
    * at least one. The classic set-similarity self-join: for undirected
    * graphs both behave identically on the bidirected view.
    */
  def cocitation(g: LinkGraph, minCommon: Long = 1L): DataFrame = {
    // (a,b) co-cited when some u links to both: shared key = the citer (src)
    val e = (if (g.directed) g.weighted else g.bidirected).select("src", "dst").distinct()
    pairOverlap(e.select(col("src").as("key"), col("dst").as("v")), minCommon)
  }

  def bibcoupling(g: LinkGraph, minCommon: Long = 1L): DataFrame = {
    // (a,b) coupled when both cite some u: shared key = the cited (dst)
    val e = (if (g.directed) g.weighted else g.bidirected).select("src", "dst").distinct()
    pairOverlap(e.select(col("dst").as("key"), col("src").as("v")), minCommon)
  }

  /** (key,v) pairs -> for each (v1<v2) sharing a key: overlap count.
    * `minCommon > 1` is the web-scale pushdown: the threshold is applied as
    * a HAVING inside the pair aggregate (partial aggregation still combines
    * map-side), so only pairs with real overlap survive the shuffle readout
    * — on hub-skewed graphs the 1-common-neighbor tail is the bulk of the
    * O(Σd²) output.
    */
  private def pairOverlap(kv: DataFrame, minCommon: Long = 1L): DataFrame = {
    // explicit fixed-width repartition on the join key: the wedge join
    // EXPANDS each key to deg(key)² rows AFTER the exchange, so AQE — which
    // coalesces on the tiny pre-join input bytes — would funnel the whole
    // quadratic expansion through one or two tasks (StageProbe: 17 tasks /
    // 10 s for q_topk_jaccard before, full parallelism after)
    val nPart = kv.sparkSession.sparkContext.defaultParallelism
    val a = kv.select(col("key"), col("v").as("a")).repartition(nPart, col("key"))
    val b = kv.select(col("key"), col("v").as("b"))
    val agg = a.join(b, Seq("key")).where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    if (minCommon > 1L) agg.where(col("common") >= minCommon) else agg
  }

  /** Per-vertex top-k restriction of a symmetric pair-similarity frame
    * (a, b, score) — the kNN-graph builder for the web path: each vertex
    * keeps its k highest-scoring partners (both roles), ties broken by
    * partner id. The window is partitioned per vertex (≤ candidate-partner
    * rows per key, never global). Output (v, u, <scoreCol>).
    */
  def topKSimilar(pairs: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val sym = pairs.select(col("a").as("v"), col("b").as("u"), col(scoreCol))
      .union(pairs.select(col("b").as("v"), col("a").as("u"), col(scoreCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("v").orderBy(col(scoreCol).desc, col("u"))
    sym.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k).drop("__rn")
  }

  /** Jaccard similarity of neighbor sets for pairs with >=1 common neighbor
    * (`graphobject.c:14247`). Neighbor sets on the undirected simple view.
    */
  def similarityJaccard(g: LinkGraph, minCommon: Long = 1L): DataFrame = {
    val e = g.bidirected.where(col("src") =!= col("dst")).select("src", "dst").distinct()
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val common = pairOverlap(e.select(col("dst").as("key"), col("src").as("v")), minCommon)
    common
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "dega"), Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "degb"), Seq("b"))
      .select(col("a"), col("b"),
        (col("common") / (col("dega") + col("degb") - col("common"))).as("jaccard"))
  }

  /** Dice similarity: 2|A∩B| / (|A|+|B|) (`graphobject.c:14203`). */
  def similarityDice(g: LinkGraph, minCommon: Long = 1L): DataFrame = {
    val e = g.bidirected.where(col("src") =!= col("dst")).select("src", "dst").distinct()
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val common = pairOverlap(e.select(col("dst").as("key"), col("src").as("v")), minCommon)
    common
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "dega"), Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "degb"), Seq("b"))
      .select(col("a"), col("b"),
        (lit(2.0) * col("common") / (col("dega") + col("degb"))).as("dice"))
  }

  /** Adamic-Adar-style inverse-log-weighted similarity
    * (`similarity_inverse_log_weighted`, `graphobject.c:14229` — "the best
    * of the three" for hub-skewed webgraphs): each common neighbor u
    * contributes 1/ln(deg(u)), so ubiquitous hubs count less.
    * Pairs (a < b) with >= 1 common neighbor on the undirected simple view.
    * Degree-1 vertices can never be common neighbors, so ln(deg) > 0.
    */
  def similarityInverseLogWeighted(g: LinkGraph, minCommon: Long = 1L): DataFrame = {
    val e = g.bidirected.where(col("src") =!= col("dst")).select("src", "dst").distinct()
    val deg = e.groupBy(col("src").as("u")).agg(count(lit(1)).as("deg"))
    // fixed-width repartition on the wedge key — same post-join-expansion
    // rationale as pairOverlap
    val au = e.select(col("src").as("a"), col("dst").as("u"))
      .repartition(e.sparkSession.sparkContext.defaultParallelism, col("u"))
    val bu = e.select(col("src").as("b"), col("dst").as("u"))
    val agg = au.join(bu, Seq("u")).where(col("a") < col("b"))
      .join(deg, Seq("u"))
      .groupBy("a", "b").agg(sum(lit(1.0) / log(col("deg").cast("double"))).as("ilw"),
        count(lit(1)).as("__common"))
    (if (minCommon > 1L) agg.where(col("__common") >= minCommon) else agg).drop("__common")
  }

  /** k-hop neighborhood size per vertex (vertex itself included, as the
    * reference does — `graphobject.c:13719-13774`, goldens
    * `test_structural.py:493-495`). `mindist` excludes vertices closer than
    * that. Implemented as `order` rounds of frontier self-joins with distinct.
    */
  def neighborhoodSize(g: LinkGraph, order: Int, mindist: Int = 0): DataFrame = {
    val adj = g.bidirected.select(col("src").as("v"), col("dst").as("nbr")).distinct()
    // reach: (origin, v, dist) minimal distance, BFS by rounds
    var reach = g.vertices.select(col("id").as("origin"), col("id").as("v"), lit(0).as("dist"))
    var frontier = reach
    val nPart = g.spark.sparkContext.defaultParallelism
    for (k <- 1 to order) {
      // fixed-width repartition: the hub-expansion happens AFTER the
      // exchange, so AQE's byte-based coalescing would serialize it
      val next = frontier.repartition(nPart, col("v")).join(adj, Seq("v"))
        .select(col("origin"), col("nbr").as("v"), lit(k).as("dist"))
        .join(reach.select("origin", "v").withColumn("seen", lit(1)), Seq("origin", "v"), "left_anti")
        .distinct()
      reach = reach.union(next).transform(graft.core.Lineage.cut)
      frontier = next
    }
    g.vertices.select(col("id")).join(
      reach.where(col("dist") >= mindist)
        .groupBy(col("origin").as("id")).agg(count(lit(1)).as("size")),
      Seq("id"), "left"
    ).select(col("id"), coalesce(col("size"), lit(0L)).as("size"))
  }

  /** Dyad census (mutual, asymmetric, null) — `graphobject.c:14342`.
    * Over distinct non-loop arcs of a directed graph.
    */
  def dyadCensus(g: LinkGraph): (Long, Long, Long) = {
    require(g.directed, "dyad census needs a directed graph")
    val e = g.weighted.where(col("src") =!= col("dst")).select("src", "dst").distinct()
    val pairs = e.select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("dirs"))
    val mut = pairs.where(col("dirs") === 2).count()
    val asym = pairs.where(col("dirs") === 1).count()
    val n = g.vcount()
    val nul = n * (n - 1) / 2 - mut - asym
    (mut, asym, nul)
  }

  /** Degree assortativity (`graphobject.c:13027-13091`, `assortativity_degree`
    * with the default degree-minus-one convention): Pearson correlation of
    * (deg(src)-1, deg(dst)-1) over the bidirected edge view — one `corr`
    * aggregate after two degree joins.
    */
  def assortativityDegree(g: LinkGraph): Double = {
    val deg = degrees(g, Mode.All, loops = false)
    val e = g.bidirected.where(col("src") =!= col("dst")).select("src", "dst")
    val joined = e
      .join(deg.select(col("id").as("src"), (col("degree") - 1).as("ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), (col("degree") - 1).as("dd")), Seq("dst"))
    joined.agg(corr(col("ds").cast("double"), col("dd").cast("double"))).head.getDouble(0)
  }

  /** General numeric assortativity (`Graph.assortativity(types1, types2,
    * directed)`, `graphobject.c:3705-3737`): Pearson correlation of the
    * numeric values at the two ends of every edge. `values`: (id, v).
    * Directed + directed=true: x = values(src), y = values2-or-values(dst);
    * otherwise each edge counts in both orientations (the reference
    * requires types2 = NULL for the undirected case, mirrored here).
    * One `corr` aggregate after two value joins — same plan shape as
    * [[assortativityDegree]], which equals this with values = degree-1.
    */
  def assortativity(g: LinkGraph, values: DataFrame,
                    values2: Option[DataFrame] = None,
                    directed: Boolean = true): Double = {
    val dir = g.directed && directed
    require(dir || values2.isEmpty,
      "assortativity: values2 requires a directed graph with directed=true (reference parity)")
    val v1 = values.select(col(values.columns(0)).as("id"),
      col(values.columns(1)).cast("double").as("vx"))
    val s2 = values2.getOrElse(values)
    val v2 = s2.select(col(s2.columns(0)).as("id"),
      col(s2.columns(1)).cast("double").as("vy"))
    val e = (if (dir) g.weighted else g.bidirected).select("src", "dst")
    e.join(v1.withColumnRenamed("id", "src"), Seq("src"))
      .join(v2.withColumnRenamed("id", "dst"), Seq("dst"))
      .agg(corr(col("vx"), col("vy"))).head.getDouble(0)
  }

  // ---- set operations (operators.py:13-451; `graphobject.c:15513-15521`) --

  /** Edge set for the set operators: undirected edges are canonicalized to
    * (min, max) first so (u,v) and (v,u) are the same edge across operands
    * (the reference's undirected semantics, `operators.py:261-451`).
    */
  private def setOpEdges(g: LinkGraph): DataFrame = {
    val e = g.weighted.select("src", "dst")
    (if (g.directed) e
     else e.select(least(col("src"), col("dst")).as("src"),
       greatest(col("src"), col("dst")).as("dst"))).distinct()
  }

  /** Edge-set union of two graphs over a shared id space. */
  def union(a: LinkGraph, b: LinkGraph): LinkGraph =
    LinkGraph(setOpEdges(a).union(setOpEdges(b)).distinct(),
      a.directed, maxN(a, b))

  def intersection(a: LinkGraph, b: LinkGraph): LinkGraph =
    LinkGraph(setOpEdges(a).intersect(setOpEdges(b)), a.directed, maxN(a, b))

  def difference(a: LinkGraph, b: LinkGraph): LinkGraph =
    LinkGraph(setOpEdges(a).except(setOpEdges(b)), a.directed, a.numVertices)

  /** Disjoint union: b's ids offset by a.n (`operators.py:13-81`). */
  def disjointUnion(a: LinkGraph, b: LinkGraph): LinkGraph = {
    val offset = a.vcount()
    val bShift = b.weighted.select((col("src") + offset).as("src"), (col("dst") + offset).as("dst"), col("weight"))
    LinkGraph(a.weighted.union(bShift), a.directed, Some(offset + b.vcount()))
  }

  private def maxN(a: LinkGraph, b: LinkGraph): Option[Long] =
    (a.numVertices, b.numVertices) match {
      case (Some(x), Some(y)) => Some(math.max(x, y))
      case _                  => None
    }

  /** Dense relabeling of an arbitrary label column to 0..k-1, ordered by the
    * smallest member vertex id — the canonical reindex used by the
    * reference's membership comparisons (`test_decomposition.py:175-188`).
    * Input: (id, label); output: (id, label) with dense labels.
    */
  def canonicalizeMembership(membership: DataFrame,
                             smallThreshold: Long = 8000000L): DataFrame = {
    val labelCol = membership.columns.filter(_ != "id").head
    val m0 = membership.select(col("id"), col(labelCol).cast("long").as("label"))
    // materialize the (vertex-sized) membership once: both paths below need
    // it twice (gate count + renumber), and the community queries hand us
    // uncut kernel/loop output
    val m = Lineage.cut(m0)
    // gated driver renumber (same posture as the WCC/Louvain small paths):
    // the full distributed renumber below costs ~8 scheduled jobs
    // (aggregate + assignDense's distinct/sort/counts/emit + two joins) —
    // pure per-job overhead on a kernel-gated membership that fits in one
    // task. Labels are renumbered to the dense rank of their minimum member
    // id, ascending — byte-identical to the assignDense path.
    if (m.count() <= smallThreshold) {
      val spark = m.sparkSession
      import spark.implicits._
      val rows = m.collect() // cache-read of the cut state, not a recompute
      val minId = new java.util.HashMap[Long, Long]()
      rows.foreach { r =>
        val l = r.getLong(1)
        val id = r.getLong(0)
        val cur = minId.getOrDefault(l, Long.MaxValue)
        if (id < cur) minId.put(l, id)
      }
      val sorted = minId.values().stream().mapToLong(_.longValue()).sorted().toArray
      val rank = new java.util.HashMap[Long, Long]()
      var i = 0
      while (i < sorted.length) { rank.put(sorted(i), i.toLong); i += 1 }
      return spark.createDataset(spark.sparkContext.parallelize(
        rows.toSeq.map(r => (r.getLong(0), rank.get(minId.get(r.getLong(1))))),
        spark.sparkContext.defaultParallelism)).toDF("id", "label")
    }
    // distinct labels can be O(n) (e.g. WCC on a web graph): dense-rank them
    // with the range-partitioned assigner, never a single-partition Window
    val firstSeen = m.groupBy("label").agg(min("id").as("first_id"))
    val relabel = Ids.assignDense(firstSeen.select(col("first_id")), "first_id")
      .select(col("first_id"), col("id").as("new_label"))
    m.join(firstSeen, Seq("label")).join(relabel, Seq("first_id"))
      .select(col("id"), col("new_label").cast("long").as("label"))
  }
}
