package graft.ops

import graft.algos.Components
import graft.core.{GraphOps, LinkGraph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Assorted P2 operators: line graph, matrix views, power-law fit, random
  * walk, bridges.
  */
object Extras {

  /** `feedback_arc_set` — distributed approximation (`graphobject.c:
    * 4833-4871`; the reference's default is the Eades-Lin-Smyth GR
    * heuristic, shipped as [[feedbackArcSetEades]]): rank vertices by
    * in-degree − out-degree ascending (hubs with net out-flow first, ties
    * by id) using the partition-offset dense rank (no global window); the
    * FAS is every arc pointing backward in that order, plus all
    * self-loops. Removing the returned arcs leaves a DAG BY CONSTRUCTION
    * (backward arcs of any total order), so acyclicity — the contract —
    * holds at any scale; the degree-delta order is what keeps the set
    * small on hub-skewed web graphs. Three joins + two aggregates.
    */
  def feedbackArcSet(g: LinkGraph): DataFrame = {
    require(g.directed, "feedback_arc_set requires a directed graph")
    val e = g.weighted
    val outd = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("od"))
    val ind = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("ideg"))
    val score = g.vertices
      .join(outd, Seq("id"), "left").join(ind, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("ideg"), lit(0L)) - coalesce(col("od"), lit(0L))).as("delta"))
    val ranked = graft.core.Ids
      .assignDense(score.select(struct(col("delta"), col("id")).as("k")), "k")
      .select(col("k.id").as("vid"), col("id").as("pos"))
    e.select(col("src"), col("dst"))
      .join(ranked.select(col("vid").as("src"), col("pos").as("ps")), Seq("src"))
      .join(ranked.select(col("vid").as("dst"), col("pos").as("pd")), Seq("dst"))
      .where(col("ps") > col("pd") || col("src") === col("dst"))
      .select(col("src"), col("dst"))
  }

  /** Eades-Lin-Smyth GR heuristic (the reference's `method="eades"`
    * default): repeatedly strip sinks (prepend) and sources (append), else
    * remove the max (out − in) vertex; the FAS is the backward arcs of the
    * resulting order (≤ m/2 − n/6 non-loop arcs, the GR guarantee) plus
    * self-loops. Sequential by nature — require-gated driver kernel like
    * [[graft.algos.Flow]]; at scale use [[feedbackArcSet]].
    */
  def feedbackArcSetEades(g: LinkGraph, maxKernelVertices: Long = 200000L): DataFrame = {
    require(g.directed, "feedback_arc_set requires a directed graph")
    val spark = g.spark
    import spark.implicits._
    val n = g.vcount()
    require(n <= maxKernelVertices,
      s"Eades FAS kernel capped at $maxKernelVertices vertices ($n given); use feedbackArcSet")
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val arcs = g.weighted.select("src", "dst").collect()
      .map(r => (idx(r.getLong(0)), idx(r.getLong(1))))
    val loops = arcs.filter(a => a._1 == a._2)
    val plain = arcs.filter(a => a._1 != a._2)
    val nn = ids.length
    val outAdj = Array.fill(nn)(List.empty[Int])
    val inAdj = Array.fill(nn)(List.empty[Int])
    plain.foreach { case (u, v) => outAdj(u) ::= v; inAdj(v) ::= u }
    val outDeg = outAdj.map(_.size)
    val inDeg = inAdj.map(_.size)
    val removed = new Array[Boolean](nn)
    // lazy-deletion priority queues; deterministic ties by smaller id
    val ord = Ordering.by[(Int, Int), (Int, Int)] { case (d, v) => (d, -v) }
    val maxPQ = scala.collection.mutable.PriorityQueue.empty[(Int, Int)](ord)
    val sinkQ = scala.collection.mutable.Queue.empty[Int]
    val sourceQ = scala.collection.mutable.Queue.empty[Int]
    for (v <- 0 until nn) {
      maxPQ.enqueue((outDeg(v) - inDeg(v), v))
      if (outDeg(v) == 0) sinkQ += v
      else if (inDeg(v) == 0) sourceQ += v
    }
    val s1 = scala.collection.mutable.ArrayBuffer.empty[Int]
    val s2 = scala.collection.mutable.ListBuffer.empty[Int] // prepended
    var remaining = nn
    def drop(v: Int): Unit = {
      removed(v) = true; remaining -= 1
      outAdj(v).foreach { u =>
        if (!removed(u)) {
          inDeg(u) -= 1
          maxPQ.enqueue((outDeg(u) - inDeg(u), u))
          if (inDeg(u) == 0 && outDeg(u) > 0) sourceQ += u
        }
      }
      inAdj(v).foreach { w =>
        if (!removed(w)) {
          outDeg(w) -= 1
          maxPQ.enqueue((outDeg(w) - inDeg(w), w))
          if (outDeg(w) == 0) sinkQ += w
        }
      }
    }
    while (remaining > 0) {
      var acted = false
      while (sinkQ.nonEmpty) {
        val v = sinkQ.dequeue()
        if (!removed(v) && outDeg(v) == 0) { v +=: s2; drop(v); acted = true }
      }
      while (sourceQ.nonEmpty) {
        val v = sourceQ.dequeue()
        if (!removed(v) && inDeg(v) == 0 && outDeg(v) > 0) { s1 += v; drop(v); acted = true }
      }
      if (!acted && remaining > 0) {
        var done = false
        while (!done && maxPQ.nonEmpty) {
          val (d, v) = maxPQ.dequeue()
          if (!removed(v) && d == outDeg(v) - inDeg(v)) { s1 += v; drop(v); done = true }
        }
      }
    }
    val pos = new Array[Int](nn)
    (s1 ++ s2).zipWithIndex.foreach { case (v, p) => pos(v) = p }
    val fas = plain.filter { case (u, v) => pos(u) > pos(v) } ++ loops
    fas.toSeq.map { case (u, v) => (ids(u), ids(v)) }.toDF("src", "dst")
  }

  /** Per-edge multiplicity predicates — `is_loop` / `is_multiple` /
    * `count_multiple` (`graphobject.c:12299-12330`): one row per edge
    * instance with its endpoint pair's multiplicity (undirected pairs
    * canonicalized least/greatest first, like the reference counts (u,v)
    * and (v,u) together). One groupBy + one join back on the pair key.
    */
  def edgeMultiplicity(g: LinkGraph): DataFrame = {
    val e = g.weighted.select(col("src"), col("dst"))
    val keyed =
      if (g.directed) e.select(col("src"), col("dst"), col("src").as("ka"), col("dst").as("kb"))
      else e.select(col("src"), col("dst"),
        least(col("src"), col("dst")).as("ka"), greatest(col("src"), col("dst")).as("kb"))
    val counts = keyed.groupBy("ka", "kb").agg(count(lit(1)).as("cnt"))
    keyed.join(counts, Seq("ka", "kb"))
      .select(col("src"), col("dst"),
        (col("src") === col("dst")).cast("long").as("is_loop"),
        col("cnt").as("count_multiple"),
        (col("cnt") > 1).cast("long").as("is_multiple"))
  }

  /** Line graph L(G): vertices of L = edges of G (dense edge ids assigned by
    * deterministic (src, dst) order), edges of L connect G-edges sharing an
    * endpoint (`graphobject.c:13687`; goldens `test_structural.py:570-581`).
    * Classic self-join on the shared endpoint.
    */
  def lineGraph(g: LinkGraph): LinkGraph = {
    // dense edge ids in (src, dst) order via the range-partitioned assigner
    // (Ids.assignDense): a row_number over a global Window would collapse the
    // whole edge table into one partition — guaranteed OOM at web scale
    val eid = graft.core.Ids.assignDense(
      g.weighted.select(struct(col("src"), col("dst")).as("sd")), "sd")
      .select(col("id").as("eid"), col("sd.src").as("src"), col("sd.dst").as("dst"))
    // undirected semantics: two edges adjacent iff they share any endpoint
    val ends = eid.select(col("eid"), explode(array(col("src"), col("dst"))).as("v")).distinct()
      // fixed-width repartition on the shared endpoint: the self-join
      // expands each vertex to deg² incident-edge pairs AFTER the exchange,
      // so AQE's byte-based coalescing would serialize the expansion
      .repartition(g.spark.sparkContext.defaultParallelism, col("v"))
    val adj = ends.alias("x").join(ends.alias("y"), Seq("v"))
      .where(col("x.eid") < col("y.eid"))
      .select(col("x.eid").as("src"), col("y.eid").as("dst"))
      .distinct()
    LinkGraph(adj, directed = false, Some(eid.count()))
  }

  /** `Weighted_Adjacency` (`graphobject.c:12979`): COO matrix
    * (row, col, value) -> weighted graph; zero cells drop.
    */
  def weightedAdjacency(coo: DataFrame, directed: Boolean = true): LinkGraph =
    LinkGraph(coo.select(col("row").as("src"), col("col").as("dst"),
      col("value").cast("double").as("weight")).where(col("weight") =!= 0.0),
      directed, None)

  /** `Graph.Incidence`/`Bipartite` (`graphobject.c:12647`,
    * `__init__.py:3229-3340`): incidence COO (row, col) -> bipartite graph;
    * rows are vertices 0..n1-1 (type 0), columns n1..n1+n2-1 (type 1).
    * @return (graph, (id, type))
    */
  def bipartiteFromIncidence(coo: DataFrame, n1: Long, n2: Long): (LinkGraph, DataFrame) = {
    val spark = coo.sparkSession
    val e = coo.select(col("row").as("src"), (col("col") + n1).as("dst"))
    val types = spark.range(n1 + n2).select(col("id"), (col("id") >= n1).cast("int").as("type"))
    (LinkGraph(e, directed = false, Some(n1 + n2)), types)
  }

  /** `get_incidence` (`graphobject.c:14817`): bipartite graph + (id, type)
    * back to the (row, col) incidence COO, sides ranked independently.
    */
  def getIncidence(g: LinkGraph, types: DataFrame): DataFrame = {
    def side(t: Int, as: String) = graft.core.Ids.assignDense(
      types.where(col("type") === t).select(col("id").as("vid")), "vid")
      .select(col("vid"), col("id").as(as))
    val s0 = side(0, "row")
    val s1 = side(1, "col")
    val e = g.bidirected.select(col("src"), col("dst"))
    e.join(s0.withColumnRenamed("vid", "src"), Seq("src"))
      .join(s1.withColumnRenamed("vid", "dst"), Seq("dst"))
      .select("row", "col").distinct()
  }

  /** Sparse adjacency view in COO form (the edge table IS the matrix):
    * (row, col, value) with multi-edges collapsed by sum
    * (`get_adjacency`, `__init__.py:653-754`; `get_adjacency_sparse` is
    * the same data as a scipy CSR — COO is this engine's sparse form).
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

  /** Discrete-data power-law MLE over the degree distribution: the
    * Clauset-Shalizi-Newman discrete approximation
    * alpha-hat = 1 + n / sum ln(x_i / (xmin - 0.5)) — the right estimator for
    * integer degrees and the reference's discrete plfit path (`continuous`
    * switches to the continuous-data formula ln(x_i / xmin), the reference's
    * `force_continuous`). Computed from the (small) degree histogram
    * collected to the driver — `power_law_fit` (`statistics.py:21-106`).
    */
  final case class PowerLawFit(alpha: Double, xmin: Double, n: Long)

  def powerLawFit(g: LinkGraph, xmin: Double = 1.0, continuous: Boolean = false): PowerLawFit = {
    val hist = GraphOps.degreeDistribution(g).collect()
      .map(r => (r.getLong(0).toDouble, r.getLong(1)))
      .filter(_._1 >= xmin)
    val n = hist.map(_._2).sum
    val x0 = if (continuous) xmin else xmin - 0.5
    val s = hist.map { case (x, c) => c * math.log(x / x0) }.sum
    PowerLawFit(1.0 + n / s, xmin, n)
  }

  /** Batched multi-walk sampling: N seeded walks advance together, ONE
    * adjacency join per step for ALL walkers (node2vec-style corpus
    * sampling) — the per-step job count is independent of the number of
    * walkers. State is (walk_id, cur, path); adjacency is pre-grouped into
    * sorted neighbor arrays (one row per source — the CSR-row analog), so
    * each step is a single equi-join + codegen'd `element_at` pick.
    * Stuck walkers (no out-neighbors) halt in place, like the reference's
    * `stuck="return"` (`graphobject.c:16176-16190`).
    *
    * @param starts (walk_id: Long, start: Long)
    * @return (walk_id, path: array<long>) — path[0] is the start vertex;
    *         length <= steps+1 (shorter iff the walker got stuck).
    */
  def randomWalks(g: LinkGraph, starts: DataFrame, steps: Int, seed: Long = 42L): DataFrame = {
    val adjList = g.outView.select("src", "dst")
      .groupBy("src").agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .persist()
    var state = starts.select(col("walk_id").cast("long").as("walk_id"),
      col("start").cast("long").as("cur"), array(col("start").cast("long")).as("path"))
      .transform(graft.core.Lineage.cut)
    for (k <- 0 until steps) {
      // partition-stable seeded pick: hash(seed, step, walker) % out-degree
      val pick = (pmod(xxhash64(lit(seed), lit(k), col("walk_id")), size(col("nbrs")).cast("long")) + 1).cast("int")
      state = state.join(adjList, state("cur") === adjList("src"), "left")
        .select(col("walk_id"),
          when(col("nbrs").isNull, col("cur")).otherwise(element_at(col("nbrs"), pick)).as("cur"),
          when(col("nbrs").isNull, col("path"))
            .otherwise(concat(col("path"), array(element_at(col("nbrs"), pick)))).as("path"))
        .transform(graft.core.Lineage.cut)
    }
    adjList.unpersist()
    state.select("walk_id", "path")
  }

  /** Seeded random walk from `start`: deterministic pure-hash choice among
    * out-neighbors per step (`graphobject.c:16176-16190` — the reference
    * routes RNG through Python; we route it through splitmix64(seed, step)).
    * Driver-side loop over point lookups — the igraph-parity single-walk
    * API; the pipeline operator for walk corpora is [[randomWalks]].
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
    *
    * Fully distributed, zero driver-side edge collection:
    *  1. BFS spanning forest from each component's min-id root (one frontier
    *     join per level — levels = graph eccentricity, small on web graphs).
    *  2. Every NON-tree edge copy gets a deterministic 64-bit tag
    *     `xxhash64(u, v, copy)`; each endpoint XOR-accumulates the tags of
    *     its incident non-tree copies.
    *  3. One upward sweep per tree level folds child subtree-XORs into
    *     parents (`bit_xor` aggregate).
    *  4. A tree edge (parent, c) is a bridge iff subtree-XOR(c) == 0: a
    *     non-tree edge crossing the cut contributes its tag once (nonzero);
    *     one with both endpoints inside contributes twice (cancels). The
    *     only error mode is a 2^-64 tag collision — deterministic given the
    *     seed, negligible, and the standard cut-sampling trick.
    *
    * Parallel edges are handled naturally: the surplus copies of a tree edge
    * are non-tree copies covering exactly that edge, so a multi-edge is
    * never reported as a bridge (matching the reference's multigraph
    * semantics — ADVICE r01). Self-loops are dropped (never bridges).
    */
  def bridges(g: LinkGraph, md5Tags: Boolean = false, smallThreshold: Long = 8000000L): DataFrame = {
    import graft.core.Lineage
    val spark = g.spark
    // canonical undirected non-loop copies with multiplicity
    val mult = g.weighted.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("mult"))
      .transform(Lineage.cut)
    if (mult.isEmpty)
      return spark.range(0).select(col("id").as("src"), col("id").as("dst")).limit(0)

    // gated driver kernel (the WCC/blocksDF posture): a bridge is exactly a
    // SINGLETON biconnected block whose pair multiplicity is 1 (a doubled
    // edge closes a 2-cycle and can never be a bridge), so the shared
    // Hopcroft-Tarjan edge-block kernel answers bridges directly when the
    // canonical edge set fits in one task. Above the gate the distributed
    // XOR-tag sweep below is unchanged (pinned by the smallThreshold=0
    // parity spec).
    if (mult.count() <= smallThreshold) {
      import spark.implicits._
      val rows = mult.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val es = rows.map(r => (r._1, r._2))
      val vs = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val (blockRows, _) = graft.algos.Biconnected.tarjanEdgeBlocks(es, vs)
      val blockSize = blockRows.groupBy(_._3).map { case (b, rs) => b -> rs.length }
      val multOf = rows.map(r => (r._1, r._2) -> r._3).toMap
      val out = blockRows
        .filter(r => blockSize(r._3) == 1 && multOf((r._1, r._2)) == 1L)
        .map(r => (r._1, r._2)).sorted
      return spark.createDataset(spark.sparkContext.parallelize(
        out.toSeq, math.max(1, spark.sparkContext.defaultParallelism / 4)))
        .toDF("src", "dst")
    }

    val adj = mult.select(col("u").as("a"), col("v").as("b"))
      .union(mult.select(col("v").as("a"), col("u").as("b")))
      .repartition(col("a")).persist()
    adj.count()

    // --- 1. BFS forest from per-component min-id roots -----------------
    val und = LinkGraph(mult.select(col("u").as("src"), col("v").as("dst")), directed = false, g.numVertices)
    val comp = Components.wcc(und) // (id, comp) with comp = min member id
    var visited = comp.where(col("id") === col("comp"))
      .select(col("id").as("v"), lit(-1L).as("parent"), lit(0).as("depth"))
      .transform(Lineage.cut)
    var frontier = visited
    var d = 0
    var growing = true
    while (growing) {
      d += 1
      val next = frontier.select(col("v").as("a"))
        .join(adj, Seq("a"))
        .groupBy(col("b").as("v")).agg(min(col("a")).as("parent"))
        .join(visited.select("v"), Seq("v"), "left_anti")
        .select(col("v"), col("parent"), lit(d).as("depth"))
        .transform(Lineage.cut)
      if (next.isEmpty) growing = false
      else { visited = visited.union(next).transform(Lineage.cut); frontier = next }
    }
    adj.unpersist()
    val maxDepth = d - 1

    // --- 2. tag non-tree copies, XOR per endpoint ----------------------
    val treeCanon = visited.where(col("parent") =!= -1L)
      .select(least(col("v"), col("parent")).as("u"), greatest(col("v"), col("parent")).as("v"),
        lit(1L).as("tree"))
    val withTree = mult.join(treeCanon, Seq("u", "v"), "left")
      .select(col("u"), col("v"), (col("mult") - coalesce(col("tree"), lit(0L))).as("copies"))
      .where(col("copies") > 0)
    // md5Tags: 60-bit tags from md5 hex (engine-portable — the q_bridges
    // DuckDB oracle recomputes the identical values); default xxhash64.
    val tagExpr =
      if (md5Tags) conv(substring(md5(concat_ws("_", col("u"), col("v"), col("k"))), 1, 15), 16, 10).cast("long")
      else xxhash64(col("u"), col("v"), col("k"))
    val tagged = withTree
      .select(col("u"), col("v"), explode(sequence(lit(1L), col("copies"))).as("k"))
      .select(col("u"), col("v"), tagExpr.as("tag"))
    val xPerVertex = tagged.select(col("u").as("v"), col("tag"))
      .union(tagged.select(col("v"), col("tag")))
      .groupBy("v").agg(expr("bit_xor(tag)").as("x"))

    // --- 3. upward subtree-XOR sweep, deepest level first --------------
    var sub = visited.join(xPerVertex, Seq("v"), "left")
      .select(col("v"), col("parent"), col("depth"), coalesce(col("x"), lit(0L)).as("acc"))
      .transform(Lineage.cut)
    for (dd <- maxDepth to 1 by -1) {
      val up = sub.where(col("depth") === dd)
        .groupBy(col("parent").as("v")).agg(expr("bit_xor(acc)").as("inc"))
      sub = sub.join(up, Seq("v"), "left")
        .select(col("v"), col("parent"), col("depth"),
          col("acc").bitwiseXOR(coalesce(col("inc"), lit(0L))).as("acc"))
        .transform(Lineage.cut)
    }

    // --- 4. uncovered tree edges are the bridges ------------------------
    sub.where(col("parent") =!= -1L && col("acc") === 0L)
      .select(least(col("v"), col("parent")).as("src"), greatest(col("v"), col("parent")).as("dst"))
  }

  /** The complement is inherently Θ(n²) edges — refuse above this rather
    * than launch a job whose OUTPUT cannot fit anywhere.
    */
  val maxComplementVertices = 65536L

  /** `complementer(loops)` (`graphobject.c:9846`; goldens
    * `test_operators.py:12-23`): cross-join of the vertex set minus the
    * existing edges. With `loops = true` (the reference default behavior in
    * its own tests), vertices WITHOUT a self-loop gain one.
    */
  def complementer(g: LinkGraph, loops: Boolean = true): LinkGraph = {
    val n = g.vcount()
    require(n <= maxComplementVertices,
      s"complementer of $n vertices has ~n^2 = ${n * n} edges — refusing above " +
        s"$maxComplementVertices vertices (the output itself is the blow-up)")
    val v = g.vertices
    val pairs =
      if (g.directed)
        v.select(col("id").as("src")).crossJoin(v.select(col("id").as("dst")))
          .where(if (loops) lit(true) else col("src") =!= col("dst"))
      else {
        val base = v.select(col("id").as("src")).crossJoin(v.select(col("id").as("dst")))
          .where(col("src") < col("dst"))
        if (loops) base.union(v.select(col("id").as("src"), col("id").as("dst"))) else base
      }
    val existing =
      if (g.directed) g.weighted.select("src", "dst").distinct()
      else g.weighted.select(
        when(col("src") <= col("dst"), col("src")).otherwise(col("dst")).as("src"),
        when(col("src") <= col("dst"), col("dst")).otherwise(col("src")).as("dst")).distinct()
    LinkGraph(pairs.join(existing, Seq("src", "dst"), "left_anti"), g.directed, Some(n))
  }

  /** `compose(other)` (`graphobject.c:15519`): relational composition —
    * edge (a, c) iff some b has (a, b) ∈ g1 and (b, c) ∈ g2. One
    * distributed join on the shared endpoint; vertex set is the union.
    */
  def compose(g1: LinkGraph, g2: LinkGraph): LinkGraph = {
    val e1 = (if (g1.directed) g1.weighted else g1.bidirected)
      .select(col("src").as("a"), col("dst").as("b"))
    val e2 = (if (g2.directed) g2.weighted else g2.bidirected)
      .select(col("src").as("b"), col("dst").as("c"))
    val directed = g1.directed || g2.directed
    val comp0 = e1.join(e2, Seq("b")).select(col("a").as("src"), col("c").as("dst")).distinct()
    val comp = if (directed) comp0
      else comp0.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst")).distinct()
    val n = math.max(g1.vcount(), g2.vcount())
    LinkGraph(comp, directed, Some(n))
  }

  /** `rewire(n, mode)` (`graphobject.c:13893`; goldens
    * `test_games.py:146-159`): degree-preserving double-edge swaps. A
    * require-gated driver kernel — the swap chain is inherently sequential
    * (each swap conditions on the previous state); seeded for determinism.
    * mode "simple" keeps the graph simple; "loops" additionally allows
    * self-loops.
    */
  /** `to_prufer()` (`graphobject.c:1910`, `igraph_to_prufer`): the Prüfer
    * code of a labeled undirected tree — repeatedly remove the
    * smallest-labeled leaf and record its neighbor (n − 2 entries). A gated
    * driver kernel (the removal chain is sequential; a tree that fits a
    * Prüfer use case is small by definition). Inverse of
    * [[graft.core.Generators.fromPrufer]].
    */
  def toPrufer(g: LinkGraph, maxKernelVertices: Long = 2000000L): Seq[Int] = {
    require(!g.directed && GraphOps.isTree(g), "to_prufer requires an undirected tree")
    val n = g.vcount()
    require(n <= maxKernelVertices,
      s"to_prufer is a driver kernel capped at $maxKernelVertices vertices")
    if (n <= 2) return Seq.empty
    val ni = n.toInt
    val adj = Array.fill(ni)(scala.collection.mutable.Set.empty[Int])
    g.weighted.select("src", "dst").collect().foreach { r =>
      val (a, b) = (r.getLong(0).toInt, r.getLong(1).toInt)
      adj(a) += b; adj(b) += a
    }
    val leaves = scala.collection.mutable.PriorityQueue.empty[Int](Ordering[Int].reverse)
    (0 until ni).foreach(v => if (adj(v).size == 1) leaves.enqueue(v))
    val out = new Array[Int](ni - 2)
    var i = 0
    while (i < ni - 2) {
      val leaf = leaves.dequeue()
      val p = adj(leaf).head
      out(i) = p
      adj(p) -= leaf
      adj(leaf).clear()
      if (adj(p).size == 1) leaves.enqueue(p)
      i += 1
    }
    out.toSeq
  }

  /** `unfold_tree(roots, mode)` (`graphobject.c:9995`,
    * `igraph_unfold_tree`): unfold into a forest by BFS from `roots` —
    * every original edge is kept, but an edge reaching an already-visited
    * vertex points to a FRESH COPY of it, so the result is acyclic with the
    * same edge count. Returns the forest plus the new→old vertex mapping.
    * BFS expansion order is ascending neighbor id (deterministic). Gated
    * driver kernel (sequential visit order); mode = out|in|all.
    */
  def unfoldTree(g: LinkGraph, roots: Seq[Long], mode: String = "out",
                 maxKernelVertices: Long = 2000000L): (LinkGraph, Seq[Long]) = {
    require(Seq("out", "in", "all").contains(mode), s"mode must be out|in|all, got $mode")
    val n = g.vcount()
    require(n <= maxKernelVertices,
      s"unfold_tree is a driver kernel capped at $maxKernelVertices vertices")
    val ni = n.toInt
    val eList = g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt))
    // adjacency as (neighbor, edge-index), respecting mode for directed BFS
    val adj = Array.fill(ni)(scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
    eList.zipWithIndex.foreach { case ((a, b), ei) =>
      if (!g.directed || mode == "all") { adj(a) += ((b, ei)); adj(b) += ((a, ei)) }
      else if (mode == "out") adj(a) += ((b, ei))
      else adj(b) += ((a, ei))
    }
    val visited = new Array[Boolean](ni)
    val order = Array.fill(ni)(Int.MaxValue)
    val treeEdge = new Array[Boolean](eList.length)
    var stamp = 0
    val queue = scala.collection.mutable.Queue.empty[Int]
    def bfs(r: Int): Unit = {
      if (visited(r)) return
      visited(r) = true; order(r) = stamp; stamp += 1
      queue.enqueue(r)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        adj(v).sortBy(identity).foreach { case (u, ei) =>
          if (!visited(u)) {
            visited(u) = true; order(u) = stamp; stamp += 1
            treeEdge(ei) = true
            queue.enqueue(u)
          }
        }
      }
    }
    roots.foreach(r => bfs(r.toInt))
    // components untouched by the given roots are unfolded from their
    // smallest vertex (documented engine semantics; keeps the result a
    // forest regardless of root choice)
    (0 until ni).foreach(bfs)
    val mapping = scala.collection.mutable.ArrayBuffer.tabulate(ni)(_.toLong)
    def copyOf(v: Int): Long = { mapping += v.toLong; (mapping.length - 1).toLong }
    val edges = eList.zipWithIndex.map { case ((a, b), ei) =>
      if (treeEdge(ei)) (a.toLong, b.toLong)
      else if (g.directed && mode == "out") (a.toLong, copyOf(b))
      else if (g.directed && mode == "in") (copyOf(a), b.toLong)
      // undirected / mode=all: duplicate the BFS-later endpoint — the copy
      // is always a fresh leaf, so the result is acyclic
      else if (order(a) <= order(b)) (a.toLong, copyOf(b))
      else (copyOf(a), b.toLong)
    }
    (LinkGraph(g.spark, mapping.length.toLong, edges.toSeq, g.directed), mapping.toSeq)
  }

  /** `rewire_edges(prob, loops=False, multiple=False)`
    * (`graphobject.c:5532`, `igraph_rewire_edges`): each endpoint of each
    * edge is independently replaced by a uniform random vertex with
    * probability `prob`; edge count always preserved.
    *
    * `multiple = true` is FULLY DISTRIBUTED: the coins and replacement
    * targets are pure column expressions of (seed, src, dst) —
    * `xxhash64`-derived, so any parallelism yields the identical graph
    * (parallel duplicate edges rewire identically, documented). When
    * `loops = false`, a rewire that would create a self-loop deterministically
    * shifts the new endpoint by +1 mod n (an O(1/n) non-uniformity in
    * exchange for a collect-free plan). `multiple = false` (the reference
    * default) must maintain global simplicity — each decision conditions on
    * every previous one — so it runs as a require-gated driver kernel with
    * rejection sampling, like [[rewire]].
    */
  def rewireEdges(g: LinkGraph, prob: Double, loops: Boolean = false,
                  multiple: Boolean = false, seed: Long = 42L): LinkGraph = {
    require(prob >= 0.0 && prob <= 1.0, s"prob must be in [0,1], got $prob")
    val n = g.vcount()
    if (prob == 0.0 || n == 0L) return g
    require(loops || n >= 2, "cannot avoid loops with a single vertex")
    if (multiple) {
      val u53 = (c: Column) => shiftrightunsigned(c, 11).cast("double") / 9007199254740992.0
      def coin(slot: Int): Column =
        u53(xxhash64(lit(seed), lit(slot), col("src"), col("dst"))) < prob
      def pick(slot: Int): Column =
        pmod(xxhash64(lit(seed), lit(slot + 100), col("src"), col("dst")), lit(n))
      val e0 = g.weighted
        .withColumn("ns", when(coin(1), pick(1)).otherwise(col("src")))
        .withColumn("nd", when(coin(2), pick(2)).otherwise(col("dst")))
      val fixed =
        if (loops) e0
        else e0.withColumn("nd",
          when(col("ns") === col("nd"), pmod(col("nd") + 1, lit(n))).otherwise(col("nd")))
      LinkGraph(fixed.select(col("ns").as("src"), col("nd").as("dst"), col("weight")),
        g.directed, Some(n))
    } else {
      require(n <= 2000000L && g.ecount() <= 10000000L,
        "rewire_edges(multiple=false) maintains global simplicity — a " +
          "sequential driver kernel capped at 2M vertices / 10M edges; " +
          "pass multiple=true for the distributed path")
      val rnd = new scala.util.Random(seed)
      def norm(e: (Long, Long)): (Long, Long) =
        if (g.directed || e._1 <= e._2) e else (e._2, e._1)
      val edges = g.weighted.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val eset = scala.collection.mutable.Set(edges.map(norm).toSeq: _*)
      val out = edges.map { case (a, b) =>
        var cur = (a, b)
        var slot = 0
        while (slot < 2) {
          if (rnd.nextDouble() < prob) {
            var tries = 0
            var done = false
            while (!done && tries < 100) {
              tries += 1
              val t = rnd.nextLong(n)
              val cand = if (slot == 0) (t, cur._2) else (cur._1, t)
              if ((loops || cand._1 != cand._2) && !eset.contains(norm(cand))) {
                eset -= norm(cur); eset += norm(cand); cur = cand; done = true
              }
            }
          }
          slot += 1
        }
        cur
      }
      LinkGraph(g.spark, n, out.toSeq, g.directed)
    }
  }

  def rewire(g: LinkGraph, trials: Int, mode: String = "simple", seed: Long = 42L): LinkGraph = {
    require(mode == "simple" || mode == "loops", s"rewire mode must be simple|loops, got $mode")
    val n = g.vcount()
    require(n <= 2000000L && g.ecount() <= 10000000L,
      "rewire is a sequential driver kernel — capped at 2M vertices / 10M edges")
    val rnd = new scala.util.Random(seed)
    def norm(g: LinkGraph, e: (Long, Long)): (Long, Long) =
      if (g.directed || e._1 <= e._2) e else (e._2, e._1)
    val edges = scala.collection.mutable.ArrayBuffer(
      g.weighted.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))): _*)
    val eset = scala.collection.mutable.Set(edges.map(e => norm(g, e)).toSeq: _*)
    var i = 0
    while (i < trials && edges.length >= 2) {
      i += 1
      val x = rnd.nextInt(edges.length)
      val y = rnd.nextInt(edges.length)
      if (x != y) {
        val (a, b) = edges(x); val (c, d) = edges(y)
        // swap to (a, d), (c, b) — preserves out/in degrees (and total
        // degrees when undirected)
        val n1 = norm(g, (a, d)); val n2 = norm(g, (c, b))
        val loopOk = mode == "loops" || (a != d && c != b)
        if (loopOk && n1 != n2 && !eset.contains(n1) && !eset.contains(n2)) {
          eset -= norm(g, (a, b)); eset -= norm(g, (c, d))
          eset += n1; eset += n2
          edges(x) = (a, d); edges(y) = (c, b)
        }
      }
    }
    LinkGraph(g.spark, n, edges.toSeq, g.directed)
  }
}
