package graft.algos

import graft.core.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Max-flow / min-cut family: `maxflow(_value)`, `st_mincut`, `mincut
  * (_value)`, `edge_connectivity`/`adhesion`, `vertex_connectivity`/
  * `cohesion`, `gomory_hu_tree` (reference `graphobject.c:15540-15726`,
  * `cut.py:8-188`; goldens `tests/test_flow.py`).
  *
  * These are require-gated DRIVER KERNELS (SURVEY §2.8 excludes the
  * sequential machinery from the distributed scope — augmenting-path flow
  * is inherently sequential; no distributed max-flow with useful guarantees
  * exists at web scale). The gate mirrors [[CommunityKernels]]: collect once
  * under `maxKernelVertices`, run Dinic locally, return DataFrames. At web
  * scale the honest substitutes are [[graft.ops.Extras.bridges]] /
  * [[Biconnected]] for cut structure and min-degree bounds for
  * connectivity; the error message says so.
  *
  * Undirected edges are modeled as two arcs each carrying the full
  * capacity (the standard reduction); capacities come from the graph's
  * weight column when `useWeights`, else 1.0 (unit capacities = edge
  * connectivity).
  */
object Flow {

  val maxKernelVertices = 100000L

  /** Dense local graph for the kernel: arcs with capacity + reverse index. */
  private[algos] final class Net(val n: Int) {
    val head = Array.fill(n)(-1)
    var nxt = new Array[Int](16)
    var to = new Array[Int](16)
    var cap = new Array[Double](16)
    var m = 0
    def addArc(u: Int, v: Int, c: Double): Unit = {
      if (m == nxt.length) {
        nxt = java.util.Arrays.copyOf(nxt, m * 2)
        to = java.util.Arrays.copyOf(to, m * 2)
        cap = java.util.Arrays.copyOf(cap, m * 2)
      }
      nxt(m) = head(u); to(m) = v; cap(m) = c; head(u) = m; m += 1
    }
    /** paired arcs: forward at even index, reverse at odd (rev = idx ^ 1) */
    def addEdge(u: Int, v: Int, c: Double, cRev: Double): Unit = {
      addArc(u, v, c); addArc(v, u, cRev)
    }
  }

  private final case class Collected(ids: Array[Long], idx: Map[Long, Int],
                                     edges: Array[(Int, Int, Double)], directed: Boolean)

  private def collect(g: LinkGraph, useWeights: Boolean): Collected = {
    val n = g.vcount()
    require(n <= maxKernelVertices,
      s"flow kernel capped at $maxKernelVertices vertices ($n given); at web scale use " +
        "bridges/biconnected components for cut structure and degree bounds for connectivity")
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val edges = g.weighted.select("src", "dst", "weight").collect()
      .map(r => (idx(r.getLong(0)), idx(r.getLong(1)),
        if (useWeights) r.getDouble(2) else 1.0))
      .filter(e => e._1 != e._2)
    Collected(ids, idx, edges, g.directed)
  }

  private def buildNet(c: Collected): Net = {
    val net = new Net(c.ids.length)
    c.edges.foreach { case (u, v, w) =>
      if (c.directed) net.addEdge(u, v, w, 0.0) else net.addEdge(u, v, w, w)
    }
    net
  }

  /** Dinic: BFS level graph + blocking DFS; returns max-flow value, mutating
    * `net`'s residual capacities.
    */
  private[algos] def dinic(net: Net, s: Int, t: Int): Double = {
    val n = net.n
    val level = new Array[Int](n)
    val it = new Array[Int](n)
    val q = new Array[Int](n)
    def bfs(): Boolean = {
      java.util.Arrays.fill(level, -1)
      var lo = 0; var hi = 0
      q(hi) = s; hi += 1; level(s) = 0
      while (lo < hi) {
        val u = q(lo); lo += 1
        var e = net.head(u)
        while (e != -1) {
          if (net.cap(e) > 1e-12 && level(net.to(e)) < 0) {
            level(net.to(e)) = level(u) + 1
            q(hi) = net.to(e); hi += 1
          }
          e = net.nxt(e)
        }
      }
      level(t) >= 0
    }
    // blocking flow by ITERATIVE path search (a recursive DFS would blow the
    // stack on deep level graphs — path graphs reach the vertex gate)
    val stack = new Array[Int](n + 1) // arc indices on the current path
    var flow = 0.0
    while (bfs()) {
      var i = 0
      while (i < n) { it(i) = net.head(i); i += 1 }
      var depth = 0
      var u = s
      var done = false
      while (!done) {
        if (u == t) {
          var f = Double.MaxValue
          var k = 0
          while (k < depth) { f = math.min(f, net.cap(stack(k))); k += 1 }
          k = 0
          while (k < depth) {
            net.cap(stack(k)) -= f; net.cap(stack(k) ^ 1) += f; k += 1
          }
          flow += f
          // retreat to just after the first saturated arc
          k = 0
          while (k < depth && net.cap(stack(k)) > 1e-12) k += 1
          depth = k
          u = if (depth == 0) s else net.to(stack(depth - 1))
        } else {
          var e = it(u)
          while (e != -1 && !(net.cap(e) > 1e-12 && level(net.to(e)) == level(u) + 1)) {
            e = net.nxt(e); it(u) = e
          }
          if (e == -1) {
            level(u) = -1 // dead end: prune from this phase's level graph
            if (u == s) done = true
            else {
              depth -= 1
              val back = stack(depth)
              u = if (depth == 0) s else net.to(stack(depth - 1))
              it(u) = net.nxt(back) // skip the arc that led to the dead end
            }
          } else {
            stack(depth) = e; depth += 1; u = net.to(e)
          }
        }
      }
    }
    flow
  }

  /** Residual s-side after a max flow. */
  private[algos] def sSide(net: Net, s: Int): Array[Boolean] = {
    val seen = new Array[Boolean](net.n)
    val q = scala.collection.mutable.Queue(s); seen(s) = true
    while (q.nonEmpty) {
      val u = q.dequeue()
      var e = net.head(u)
      while (e != -1) {
        if (net.cap(e) > 1e-12 && !seen(net.to(e))) { seen(net.to(e)) = true; q += net.to(e) }
        e = net.nxt(e)
      }
    }
    seen
  }

  final case class MaxFlow(value: Double, flow: DataFrame, cutEdges: DataFrame,
                           partition: DataFrame)

  /** `maxflow(s, t, capacity)`: value, per-edge net flow (src -> dst
    * positive), min-cut edges, and the (id, side) partition (side 0 = the
    * residual s-side).
    */
  def maxflow(g: LinkGraph, s: Long, t: Long, useWeights: Boolean = false): MaxFlow = {
    require(s != t, "maxflow requires distinct source and target")
    val spark = g.spark
    import spark.implicits._
    val c = collect(g, useWeights)
    val net = buildNet(c)
    val v = dinic(net, c.idx(s), c.idx(t))
    // net flow per original edge: paired arcs at (2k, 2k+1)
    val flows = c.edges.zipWithIndex.map { case ((u, w, cap0), k) =>
      val f =
        if (c.directed) cap0 - net.cap(2 * k) // = what was pushed forward
        else (net.cap(2 * k + 1) - net.cap(2 * k)) / 2.0 // symmetric init
      (c.ids(u), c.ids(w), f)
    }
    val side = sSide(net, c.idx(s))
    val cut = c.edges.collect {
      case (u, w, _) if side(u) != side(w) && (side(u) || !c.directed) =>
        (c.ids(if (side(u)) u else w), c.ids(if (side(u)) w else u))
    }
    MaxFlow(v,
      flows.toSeq.toDF("src", "dst", "flow"),
      cut.toSeq.toDF("src", "dst"),
      c.ids.map(id => (id, if (side(c.idx(id))) 0 else 1)).toSeq.toDF("id", "side"))
  }

  def maxflowValue(g: LinkGraph, s: Long, t: Long, useWeights: Boolean = false): Double =
    maxflow(g, s, t, useWeights).value

  /** `st_mincut(s, t)` — the same computation viewed as a cut. */
  def stMincut(g: LinkGraph, s: Long, t: Long, useWeights: Boolean = false): MaxFlow =
    maxflow(g, s, t, useWeights)

  /** Global `mincut_value()` / `mincut()`: fix an arbitrary source s; the
    * global min cut separates s from SOME vertex in SOME direction, so it is
    * min over v != s of st(s, v) (and ts(v, s) when directed).
    */
  def mincutValue(g: LinkGraph, useWeights: Boolean = false): Double =
    globalCut(g, useWeights)._1

  def mincut(g: LinkGraph, useWeights: Boolean = false): MaxFlow = {
    val (_, s, t, dir) = globalCut(g, useWeights)
    if (dir) maxflow(g, s, t, useWeights) else maxflow(g, t, s, useWeights)
  }

  /** @return (value, s, v, sIsSource) of the best cut. */
  private def globalCut(g: LinkGraph, useWeights: Boolean): (Double, Long, Long, Boolean) = {
    val c = collect(g, useWeights)
    require(c.ids.length >= 2, "mincut requires at least two vertices")
    val s = 0
    var best = Double.MaxValue
    var bestV = 1
    var bestDir = true
    for (v <- 1 until c.ids.length) {
      val f1 = dinic(buildNet(c), s, v)
      if (f1 < best) { best = f1; bestV = v; bestDir = true }
      if (c.directed) {
        val f2 = dinic(buildNet(c), v, s)
        if (f2 < best) { best = f2; bestV = v; bestDir = false }
      }
    }
    (best, c.ids(s), c.ids(bestV), bestDir)
  }

  /** `edge_connectivity(source, target)` / `adhesion()`: unit capacities. */
  def edgeConnectivity(g: LinkGraph, s: Long = -1L, t: Long = -1L): Long = {
    require((s < 0) == (t < 0), "edge_connectivity needs both endpoints or neither")
    if (s >= 0) math.round(maxflowValue(g, s, t))
    else math.round(mincutValue(g))
  }

  def adhesion(g: LinkGraph): Long = edgeConnectivity(g)

  /** `vertex_connectivity(source, target, neighbors=...)` via node
    * splitting: v -> (v_in, v_out) with a unit arc, graph arcs get infinite
    * capacity. For ADJACENT endpoints vertex connectivity is undefined —
    * `neighbors` mirrors the reference: "error" raises, "negative" returns
    * -1, "nodes" returns the vertex count.
    */
  def vertexConnectivity(g: LinkGraph, s: Long, t: Long,
                         neighbors: String = "error"): Long = {
    val c = collect(g, useWeights = false)
    val si = c.idx(s); val ti = c.idx(t)
    val adjacent = c.edges.exists(e =>
      (e._1 == si && e._2 == ti) || (!c.directed && e._1 == ti && e._2 == si))
    if (adjacent) neighbors match {
      case "nodes"    => return c.ids.length.toLong
      case "negative" => return -1L
      case _ => throw new IllegalArgumentException(
        "vertex_connectivity is undefined for adjacent endpoints (neighbors=\"error\")")
    }
    splitFlow(c, si, ti)
  }

  private def splitFlow(c: Collected, si: Int, ti: Int): Long = {
    val n = c.ids.length
    val inf = 1e18
    val net = new Net(2 * n) // v_in = v, v_out = v + n
    for (v <- 0 until n)
      net.addEdge(v, v + n, if (v == si || v == ti) inf else 1.0, 0.0)
    c.edges.foreach { case (u, v, _) =>
      net.addEdge(u + n, v, inf, 0.0)
      if (!c.directed) net.addEdge(v + n, u, inf, 0.0)
    }
    math.round(dinic(net, si + n, ti))
  }

  /** Global `vertex_connectivity()` / `cohesion()`: min over non-adjacent
    * ordered pairs (complete graphs: n - 1; disconnected: 0 falls out).
    */
  def cohesion(g: LinkGraph): Long = {
    val c = collect(g, useWeights = false)
    val n = c.ids.length
    require(n >= 2, "cohesion requires at least two vertices")
    require(n <= 2000, s"global vertex connectivity is O(n^2) max-flows — capped at 2000 vertices ($n given)")
    val adj = Array.fill(n)(new java.util.BitSet(n))
    c.edges.foreach { case (u, v, _) =>
      adj(u).set(v); if (!c.directed) adj(v).set(u)
    }
    var best = (n - 1).toLong
    for (s <- 0 until n; t <- 0 until n if s != t && !adj(s).get(t)) {
      val f = splitFlow(c, s, t)
      if (f < best) best = f
      if (best == 0) return 0L
    }
    best
  }

  /** All-pairs s-t min-cut values (rows `(s, t, mincut)` with s < t):
    * collects once, runs one Dinic per pair. O(n^2) max-flows, so this is
    * an oracle/validation surface, gated far below the single-flow kernel
    * cap — its purpose is to give the flow family a value-checkable
    * fixture (DuckDB can brute-force min cuts by subset enumeration on a
    * tiny graph, which it cannot do for the at-scale rows-only queries).
    */
  def allPairsMinCut(g: LinkGraph, useWeights: Boolean = false): DataFrame = {
    require(!g.directed, "allPairsMinCut: undirected only (st == ts symmetry)")
    val spark = g.spark
    import spark.implicits._
    val c = collect(g, useWeights)
    val n = c.ids.length
    require(n <= 64,
      s"all-pairs min-cut is O(n^2) max-flows — capped at 64 vertices ($n given)")
    val rows = for { i <- 0 until n; j <- i + 1 until n }
      yield (c.ids(i), c.ids(j), dinic(buildNet(c), i, j))
    rows.toDF("s", "t", "mincut")
  }

  /** All-pairs min-cut values DERIVED from the Gomory-Hu tree: the min
    * edge weight on the unique tree path u..t. By the Gomory-Hu property
    * this must equal [[allPairsMinCut]] on every pair — the
    * `q_gomory_hu_pairs` oracle checks it against DuckDB's independent
    * brute-force subset enumeration, upgrading the tree from a rows-only
    * check to a value-verified one (the tree itself is not unique, so the
    * pairwise cut values are its canonical observable).
    */
  def gomoryHuAllPairs(g: LinkGraph, useWeights: Boolean = false): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val tree = gomoryHu(g, useWeights).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = (tree.map(_._1) ++ tree.map(_._2)).distinct.sorted
    val n = ids.length
    require(n <= 4096, s"gomoryHuAllPairs emits O(n^2) rows — capped at 4096 vertices ($n given)")
    if (n == 0) return Seq.empty[(Long, Long, Double)].toDF("s", "t", "mincut")
    val idx = ids.zipWithIndex.toMap
    val adj = Array.fill(n)(List.empty[(Int, Double)])
    tree.foreach { case (a, b, w) =>
      val u = idx(a); val v = idx(b)
      adj(u) ::= (v, w); adj(v) ::= (u, w)
    }
    val rows = Seq.newBuilder[(Long, Long, Double)]
    for (s <- 0 until n) {
      val minw = Array.fill(n)(-1.0)
      val q = scala.collection.mutable.Queue(s); minw(s) = Double.MaxValue
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj(u).foreach { case (v, w) =>
          if (minw(v) < 0) { minw(v) = math.min(minw(u), w); q += v }
        }
      }
      for (t <- s + 1 until n) rows += ((ids(s), ids(t), minw(t)))
    }
    rows.result().toDF("s", "t", "mincut")
  }

  /** `gomory_hu_tree()` (undirected only, like the reference): Gusfield's
    * algorithm — n-1 max flows, no contraction. Returns tree edges
    * (src, dst, flow); min edge on the tree path u..v equals
    * maxflow_value(u, v) for EVERY pair (validated property in FlowSpec).
    */
  def gomoryHu(g: LinkGraph, useWeights: Boolean = false): DataFrame = {
    require(!g.directed, "gomory_hu_tree requires an undirected graph (reference parity)")
    val spark = g.spark
    import spark.implicits._
    val c = collect(g, useWeights)
    val n = c.ids.length
    if (n == 0) return Seq.empty[(Long, Long, Double)].toDF("src", "dst", "flow")
    val parent = new Array[Int](n)
    val fl = new Array[Double](n)
    for (i <- 1 until n) {
      val net = buildNet(c)
      fl(i) = dinic(net, i, parent(i))
      val side = sSide(net, i)
      for (j <- i + 1 until n)
        if (side(j) && parent(j) == parent(i)) parent(j) = i
    }
    (1 until n).map(i => (c.ids(i), c.ids(parent(i)), fl(i))).toDF("src", "dst", "flow")
  }
}
