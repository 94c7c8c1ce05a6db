package graft.algos

import graft.core.LinkGraph
import org.apache.spark.sql.DataFrame

/** Vertex separators + cohesive blocking (`graphobject.c:15575-15726`;
  * goldens `tests/test_separators.py`, `test_decomposition.py:485-554`,
  * `test_flow.py:136-196`). Require-gated DRIVER KERNELS (SURVEY §2.8):
  * the graph is collected once, everything below runs on local adjacency
  * bitsets with [[Flow]]'s Dinic for the connectivity subcalls.
  *
  *  - `all_minimal_st_separators`: Berry–Bordat generation — seed with the
  *    component neighborhoods of every `G − N[v]`, close under the
  *    "substitute a vertex of S by a component neighborhood of
  *    G − (S ∪ N[x])" rule.
  *  - `minimum_size_separators`: every minimum-size separator is a minimal
  *    separator, so filter the Berry–Bordat set to the minimum size (which
  *    equals the vertex connectivity — asserted by the reference's own
  *    equivalence test).
  *  - `cohesive_blocks`: Moody–White recursion — per block compute
  *    cohesion, split on every minimum-size separator, keep blocks not
  *    contained in an equally-or-more-cohesive other block.
  *  - `all_st_cuts` / `all_st_mincuts`: enumeration of minimal directed
  *    edge cuts (membership + cut edges + value), brute-over-subsets with
  *    a minimality check under a tight vertex gate.
  */
object Separators {

  val maxKernelVertices = 5000L

  private final case class L(n: Int, ids: Array[Long], idx: Map[Long, Int],
                             adj: Array[java.util.BitSet])

  private def collect(g: LinkGraph): L = {
    val n0 = g.vcount()
    require(n0 <= maxKernelVertices,
      s"separator kernels capped at $maxKernelVertices vertices ($n0 given)")
    val n = n0.toInt
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val adj = Array.fill(n)(new java.util.BitSet(n))
    g.weighted.select("src", "dst").collect().foreach { r =>
      val (a, b) = (idx(r.getLong(0)), idx(r.getLong(1)))
      if (a != b) { adj(a).set(b); adj(b).set(a) } // separators are undirected-semantics
    }
    L(n, ids, idx, adj)
  }

  /** Components of the induced subgraph on `inside`. */
  private def components(l: L, inside: java.util.BitSet): Seq[java.util.BitSet] = {
    val seen = new java.util.BitSet(l.n)
    val out = scala.collection.mutable.ArrayBuffer.empty[java.util.BitSet]
    var v = inside.nextSetBit(0)
    while (v >= 0) {
      if (!seen.get(v)) {
        val comp = new java.util.BitSet(l.n)
        val q = scala.collection.mutable.Queue(v)
        seen.set(v); comp.set(v)
        while (q.nonEmpty) {
          val x = q.dequeue()
          var y = l.adj(x).nextSetBit(0)
          while (y >= 0) {
            if (inside.get(y) && !seen.get(y)) { seen.set(y); comp.set(y); q += y }
            y = l.adj(x).nextSetBit(y + 1)
          }
        }
        out += comp
      }
      v = inside.nextSetBit(v + 1)
    }
    out.toSeq
  }

  private def nbrsOf(l: L, comp: java.util.BitSet, within: java.util.BitSet): java.util.BitSet = {
    val res = new java.util.BitSet(l.n)
    var v = comp.nextSetBit(0)
    while (v >= 0) {
      val a = l.adj(v).clone().asInstanceOf[java.util.BitSet]
      a.and(within); a.andNot(comp)
      res.or(a)
      v = comp.nextSetBit(v + 1)
    }
    res
  }

  private def bsKey(b: java.util.BitSet): Vector[Int] = {
    val buf = Vector.newBuilder[Int]
    var v = b.nextSetBit(0)
    while (v >= 0) { buf += v; v = b.nextSetBit(v + 1) }
    buf.result()
  }

  /** `is_separator(vs)`: does removing `vs` disconnect what remains? */
  def isSeparator(g: LinkGraph, vs: Seq[Long]): Boolean = {
    val l = collect(g)
    isSepLocal(l, vs.map(l.idx).toSet, fullSet(l.n))
  }

  private def fullSet(n: Int): java.util.BitSet = {
    val b = new java.util.BitSet(n); b.set(0, n); b
  }

  private def isSepLocal(l: L, sep: Set[Int], universe: java.util.BitSet): Boolean = {
    val inside = universe.clone().asInstanceOf[java.util.BitSet]
    sep.foreach(inside.clear)
    components(l, inside).size > components(l, universe).size
  }

  /** `is_minimal_separator(vs)`: S is a minimal separator iff it is a
    * minimal (a,b)-separator for SOME pair — the classic characterization:
    * at least two components of G − S are FULL (N(C) = S). (This is the
    * reference's semantics: its Petersen test asserts exact agreement
    * between `is_minimal_separator` and `all_minimal_st_separators`.)
    */
  def isMinimalSeparator(g: LinkGraph, vs: Seq[Long]): Boolean = {
    val l = collect(g)
    val sep = vs.map(l.idx).toSet
    isMinSepLocal(l, sep, fullSet(l.n))
  }

  private def isMinSepLocal(l: L, sep: Set[Int], universe: java.util.BitSet): Boolean = {
    if (sep.isEmpty) return false
    val inside = universe.clone().asInstanceOf[java.util.BitSet]
    sep.foreach(inside.clear)
    val comps = components(l, inside)
    comps.count { c =>
      val nb = nbrsOf(l, c, universe)
      bsKey(nb).toSet == sep
    } >= 2
  }

  /** Berry–Bordat: ALL minimal (a,b)-separators of the graph (local form).
    */
  private def allMinSepsLocal(l: L, universe: java.util.BitSet): Set[Vector[Int]] = {
    val seen = scala.collection.mutable.Set.empty[Vector[Int]]
    val queue = scala.collection.mutable.Queue.empty[java.util.BitSet]
    def candidate(s: java.util.BitSet): Unit = {
      if (!s.isEmpty) {
        val k = bsKey(s)
        if (!seen.contains(k)) { seen += k; queue += s }
      }
    }
    // seeds: neighborhoods of components of G − N[v]
    var v = universe.nextSetBit(0)
    while (v >= 0) {
      val inside = universe.clone().asInstanceOf[java.util.BitSet]
      inside.clear(v)
      val a = l.adj(v).clone().asInstanceOf[java.util.BitSet]
      a.and(universe)
      var x = a.nextSetBit(0)
      while (x >= 0) { inside.clear(x); x = a.nextSetBit(x + 1) }
      components(l, inside).foreach(c => candidate(nbrsOf(l, c, universe)))
      v = universe.nextSetBit(v + 1)
    }
    // closure: substitute x ∈ S by component neighborhoods of G − (S ∪ N[x])
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      var x = s.nextSetBit(0)
      while (x >= 0) {
        val inside = universe.clone().asInstanceOf[java.util.BitSet]
        var y = s.nextSetBit(0)
        while (y >= 0) { inside.clear(y); y = s.nextSetBit(y + 1) }
        inside.clear(x)
        val ax = l.adj(x).clone().asInstanceOf[java.util.BitSet]
        ax.and(universe)
        var z = ax.nextSetBit(0)
        while (z >= 0) { inside.clear(z); z = ax.nextSetBit(z + 1) }
        components(l, inside).foreach(c => candidate(nbrsOf(l, c, universe)))
        x = s.nextSetBit(x + 1)
      }
    }
    // keep only true minimal separators (seeds/closure can generate
    // neighborhoods that do not separate, e.g. a whole component's hull)
    seen.filter(k => isMinSepLocal(l, k.toSet, universe)).toSet
  }

  /** `all_minimal_st_separators()`: every minimal vertex separator, one
    * row per separator as a sorted id array.
    */
  def allMinimalStSeparators(g: LinkGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val l = collect(g)
    allMinSepsLocal(l, fullSet(l.n)).toSeq
      .map(k => k.map(i => l.ids(i)))
      .toDF("separator")
  }

  /** `minimum_size_separators()`: the minimal separators of minimum size
    * (= the vertex connectivity) — every minimum-size separator is minimal,
    * the equivalence the reference's own test asserts.
    */
  def minimumSizeSeparators(g: LinkGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val l = collect(g)
    val all = allMinSepsLocal(l, fullSet(l.n))
    val out = if (all.isEmpty) Seq.empty[Vector[Int]]
      else { val m = all.map(_.size).min; all.filter(_.size == m).toSeq }
    out.map(k => k.map(i => l.ids(i))).toDF("separator")
  }

  private def minSepsOf(l: L, universe: java.util.BitSet): Seq[Set[Int]] = {
    val all = allMinSepsLocal(l, universe)
    if (all.isEmpty) Seq.empty
    else { val m = all.map(_.size).min; all.filter(_.size == m).map(_.toSet).toSeq }
  }

  /** Local vertex connectivity of the induced subgraph via node splitting;
    * complete graphs (no non-adjacent pair) → n − 1.
    */
  private def cohesionLocal(l: L, universe: java.util.BitSet): Int = {
    val verts = bsKey(universe)
    val n = verts.length
    if (n <= 1) return 0
    val pos = verts.zipWithIndex.toMap
    if (components(l, universe).size > 1) return 0
    var best = n - 1
    var found = false
    for (si <- verts; ti <- verts if si < ti && !l.adj(si).get(ti)) {
      found = true
      val net = new Flow.Net(2 * n)
      val inf = 1e18
      verts.foreach { v =>
        val i = pos(v)
        net.addEdge(i, i + n, if (v == si || v == ti) inf else 1.0, 0.0)
      }
      verts.foreach { u =>
        var w = l.adj(u).nextSetBit(0)
        while (w >= 0) {
          if (universe.get(w) && pos.contains(w) && u < w) {
            net.addEdge(pos(u) + n, pos(w), inf, 0.0)
            net.addEdge(pos(w) + n, pos(u), inf, 0.0)
          }
          w = l.adj(u).nextSetBit(w + 1)
        }
      }
      val f = math.round(Flow.dinic(net, pos(si) + n, pos(ti))).toInt
      if (f < best) best = f
      if (best == 0) return 0
    }
    if (found) best else n - 1
  }

  final case class CohesiveBlock(vertices: Seq[Long], cohesion: Int, parent: Option[Seq[Long]])

  /** `cohesive_blocks()` (Moody–White; goldens
    * `test_decomposition.py:485-554`): the hierarchy of maximal
    * increasingly-cohesive vertex groups. Returns blocks with their
    * cohesion and parent block (None for the root).
    */
  def cohesiveBlocks(g: LinkGraph): Seq[CohesiveBlock] = {
    require(!g.directed, "cohesive_blocks requires an undirected graph (reference parity)")
    val l = collect(g)
    val root = fullSet(l.n)
    // discover candidates
    val cand = scala.collection.mutable.LinkedHashMap.empty[Vector[Int], Int] // block -> cohesion
    val parentOf = scala.collection.mutable.Map.empty[Vector[Int], Vector[Int]]
    val queue = scala.collection.mutable.Queue((root, Option.empty[Vector[Int]]))
    while (queue.nonEmpty) {
      val (b, par) = queue.dequeue()
      val key = bsKey(b)
      if (!cand.contains(key)) {
        val k = cohesionLocal(l, b)
        cand(key) = k
        par.foreach(p => parentOf(key) = p)
        minSepsOf(l, b).foreach { sep =>
          val inside = b.clone().asInstanceOf[java.util.BitSet]
          sep.foreach(inside.clear)
          components(l, inside).foreach { c =>
            val child = c.clone().asInstanceOf[java.util.BitSet]
            sep.foreach(child.set)
            if (child.cardinality() < b.cardinality()) queue += ((child, Some(key)))
          }
        }
      } else if (!parentOf.contains(key) && par.isDefined) parentOf(key) = par.get
    }
    // keep only blocks not contained in an (other) block of >= cohesion
    val entries = cand.toSeq
    def subsetOf(a: Vector[Int], b: Vector[Int]): Boolean =
      a.forall(b.toSet.contains)
    val kept = entries.filter { case (b, k) =>
      !entries.exists { case (b2, k2) =>
        b2 != b && k2 >= k && subsetOf(b, b2) && !(k2 == k && subsetOf(b2, b))
      }
    }
    val keptKeys = kept.map(_._1).toSet
    def liftParent(b: Vector[Int]): Option[Vector[Int]] = {
      var p = parentOf.get(b)
      while (p.isDefined && !keptKeys.contains(p.get)) p = parentOf.get(p.get)
      p
    }
    kept.map { case (b, k) =>
      CohesiveBlock(b.map(i => l.ids(i)), k, liftParent(b).map(_.map(i => l.ids(i))))
    }
  }

  // ------------------------------------------------- directed edge cuts

  final case class StCut(value: Double, membership: Seq[Int], cutEdges: Seq[(Long, Long)])

  /** `all_st_cuts(s, t)` (`graphobject.c:15575`; goldens
    * `test_flow.py:136-172`): every MINIMAL directed s-t edge cut. A cut is
    * the edge set from S to V−S (s ∈ S, t ∉ S); minimal iff every cut edge
    * (u, v) has u reachable from s inside S and v reaching t inside V−S.
    * Brute enumeration over subsets under a tight gate (the output itself
    * is exponential).
    */
  def allStCuts(g: LinkGraph, s: Long, t: Long,
                useWeights: Boolean = false, minOnly: Boolean = false): Seq[StCut] = {
    require(g.directed, "all_st_cuts requires a directed graph")
    val l = collect(g) // undirected adjacency for gate only
    require(l.n <= 24, s"all_st_cuts enumerates subsets — capped at 24 vertices (${l.n} given)")
    val edges = g.weighted.select("src", "dst", "weight").collect()
      .map(r => (l.idx(r.getLong(0)), l.idx(r.getLong(1)),
        if (useWeights) r.getDouble(2) else 1.0))
      .filter(e => e._1 != e._2)
    val si = l.idx(s); val ti = l.idx(t)
    val free = (0 until l.n).filter(v => v != si && v != ti)
    val out = scala.collection.mutable.ArrayBuffer.empty[StCut]
    val outAdj = Array.fill(l.n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val inAdj = Array.fill(l.n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    edges.foreach { case (u, v, _) => outAdj(u) += v; inAdj(v) += u }
    def sameSideReach(from: Int, nbrs: Array[scala.collection.mutable.ArrayBuffer[Int]],
                      side: Array[Boolean]): Array[Boolean] = {
      val seen = new Array[Boolean](l.n)
      val q = scala.collection.mutable.Queue(from); seen(from) = true
      while (q.nonEmpty) {
        val u = q.dequeue()
        nbrs(u).foreach(v => if (side(v) == side(from) && !seen(v)) { seen(v) = true; q += v })
      }
      seen
    }
    for (mask <- 0L until (1L << free.length)) {
      val side = new Array[Boolean](l.n) // true = S (source side)
      side(si) = true
      free.zipWithIndex.foreach { case (v, i) => side(v) = ((mask >> i) & 1L) == 1L }
      val cut = edges.filter { case (u, v, _) => side(u) && !side(v) }
      // minimality: every cut edge is fed from s within S and drains to t
      // within T — otherwise it could be dropped and the rest still cuts
      val rs = sameSideReach(si, outAdj, side)
      val back = sameSideReach(ti, inAdj, side)
      val minimal = cut.nonEmpty &&
        cut.forall { case (u, v, _) => rs(u) && back(v) }
      if (minimal) out += StCut(cut.map(_._3).sum, side.map(b => if (b) 0 else 1).toSeq,
        cut.map { case (u, v, _) => (l.ids(u), l.ids(v)) }.toSeq)
    }
    val res = out.toSeq
    if (minOnly && res.nonEmpty) {
      val m = res.map(_.value).min
      res.filter(_.value <= m + 1e-9)
    } else res
  }

  /** `all_st_mincuts(s, t, capacity)` (goldens `test_flow.py:174-196`). */
  def allStMincuts(g: LinkGraph, s: Long, t: Long, useWeights: Boolean = false): Seq[StCut] =
    allStCuts(g, s, t, useWeights, minOnly = true)
}
