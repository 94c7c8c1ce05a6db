package graft.algos

import graft.core.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dendrogram-producing community methods: `community_fastgreedy` (CNM,
  * `graphobject.c:15886`, Py `__init__.py:1151`), `community_edge_betweenness`
  * (Girvan-Newman, `graphobject.c:16025`, Py `__init__.py:1391`),
  * `community_walktrap` (Pons-Latapy, `graphobject.c:16131`, Py
  * `__init__.py:1483`) and `community_leading_eigenvector` (Newman spectral,
  * `graphobject.c:15966`, Py `__init__.py:1250`). Goldens
  * `tests/test_decomposition.py:190-239, 240-248, 428-434`.
  *
  * These four are agglomerative/divisive with a strictly sequential merge
  * order (each step depends on the full result of the previous one), so —
  * like [[Biconnected]] — they run as driver kernels over a collected
  * graph, capped by [[maxKernelVertices]]. At corpus scale the engine's
  * community surface is [[Louvain]]/[[Leiden]]/[[LabelProp]] (the reference
  * community of practice makes the same split: CNM/walktrap/GN are
  * small-graph tools). The heavy inner primitive of Girvan-Newman — one
  * full edge-betweenness pass — does exist distributed
  * ([[Betweenness.edgeBetweenness]]) for one-shot use on big graphs.
  */
object CommunityKernels {

  val maxKernelVertices = 100000L

  /** Merge tree: `merges(step) = (a, b)` in igraph convention — communities
    * `a` and `b` (ids 0..n-1 for leaves, n+step for merge products) fuse
    * into community `n + step`. `q(step)` = modularity AFTER `step` merges
    * (q(0) = all-singletons), so the optimal cut is `argmax(q)`.
    */
  final case class Dendrogram(n: Int, merges: Vector[(Int, Int)], q: Vector[Double]) {

    /** Membership after exactly `steps` merges (labels canonicalized in
      * first-seen order, the reference's `reindexMembership`).
      */
    def cutAt(steps: Int): Array[Int] = {
      val parent = Array.tabulate(n + steps)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for (s <- 0 until steps) {
        val (a, b) = merges(s)
        parent(find(a)) = n + s
        parent(find(b)) = n + s
      }
      val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      Array.tabulate(n)(v => seen.getOrElseUpdate(find(v), seen.size))
    }

    /** Cut to exactly `k` communities (`as_clustering(n=k)`). */
    def cutToCount(k: Int): Array[Int] = cutAt(math.max(0, math.min(merges.length, n - k)))

    /** Max-modularity cut (`as_clustering()` default). */
    def asClustering: Array[Int] = cutAt(q.indices.maxBy(q))
  }

  /** Collected undirected weighted graph for the kernels. */
  private final class G(val n: Int, val edges: Array[(Int, Int, Double)]) {
    val adj: Array[Array[(Int, Double)]] = {
      val b = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[(Int, Double)])
      edges.foreach { case (u, v, w) => if (u != v) { b(u) += ((v, w)); b(v) += ((u, w)) } }
      b.map(_.toArray)
    }
    val strength: Array[Double] = {
      val s = new Array[Double](n)
      edges.foreach { case (u, v, w) => s(u) += w; s(v) += w }
      s
    }
    val m: Double = edges.map(_._3).sum
  }

  private def collect(g: LinkGraph): G = {
    val n = g.vcount()
    require(n <= maxKernelVertices,
      s"sequential community kernel capped at $maxKernelVertices vertices ($n given); " +
        "use Louvain/Leiden/LabelProp at scale")
    val edges = g.weighted.select("src", "dst", "weight").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    new G(n.toInt, edges)
  }

  /** Modularity of a membership on a collected graph (loops included via
    * strength, matching [[Modularity.modularity]]).
    */
  private def localQ(g: G, memb: Array[Int]): Double = {
    if (g.m == 0.0) return 0.0
    val m2 = 2.0 * g.m
    var intra = 0.0
    g.edges.foreach { case (u, v, w) => if (memb(u) == memb(v)) intra += w }
    val stot = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
    (0 until g.n).foreach(v => stot(memb(v)) += g.strength(v))
    intra / g.m - stot.values.map(s => (s / m2) * (s / m2)).sum
  }

  // ------------------------------------------------------------- fastgreedy

  /** Clauset-Newman-Moore greedy modularity agglomeration
    * (`community_fastgreedy`; goldens `test_decomposition.py:190-220`).
    * Merge the adjacent community pair with max ΔQ = 2(e_ij − a_i·a_j)
    * until one community per component remains.
    */
  def fastgreedy(g0: LinkGraph): Dendrogram = {
    val g = collect(g0)
    val n = g.n
    if (g.m == 0.0) return Dendrogram(n, Vector.empty, Vector(0.0))
    val m2 = 2.0 * g.m
    // community state: eij (between-community weight fractions), a_i
    val comm = Array.tabulate(n)(identity) // current community id per slot (n+step after merges)
    val alive = scala.collection.mutable.Set(0 until n: _*)
    val a = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
    val e = scala.collection.mutable.Map.empty[(Int, Int), Double].withDefaultValue(0.0)
    (0 until n).foreach(v => a(v) = g.strength(v) / m2)
    var q0 = 0.0
    g.edges.foreach { case (u, v, w) =>
      if (u == v) q0 += w / g.m
      else {
        val key = if (u < v) (u, v) else (v, u)
        e(key) += w / m2 // each direction contributes w/2m; pair stores e_ij
      }
    }
    var q = q0 - (0 until n).map(v => a(v) * a(v)).sum
    val merges = Vector.newBuilder[(Int, Int)]
    val qs = Vector.newBuilder[Double]
    qs += q
    var step = 0
    var continue = true
    while (continue && alive.size > 1) {
      // best adjacent pair: ΔQ = 2(e_ij − a_i a_j); deterministic tie-break
      var best: (Int, Int) = null
      var bestDq = Double.NegativeInfinity
      e.foreach { case ((i, j), eij) =>
        val dq = 2.0 * (eij - a(i) * a(j))
        if (dq > bestDq + 1e-12 ||
            (dq > bestDq - 1e-12 && best != null && (i < best._1 || (i == best._1 && j < best._2)))) {
          bestDq = dq; best = (i, j)
        }
      }
      if (best == null) continue = false // graph disconnected: no adjacent pairs left
      else {
        val (i, j) = best
        val nid = n + step
        // fuse j into new id: new community nid absorbs i and j
        a(nid) = a(i) + a(j)
        // rebuild e rows touching i or j
        val touched = e.keys.filter { case (x, y) => x == i || y == i || x == j || y == j }.toArray
        val row = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
        touched.foreach { case key @ (x, y) =>
          val other = if (x == i || x == j) y else x
          if (other != i && other != j) row(other) += e(key)
          e.remove(key)
        }
        row.foreach { case (o, w) => e(if (o < nid) (o, nid) else (nid, o)) = w }
        alive -= i; alive -= j; alive += nid
        a.remove(i); a.remove(j)
        q += bestDq
        merges += ((i, j))
        qs += q
        step += 1
      }
    }
    Dendrogram(n, merges.result(), qs.result())
  }

  // --------------------------------------------- edge betweenness (GN) -----

  /** Weighted Brandes edge betweenness on the collected graph (inner
    * primitive of Girvan-Newman; distributed one-shot variant:
    * [[Betweenness.edgeBetweenness]]).
    */
  private def localEdgeBetweenness(n: Int, adj: Array[Array[(Int, Int, Double)]]): Array[Double] = {
    // adj entries: (neighbor, edgeIdx, weight); returns betweenness per edgeIdx
    val nE = adj.map(_.length).sum / 2
    val eb = new Array[Double](nE)
    for (s <- 0 until n) {
      val dist = Array.fill(n)(Double.PositiveInfinity)
      val sigma = new Array[Double](n)
      val preds = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]) // (pred, edgeIdx)
      dist(s) = 0.0; sigma(s) = 1.0
      val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
      pq.enqueue((0.0, s))
      val order = scala.collection.mutable.ArrayBuffer.empty[Int]
      val done = new Array[Boolean](n)
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (!done(u) && d <= dist(u) + 1e-12) {
          done(u) = true; order += u
          adj(u).foreach { case (v, ei, w) =>
            val nd = dist(u) + w
            if (nd < dist(v) - 1e-12) {
              dist(v) = nd; sigma(v) = sigma(u)
              preds(v).clear(); preds(v) += ((u, ei))
              pq.enqueue((nd, v))
            } else if (math.abs(nd - dist(v)) <= 1e-12 && !done(v)) {
              sigma(v) += sigma(u); preds(v) += ((u, ei))
            }
          }
        }
      }
      val delta = new Array[Double](n)
      order.reverseIterator.foreach { w =>
        preds(w).foreach { case (u, ei) =>
          val c = sigma(u) / sigma(w) * (1.0 + delta(w))
          eb(ei) += c
          delta(u) += c
        }
      }
    }
    eb.map(_ / 2.0) // undirected: each pair counted from both endpoints
  }

  /** Girvan-Newman divisive clustering (`community_edge_betweenness`;
    * golden `test_decomposition.py:222-238`): repeatedly delete the
    * max-edge-betweenness edge (recomputing after every deletion); the
    * dendrogram is the reverse of the component-split history.
    */
  def edgeBetweennessCommunities(g0: LinkGraph): Dendrogram = {
    val g = collect(g0)
    val n = g.n
    val act = g.edges.zipWithIndex.filter { case ((u, v, _), _) => u != v }
    val active = scala.collection.mutable.Set(act.map(_._2): _*)
    // deletion order; then replay backwards to build merges
    val deletions = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (active.nonEmpty) {
      // build adjacency over active edges with a dense re-index
      val idxs = active.toArray.sorted
      val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)])
      idxs.zipWithIndex.foreach { case (ei, dense) =>
        val (u, v, w) = g.edges(ei)
        // GN uses weights as distances (strong ties = short = high traffic)
        adj(u) += ((v, dense, w)); adj(v) += ((u, dense, w))
      }
      val eb = localEdgeBetweenness(n, adj.map(_.toArray))
      val bestDense = eb.indices.maxBy(i => (eb(i), -i)) // max eb, tie → smallest edge id
      deletions += idxs(bestDense)
      active -= idxs(bestDense)
    }
    // replay deletions in reverse as union merges (igraph merge convention)
    val parent = scala.collection.mutable.Map.empty[Int, Int] // comm -> merged-into
    val merges = Vector.newBuilder[(Int, Int)]
    var step = 0
    // union-find over vertices for q snapshots
    val memb = Array.tabulate(n)(identity)
    val qs = scala.collection.mutable.ArrayBuffer(localQ(g, memb.clone()))
    deletions.reverseIterator.foreach { ei =>
      val (u, v, _) = g.edges(ei)
      val cu = findRoot(memb, parent, u, n)
      val cv = findRoot(memb, parent, v, n)
      if (cu != cv) {
        val nid = n + step
        parent(cu) = nid; parent(cv) = nid
        merges += ((cu, cv))
        step += 1
        // recompute q on the merged membership
        val flat = Array.tabulate(n)(x => findRoot(memb, parent, x, n))
        qs += localQ(g, flat)
      }
    }
    Dendrogram(n, merges.result(), qs.toVector)
  }

  private def findRoot(memb: Array[Int], parent: scala.collection.mutable.Map[Int, Int],
                       v: Int, n: Int): Int = {
    var r = memb(v)
    while (parent.getOrElse(r, r) != r) r = parent(r)
    r
  }

  // --------------------------------------------------------------- walktrap

  /** Pons-Latapy walktrap (`community_walktrap`; golden
    * `test_decomposition.py:428-434`): t-step random-walk probability
    * vectors as community signatures, Ward-style agglomeration of adjacent
    * communities by minimum Δσ.
    */
  def walktrap(g0: LinkGraph, steps: Int = 4): Dendrogram = {
    val g = collect(g0)
    val n = g.n
    // P^t signatures are dense n-vectors: O(n²) doubles. Tighter cap than
    // the shared kernel limit — 4096² ≈ 128 MB of signature state.
    require(n <= 4096, s"walktrap dense-signature kernel capped at 4096 vertices ($n given)")
    if (g.m == 0.0 || n == 0) return Dendrogram(n, Vector.empty, Vector(0.0))
    // transition matrix rows with self-loop smoothing as in Pons-Latapy
    // (walk moves to a uniform neighbor by weight)
    val p1 = Array.fill(n)(new Array[Double](n))
    for (v <- 0 until n) {
      val d = g.strength(v)
      if (d > 0) g.adj(v).foreach { case (u, w) => p1(v)(u) += w / d }
      else p1(v)(v) = 1.0
    }
    // P^t rows
    var pt = p1.map(_.clone())
    for (_ <- 1 until steps) {
      val nxt = Array.fill(n)(new Array[Double](n))
      for (v <- 0 until n) {
        val row = nxt(v)
        val cur = pt(v)
        for (k <- 0 until n if cur(k) != 0.0) {
          val pk = p1(k)
          var j = 0
          while (j < n) { row(j) += cur(k) * pk(j); j += 1 }
        }
      }
      pt = nxt
    }
    val invSqrtDeg = Array.tabulate(n)(v => if (g.strength(v) > 0) 1.0 / math.sqrt(g.strength(v)) else 0.0)
    // community state: prob vector (size-weighted), size, members adjacency
    val vecs = scala.collection.mutable.Map[Int, Array[Double]]((0 until n).map(v => v -> pt(v).clone()): _*)
    val size = scala.collection.mutable.Map[Int, Int]((0 until n).map(_ -> 1): _*)
    val nbrs = scala.collection.mutable.Map[Int, scala.collection.mutable.Set[Int]](
      (0 until n).map(v => v -> scala.collection.mutable.Set(g.adj(v).map(_._1).toSeq: _*)): _*)
    val memb = Array.tabulate(n)(identity)
    def dist2(c1: Int, c2: Int): Double = {
      val a = vecs(c1); val b = vecs(c2)
      var s = 0.0
      var k = 0
      while (k < n) { val d = (a(k) - b(k)) * invSqrtDeg(k); s += d * d; k += 1 }
      s
    }
    def dSigma(c1: Int, c2: Int): Double =
      size(c1).toDouble * size(c2) / (size(c1) + size(c2)) / n * dist2(c1, c2)
    val merges = Vector.newBuilder[(Int, Int)]
    val qs = scala.collection.mutable.ArrayBuffer(localQ(g, memb.clone()))
    var step = 0
    var progressing = true
    while (progressing) {
      var best: (Int, Int) = null
      var bestD = Double.PositiveInfinity
      vecs.keys.toArray.sorted.foreach { c1 =>
        nbrs(c1).toArray.sorted.foreach { c2 =>
          if (c1 < c2) {
            val d = dSigma(c1, c2)
            if (d < bestD - 1e-15) { bestD = d; best = (c1, c2) }
          }
        }
      }
      if (best == null) progressing = false
      else {
        val (c1, c2) = best
        val nid = n + step
        val s1 = size(c1); val s2 = size(c2)
        val merged = new Array[Double](n)
        val v1 = vecs(c1); val v2 = vecs(c2)
        var k = 0
        while (k < n) { merged(k) = (v1(k) * s1 + v2(k) * s2) / (s1 + s2); k += 1 }
        vecs.remove(c1); vecs.remove(c2); vecs(nid) = merged
        size(nid) = s1 + s2; size.remove(c1); size.remove(c2)
        val nn = (nbrs(c1) ++ nbrs(c2)) -= c1 -= c2
        nbrs.remove(c1); nbrs.remove(c2); nbrs(nid) = nn
        nbrs.values.foreach { s => if (s.remove(c1) | s.remove(c2)) s += nid }
        for (v <- 0 until n) if (memb(v) == c1 || memb(v) == c2) memb(v) = nid
        merges += ((c1, c2))
        qs += localQ(g, memb.clone())
        step += 1
      }
    }
    Dendrogram(n, merges.result(), qs.toVector)
  }

  // -------------------------------------------------- leading eigenvector --

  /** Newman leading-eigenvector spectral bisection
    * (`community_leading_eigenvector`; the deprecated
    * `community_leading_eigenvector_naive` wrapper resolves to the same
    * algorithm; golden `test_decomposition.py:240-248`).
    * Recursively split each community by the sign pattern of the dominant
    * eigenvector of the generalized modularity matrix; stop when the split
    * no longer increases modularity or `clusters` is reached.
    */
  def leadingEigenvector(g0: LinkGraph, clusters: Int = -1): DataFrame = {
    val g = collect(g0)
    val n = g.n
    val spark = g0.spark
    import spark.implicits._
    if (g.m == 0.0 || n == 0)
      return (0 until n).map(v => (v.toLong, v.toLong)).toDF("id", "label")
    val m2 = 2.0 * g.m
    val memb = Array.fill(n)(0)
    var nComm = 1
    val queue = scala.collection.mutable.Queue(0)
    val target = if (clusters <= 0) Int.MaxValue else clusters
    while (queue.nonEmpty && nComm < target) {
      val c = queue.dequeue()
      val members = (0 until n).filter(memb(_) == c).toArray
      if (members.length > 1) {
        val idx = members.zipWithIndex.toMap
        val nm = members.length
        // generalized modularity matrix B^(S) x product, computed on the fly
        val kS = members.map(g.strength)
        val kInS = members.map { v =>
          g.adj(v).collect { case (u, w) if idx.contains(u) => w }.sum
        }
        def bx(x: Array[Double]): Array[Double] = {
          val kx = members.indices.map(i => kS(i) * x(i)).sum / m2
          val out = new Array[Double](nm)
          members.zipWithIndex.foreach { case (v, i) =>
            var s = 0.0
            g.adj(v).foreach { case (u, w) => idx.get(u).foreach(j => s += w * x(j)) }
            out(i) = s - kS(i) * kx - (kInS(i) - kS(i) * kS.sum / m2) * x(i)
          }
          out
        }
        // shifted power iteration for the dominant (most positive) eigenvalue
        // Gershgorin-style bound so B + shift·I is PSD and power iteration
        // converges to the algebraically largest eigenvalue of B
        val shift = 2.0 * (kS.max + kS.sum / m2 * kS.max + kInS.max + 1.0)
        var x = Array.tabulate(nm)(i => 1.0 + (i % 7) * 0.01) // deterministic start
        var lambda = 0.0
        for (_ <- 0 until 500) {
          val y = bx(x).zip(x).map { case (b, xi) => b + shift * xi }
          val norm = math.sqrt(y.map(v => v * v).sum)
          x = y.map(_ / norm)
        }
        lambda = bx(x).zip(x).map { case (b, xi) => b * xi }.sum // Rayleigh
        val split = x.map(_ >= 0.0)
        if (lambda > 1e-9 && split.distinct.length == 2) {
          val before = localQ(g, memb.clone())
          val trial = memb.clone()
          val newC = nComm
          members.zipWithIndex.foreach { case (v, i) => if (!split(i)) trial(v) = newC }
          if (localQ(g, trial) > before + 1e-12) {
            members.zipWithIndex.foreach { case (v, i) => if (!split(i)) memb(v) = newC }
            nComm += 1
            queue.enqueue(c); queue.enqueue(newC)
          }
        }
      }
    }
    val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    (0 until n).map(v => (v.toLong, seen.getOrElseUpdate(memb(v), seen.size).toLong))
      .toDF("id", "label")
  }

  /** DataFrame wrappers returning (id, label) with first-seen dense labels. */
  private def toDf(g0: LinkGraph, m: Array[Int]): DataFrame = {
    val spark = g0.spark
    import spark.implicits._
    m.zipWithIndex.map { case (l, v) => (v.toLong, l.toLong) }.toSeq.toDF("id", "label")
  }

  def communityFastgreedy(g: LinkGraph, k: Int = -1): DataFrame = {
    val d = fastgreedy(g)
    toDf(g, if (k > 0) d.cutToCount(k) else d.asClustering)
  }

  def communityEdgeBetweenness(g: LinkGraph, k: Int = -1): DataFrame = {
    val d = edgeBetweennessCommunities(g)
    toDf(g, if (k > 0) d.cutToCount(k) else d.asClustering)
  }

  def communityWalktrap(g: LinkGraph, steps: Int = 4, k: Int = -1): DataFrame = {
    val d = walktrap(g, steps)
    toDf(g, if (k > 0) d.cutToCount(k) else d.asClustering)
  }

  /** `community_spinglass` (`graphobject.c:16089`; golden
    * `test_decomposition.py:399-426`: three Full(5) cliques in a ring →
    * one community per clique). Reichardt-Bornholdt Potts model with the
    * configuration null model — at `gamma` = 1 the ground state is the
    * max-modularity partition. Seeded simulated annealing: per node, take
    * the best-gain spin when it improves, otherwise a Metropolis-accepted
    * random spin (`exp(Δ/T)`), cooling by `coolFact` per sweep, then a
    * zero-temperature polish to a local optimum. Driver kernel (inherently
    * sequential anneal), capped like the other [[CommunityKernels]]; the
    * distributed community surface at scale is Louvain/Leiden/LPA.
    */
  def spinglass(g0: LinkGraph, spins: Int = 25, seed: Long = 0L,
                startTemp: Double = 1.0, stopTemp: Double = 0.01,
                coolFact: Double = 0.99, gamma: Double = 1.0): Array[Int] = {
    val g = collect(g0)
    val n = g.n
    if (n == 0) return Array.empty
    val rnd = new scala.util.Random(seed)
    val q = math.max(2, math.min(spins, n))
    val memb = Array.tabulate(n)(_ => rnd.nextInt(q))
    val dTot = new Array[Double](q)
    (0 until n).foreach(v => dTot(memb(v)) += g.strength(v))
    val m2 = 2.0 * math.max(g.m, 1e-12)
    val links = new Array[Double](q)
    val order = Array.tabulate(n)(identity)
    def sweep(t: Double): Int = {
      var moves = 0
      var i = n - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val tmp = order(i); order(i) = order(j); order(j) = tmp
        i -= 1
      }
      var oi = 0
      while (oi < n) {
        val v = order(oi)
        java.util.Arrays.fill(links, 0.0)
        g.adj(v).foreach { case (u, w) => if (u != v) links(memb(u)) += w }
        val a = memb(v)
        dTot(a) -= g.strength(v)
        def gain(c: Int): Double = links(c) - gamma * g.strength(v) * dTot(c) / m2
        val base = gain(a)
        var best = a
        var bestGain = base
        var c = 0
        while (c < q) {
          if (c != a) {
            val gn = gain(c)
            if (gn > bestGain + 1e-12) { best = c; bestGain = gn }
          }
          c += 1
        }
        var target = a
        if (best != a) target = best
        else if (t > 0.0) {
          val cand = rnd.nextInt(q)
          val delta = gain(cand) - base
          if (cand != a && (delta > 0.0 || rnd.nextDouble() < math.exp(delta / t)))
            target = cand
        }
        if (target != a) { memb(v) = target; moves += 1 }
        dTot(memb(v)) += g.strength(v)
        oi += 1
      }
      moves
    }
    var temp = startTemp
    while (temp >= stopTemp) { sweep(temp); temp *= coolFact }
    while (sweep(0.0) > 0) ()
    // first-seen-order reindex (the reference's reindexMembership)
    val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    Array.tabulate(n)(v => seen.getOrElseUpdate(memb(v), seen.size))
  }

  def communitySpinglass(g: LinkGraph, spins: Int = 25, seed: Long = 0L): DataFrame =
    toDf(g, spinglass(g, spins = spins, seed = seed))

  /** `community_optimal_modularity` (`graphobject.c:16047`; golden
    * `test_decomposition.py:332-343`: bull -> [0,0,1,0,1], q = 0.08).
    * The reference solves an ILP via GLPK; without a solver the exact
    * optimum is enumerable only for TINY graphs — gated at 12 vertices
    * (Bell(12) ≈ 4.2M partitions, restricted-growth-string enumeration).
    * Use Louvain/Leiden at any real size; this exists as the exactness
    * anchor for their goldens.
    */
  def optimalModularity(g0: LinkGraph): (Array[Int], Double) = {
    val g = collect(g0)
    val n = g.n
    require(n <= 12,
      s"optimal modularity is exact-exponential — capped at 12 vertices ($n given); use Louvain/Leiden")
    if (n == 0) return (Array.empty, 0.0)
    // enumerate set partitions as restricted growth strings
    val memb = new Array[Int](n)
    var best = Array.fill(n)(0)
    var bestQ = localQ(g, best)
    def rec(i: Int, maxLabel: Int): Unit = {
      if (i == n) {
        val q = localQ(g, memb)
        if (q > bestQ) { bestQ = q; best = memb.clone() }
      } else {
        var l = 0
        while (l <= maxLabel + 1 && l < n) {
          memb(i) = l
          rec(i + 1, math.max(maxLabel, l))
          l += 1
        }
      }
    }
    memb(0) = 0
    rec(1, 0)
    (best, bestQ)
  }
}
