package graft.algos

import graft.core.LinkGraph

/** VF2 (sub)graph isomorphism (`graphobject.c` isomorphic_vf2 /
  * count_isomorphisms_vf2 / get_automorphisms_vf2 / subisomorphic_vf2 /
  * count_subisomorphisms_vf2; goldens `tests/test_isomorphism.py`).
  *
  * Require-gated DRIVER KERNEL (SURVEY §2.9 excludes general isomorphism
  * from the distributed scope — the search tree is inherently sequential
  * and exponential in the worst case). Supports directed and undirected
  * graphs and optional vertex colors; VF2 subgraph semantics are INDUCED,
  * like the reference's `subisomorphic_vf2` (its LAD entry point is the
  * non-induced variant — pass `induced = false` here for that semantics).
  *
  * For LARGE graphs the engine's scalable stand-ins are the invariant
  * pipeline: degree distributions, triad/motif censuses and [[graft.core.
  * Catalog]] isoclasses for small pieces — the usual way web-scale systems
  * compare graph shapes.
  */
object Isomorphism {

  val maxKernelVertices = 512L

  private final case class LocalG(n: Int, directed: Boolean,
                                  out: Array[Set[Int]], in: Array[Set[Int]],
                                  color: Array[Int])

  private def collect(g: LinkGraph, color: Option[Seq[Int]]): LocalG = {
    val n0 = g.vcount()
    require(n0 <= maxKernelVertices,
      s"VF2 is a sequential driver kernel — capped at $maxKernelVertices vertices ($n0 given); " +
        "compare large graphs by invariants (degree distribution, triad/motif census) instead")
    val n = n0.toInt
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val out = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    val in = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    g.weighted.select("src", "dst").collect().foreach { r =>
      val (a, b) = (idx(r.getLong(0)), idx(r.getLong(1)))
      if (a != b) {
        out(a) += b; in(b) += a
        if (!g.directed) { out(b) += a; in(a) += b }
      }
    }
    val cols = color.map(_.toArray).getOrElse(Array.fill(n)(0))
    require(cols.length == n, s"color vector length ${cols.length} != vcount $n")
    LocalG(n, g.directed, out.map(_.toSet), in.map(_.toSet), cols)
  }

  /** Core search: map every PATTERN vertex to a distinct TARGET vertex such
    * that pattern edges map to edges and (if `induced`) pattern non-edges to
    * non-edges among the mapped image. `onFound` returns true to STOP.
    * `domains`, when given, restricts each pattern vertex to an explicit set
    * of allowed target positions (the LAD-style domain constraint).
    */
  private def search(target: LocalG, pattern: LocalG, induced: Boolean,
                     onFound: Array[Int] => Boolean,
                     domains: Option[Array[Set[Int]]] = None): Unit = {
    require(target.directed == pattern.directed, "directedness must match")
    if (pattern.n == 0) { onFound(Array.empty); return }
    if (pattern.n > target.n) return
    // static pattern order: highest degree first, then most-constrained
    // (neighbors of already-ordered vertices first) — the classic VF2 order
    val order = {
      val remaining = scala.collection.mutable.Set(0 until pattern.n: _*)
      val res = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (remaining.nonEmpty) {
        val anchored = remaining.filter(v =>
          res.exists(u => pattern.out(u).contains(v) || pattern.in(u).contains(v)))
        val pool = if (anchored.nonEmpty) anchored else remaining
        val next = pool.maxBy(v => pattern.out(v).size + pattern.in(v).size)
        res += next; remaining -= next
      }
      res.toArray
    }
    val pmap = Array.fill(pattern.n)(-1) // pattern -> target
    val used = Array.fill(target.n)(false)
    var stop = false
    def rec(depth: Int): Unit = {
      if (stop) return
      if (depth == pattern.n) { stop = onFound(pmap.clone()); return }
      val p = order(depth)
      var cand = 0
      while (cand < target.n && !stop) {
        if (!used(cand) && pattern.color(p) == target.color(cand) &&
          pattern.out(p).size <= target.out(cand).size &&
          pattern.in(p).size <= target.in(cand).size &&
          domains.forall(_(p).contains(cand))) {
          // consistency vs every already-mapped pattern vertex
          var ok = true
          var d = 0
          while (ok && d < depth) {
            val q = order(d); val t = pmap(q)
            val pe1 = pattern.out(q).contains(p)
            val te1 = target.out(t).contains(cand)
            val pe2 = pattern.out(p).contains(q)
            val te2 = target.out(cand).contains(t)
            ok = (if (induced) pe1 == te1 && pe2 == te2
                  else (!pe1 || te1) && (!pe2 || te2))
            d += 1
          }
          if (ok) {
            pmap(p) = cand; used(cand) = true
            rec(depth + 1)
            pmap(p) = -1; used(cand) = false
          }
        }
        cand += 1
      }
    }
    rec(0)
  }

  /** `isomorphic_vf2`: exact isomorphism (optionally vertex-colored). */
  def isomorphicVf2(g1: LinkGraph, g2: LinkGraph,
                    color1: Option[Seq[Int]] = None,
                    color2: Option[Seq[Int]] = None): Boolean =
    isomorphicMapping(g1, g2, color1, color2).isDefined

  /** First isomorphism found as a mapping g1-vertex-position -> g2-vertex-
    * position (None when not isomorphic). The reference's `mapping_12`.
    */
  def isomorphicMapping(g1: LinkGraph, g2: LinkGraph,
                        color1: Option[Seq[Int]] = None,
                        color2: Option[Seq[Int]] = None): Option[Array[Int]] = {
    val t = collect(g2, color2); val p = collect(g1, color1)
    if (t.n != p.n ||
      t.out.map(_.size).sorted.toSeq != p.out.map(_.size).sorted.toSeq) return None
    var res: Option[Array[Int]] = None
    search(t, p, induced = true, m => { res = Some(m); true })
    res
  }

  /** `count_isomorphisms_vf2` (same graph twice = automorphism count). */
  def countIsomorphisms(g1: LinkGraph, g2: LinkGraph,
                        color1: Option[Seq[Int]] = None,
                        color2: Option[Seq[Int]] = None): Long = {
    val t = collect(g2, color2); val p = collect(g1, color1)
    if (t.n != p.n) return 0L
    var c = 0L
    search(t, p, induced = true, _ => { c += 1; false })
    c
  }

  /** `count_automorphisms_vf2` (and the Python `count_automorphisms_vf2`
    * wrapper): automorphisms = isomorphisms of g with itself.
    */
  def countAutomorphisms(g: LinkGraph, color: Option[Seq[Int]] = None): Long =
    countIsomorphisms(g, g, color, color)

  /** `get_automorphisms_vf2`: every automorphism as a mapping array. */
  def getAutomorphisms(g: LinkGraph, color: Option[Seq[Int]] = None): Seq[Array[Int]] = {
    val t = collect(g, color); val p = collect(g, color)
    val res = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    search(t, p, induced = true, m => { res += m; false })
    res.toSeq
  }

  /** `subisomorphic_vf2`: does `g` contain an INDUCED subgraph isomorphic
    * to `pattern`? (`induced = false` gives the LAD-style monomorphism.)
    */
  def subisomorphicVf2(g: LinkGraph, pattern: LinkGraph,
                       colorG: Option[Seq[Int]] = None,
                       colorP: Option[Seq[Int]] = None,
                       induced: Boolean = true): Boolean = {
    val t = collect(g, colorG); val p = collect(pattern, colorP)
    var found = false
    search(t, p, induced, _ => { found = true; true })
    found
  }

  /** `count_subisomorphisms_vf2`. */
  def countSubisomorphisms(g: LinkGraph, pattern: LinkGraph,
                           colorG: Option[Seq[Int]] = None,
                           colorP: Option[Seq[Int]] = None,
                           induced: Boolean = true): Long = {
    val t = collect(g, colorG); val p = collect(pattern, colorP)
    var c = 0L
    search(t, p, induced, _ => { c += 1; false })
    c
  }

  /** `canonical_permutation()` (`graphobject.c:15135`; the reference uses
    * BLISS): a permutation old-position -> new-position such that two
    * graphs are isomorphic IFF their permuted (canonical) forms are equal.
    *
    * Kernel shape: iterated Weisfeiler-Leman color refinement — the new
    * color of v is the (old color, sorted multiset of in/out neighbor
    * colors) composite, dense-ranked by lexicographic order, which is
    * isomorphism-invariant by induction — then brute-force minimization of
    * the adjacency code ONLY within still-ambiguous color cells. The
    * within-cell search space (Π |cell|!) is require-gated, so regular
    * graphs beyond the gate fail loudly instead of silently mislabeling.
    * Like every kernel in this object, self-loops and edge multiplicities
    * are ignored (simple-graph semantics, the reference's own constraint
    * for its isomorphism family).
    */
  def canonicalPermutation(g: LinkGraph, color: Option[Seq[Int]] = None,
                           maxCellPerms: Long = 1000000L): Seq[Int] = {
    val c = collect(g, color)
    val n = c.n
    if (n == 0) return Seq.empty
    // --- WL refinement to a stable, canonically-ordered coloring
    var colors = {
      // initial colors: dense rank of the user color (invariant)
      val sorted = c.color.distinct.sorted
      val rank = sorted.zipWithIndex.toMap
      c.color.map(rank)
    }
    var stable = false
    while (!stable) {
      val sig: Array[(Int, Seq[Int], Seq[Int])] = (0 until n).map { v =>
        (colors(v),
          c.out(v).toSeq.map(colors(_)).sorted,
          c.in(v).toSeq.map(colors(_)).sorted)
      }.toArray
      implicit val ord: Ordering[(Int, Seq[Int], Seq[Int])] =
        Ordering.Tuple3(Ordering.Int, Ordering.Implicits.seqOrdering[Seq, Int],
          Ordering.Implicits.seqOrdering[Seq, Int])
      val rank = sig.distinct.sorted.zipWithIndex.toMap
      val next = sig.map(rank)
      stable = next.toSeq == colors.toSeq
      colors = next
    }
    // --- cells in canonical (color) order; singletons are fixed
    val cells: Seq[Array[Int]] = colors.zipWithIndex.groupBy(_._1).toSeq
      .sortBy(_._1).map(_._2.map(_._2).sorted)
    // overflow-safe factorial product: 21! wraps a Long negative and 66!+
    // wraps to 0, which would sail through the gate and enumerate forever on
    // highly symmetric graphs — fold factors and saturate the moment the
    // running product clears the gate, before it can wrap
    val space = {
      var acc = 1L
      cells.foreach { cl =>
        var f = 2L
        while (f <= cl.length && acc <= maxCellPerms) {
          acc = try Math.multiplyExact(acc, f)
          catch { case _: ArithmeticException => Long.MaxValue }
          f += 1
        }
      }
      acc
    }
    require(space <= maxCellPerms,
      s"canonical_permutation: ambiguous-cell search space >= $space exceeds $maxCellPerms " +
        s"(highly symmetric graph); raise maxCellPerms or compare by invariants")
    // --- enumerate within-cell orders, pick the adjacency-code-minimal one
    def codeOf(order: Array[Int]): IndexedSeq[Long] = {
      val pos = new Array[Int](n)
      order.zipWithIndex.foreach { case (v, p) => pos(v) = p }
      val words = new Array[Long]((n * n + 63) / 64)
      for (v <- 0 until n; u <- c.out(v)) {
        val bit = pos(v) * n + pos(u)
        words(bit >> 6) |= 1L << (bit & 63)
      }
      words.toIndexedSeq
    }
    implicit val seqOrd: Ordering[IndexedSeq[Long]] =
      Ordering.Implicits.seqOrdering[IndexedSeq, Long](
        Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0))
    def product(rem: List[Array[Int]]): Iterator[Array[Int]] = rem match {
      case Nil => Iterator(Array.empty[Int])
      case h :: t =>
        h.toSeq.permutations.flatMap(p => product(t).map(rest => (p ++ rest).toArray))
    }
    val best = product(cells.toList)
      .map(order => (codeOf(order), order)).minBy(_._1)._2
    val perm = new Array[Int](n)
    best.zipWithIndex.foreach { case (v, p) => perm(v) = p }
    perm.toSeq
  }

  /** `isomorphic_bliss` (`graphobject.c:15157`): isomorphism decision via
    * canonical forms, the BLISS approach (Junttila & Kaski 2007) — permute
    * both graphs to their canonical labelings and compare adjacency codes.
    * The reference's `sh1`/`sh2` splitting heuristics only steer search
    * order, never the decision, so they have no counterpart here. Colors
    * use the VF2 family's absolute-equality semantics (a color-1 vertex can
    * only map to a color-1 vertex of the OTHER graph), hence the shared
    * rank over the union below. Agrees with [[isomorphicVf2]] by
    * construction; cross-checked in the spec.
    */
  def isomorphicBliss(g1: LinkGraph, g2: LinkGraph,
                      color1: Option[Seq[Int]] = None,
                      color2: Option[Seq[Int]] = None,
                      maxCellPerms: Long = 1000000L): Boolean = {
    val a = collect(g1, color1)
    val b = collect(g2, color2)
    if (a.n != b.n || a.directed != b.directed) return false
    // shared dense rank across BOTH graphs' colors: per-graph ranking would
    // erase absolute color mismatches (g1 colors {1,2} vs g2 {1,3})
    val rank = (a.color ++ b.color).distinct.sorted.zipWithIndex.toMap
    val ca = a.color.map(rank).toSeq
    val cb = b.color.map(rank).toSeq
    if (ca.sorted != cb.sorted) return false
    val p1 = canonicalPermutation(g1, Some(ca), maxCellPerms)
    val p2 = canonicalPermutation(g2, Some(cb), maxCellPerms)
    def canonEdges(c: LocalG, p: Seq[Int]): Set[(Int, Int)] =
      (0 until c.n).flatMap(v => c.out(v).map(u => (p(v), p(u)))).toSet
    def canonColors(c: LocalG, cc: Seq[Int], p: Seq[Int]): Seq[Int] = {
      val arr = new Array[Int](c.n)
      (0 until c.n).foreach(v => arr(p(v)) = cc(v))
      arr.toSeq
    }
    canonEdges(a, p1) == canonEdges(b, p2) &&
      canonColors(a, ca, p1) == canonColors(b, cb, p2)
  }

  /** `get_isomorphisms_vf2` (`graphobject.c:15193`): EVERY isomorphism
    * g1 -> g2 as a mapping array (g1 position i maps to g2 position m(i));
    * same graph twice reproduces [[getAutomorphisms]], reference parity.
    */
  def getIsomorphisms(g1: LinkGraph, g2: LinkGraph,
                      color1: Option[Seq[Int]] = None,
                      color2: Option[Seq[Int]] = None,
                      maxResults: Int = 1 << 20): Seq[Array[Int]] = {
    val t = collect(g2, color2); val p = collect(g1, color1)
    if (t.n != p.n) return Seq.empty
    val res = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    search(t, p, induced = true, m => { res += m; res.length >= maxResults })
    res.toSeq
  }

  /** `get_subisomorphisms_vf2` (`graphobject.c:15357`): every embedding of
    * `pattern` into `g` as a mapping array; `induced = false` gives the
    * monomorphism (LAD-style) enumeration. Bounded by `maxResults` — the
    * embedding count is potentially factorial, so the cap is loud, not
    * silent: results.length == maxResults means truncation.
    */
  def getSubisomorphisms(g: LinkGraph, pattern: LinkGraph,
                         colorG: Option[Seq[Int]] = None,
                         colorP: Option[Seq[Int]] = None,
                         induced: Boolean = true,
                         maxResults: Int = 1 << 20): Seq[Array[Int]] = {
    val t = collect(g, colorG); val p = collect(pattern, colorP)
    val res = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    search(t, p, induced, m => { res += m; res.length >= maxResults })
    res.toSeq
  }

  /** Per-pattern-vertex domain lists (target vertex IDS) -> sets of target
    * POSITIONS in the kernel's sorted-id numbering (identity on dense ids).
    * Ids absent from the target silently shrink the domain — an unmatchable
    * id can never be mapped anyway; an EMPTY domain makes its pattern vertex
    * unmatchable, so the search correctly finds nothing (reference parity:
    * `domains=[[], ...]` -> False).
    */
  private def domainSets(g: LinkGraph, patternN: Int,
                         domains: Seq[Seq[Long]]): Array[Set[Int]] = {
    require(domains.size == patternN,
      s"domains must list one target-vertex set per pattern vertex (${domains.size} given, $patternN needed)")
    val idx = g.vertices.collect().map(_.getLong(0)).sorted.zipWithIndex.toMap
    domains.map(_.flatMap(idx.get).toSet).toArray
  }

  /** `subisomorphic_lad(other, domains, induced)` (`graphobject.c:9565,
    * 15446`): does `g` contain a subgraph isomorphic to `pattern`, LAD
    * semantics — MONOMORPHISM by default (`induced = false`, the opposite
    * default of [[subisomorphicVf2]]), with optional per-pattern-vertex
    * `domains` restricting which target vertices each pattern vertex may
    * map to. The reference runs the LAD solver; the semantics are identical
    * to the domain-constrained VF2 search this shares with the rest of the
    * family (same require-gated driver-kernel posture), so this is an API-
    * parity entry point, not a second solver. Goldens:
    * `tests/test_isomorphism.py:202-237`.
    */
  def subisomorphicLad(g: LinkGraph, pattern: LinkGraph,
                       domains: Option[Seq[Seq[Long]]] = None,
                       induced: Boolean = false): Boolean = {
    val t = collect(g, None); val p = collect(pattern, None)
    val dom = domains.map(domainSets(g, p.n, _))
    var found = false
    search(t, p, induced, _ => { found = true; true }, dom)
    found
  }

  /** `get_subisomorphisms_lad(other, domains, induced)` (`graphobject.c:
    * 9633,15474`): every LAD-semantics embedding of `pattern` into `g` as a
    * mapping array (pattern position i -> target position m(i)); an empty
    * pattern yields NO mappings (reference parity — unlike the boolean
    * face, which is vacuously true). Goldens:
    * `tests/test_isomorphism.py:239-285`.
    */
  def getSubisomorphismsLad(g: LinkGraph, pattern: LinkGraph,
                            domains: Option[Seq[Seq[Long]]] = None,
                            induced: Boolean = false,
                            maxResults: Int = 1 << 20): Seq[Array[Int]] = {
    val t = collect(g, None); val p = collect(pattern, None)
    if (p.n == 0) return Seq.empty
    val dom = domains.map(domainSets(g, p.n, _))
    val res = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    search(t, p, induced, m => { res += m; res.length >= maxResults }, dom)
    res.toSeq
  }
}
