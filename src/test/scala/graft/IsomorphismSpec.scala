package graft

import graft.algos.Isomorphism
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** VF2 goldens from /root/reference/tests/test_isomorphism.py. */
class IsomorphismSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // the two isomorphic cubic graphs from testIsomorphic
  def g1 = LinkGraph(spark, 8, Seq((0L, 4L), (0L, 5L), (0L, 6L), (1L, 4L), (1L, 5L),
    (1L, 7L), (2L, 4L), (2L, 6L), (2L, 7L), (3L, 5L), (3L, 6L), (3L, 7L)), directed = false)
  def g2 = LinkGraph(spark, 8, Seq((0L, 1L), (0L, 3L), (0L, 4L), (2L, 3L), (2L, 1L),
    (2L, 6L), (5L, 1L), (5L, 4L), (5L, 6L), (7L, 3L), (7L, 6L), (7L, 4L)), directed = false)

  test("isomorphic + valid mapping + self-isomorphism (test_isomorphism.py:18-72)") {
    assert(Isomorphism.isomorphicVf2(g1, g2))
    val m = Isomorphism.isomorphicMapping(g1, g2).get
    // the mapping must be a bijection preserving edges both ways (induced)
    assert(m.toSet.size == 8)
    val e1 = Seq((0, 4), (0, 5), (0, 6), (1, 4), (1, 5), (1, 7), (2, 4), (2, 6),
      (2, 7), (3, 5), (3, 6), (3, 7)).map { case (a, b) => Set(a, b) }.toSet
    val e2 = Seq((0, 1), (0, 3), (0, 4), (2, 3), (2, 1), (2, 6), (5, 1), (5, 4),
      (5, 6), (7, 3), (7, 6), (7, 4)).map { case (a, b) => Set(a, b) }.toSet
    assert(e1.map(s => s.map(m)) == e2)
    assert(Isomorphism.isomorphicVf2(g1, g1))
    // non-isomorphic pair: same degrees, different structure (C6 vs 2xC3)
    val c6 = LinkGraph.ring(spark, 6)
    val c33 = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L)), directed = false)
    assert(!Isomorphism.isomorphicVf2(c6, c33))
  }

  test("vertex-colored isomorphism (test_isomorphism.py:74-81)") {
    assert(Isomorphism.isomorphicVf2(g1, g2,
      Some(Seq(0, 1, 0, 1, 0, 1, 0, 1)), Some(Seq(0, 0, 1, 1, 0, 0, 1, 1))))
    assert(!Isomorphism.isomorphicVf2(g1, g2,
      Some(Seq(0, 1, 0, 1, 0, 1, 0, 1)), Some(Seq(0, 0, 1, 1, 0, 1, 1, 0))))
  }

  test("isomorphic_bliss: canonical-form decision incl. colors (test_isomorphism.py:61-100)") {
    assert(Isomorphism.isomorphicBliss(g1, g2))
    assert(Isomorphism.isomorphicBliss(g1, g1))
    // color goldens from the reference bliss block
    assert(Isomorphism.isomorphicBliss(g1, g2,
      Some(Seq.fill(8)(0)), Some(Seq.fill(8)(0))))
    assert(Isomorphism.isomorphicBliss(g1, g2,
      Some(Seq(1, 0, 2, 0, 0, 0, 0, 0)), Some(Seq(1, 0, 2, 0, 0, 0, 0, 0))))
    assert(Isomorphism.isomorphicBliss(g1, g2,
      Some(Seq(0, 1, 0, 1, 0, 1, 0, 1)), Some(Seq(0, 0, 1, 1, 0, 0, 1, 1))))
    // the VF2 negative color case must be negative here too
    assert(!Isomorphism.isomorphicBliss(g1, g2,
      Some(Seq(0, 1, 0, 1, 0, 1, 0, 1)), Some(Seq(0, 0, 1, 1, 0, 1, 1, 0))))
    // absolute color semantics: same structure, colors {1,2} vs {1,3}
    assert(!Isomorphism.isomorphicBliss(g1, g1,
      Some(Seq(1, 2, 1, 2, 1, 2, 1, 2)), Some(Seq(1, 3, 1, 3, 1, 3, 1, 3))))
    // WL-equivalent non-isomorphic pair
    val c6 = LinkGraph.ring(spark, 6)
    val c33 = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L)), directed = false)
    assert(!Isomorphism.isomorphicBliss(c6, c33))
    // random relabeled pairs: bliss agrees with VF2
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 5) {
      val n = 8
      val edges = (for {
        i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.4
      } yield (i.toLong, j.toLong)).toSeq
      val g = LinkGraph(spark, n, edges, directed = false)
      val relab = rnd.shuffle((0 until n).toList)
      val h = LinkGraph(spark, n,
        edges.map { case (a, b) => (relab(a.toInt).toLong, relab(b.toInt).toLong) },
        directed = false)
      assert(Isomorphism.isomorphicBliss(g, h) == Isomorphism.isomorphicVf2(g, h))
      assert(Isomorphism.isomorphicBliss(g, h))
    }
  }

  test("count/get automorphisms (test_isomorphism.py:153-199)") {
    assert(Isomorphism.countAutomorphisms(LinkGraph.full(spark, 4)) == 24L)
    val ladder = LinkGraph(spark, 6,
      Seq((0L, 1L), (2L, 3L), (4L, 5L), (0L, 2L), (2L, 4L), (1L, 3L), (3L, 5L)), directed = false)
    assert(Isomorphism.countAutomorphisms(ladder) == 4L)
    assert(Isomorphism.getAutomorphisms(ladder).map(_.toSeq).toSet == Set(
      Seq(0, 1, 2, 3, 4, 5), Seq(1, 0, 3, 2, 5, 4), Seq(4, 5, 2, 3, 0, 1), Seq(5, 4, 3, 2, 1, 0)))
    // colored automorphism counts on Full(4)
    val k4 = LinkGraph.full(spark, 4)
    assert(Isomorphism.countAutomorphisms(k4, Some(Seq(0, 1, 1, 0))) == 4L)
    assert(Isomorphism.countAutomorphisms(k4, Some(Seq(0, 1, 2, 0))) == 2L)
    assert(Isomorphism.getAutomorphisms(k4, Some(Seq(0, 1, 1, 0))).map(_.toSeq).toSet ==
      Set(Seq(0, 1, 2, 3), Seq(0, 2, 1, 3), Seq(3, 1, 2, 0), Seq(3, 2, 1, 0)))
  }

  test("subisomorphism: containment + counts + colors (test_isomorphism.py:287-332)") {
    val lat3 = LinkGraph.lattice(spark, Seq(3, 3))
    val pat = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (1L, 3L)), directed = false)
    assert(Isomorphism.subisomorphicVf2(lat3, pat))
    assert(!Isomorphism.subisomorphicVf2(pat, lat3))
    val lat2 = LinkGraph.lattice(spark, Seq(2, 2))
    assert(Isomorphism.countSubisomorphisms(lat3, lat2) == 32L)
    assert(Isomorphism.countSubisomorphisms(lat2, lat3) == 0L)
    // colors: center of the 3x3 grid colored 1, pattern leaf colored 1
    assert(Isomorphism.countSubisomorphisms(lat3, pat,
      Some(Seq(0, 0, 0, 0, 1, 0, 0, 0, 0)), Some(Seq(1, 0, 0, 0))) == 8L)
    // directed containment: C3 inside directed C6? no; inside directed C3+tail yes
    val c6d = LinkGraph(spark, 6, (0 until 6).map(i => (i.toLong, (i + 1) % 6L)), directed = true)
    val c3d = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L), (2L, 0L)), directed = true)
    assert(!Isomorphism.subisomorphicVf2(c6d, c3d))
    val c3tail = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)), directed = true)
    assert(Isomorphism.subisomorphicVf2(c3tail, c3d))
  }

  test("get_isomorphisms / get_subisomorphisms: full enumeration (graphobject.c:15193,15357)") {
    // every enumerated mapping is a valid bijection; count matches count_*
    val maps = Isomorphism.getIsomorphisms(g1, g2)
    assert(maps.length == Isomorphism.countIsomorphisms(g1, g2))
    assert(maps.forall(_.toSet.size == 8))
    val e2 = Seq((0, 1), (0, 3), (0, 4), (2, 3), (2, 1), (2, 6), (5, 1), (5, 4),
      (5, 6), (7, 3), (7, 6), (7, 4)).map { case (a, b) => Set(a, b) }.toSet
    val e1 = Seq((0, 4), (0, 5), (0, 6), (1, 4), (1, 5), (1, 7), (2, 4), (2, 6),
      (2, 7), (3, 5), (3, 6), (3, 7)).map { case (a, b) => Set(a, b) }.toSet
    assert(maps.forall(m => e1.map(s => s.map(m)) == e2))
    // same graph twice == automorphisms
    val ladder = LinkGraph(spark, 6,
      Seq((0L, 1L), (2L, 3L), (4L, 5L), (0L, 2L), (2L, 4L), (1L, 3L), (3L, 5L)), directed = false)
    assert(Isomorphism.getIsomorphisms(ladder, ladder).map(_.toSeq).toSet ==
      Isomorphism.getAutomorphisms(ladder).map(_.toSeq).toSet)
    // size mismatch -> empty
    assert(Isomorphism.getIsomorphisms(ladder, LinkGraph.full(spark, 4)).isEmpty)
    // subisomorphism enumeration count matches count_subisomorphisms; each
    // embedding preserves pattern edges
    val lat3 = LinkGraph.lattice(spark, Seq(3, 3))
    val pat = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (1L, 3L)), directed = false)
    val subs = Isomorphism.getSubisomorphisms(lat3, pat)
    assert(subs.length == Isomorphism.countSubisomorphisms(lat3, pat))
    assert(subs.nonEmpty && subs.forall(_.toSet.size == 4))
    // maxResults cap is loud: exactly maxResults rows returned on truncation
    assert(Isomorphism.getSubisomorphisms(lat3, pat, maxResults = 3).length == 3)
  }

  test("canonical_permutation: isomorphic graphs canonicalize identically (graphobject.c:15135)") {
    def canonEdges(g: LinkGraph): Set[Set[Int]] = {
      val perm = Isomorphism.canonicalPermutation(g)
      g.weighted.select("src", "dst").collect()
        .map(r => Set(perm(r.getLong(0).toInt), perm(r.getLong(1).toInt))).toSet
    }
    // the two isomorphic cubic graphs -> identical canonical edge sets
    assert(canonEdges(g1) == canonEdges(g2))
    // random graph vs a relabeled copy: identical canonical form
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 5) {
      val n = 9
      val edges = (for {
        i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.35
      } yield (i.toLong, j.toLong)).toSeq
      val g = LinkGraph(spark, n, edges, directed = false)
      val relab = rnd.shuffle((0 until n).toList)
      val h = LinkGraph(spark, n,
        edges.map { case (a, b) => (relab(a.toInt).toLong, relab(b.toInt).toLong) },
        directed = false)
      assert(canonEdges(g) == canonEdges(h))
    }
    // non-isomorphic WL-equivalent pair (C6 vs 2xC3, both 2-regular):
    // brute within-cell search still separates them
    val c6 = LinkGraph.ring(spark, 6)
    val c33 = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L)), directed = false)
    assert(canonEdges(c6) != canonEdges(c33))
    // result is a true permutation
    val p = Isomorphism.canonicalPermutation(g1)
    assert(p.sorted == (0 until 8))
    // symmetric-space gate is loud
    intercept[IllegalArgumentException](
      Isomorphism.canonicalPermutation(LinkGraph.full(spark, 12), maxCellPerms = 1000L))
    // factorial overflow cannot slip the gate: a 25-vertex WL cell's 25!
    // wraps a Long, but the saturating product still fails loudly (and
    // fast) instead of enumerating factorially many permutations
    intercept[IllegalArgumentException](
      Isomorphism.canonicalPermutation(LinkGraph.full(spark, 25)))
  }

  // --- LAD API parity (round-4 verdict ask #6) ------------------------------
  // g3 = the 3x3 lattice plus the reference's 8 extra edges
  private def latticeExtra: LinkGraph = {
    val base = LinkGraph.lattice(spark, Seq(3, 3)).weighted
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val extra = Seq((0L, 4L), (2L, 4L), (6L, 4L), (8L, 4L),
      (3L, 1L), (1L, 5L), (5L, 7L), (7L, 3L))
    LinkGraph(spark, 9, base ++ extra, directed = false)
  }
  private val fullDomain: Seq[Long] = Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L)

  test("subisomorphic_lad: monomorphism default, induced, domains, corners (test_isomorphism.py:202-237)") {
    val g = LinkGraph.lattice(spark, Seq(3, 3))
    val pat = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (1L, 3L)), directed = false)
    val g3 = latticeExtra
    assert(Isomorphism.subisomorphicLad(g, pat))
    assert(!Isomorphism.subisomorphicLad(pat, g))
    // induced: g3 has no induced 3x3-lattice copy, but a monomorphic one
    assert(!Isomorphism.subisomorphicLad(g3, g, induced = true))
    assert(Isomorphism.subisomorphicLad(g3, g, induced = false))
    assert(Isomorphism.subisomorphicLad(g3, g))
    assert(Isomorphism.subisomorphicLad(g3, pat, induced = true))
    assert(Isomorphism.subisomorphicLad(g3, pat))
    // domain-constrained: pattern center pinned to lattice center 4
    assert(Isomorphism.subisomorphicLad(g, pat,
      Some(Seq(Seq(4L), fullDomain, fullDomain, fullDomain))))
    // empty domain for a pattern vertex -> unmatchable
    assert(!Isomorphism.subisomorphicLad(g, pat,
      Some(Seq(Seq.empty, fullDomain, fullDomain, fullDomain))))
    // corner cases: empty pattern is vacuously contained
    val empty = LinkGraph(spark, 0, Seq.empty, directed = false)
    assert(Isomorphism.subisomorphicLad(g, empty))
    assert(Isomorphism.subisomorphicLad(empty, empty))
  }

  test("get_subisomorphisms_lad: full enumeration + induced + domains (test_isomorphism.py:239-285)") {
    import scala.math.Ordering.Implicits.seqOrdering
    val g = LinkGraph.lattice(spark, Seq(3, 3))
    val c4 = LinkGraph(spark, 4,
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), directed = false)
    val g3 = latticeExtra
    val allSubiso = ("0143 0341 1034 1254 1430 1452 2145 2541 3014 3410 3476 " +
      "3674 4103 4125 4301 4367 4521 4587 4763 4785 5214 5412 5478 5874 6347 " +
      "6743 7436 7458 7634 7854 8547 8745")
      .split(" ").toSeq.map(_.map(_.asDigit).toVector).sorted
    assert(Isomorphism.getSubisomorphismsLad(g, c4)
      .map(_.toVector).sorted == allSubiso)
    assert(Isomorphism.getSubisomorphismsLad(c4, g).isEmpty)
    // induced: only the diamond 1-3-7-5 (and its symmetries) is an INDUCED C4 in g3
    val inducedSubiso = "1375 1573 3751 5731 7513 7315 5137 3157"
      .split(" ").toSeq.map(_.map(_.asDigit).toVector).sorted
    assert(Isomorphism.getSubisomorphismsLad(g3, c4, induced = true)
      .map(_.toVector).sorted == inducedSubiso)
    assert(Isomorphism.getSubisomorphismsLad(g3, g, induced = true).isEmpty)
    // domains: pin the pattern's first vertex to the lattice center
    val dom = Some(Seq(Seq(4L), fullDomain, fullDomain, fullDomain))
    assert(Isomorphism.getSubisomorphismsLad(g, c4, dom)
      .map(_.toVector).sorted == allSubiso.filter(_.head == 4))
    val domEmpty = Some(Seq(Seq.empty[Long], fullDomain, fullDomain, fullDomain))
    assert(Isomorphism.getSubisomorphismsLad(g, c4, domEmpty).isEmpty)
    // corner cases: an empty pattern enumerates NO mappings (unlike the
    // vacuously-true boolean face — reference parity)
    val empty = LinkGraph(spark, 0, Seq.empty, directed = false)
    assert(Isomorphism.getSubisomorphismsLad(g, empty).isEmpty)
    assert(Isomorphism.getSubisomorphismsLad(empty, empty).isEmpty)
  }

  test("kernel gate refuses oversized graphs") {
    val big = LinkGraph(spark, Isomorphism.maxKernelVertices + 1,
      Seq((0L, 1L)), directed = false)
    val e = intercept[IllegalArgumentException](Isomorphism.isomorphicVf2(big, big))
    assert(e.getMessage.contains("driver kernel"))
  }
}
