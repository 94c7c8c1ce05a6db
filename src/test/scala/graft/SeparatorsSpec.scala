package graft

import graft.algos.Separators
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** Separator / cohesive-blocks / st-cut goldens from
  * /root/reference/tests/test_separators.py, test_decomposition.py:485-554,
  * test_flow.py:136-196.
  */
class SeparatorsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("is_separator / is_minimal_separator on Lattice([8,4]) (test_separators.py:14-37)") {
    // igraph's Lattice([8,4]) numbers the FIRST dimension fastest — our
    // lattice numbers the last fastest, so [8,4] there == Seq(4,8) here
    val flat = LinkGraph.lattice(spark, Seq(4, 8))
    assert(Separators.isSeparator(flat, Seq(3L, 11L, 19L, 27L)))
    assert(!Separators.isSeparator(flat, Seq(10L, 11L, 18L, 19L)))
    assert(Separators.isSeparator(flat, Seq(29L, 20L, 11L, 2L)))
    assert(Separators.isSeparator(flat, Seq(16L, 25L, 17L)))
    val circ = LinkGraph.lattice(spark, Seq(4, 8), circular = true)
    assert(!Separators.isSeparator(circ, Seq(3L, 11L, 19L, 27L)))
    assert(!Separators.isSeparator(circ, Seq(29L, 20L, 11L, 2L)))
    assert(!Separators.isSeparator(circ, (0L until 32L).toSeq))
    assert(Separators.isMinimalSeparator(flat, Seq(3L, 11L, 19L, 27L)))
    assert(!Separators.isMinimalSeparator(flat, Seq(3L, 11L, 19L, 27L, 28L)))
    assert(!Separators.isMinimalSeparator(flat, Seq(16L, 25L, 17L)))
    assert(Separators.isMinimalSeparator(flat, Seq(16L, 25L)))
    assert(!Separators.isMinimalSeparator(flat, (0L until 32L).toSeq))
  }

  test("all_minimal_st_separators == exactly the minimal separators (Petersen powerset, test_separators.py:39-46)") {
    // Petersen: outer C5 0-4, inner pentagram 5-9, spokes
    val petersen = LinkGraph(spark, 10,
      (0 until 5).flatMap(i => Seq((i.toLong, ((i + 1) % 5).toLong),
        (i.toLong, (i + 5).toLong), ((i + 5).toLong, ((i + 2) % 5 + 5).toLong))),
      directed = false)
    val listed = Separators.allMinimalStSeparators(petersen)
      .collect().map(_.getSeq[Long](0).toSet).toSet
    // powerset cross-check (subsets of size 1..6 keep the test fast; the
    // minimum separators have size 3 and minimality fails fast above)
    for (k <- 1 to 6; s <- (0L until 10L).combinations(k)) {
      assert(listed.contains(s.toSet) == Separators.isMinimalSeparator(petersen, s),
        s"subset $s")
    }
  }

  test("minimum_size_separators subset-of-minimal + size census (test_separators.py:48-60, zachary)") {
    val zachary = graft.core.Generators.famous(spark, "zachary")
    val minimal = Separators.allMinimalStSeparators(zachary)
      .collect().map(_.getSeq[Long](0).toSet).toSet
    val minsize = Separators.minimumSizeSeparators(zachary)
      .collect().map(_.getSeq[Long](0).toSet).toSeq
    assert(minsize.toSet.subsetOf(minimal))
    assert(minsize.toSet.size == minsize.size)
    val size = minsize.head.size
    assert(minsize.forall(_.size == size))
    assert(minimal.count(_.size == size) == minsize.size)
    // zachary's vertex connectivity is 1 (pendant vertex 11)
    assert(size == 1)
  }

  test("cohesive_blocks: R-manual fixture (test_decomposition.py:496-520)") {
    val base = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 2))
    val edges = (for (c <- 0 until 3; (a, b) <- base) yield (a + 6 * c.toLong, b + 6 * c.toLong)) ++
      Seq((0L, 6L), (1L, 7L), (0L, 12L), (4L, 0L), (4L, 1L))
    val g = LinkGraph(spark, 18, edges, directed = false)
    val blocks = Separators.cohesiveBlocks(g)
    val got = blocks.map(b => (b.vertices.toSet, b.cohesion, b.parent.map(_.toSet))).toSet
    val R = (0L until 18L).toSet
    val A = Set(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L)
    val B = (12L until 17L).toSet
    val want = Set(
      (R, 1, None),
      (A, 2, Some(R)),
      (B, 2, Some(R)),
      ((0L until 5L).toSet, 4, Some(A)),
      ((6L until 10L).toSet, 3, Some(A)),
      ((12L until 16L).toSet, 3, Some(B)))
    assert(got == want)
    // max cohesion per vertex (reference golden)
    val wantMax = Seq(4, 4, 4, 4, 4, 1, 3, 3, 3, 3, 2, 1, 3, 3, 3, 3, 2, 1)
    val maxC = (0L until 18L).map(v =>
      blocks.filter(_.vertices.contains(v)).map(_.cohesion).max)
    assert(maxC == wantMax)
  }

  test("cohesive_blocks: Moody-White fixture (test_decomposition.py:522-551)") {
    // Graph.Formula translated to 0-based edges
    val spec = Seq(
      1 -> Seq(2, 3, 4, 5, 6), 2 -> Seq(3, 4, 5, 7), 3 -> Seq(4, 6, 7),
      4 -> Seq(5, 6, 7), 5 -> Seq(6, 7, 21), 6 -> Seq(7), 7 -> Seq(8, 11, 14, 19),
      8 -> Seq(9, 11, 14), 9 -> Seq(10), 10 -> Seq(12, 13), 11 -> Seq(12, 14),
      12 -> Seq(16), 13 -> Seq(16), 14 -> Seq(15), 15 -> Seq(16),
      17 -> Seq(18, 19, 20), 18 -> Seq(20, 21), 19 -> Seq(20, 22, 23),
      20 -> Seq(21), 21 -> Seq(22, 23), 22 -> Seq(23))
    val edges = spec.flatMap { case (a, bs) => bs.map(b => (a - 1L, b - 1L)) }
    val g = LinkGraph(spark, 23, edges, directed = false)
    val blocks = Separators.cohesiveBlocks(g)
    val got = blocks.map(b => (b.vertices.toSet, b.cohesion, b.parent.map(_.toSet))).toSet
    val root = (0L until 23L).toSet
    val b1 = (0L until 7L).toSet ++ (16L until 23L).toSet
    val b2 = (6L until 16L).toSet
    val want = Set(
      (root, 1, None),
      (b1, 2, Some(root)),
      (b2, 2, Some(root)),
      ((0L until 7L).toSet, 5, Some(b1)),
      (Set(6L, 7L, 10L, 13L), 3, Some(b2)))
    assert(got == want)
  }

  test("all_st_cuts on the simple digraph + ladder (test_flow.py:136-172)") {
    val g = LinkGraph.weighted(spark, 4, Seq(
      (0L, 1L, 4.0), (0L, 2L, 2.0), (1L, 2L, 10.0), (1L, 3L, 2.0), (2L, 3L, 2.0)),
      directed = true)
    val cuts = Separators.allStCuts(g, 0L, 3L)
    val got = cuts.map(c => c.membership -> c.value).toMap
    assert(got == Map(
      Seq(0, 1, 1, 1) -> 2.0, Seq(0, 0, 1, 1) -> 3.0,
      Seq(0, 1, 0, 1) -> 2.0, Seq(0, 0, 0, 1) -> 2.0))
    cuts.foreach(c => assert(c.cutEdges.size == c.value.toInt))
    // one-way ladder: 36 minimal cuts, values in [2, 6]
    val el = (0 until 5).map(i => (i.toLong, i + 1L)) ++
      (6 until 11).map(i => (i.toLong, i + 1L)) ++
      (0 until 6).map(i => (i.toLong, i + 6L))
    val ladder = LinkGraph(spark, 12, el, directed = true)
    val lc = Separators.allStCuts(ladder, 0L, 11L)
    assert(lc.size == 36)
    assert(lc.map(_.membership).toSet.size == 36)
    assert(lc.forall(c => c.value >= 2 && c.value <= 6))
  }

  test("all_st_mincuts on the mutual ladder: 7 cuts of value 2 (test_flow.py:174-186)") {
    val el = ((0 until 5).map(i => (i.toLong, i + 1L)) ++
      (6 until 11).map(i => (i.toLong, i + 1L)) ++
      (0 until 6).map(i => (i.toLong, i + 6L)))
    val mutual = el.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val g = LinkGraph(spark, 12, mutual, directed = true)
    val cuts = Separators.allStMincuts(g, 0L, 11L)
    assert(cuts.size == 7)
    assert(cuts.map(_.membership).toSet.size == 7)
    assert(cuts.forall(_.value == 2.0))
  }
}
