package graft

import graft.algos.Triads
import graft.core.{GraphOps, LinkGraph}
import org.scalatest.funsuite.AnyFunSuite

/** Triad census hand-verified goldens (the reference only tests the result
  * type's accessors, `test_cliques.py:178-190` — values checked here by
  * hand against the class definitions) + inverse-log-weighted similarity.
  */
class TriadsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def census(edges: Seq[(Long, Long)], n: Int): Map[String, Long] =
    Triads.classNames.zip(Triads.triadCensus(
      LinkGraph(spark, n, edges, directed = true))).toMap

  test("out-star: 021D wedges + null triads") {
    val c = census(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)), 5)
    assert(c("021d") == 6 && c("003") == 4 && c.values.sum == 10)
    assert(c.filter { case (k, v) => v != 0 } == Map("021d" -> 6L, "003" -> 4L))
  }

  test("in-star: 021U wedges") {
    val c = census(Seq((1L, 0L), (2L, 0L), (3L, 0L)), 4)
    assert(c("021u") == 3 && c("003") == 1 && c.values.sum == 4)
  }

  test("mutual dyad + isolates: 102") {
    val c = census(Seq((0L, 1L), (1L, 0L)), 4)
    assert(c("102") == 2 && c("003") == 2 && c.values.sum == 4)
  }

  test("3-cycle is 030C; transitive triple is 030T; chain is 021C") {
    assert(census(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 3)("030c") == 1)
    assert(census(Seq((0L, 1L), (0L, 2L), (1L, 2L)), 3)("030t") == 1)
    assert(census(Seq((0L, 1L), (1L, 2L)), 3)("021c") == 1)
  }

  test("complete mutual triangle is 300; census sums to C(n,3) on a mixed graph") {
    assert(census(Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (1L, 2L), (2L, 1L)), 3)("300") == 1)
    val mixed = census(Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 3L), (3L, 1L), (0L, 4L), (4L, 5L)), 6)
    assert(mixed.values.sum == 20) // C(6,3)
  }

  test("motifs3 directed: matches brute-force induced-triple classification") {
    import graft.algos.Motifs
    import graft.core.Catalog
    val rnd = new scala.util.Random(7)
    val edges = for {
      i <- 0 until 7; j <- 0 until 7 if i != j && rnd.nextDouble() < 0.3
    } yield (i.toLong, j.toLong)
    val g = LinkGraph(spark, 7L, edges, directed = true)
    val got = Motifs.motifs3(g)
    assert(got.size == 16 && got.count(_.isDefined) == 13) // 3 disconnected classes
    val exp = Array.fill(16)(0L)
    for (a <- 0L until 7L; b <- a + 1 until 7; c <- b + 1 until 7) {
      val ids = Seq(a, b, c)
      val sub = edges.filter { case (x, y) => ids.contains(x) && ids.contains(y) }
        .map { case (x, y) => (ids.indexOf(x).toLong, ids.indexOf(y).toLong) }
      exp(Catalog.isoclassOf(LinkGraph(spark, 3L, sub, directed = true))) += 1
    }
    got.zipWithIndex.foreach { case (o, i) =>
      o.foreach(cnt => assert(cnt == exp(i), s"isoclass $i: $cnt vs ${exp(i)}"))
    }
    // motifs_randesu_no: total connected triples == brute-force count
    val bruteConnected = got.zipWithIndex.collect { case (Some(_), i) => exp(i) }.sum
    assert(Motifs.motifs3Count(g) == bruteConnected)
  }

  test("motifs3 directed: isoclass numbering frozen (MAN triad -> index) + fixed-digraph motif vector") {
    // round-3 ADVICE #1: the brute-force parity test classifies triples with
    // the same Catalog the engine uses, so it cannot catch an enumeration
    // change. This golden FREEZES the engine's canonical numbering — any
    // Catalog enumeration change fails loudly here. (The reference igraph
    // library's own isoclass tables are not available in this sandbox — its
    // C core is an absent submodule — so the pin is to the engine's
    // documented self-consistent enumeration, the same contract the
    // reference's motif vector has with its own tables.)
    import graft.core.Catalog
    import graft.algos.Motifs
    def iso(edges: (Long, Long)*): Int =
      Catalog.isoclassOf(LinkGraph(spark, 3L, edges, directed = true))
    val frozen = Seq(
      "003" -> iso() -> 0, "012" -> iso((0L, 1L)) -> 1,
      "021D" -> iso((1L, 0L), (1L, 2L)) -> 2,
      "102" -> iso((0L, 1L), (1L, 0L)) -> 3,
      "021C" -> iso((0L, 1L), (1L, 2L)) -> 4,
      "021U" -> iso((0L, 1L), (2L, 1L)) -> 5,
      "111U" -> iso((0L, 1L), (1L, 0L), (1L, 2L)) -> 6,
      "030T" -> iso((0L, 1L), (0L, 2L), (1L, 2L)) -> 7,
      "111D" -> iso((0L, 1L), (1L, 0L), (2L, 1L)) -> 8,
      "030C" -> iso((0L, 1L), (1L, 2L), (2L, 0L)) -> 9,
      "120U" -> iso((0L, 1L), (2L, 1L), (0L, 2L), (2L, 0L)) -> 10,
      "201" -> iso((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L)) -> 11,
      "120C" -> iso((0L, 1L), (1L, 2L), (0L, 2L), (2L, 0L)) -> 12,
      "120D" -> iso((1L, 0L), (1L, 2L), (0L, 2L), (2L, 0L)) -> 13,
      "210" -> iso((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 2L)) -> 14,
      "300" -> iso((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 2L), (2L, 0L)) -> 15)
    frozen.foreach { case ((man, got), want) =>
      assert(got == want, s"triad $man: isoclass $got, frozen golden $want")
    }
    // fixed digraph, hand-classified (all 10 triples independently assigned
    // a MAN class by inspection): 030C {0,1,2}; 021D {0,1,4}; 111U {0,2,3}
    // and {2,3,4}; 021C {0,2,4}; 021U {0,3,4}; 111D {1,2,3}; disconnected
    // {0,1,3},{1,2,4},{1,3,4}
    val g = LinkGraph(spark, 5L,
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 2L), (3L, 4L), (0L, 4L)),
      directed = true)
    val want: Seq[Option[Long]] = Seq(None, None, Some(1L), None, Some(1L),
      Some(1L), Some(2L), Some(0L), Some(1L), Some(1L), Some(0L), Some(0L),
      Some(0L), Some(0L), Some(0L), Some(0L))
    assert(Motifs.motifs3(g) == want)
  }

  test("motifs3 undirected: path/triangle counts and stable isoclass indices") {
    import graft.algos.Motifs
    // square + one diagonal: triangles = 2 (012, 023? vertices 0-3, edges
    // ring 0-1-2-3-0 plus 0-2): triangles {0,1,2} and {0,2,3}; induced
    // paths = wedges - 3*tri: degrees (3,2,3,2) -> 3+1+3+1=8 wedges -> 2
    val g = LinkGraph(spark, 4L,
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)), directed = false)
    val m = Motifs.motifs3(g)
    assert(m.size == 4)
    assert(m(0).isEmpty && m(1).isEmpty) // empty / single-edge: disconnected
    assert(m(2).contains(2L)) // induced paths
    assert(m(3).contains(2L)) // triangles
  }

  test("motifs4 undirected: fixed-shape goldens (K4, Ring(5), Star(5))") {
    import graft.algos.Motifs
    def named(g: LinkGraph) = Motifs.motifs4Named(g).toMap
    assert(named(LinkGraph.full(spark, 4)) ==
      Map("p4" -> 0L, "claw" -> 0L, "c4" -> 0L, "paw" -> 0L, "diamond" -> 0L, "k4" -> 1L))
    // C5: every 4-subset induces a P4
    assert(named(LinkGraph.ring(spark, 5)) ==
      Map("p4" -> 5L, "claw" -> 0L, "c4" -> 0L, "paw" -> 0L, "diamond" -> 0L, "k4" -> 0L))
    // Star(5): hub + 4 spokes -> C(4,3) claws
    assert(named(LinkGraph.star(spark, 5)) ==
      Map("p4" -> 0L, "claw" -> 4L, "c4" -> 0L, "paw" -> 0L, "diamond" -> 0L, "k4" -> 0L))
    // motifs vector: 11 classes, exactly 6 defined, count matches _no
    val v = Motifs.motifs4(LinkGraph.full(spark, 5))
    assert(v.size == 11 && v.count(_.isDefined) == 6)
    assert(Motifs.motifs4Count(LinkGraph.full(spark, 5)) == 5) // C(5,4) K4s
  }

  test("motifs4 undirected: matches brute-force induced classification across densities") {
    import graft.algos.Motifs
    val rnd = new scala.util.Random(23)
    for (p <- Seq(0.25, 0.4, 0.6)) {
      val n = 8
      val edges = (for {
        i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < p
      } yield (i.toLong, j.toLong)).toSeq
      val g = LinkGraph(spark, n.toLong, edges, directed = false)
      val eset = edges.toSet
      def adj(a: Long, b: Long) = eset.contains((math.min(a, b), math.max(a, b)))
      // classify each 4-subset by (internal edge count, sorted degree seq)
      val want = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for (s <- (0L until n).combinations(4)) {
        val ie = s.combinations(2).count { case Seq(a, b) => adj(a, b) }
        val ds = s.map(v => s.count(u => u != v && adj(u, v))).sorted
        val shape = (ie, ds) match {
          case (3, Seq(1, 1, 1, 3)) => "claw"
          case (3, Seq(1, 1, 2, 2)) => "p4"
          case (4, Seq(2, 2, 2, 2)) => "c4"
          case (4, Seq(1, 2, 2, 3)) => "paw"
          case (5, _)               => "diamond"
          case (6, _)               => "k4"
          case _                    => "disconnected-or-sparse"
        }
        if (shape != "disconnected-or-sparse") want(shape) += 1L
      }
      val got = Motifs.motifs4Named(g).toMap
      Seq("p4", "claw", "c4", "paw", "diamond", "k4").foreach { s =>
        assert(got(s) == want(s), s"p=$p shape=$s got=${got(s)} want=${want(s)} edges=$edges")
      }
    }
  }

  test("motifs4 directed: ESU census matches brute-force 4-subset classification") {
    import graft.algos.Motifs
    import graft.core.Catalog
    val rnd = new scala.util.Random(29)
    val table = Catalog.maskClassTable(4, directed = true)
    for (p <- Seq(0.15, 0.3, 0.45)) {
      val n = 8
      val edges = (for {
        i <- 0 until n; j <- 0 until n if i != j && rnd.nextDouble() < p
      } yield (i.toLong, j.toLong)).toSeq
      val g = LinkGraph(spark, n.toLong, edges, directed = true)
      val eset = edges.toSet
      val want = new Array[Long](218)
      for (s <- (0 until n).combinations(4)) {
        val within = for {
          a <- 0 until 4; b <- 0 until 4
          if a != b && eset.contains((s(a).toLong, s(b).toLong))
        } yield (a, b)
        val weak = {
          val par = Array(0, 1, 2, 3)
          def find(x: Int): Int = if (par(x) == x) x else { par(x) = find(par(x)); par(x) }
          within.foreach { case (a, b) => par(find(a)) = find(b) }
          (0 until 4).map(find).distinct.size == 1
        }
        if (weak) {
          var mask = 0
          within.foreach { case (a, b) => mask |= 1 << Catalog.dirPairIdx(4, a, b) }
          want(table(mask)) += 1
        }
      }
      val got = Motifs.motifs4Directed(g)
      assert(got.size == 218, "directed 4-isoclass count")
      got.zipWithIndex.foreach {
        case (Some(c), i) => assert(c == want(i), s"p=$p class=$i got=$c want=${want(i)}")
        case (None, i)    => assert(want(i) == 0L, s"p=$p class=$i should be disconnected")
      }
    }
  }

  test("motifs4 directed: mutual-arc digraph census cross-checks the independent undirected closed form") {
    import graft.algos.Motifs
    import graft.core.Catalog
    // the undirected path is closed-form statistics + Möbius inversion — a
    // fully independent algorithm; mutualizing every edge must reproduce it
    val rnd = new scala.util.Random(31)
    val n = 9
    val uedges = (for {
      i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.35
    } yield (i.toLong, j.toLong)).toSeq
    val gu = LinkGraph(spark, n.toLong, uedges, directed = false)
    val gd = LinkGraph(spark, n.toLong,
      uedges.flatMap { case (a, b) => Seq((a, b), (b, a)) }, directed = true)
    val dv = Motifs.motifs4Directed(gd)
    assert(Motifs.motifs4DirectedCount(gd) == Motifs.motifs4Count(gu))
    // per-shape: the directed class of each fully-mutualized undirected shape
    val shapes = Map(
      "p4" -> Seq((0, 1), (1, 2), (2, 3)),
      "claw" -> Seq((0, 1), (0, 2), (0, 3)),
      "c4" -> Seq((0, 1), (1, 2), (2, 3), (3, 0)),
      "paw" -> Seq((0, 1), (1, 2), (2, 0), (2, 3)),
      "diamond" -> Seq((0, 1), (1, 2), (2, 0), (0, 3), (1, 3)),
      "k4" -> Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)))
    val table = Catalog.maskClassTable(4, directed = true)
    val und = Motifs.motifs4Named(gu).toMap
    shapes.foreach { case (name, es) =>
      var mask = 0
      es.foreach { case (a, b) =>
        mask |= 1 << Catalog.dirPairIdx(4, a, b)
        mask |= 1 << Catalog.dirPairIdx(4, b, a)
      }
      assert(dv(table(mask)).contains(und(name)), s"shape $name")
    }
  }

  test("motifs4 directed RAND-ESU sampling: zeros == exact; unbiased estimate over seeds") {
    import graft.algos.Motifs
    val rnd = new scala.util.Random(37)
    val n = 9
    val edges = (for {
      i <- 0 until n; j <- 0 until n if i != j && rnd.nextDouble() < 0.3
    } yield (i.toLong, j.toLong)).toSeq
    val g = LinkGraph(spark, n.toLong, edges, directed = true)
    val exact = Motifs.motifs4Directed(g)
    // cut_prob all zero reproduces the exact census
    assert(Motifs.motifs4DirectedSampled(g, Seq(0.0, 0.0, 0.0, 0.0))
      .map(_.map(_.toLong)) == exact)
    // deterministic per seed
    val s1 = Motifs.motifs4DirectedSampled(g, Seq(0.0, 0.0, 0.3, 0.3), seed = 5L)
    assert(s1 == Motifs.motifs4DirectedSampled(g, Seq(0.0, 0.0, 0.3, 0.3), seed = 5L))
    // unbiased: the seed-averaged estimate of the total approaches the truth
    val total = exact.flatten.sum.toDouble
    val est = (1 to 40).map { s =>
      Motifs.motifs4DirectedSampled(g, Seq(0.0, 0.2, 0.3, 0.3), seed = s.toLong)
        .flatten.sum
    }.sum / 40.0
    assert(math.abs(est - total) / total < 0.15, s"estimate $est vs exact $total")
    // invalid cut_prob fails loudly
    intercept[IllegalArgumentException](
      Motifs.motifs4DirectedSampled(g, Seq(0.0, 0.0, 1.0, 0.0)))
  }

  test("motifs3 RAND-ESU sampling: zeros == exact (both directednesses); unbiased estimate") {
    import graft.algos.Motifs
    val rnd = new scala.util.Random(11)
    val n = 12
    val dEdges = (for {
      i <- 0 until n; j <- 0 until n if i != j && rnd.nextDouble() < 0.25
    } yield (i.toLong, j.toLong)).toSeq
    val gd = LinkGraph(spark, n.toLong, dEdges, directed = true)
    val gu = LinkGraph(spark, n.toLong, dEdges, directed = false)
    // cut_prob all zero reproduces the exact (distributed closed-form) census
    assert(Motifs.motifs3Sampled(gd, Seq(0.0, 0.0, 0.0)).map(_.map(_.toLong)) ==
      Motifs.motifs3(gd))
    assert(Motifs.motifs3Sampled(gu, Seq(0.0, 0.0, 0.0)).map(_.map(_.toLong)) ==
      Motifs.motifs3(gu))
    // deterministic per seed
    val s1 = Motifs.motifs3Sampled(gd, Seq(0.0, 0.3, 0.3), seed = 5L)
    assert(s1 == Motifs.motifs3Sampled(gd, Seq(0.0, 0.3, 0.3), seed = 5L))
    // unbiased: seed-averaged total approaches the exact count (like motifs4's)
    val total = Motifs.motifs3Count(gd).toDouble
    val est = (1 to 40).map(s =>
      Motifs.motifs3Sampled(gd, Seq(0.2, 0.3, 0.2), seed = s.toLong).flatten.sum).sum / 40.0
    assert(math.abs(est - total) / total < 0.15, s"estimate $est vs exact $total")
    // estimate face: sampleFrac 1.0 is exact; invalid inputs fail loudly
    assert(Motifs.motifs3Estimate(gd, 1.0) == total)
    intercept[IllegalArgumentException](Motifs.motifs3Estimate(gd, 0.0))
    intercept[IllegalArgumentException](Motifs.motifs3Sampled(gd, Seq(0.0, 1.0, 0.0)))
  }

  test("motifs4 directed: goldens, vector shape and the kernel gate") {
    import graft.algos.Motifs
    // directed 4-cycle: exactly one connected 4-set, its own class
    val c4 = LinkGraph(spark, 4L, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), directed = true)
    val v = Motifs.motifs4Directed(c4)
    assert(v.flatten.sum == 1L && v.exists(_.contains(1L)))
    // out-star on 5 vertices: C(4,3) = 4 out-claws
    val star = LinkGraph(spark, 5L, (1 to 4).map(i => (0L, i.toLong)), directed = true)
    assert(Motifs.motifs4DirectedCount(star) == 4L)
    val big = LinkGraph(spark, 5000L, Seq((0L, 1L)), directed = true)
    intercept[IllegalArgumentException](Motifs.motifs4Directed(big))
    assert(Motifs.motifs4DirectedCount(big, maxKernelVertices = 5000) == 0L)
  }

  test("inverse-log-weighted similarity: shared hub weighted by 1/ln(deg)") {
    // 0 and 1 share neighbors 2 (deg 3) and 3 (deg 2)
    val g = LinkGraph(spark, 5,
      Seq((0L, 2L), (1L, 2L), (4L, 2L), (0L, 3L), (1L, 3L)), directed = false)
    val ilw = GraphOps.similarityInverseLogWeighted(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = 1.0 / math.log(3.0) + 1.0 / math.log(2.0)
    assert(math.abs(ilw((0L, 1L)) - want) < 1e-12)
    assert(math.abs(ilw((0L, 4L)) - 1.0 / math.log(3.0)) < 1e-12)
  }
}
