package graft

import graft.algos.{Centrality, PageRank}
import graft.core.Catalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Graph.Atlas` / `Graph.Isoclass` / `g.isoclass()` — structural contracts
  * plus the reference's property suite (`tests/test_atlas.py:6-165`) on a
  * deterministic sample (the reference sweeps all 1253+234 graphs in-process;
  * each of ours is a distributed job, so we sample with a fixed stride —
  * every shape family is still hit because the catalog is sorted by size).
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("atlas catalog: 1253 graphs, per-order counts match OEIS A000088") {
    val byN = Catalog.atlasEntries.groupBy(_._1).view.mapValues(_.size).toMap
    assert(Catalog.atlasEntries.size == 1253)
    assert((0 to 7).map(byN) == Seq(1, 1, 2, 4, 11, 34, 156, 1044))
    // all entries pairwise distinct (canonical masks are class invariants)
    assert(Catalog.atlasEntries.distinct.size == 1253)
  }

  test("atlas ordering: vertex count, then edges, monotone within the book sort") {
    val ns = Catalog.atlasEntries.map(_._1)
    assert(ns == ns.sorted, "vertex count must be non-decreasing")
    // within fixed n, edge count non-decreasing
    Catalog.atlasEntries.groupBy(_._1).foreach { case (_, es) =>
      val ms = es.map(e => java.lang.Long.bitCount(e._2))
      assert(ms == ms.sorted)
    }
    // first entries: K0, K1, 2-vertex empty, 2-vertex K2
    assert(Catalog.atlas(spark, 0).vcount() == 0)
    assert(Catalog.atlas(spark, 1).vcount() == 1 && Catalog.atlas(spark, 1).ecount() == 0)
    assert(Catalog.atlas(spark, 3).vcount() == 2 && Catalog.atlas(spark, 3).ecount() == 1)
    // last entry: K7
    assert(Catalog.atlas(spark, 1252).vcount() == 7 && Catalog.atlas(spark, 1252).ecount() == 21)
  }

  test("isoclass counts match OEIS A000273 (directed) / A000088 (undirected)") {
    assert(Catalog.isoclassCount(3, directed = true) == 16)
    assert(Catalog.isoclassCount(4, directed = true) == 218)
    assert(Catalog.isoclassCount(3, directed = false) == 4)
    assert(Catalog.isoclassCount(4, directed = false) == 11)
    assert(Catalog.isoclassCount(5, directed = false) == 34)
    assert(Catalog.isoclassCount(6, directed = false) == 156)
  }

  test("isoclass endpoints: class 0 empty, top class complete (igraph's documented invariant)") {
    for ((n, dir) <- Seq((3, true), (4, true), (4, false), (6, false))) {
      val top = Catalog.isoclassCount(n, dir) - 1
      assert(Catalog.isoclass(spark, n, 0, dir).ecount() == 0L)
      val full = Catalog.isoclass(spark, n, top, dir)
      val expect = if (dir) n.toLong * (n - 1) else n.toLong * (n - 1) / 2
      assert(full.ecount() == expect)
    }
  }

  test("isoclass round-trip: create -> classify is the identity") {
    for (c <- 0 until 16)
      assert(Catalog.isoclassOf(Catalog.isoclass(spark, 3, c, directed = true)) == c)
    for (c <- 0 until 218 by 13)
      assert(Catalog.isoclassOf(Catalog.isoclass(spark, 4, c, directed = true)) == c)
    for (c <- 0 until 156 by 11)
      assert(Catalog.isoclassOf(Catalog.isoclass(spark, 6, c, directed = false)) == c)
  }

  test("isoclassOf is permutation-invariant (the whole point of the class id)") {
    // house graph relabeled two ways -> same class
    val a = core.LinkGraph(spark, 5, Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)),
      directed = false)
    val b = core.LinkGraph(spark, 5, Seq((4L, 3L), (4L, 2L), (3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L)),
      directed = false)
    assert(Catalog.isoclassOf(a) == Catalog.isoclassOf(b))
  }

  test("atlas property sweep: pagerank sums to 1, nonneg (test_atlas.py:7-32)") {
    // fixed-stride sample across the catalog (plus the K7 endpoint)
    val idxs = (1 until 1253 by 149) :+ 1252
    for (idx <- idxs) {
      val g = Catalog.atlas(spark, idx)
      val pr = PageRank.run(g, tol = 1e-9).ranks.agg(
        sum("rank").as("s"), min("rank").as("mn")).head
      assert(math.abs(pr.getDouble(0) - 1.0) < 1e-5, s"atlas #$idx pagerank sum ${pr.getDouble(0)}")
      assert(pr.getDouble(1) >= 0.0, s"atlas #$idx negative pagerank")
    }
  }

  test("isoclass property sweep: HITS hub/authority max is 1 (test_atlas.py:103-157)") {
    val picks = Seq((3, 5), (3, 15), (4, 17), (4, 100), (4, 217))
    for ((n, c) <- picks) {
      val g = Catalog.isoclass(spark, n, c, directed = true)
      val r = Centrality.hits(g).agg(
        max("hub").as("mh"), min("hub").as("nh"),
        max("authority").as("ma"), min("authority").as("na")).head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-7, s"isoclass($n,$c) hub max ${r.getDouble(0)}")
      assert(r.getDouble(1) >= 0.0 && r.getDouble(3) >= 0.0)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-7, s"isoclass($n,$c) auth max ${r.getDouble(2)}")
    }
  }
}
