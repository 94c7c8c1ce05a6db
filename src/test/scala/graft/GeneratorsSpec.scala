package graft

import graft.core.{Generators, GraphOps, LinkGraph, Mode}
import org.scalatest.funsuite.AnyFunSuite

/** Generator family contracts: determinism across parallelism, exact
  * structural invariants, reference shapes (`graphobject.c:12415-12979`).
  */
class GeneratorsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("Erdos-Renyi G(n,p): deterministic, loop-free, plausible density") {
    val g = Generators.erdosRenyiGnp(spark, 60, 0.1, seed = 7L)
    val m = g.ecount()
    assert(m > 0 && m < 60 * 59 / 2)
    assert(g.edges.where(org.apache.spark.sql.functions.col("src") ===
      org.apache.spark.sql.functions.col("dst")).isEmpty)
    assert(Generators.erdosRenyiGnp(spark, 60, 0.1, seed = 7L).ecount() == m)
    // expected m = C(60,2)*0.1 = 177; allow wide deterministic band
    assert(m > 100 && m < 260, s"m=$m")
  }

  test("Erdos-Renyi G(n,m): exactly m distinct edges") {
    val g = Generators.erdosRenyiGnm(spark, 100, 300, seed = 3L)
    assert(g.ecount() == 300)
    assert(g.edges.distinct().count() == 300)
  }

  test("Watts-Strogatz: p=0 is the exact ring lattice; p=1 keeps edge count") {
    val ring = Generators.wattsStrogatz(spark, 100, 2, 0.0)
    assert(ring.ecount() == 200)
    val deg = GraphOps.degrees(ring, Mode.All).collect().map(_.getLong(1))
    assert(deg.forall(_ == 4))
    assert(Generators.wattsStrogatz(spark, 100, 2, 1.0).ecount() == 200)
  }

  test("Barabasi: edge count, determinism, heavy-tail degrees") {
    val g = Generators.barabasi(spark, 2000, 3, seed = 5L)
    assert(g.ecount() == 3 + (2000L - 3) * 3) // 1+2+3 + (n-3)*3 ... min(i,m) sum
    val maxDeg = GraphOps.maxDegree(g, Mode.All)
    assert(maxDeg > 40, s"hub degree $maxDeg — preferential attachment should be skewed")
    val again = Generators.barabasi(spark, 2000, 3, seed = 5L)
    assert(again.edges.except(g.edges).isEmpty)
  }

  test("Degree_Sequence / K_Regular: degrees preserved exactly (loops double)") {
    val g = Generators.kRegular(spark, 8, 3, seed = 9L)
    assert(g.ecount() == 12)
    val deg = GraphOps.degrees(g, Mode.All, loops = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 7L).foreach(i => assert(deg(i) == 3, s"vertex $i degree ${deg(i)}"))
  }

  test("Full_Citation is a complete DAG; Full_Bipartite crosses sides") {
    val fc = Generators.fullCitation(spark, 4)
    assert(fc.ecount() == 6 && graft.algos.Distances.isDag(fc))
    val fb = Generators.fullBipartite(spark, 3, 4)
    assert(fb.ecount() == 12)
    assert(fb.edges.where(org.apache.spark.sql.functions.col("src") >= 3).isEmpty)
  }

  test("De Bruijn(2,2): 4 vertices, 8 arcs, out-degree 2; LCF cube is 3-regular") {
    val db = Generators.deBruijn(spark, 2, 2)
    assert(db.vcount() == 4 && db.ecount() == 8)
    val outDeg = GraphOps.degrees(db, Mode.Out).collect().map(_.getLong(1))
    assert(outDeg.forall(_ == 2))
    val cube = Generators.lcf(spark, Seq(3, -3), 4)
    assert(cube.vcount() == 8 && cube.ecount() == 12)
    val deg = GraphOps.degrees(cube, Mode.All).collect().map(_.getLong(1))
    assert(deg.forall(_ == 3))
  }

  test("Famous: zachary/bull/petersen shapes; Louvain on bull matches the optimal-modularity golden") {
    val z = Generators.famous(spark, "zachary")
    assert(z.vcount() == 34 && z.ecount() == 78)
    val p = Generators.famous(spark, "petersen")
    assert(p.vcount() == 10 && p.ecount() == 15)
    // test_decomposition.py:330-338: bull optimal membership [0,0,1,0,1], q=0.08
    val bull = Generators.famous(spark, "bull")
    val m = TestSession.reindex(TestSession.longVector(
      graft.algos.Louvain.communityMultilevel(bull), "label").toSeq)
    assert(m == Seq(0, 0, 1, 0, 1), s"got $m")
    val q = graft.algos.Modularity.modularity(bull,
      graft.algos.Louvain.communityMultilevel(bull))
    assert(math.abs(q - 0.08) < 1e-7)
  }

  test("Famous catalog: structural invariants of the expanded named graphs") {
    import graft.algos.{Distances, Triangles}
    // (name, n, m, regular-degree or -1, triangles or -1, diameter or -1)
    val cases = Seq(
      ("diamond", 4L, 5L, -1, 2L, 2L),
      ("tetrahedral", 4L, 6L, 3, 4L, 1L),
      ("cubical", 8L, 12L, 3, 0L, 3L),
      ("octahedral", 6L, 12L, 4, 8L, 2L),
      ("icosahedral", 12L, 30L, 5, 20L, 3L),
      ("dodecahedral", 20L, 30L, 3, 0L, 5L),
      ("chvatal", 12L, 24L, 4, 0L, 2L),
      ("coxeter", 28L, 42L, 3, 0L, 4L),
      ("grotzsch", 11L, 20L, -1, 0L, 2L),
      ("krackhardt_kite", 10L, 18L, -1, -1L, 4L),
      ("housex", 5L, 8L, -1, 5L, 2L),
      ("franklin", 12L, 18L, 3, 0L, 3L),
      ("frucht", 12L, 18L, 3, -1L, -1L),
      ("heawood", 14L, 21L, 3, 0L, 3L),
      ("levi", 30L, 45L, 3, 0L, 4L),
      ("mcgee", 24L, 36L, 3, 0L, 4L),
      ("pappus", 18L, 27L, 3, 0L, 4L))
    cases.foreach { case (name, n, m, reg, tri, diam) =>
      val g = Generators.famous(spark, name)
      assert(g.vcount() == n, s"$name vcount")
      assert(g.ecount() == m, s"$name ecount")
      if (reg > 0) {
        val deg = GraphOps.degrees(g, Mode.All).collect().map(_.getLong(1))
        assert(deg.forall(_ == reg), s"$name not $reg-regular")
      }
      if (tri >= 0) assert(Triangles.count(g) == tri, s"$name triangles")
      if (diam >= 0) assert(Distances.diameter(g) == diam, s"$name diameter")
    }
    // aliases resolve to the same shape
    assert(Generators.famous(spark, "dodecahedron").ecount() == 30)
    assert(Generators.famous(spark, "octahedron").ecount() == 12)
    assert(Generators.famous(spark, "tetrahedron").ecount() == 6)
    intercept[IllegalArgumentException](Generators.famous(spark, "no_such_graph"))
  }

  test("GRG: cell-join edges match brute-force distance pairs exactly") {
    import org.apache.spark.sql.functions._
    val (g, pts) = Generators.grg(spark, 300, 0.1, seed = 11L)
    val got = g.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = (for {
      (a, xa, ya) <- p; (b, xb, yb) <- p if a < b
      if (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 0.01 + 1e-15
    } yield (a, b)).toSet
    assert(got === want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // torus mode wraps: points at opposite edges can connect
    val (gt, _) = Generators.grg(spark, 300, 0.1, torus = true, seed = 11L)
    assert(gt.ecount() >= g.ecount())
  }

  test("SBM: block structure (test_generators.py:207-235)") {
    val pref = Seq(Seq(0.5, 0.0, 0.0), Seq(0.0, 0.0, 0.5), Seq(0.0, 0.5, 0.0))
    val g = Generators.sbm(spark, pref, Seq(20L, 20L, 20L), seed = 9L)
    assert(GraphOps.isSimple(g))
    // block 0 is one component; blocks 1 and 2 (cross-linked only) are another
    val comp = TestSession.reindex(TestSession.longVector(
      graft.algos.Components.wcc(g), "comp").toSeq)
    assert(comp === Seq.fill(20)(0) ++ Seq.fill(40)(1))
    // no intra-block edges in blocks 1 and 2
    import org.apache.spark.sql.functions._
    val intra12 = g.edges.where(col("src") >= 20 && col("dst") >= 20 &&
      (col("src") - 20) / 20 === (col("dst") - 20) / 20).count()
    assert(intra12 === 0L)
    // loops argument produces loops; directed variant has non-mutual arcs
    val gl = Generators.sbm(spark, pref, Seq(20L, 20L, 20L), loops = true, seed = 9L)
    assert(gl.edges.where(col("src") === col("dst")).count() > 0)
    val gd = Generators.sbm(spark, pref, Seq(20L, 20L, 20L), directed = true, seed = 9L)
    assert(gd.edges.where(col("src") === col("dst")).count() === 0L)
    val mutual = gd.edges.alias("a").join(gd.edges.alias("b"),
      col("a.src") === col("b.dst") && col("a.dst") === col("b.src")).count()
    assert(mutual < gd.ecount())
  }

  test("Static_Fitness / Static_Power_Law: exact m, simple, fitness-biased") {
    import org.apache.spark.sql.functions._
    // mild skew: heavy skew saturates the distinct hot-hot pair space under
    // the simple-graph constraint (igraph's rejection sampling clips the
    // same way), which would mask the bias being tested
    val fit = spark.range(200).select(col("id"),
      when(col("id") < 20, 4.0).otherwise(1.0).as("w"))
    val g = Generators.staticFitness(spark, 300, fit, seed = 13L)
    assert(g.ecount() === 300L)
    assert(g.edges.where(col("src") === col("dst")).count() === 0L)
    assert(g.edges.distinct().count() === 300L)
    // per-capita degree of high-fitness vertices ≈ 4x the low-fitness ones
    val deg = GraphOps.degrees(g, Mode.All).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hotAvg = (0L until 20L).map(deg.getOrElse(_, 0L)).sum.toDouble / 20
    val coldAvg = (20L until 200L).map(deg.getOrElse(_, 0L)).sum.toDouble / 180
    assert(hotAvg > 2.0 * coldAvg, s"hotAvg=$hotAvg coldAvg=$coldAvg")
    // determinism
    assert(Generators.staticFitness(spark, 300, fit, seed = 13L)
      .edges.collect().toSet === g.edges.collect().toSet)

    val pl = Generators.staticPowerLaw(spark, 2000, 6000, exponent = 2.5, seed = 17L)
    assert(pl.ecount() === 6000L)
    assert(GraphOps.maxDegree(pl, Mode.All) > 50, "power-law head should be heavy")
  }

  test("Growing_Random / Random_Bipartite / Tree_Game shapes") {
    import org.apache.spark.sql.functions._
    val gr = Generators.growingRandom(spark, 500, 2, seed = 21L)
    assert(gr.ecount() === 499L * 2)
    assert(gr.edges.where(col("dst") >= col("src")).count() === 0L)

    val rb = Generators.randomBipartite(spark, 40, 60, 0.2, seed = 23L)
    assert(rb.edges.where(col("src") >= 40 || col("dst") < 40).count() === 0L)
    val m = rb.ecount()
    assert(m > 250 && m < 720, s"m=$m") // E = 480

    val t = Generators.treeGame(spark, 200, seed = 25L)
    assert(t.ecount() === 199L)
    assert(graft.algos.Components.wcc(t).select("comp").distinct().count() === 1L)
    assert(Generators.treeGame(spark, 200, seed = 25L).edges.collect().toSet ===
      t.edges.collect().toSet)
  }

  test("Kautz(2,2): 12 vertices, in/out degree 2 (test_generators.py:193-198)") {
    val g = Generators.kautz(spark, 2, 2)
    assert(g.vcount() === 12L && g.directed)
    val din = GraphOps.degrees(g, Mode.In).collect().map(_.getLong(1))
    val dout = GraphOps.degrees(g, Mode.Out).collect().map(_.getLong(1))
    assert(din.length === 12 && din.forall(_ == 2L), din.mkString(","))
    assert(dout.forall(_ == 2L))
  }

  test("Realize_Degree_Sequence: reference cases incl. zachary degrees (test_generators.py:138-190)") {
    import org.apache.spark.sql.functions._
    val g1 = Generators.realizeDegreeSequence(spark, Seq(1, 1), method = "smallest")
    assert(!g1.directed)
    assert(GraphOps.degrees(g1, Mode.All).collect().map(_.getLong(1)).toSeq === Seq(1L, 1L))

    val g2 = Generators.realizeDegreeSequence(spark, Seq(1, 1), Some(Seq(1, 1)), "largest")
    assert(g2.directed)
    assert(GraphOps.degrees(g2, Mode.In).collect().map(_.getLong(1)).toSeq === Seq(1L, 1L))
    assert(GraphOps.degrees(g2, Mode.Out).collect().map(_.getLong(1)).toSeq === Seq(1L, 1L))

    val zachary = Generators.famous(spark, "zachary")
    val degrees = GraphOps.degrees(zachary, Mode.All).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toInt).toSeq
    val gz = Generators.realizeDegreeSequence(spark, degrees)
    val got = GraphOps.degrees(gz, Mode.All).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toInt).toSeq
    assert(got === degrees)
    assert(GraphOps.isSimple(gz))
    // index strategy also realizes it
    val gi = Generators.realizeDegreeSequence(spark, degrees, method = "index")
    assert(GraphOps.degrees(gi, Mode.All).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toInt).toSeq === degrees)
  }

  test("staticFitness rejects unrealizable m up front (ADVICE r2: no infinite oversample loop)") {
    import spark.implicits._
    val fit = Seq((0L, 1.0), (1L, 1.0), (2L, 1.0)).toDF("id", "w")
    // 3 positive-fitness vertices -> capacity 3 simple undirected edges
    intercept[IllegalArgumentException] {
      Generators.staticFitness(spark, m = 4, fitness = fit)
    }
    // zero-fitness vertices don't count toward capacity
    val fit2 = Seq((0L, 1.0), (1L, 1.0), (2L, 0.0)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      Generators.staticFitness(spark, m = 2, fitness = fit2)
    }
    // realizable m still works
    assert(Generators.staticFitness(spark, m = 3, fitness = fit).ecount() == 3)
  }

  test("Forest_Fire smoke: valid growth graph, deterministic (test_games.py:15-19)") {
    val g = Generators.forestFire(spark, 100, 0.1)
    assert(!g.directed && g.vcount() == 100)
    val e = g.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    // growth model: every edge points from a newer to an older vertex
    assert(e.forall { case (s, d) => s > d })
    assert(e.length >= 99, "every non-root vertex links to >= 1 ambassador")
    val gd = Generators.forestFire(spark, 100, 0.1, directed = true)
    assert(gd.directed)
    // determinism
    val e2 = Generators.forestFire(spark, 100, 0.1).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq == e2.toSeq)
    // higher burn probability spreads wider -> more edges
    val hot = Generators.forestFire(spark, 100, 0.6).ecount()
    assert(hot > g.ecount())
  }

  test("Recent_Degree smoke: m edges per step within the window model (test_games.py:21-23)") {
    val g = Generators.recentDegree(spark, 100, 5, 10)
    assert(g.vcount() == 100)
    val e = g.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.forall { case (s, d) => s > d })
    // vertex v adds min(m, v) edges
    assert(e.length == (1 until 100).map(v => math.min(5, v)).sum)
    // determinism
    val e2 = Generators.recentDegree(spark, 100, 5, 10).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.toSeq == e2.toSeq)
  }

  test("Preference: type-block structure + determinism (graphobject.c:12685)") {
    import org.apache.spark.sql.functions.col
    // identity pref matrix: every realized edge joins SAME-type endpoints
    val (g, types) = Generators.preference(spark, 80, Seq(0.5, 0.5),
      Seq(Seq(0.4, 0.0), Seq(0.0, 0.4)), seed = 11L)
    val tmap = types.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = g.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && edges.forall { case (s, d) => tmap(s) == tmap(d) })
    // single type, p=1 -> the complete graph
    val (full, _) = Generators.preference(spark, 12, Seq(1.0), Seq(Seq(1.0)))
    assert(full.ecount() == 12L * 11 / 2)
    // determinism
    val (g2, _) = Generators.preference(spark, 80, Seq(0.5, 0.5),
      Seq(Seq(0.4, 0.0), Seq(0.0, 0.4)), seed = 11L)
    assert(g2.edges.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      edges.sorted.toSeq)
  }

  test("Establishment: growing typed trials — counts, partner bounds, type blocks, determinism (graphobject.c:12542)") {
    // p=1 everywhere: every trial lands -> exactly (n-k)*k edges, every edge
    // from a post-seed vertex to a strictly earlier one
    val (all, _) = Generators.establishment(spark, 50, 3, Seq(1.0), Seq(Seq(1.0)))
    val e = all.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.length == (50 - 3) * 3)
    assert(e.forall { case (s, d) => s >= 3 && d < s })
    // p=0: no trial ever succeeds
    val (none, _) = Generators.establishment(spark, 50, 3, Seq(1.0), Seq(Seq(0.0)))
    assert(none.ecount() == 0 && none.vcount() == 50)
    // identity pref over two types: realized edges join same-type endpoints
    val (blk, types) = Generators.establishment(spark, 120, 2, Seq(0.5, 0.5),
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), seed = 5L)
    val tmap = types.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val be = blk.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(be.nonEmpty && be.forall { case (s, d) => tmap(s) == tmap(d) })
    // determinism
    val (blk2, _) = Generators.establishment(spark, 120, 2, Seq(0.5, 0.5),
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), seed = 5L)
    assert(blk2.edges.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      be.sorted.toSeq)
    // gates
    intercept[IllegalArgumentException](
      Generators.establishment(spark, 3, 3, Seq(1.0), Seq(Seq(1.0))))
  }

  test("Asymmetric_Preference: joint in/out types drive directed blocks (graphobject.c:12436)") {
    // single type, p=1, no loops -> the complete directed graph
    val (full, _) = Generators.asymmetricPreference(spark, 10, Seq(Seq(1.0)), Seq(Seq(1.0)))
    assert(full.directed && full.ecount() == 10L * 9)
    // diagonal joint dist (out-type == in-type per vertex); pref only lets
    // out-type 0 reach in-type 0 -> every edge stays inside type-0 vertices
    val (g, types) = Generators.asymmetricPreference(spark, 80,
      Seq(Seq(0.5, 0.0), Seq(0.0, 0.5)), Seq(Seq(0.7, 0.0), Seq(0.0, 0.0)), seed = 9L)
    val outT = types.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = g.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && edges.forall { case (s, d) => outT(s) == 0 && outT(d) == 0 })
    // no loops unless requested
    assert(edges.forall { case (s, d) => s != d })
    val (lp, _) = Generators.asymmetricPreference(spark, 10, Seq(Seq(1.0)), Seq(Seq(1.0)),
      loops = true)
    assert(lp.ecount() == 10L * 10)
  }
}
