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
}
