package graft

import graft.algos.{Components, Mst}
import graft.core.{Generators, LinkGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** spanning_tree (`graphobject.c:13996`, Py `__init__.py:1031-1052`):
  * Borůvka MST vs a local Kruskal oracle, forest semantics, unweighted
  * behavior.
  */
class MstSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Local Kruskal with the same (weight, src, dst) tie-break. */
  private def kruskalWeight(n: Int, edges: Seq[(Long, Long, Double)]): (Double, Int) = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    var total = 0.0
    var cnt = 0
    edges.filter(e => e._1 != e._2)
      .map { case (u, v, w) => if (u < v) (u, v, w) else (v, u, w) }
      .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
      .sortBy(e => (e._3, e._1, e._2)).foreach { case (u, v, w) =>
        val (ru, rv) = (find(u.toInt), find(v.toInt))
        if (ru != rv) { parent(ru) = rv; total += w; cnt += 1 }
      }
    (total, cnt)
  }

  test("Borůvka MST matches Kruskal total weight on a random weighted graph") {
    val base = Generators.erdosRenyiGnm(spark, 200, 600, seed = 31L)
    val we = base.edges.select(col("src"), col("dst"),
      (pmod(xxhash64(lit(5L), col("src"), col("dst")), lit(1000L)).cast("double") / 100.0 + 0.5).as("weight"))
    val g = LinkGraph(we, directed = false, Some(200L))
    val forest = Mst.spanningForest(g).collect()
    val local = we.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (wantW, wantN) = kruskalWeight(200, local.toSeq)
    assert(forest.length === wantN)
    val gotW = forest.map(_.getDouble(2)).sum
    assert(math.abs(gotW - wantW) < 1e-9, s"got=$gotW want=$wantW")
    // determinism (unique MST under the total-order tie-break)
    val again = Mst.spanningForest(g).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === forest.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("spanning forest of a disconnected graph: n - c edges, unweighted ok") {
    // two cliques, no bridge
    val edges = (for (i <- 0L to 4L; j <- i + 1 to 4L) yield (i, j)) ++
      (for (i <- 5L to 9L; j <- i + 1 to 9L) yield (i, j))
    val g = LinkGraph(spark, 10, edges, directed = false)
    val t = Mst.spanningTree(g)
    assert(t.ecount() === 8L) // 10 vertices - 2 components
    // spanning: components of the forest match components of the graph
    val cf = Components.wcc(t).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cg = Components.wcc(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 9L).forall(v => cf(v) == cg(v)))
  }

  test("MST picks the light edges: ring with one heavy edge drops it") {
    val e = (0L until 9L).map(i => (i, i + 1, 1.0)) :+ ((9L, 0L, 100.0))
    val g = LinkGraph.weighted(spark, 10, e, directed = false)
    val forest = Mst.spanningForest(g).collect()
    assert(forest.length === 9)
    assert(!forest.exists(_.getDouble(2) > 1.5), "heavy closing edge must be excluded")
  }
}
