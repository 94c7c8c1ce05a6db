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
