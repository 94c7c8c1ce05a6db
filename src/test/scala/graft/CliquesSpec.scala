package graft

import graft.algos.Cliques
import graft.core.{GraphOps, LinkGraph}
import org.scalatest.funsuite.AnyFunSuite

/** Clique goldens from /root/reference/tests/test_cliques.py. */
class CliquesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** Full(6) minus edges (0,1), (0,2), (3,5) — the reference fixture. */
  def fixture: LinkGraph = {
    val all = for (i <- 0 until 6; j <- i + 1 until 6) yield (i.toLong, j.toLong)
    val cut = Set((0L, 1L), (0L, 2L), (3L, 5L))
    LinkGraph(spark, 6, all.filterNot(cut.contains), directed = false)
  }

  private def sortedCliques(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
    df.select("clique").collect().map(_.getSeq[Long](0).toSeq).toSeq.sortBy(_.mkString(","))

  test("cliques(4,-1), cliques(2,2), cliques(-1,-1) goldens (test_cliques.py:13-63)") {
    assert(sortedCliques(Cliques.cliques(fixture, 4)).toSet ==
      Set(Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 4L, 5L)))
    assert(sortedCliques(Cliques.cliques(fixture, 2, 2)).toSet == Set(
      Seq(0L, 3L), Seq(0L, 4L), Seq(0L, 5L), Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L),
      Seq(1L, 5L), Seq(2L, 3L), Seq(2L, 4L), Seq(2L, 5L), Seq(3L, 4L), Seq(4L, 5L)))
    val all = sortedCliques(Cliques.cliques(fixture))
    assert(all.size == 29) // 6 + 12 + 9 + 2 from the reference's (-1,-1) table
    assert(all.count(_.size == 3) == 9)
  }

  test("maximal_cliques + min/max filters (test_cliques.py:65-82)") {
    assert(sortedCliques(Cliques.maximalCliques(fixture)).toSet ==
      Set(Seq(0L, 3L, 4L), Seq(0L, 4L, 5L), Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 4L, 5L)))
    assert(sortedCliques(Cliques.maximalCliques(fixture, min = 4)).toSet ==
      Set(Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 4L, 5L)))
    assert(sortedCliques(Cliques.maximalCliques(fixture, max = 3)).toSet ==
      Set(Seq(0L, 3L, 4L), Seq(0L, 4L, 5L)))
  }

  test("largest_cliques + clique_number (test_cliques.py:65-68,104-106)") {
    assert(sortedCliques(Cliques.largestCliques(fixture)).toSet ==
      Set(Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 4L, 5L)))
    assert(Cliques.cliqueNumber(fixture) == 4)
  }

  test("isolated vertices are maximal 1-cliques; direction ignored; empty graph") {
    val g = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 0L), (1L, 2L)), directed = true)
    assert(sortedCliques(Cliques.maximalCliques(g)).toSet ==
      Set(Seq(0L, 1L), Seq(1L, 2L), Seq(3L)))
    assert(Cliques.cliqueNumber(LinkGraph(spark, 3, Seq.empty, directed = false)) == 1)
  }

  test("maximal cliques match brute force on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 4) {
      val n = 8
      val edges = (for {
        i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.45
      } yield (i.toLong, j.toLong)).toSeq
      val g = LinkGraph(spark, n.toLong, edges, directed = false)
      val eset = edges.toSet
      def adj(a: Long, b: Long) = eset.contains((math.min(a, b), math.max(a, b)))
      // brute force: all subsets that are cliques with no extension
      val verts = (0L until n).toSeq
      val brute = (1 to n).flatMap(k => verts.combinations(k))
        .filter(s => s.combinations(2).forall { case Seq(a, b) => adj(a, b) })
        .filter(s => !verts.exists(w => !s.contains(w) && s.forall(adj(_, w))))
        .map(_.sorted).toSet
      assert(sortedCliques(Cliques.maximalCliques(g)).toSet == brute, s"trial $trial edges=$edges")
      // cliques(-1,-1) == all complete subsets
      val bruteAll = (1 to n).flatMap(k => verts.combinations(k))
        .filter(s => s.combinations(2).forall { case Seq(a, b) => adj(a, b) })
        .map(_.sorted).toSet
      assert(sortedCliques(Cliques.cliques(g)).toSet == bruteAll, s"trial $trial (all cliques)")
    }
  }

  test("subproblem gate: hub with too many triangles refuses with guidance") {
    // K9: every vertex has C(8,2) = 28 triangles through it
    val rim = for (i <- 0L to 8L; j <- i + 1 to 8L) yield (i, j)
    val g = LinkGraph(spark, 9, rim, directed = false)
    val e = intercept[IllegalArgumentException](
      Cliques.maximalCliques(g, maxSub = 10L).count())
    assert(e.getMessage.contains("maxSubproblem"))
    // and the same graph passes with the default gate
    assert(Cliques.cliqueNumber(g) == 9)
  }
}
