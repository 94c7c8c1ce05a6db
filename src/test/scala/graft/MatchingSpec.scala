package graft

import graft.algos.{Flow, Matching}
import graft.core.LinkGraph
import org.scalatest.funsuite.AnyFunSuite

/** Matching goldens from /root/reference/tests/test_matching.py. */
class MatchingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  val ledaEdges = Seq((0, 8), (0, 12), (0, 14), (1, 9), (1, 10), (1, 13), (2, 8),
    (2, 9), (3, 10), (3, 11), (3, 13), (4, 9), (4, 14), (5, 14), (6, 9), (6, 14),
    (7, 8), (7, 12), (7, 14)).map { case (a, b) => (a.toLong, b.toLong) }

  def leda: LinkGraph = LinkGraph(spark, 15, ledaEdges, directed = false)
  def ledaTypes = {
    import org.apache.spark.sql.functions._
    spark.range(15).select(col("id"), when(col("id") < 8, 0).otherwise(1).as("type"))
  }

  test("LEDA fixture: maximum bipartite matching has size 6, is valid and maximal (test_matching.py:67-77)") {
    val m = Matching.maximumBipartiteMatching(leda, ledaTypes)
    assert(Matching.matchingSize(m) == 6L)
    val mates = m.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // validity: symmetric, matched pairs are edges
    val eset = ledaEdges.toSet
    mates.foreach { case (v, w) =>
      if (w >= 0) {
        assert(mates(w) == v)
        assert(eset.contains((math.min(v, w), math.max(v, w))))
      }
    }
    // maximality: no edge with both endpoints unmatched
    assert(!ledaEdges.exists { case (a, b) => mates(a) == -1L && mates(b) == -1L })
  }

  test("matching size equals unit max-flow on random bipartite graphs (independent kernels agree)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 3) {
      val nl = 6; val nr = 7
      val edges = (for {
        i <- 0 until nl; j <- 0 until nr if rnd.nextDouble() < 0.35
      } yield (i.toLong, (nl + j).toLong)).toSeq
      if (edges.nonEmpty) {
        val g = LinkGraph(spark, (nl + nr).toLong, edges, directed = true)
        val types = spark.range(nl + nr)
          .select(col("id"), when(col("id") < nl, 0).otherwise(1).as("type"))
        val size = Matching.matchingSize(Matching.maximumBipartiteMatching(g, types))
        // independent check: super-source/super-sink unit max flow
        val s = (nl + nr).toLong; val t = s + 1
        val flowEdges = edges ++ (0 until nl).map(i => (s, i.toLong)) ++
          (0 until nr).map(j => (nl + j.toLong, t))
        val fg = LinkGraph(spark, t + 1, flowEdges, directed = true)
        assert(size == math.round(Flow.maxflowValue(fg, s, t)), s"trial $trial edges=$edges")
      }
    }
  }

  test("non-bipartite edge wrt types refuses") {
    import org.apache.spark.sql.functions._
    val g = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = false)
    val types = spark.range(3).select(col("id"), lit(0).as("type"))
    val e = intercept[IllegalArgumentException](
      Matching.maximumBipartiteMatching(g, types).count())
    assert(e.getMessage.contains("not bipartite"))
  }

  test("is_matching / is_maximal: reference Matching fixture (test_matching.py:42-50)") {
    import spark.implicits._
    // the reference's hand-built matching vector on the LEDA graph
    val vec = Seq(12, 10, 8, 13, -1, 14, 9, -1, 2, 6, 1, -1, 0, 3, 5)
      .zipWithIndex.map { case (m, i) => (i.toLong, m.toLong) }
    val m = vec.toDF("id", "mate")
    assert(Matching.isMatching(leda, m))
    assert(Matching.isMaximalMatching(leda, m))
    // un-match the (0, 12) pair: still a valid matching, no longer maximal
    // because edge (0, 12) now has both endpoints unmatched
    val broken = vec.map { case (i, mt) =>
      if (i == 0L || i == 12L) (i, -1L) else (i, mt) }.toDF("id", "mate")
    assert(Matching.isMatching(leda, broken))
    assert(!Matching.isMaximalMatching(leda, broken))
    // asymmetric vector is not a matching
    val asym = vec.map { case (i, mt) => if (i == 0L) (i, 13L) else (i, mt) }
      .toDF("id", "mate")
    assert(!Matching.isMatching(leda, asym))
    // symmetric but non-edge pair (4, 7) is not a matching either
    val nonEdge = vec.map { case (i, mt) =>
      if (i == 4L) (i, 7L) else if (i == 7L) (i, 4L) else (i, mt) }
      .toDF("id", "mate")
    assert(!Matching.isMatching(leda, nonEdge))
  }
}
