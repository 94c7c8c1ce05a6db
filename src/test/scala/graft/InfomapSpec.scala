package graft

import graft.algos.Infomap
import graft.core.Generators
import org.scalatest.funsuite.AnyFunSuite

/** Infomap golden ported from `tests/test_decomposition.py:250-266`. */
class InfomapSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("zachary: membership + codelength 4.60605 + q 0.40203 (test_decomposition.py:250-258)") {
    val g = Generators.famous(spark, "zachary")
    val r = Infomap.communityInfomap(g)
    assert(math.abs(r.codelength - 4.60605) < 5e-4, s"codelength=${r.codelength}")
    val memb = TestSession.reindex(TestSession.longVector(r.membership, "label").toSeq)
    val golden = TestSession.reindex(
      (Seq(1, 1, 1, 1, 2, 2, 2, 1, 0, 1, 2, 1, 1, 1, 0, 0, 2, 1, 0, 1, 0, 1)
        ++ Seq.fill(12)(0)).map(_.toLong))
    assert(memb === golden)
    val q = graft.algos.Modularity.modularity(g, r.membership)
    assert(math.abs(q - 0.40203) < 5e-4, s"q=$q")
  }

  test("distributed codelength scorer agrees with the kernel on zachary") {
    val g = Generators.famous(spark, "zachary")
    val r = Infomap.communityInfomap(g)
    val distL = Infomap.codelength(g, r.membership)
    assert(math.abs(distL - r.codelength) < 1e-6, s"kernel=${r.codelength} dist=$distL")
  }

  test("weighted smoke: edge and vertex weights accepted (test_decomposition.py:260-266)") {
    val g = Generators.famous(spark, "zachary")
    // deterministic pseudo-random weights as in the reference's smoke test
    val vw = (0L until 34L).map(v => v -> (1.0 + (v % 5))).toMap
    val r = Infomap.communityInfomap(g, trials = 2, vertexWeights = Some(vw))
    assert(r.membership.count() === 34L)
    assert(r.codelength > 0.0)
  }
}
