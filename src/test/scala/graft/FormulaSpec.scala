package graft

import graft.core.{Generators, LinkGraph}
import graft.ingest.Formula
import org.scalatest.funsuite.AnyFunSuite

/** Formula DSL goldens from /root/reference/tests/test_generators.py:46-107
  * + the optimal-modularity golden from test_decomposition.py:332-343.
  */
class FormulaSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def edgeList(g: LinkGraph): Seq[(Long, Long)] =
    g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("Graph.Formula: all reference cases (test_generators.py:46-107)") {
    val cases: Seq[(String, Seq[String], Seq[(Int, Int)])] = Seq(
      ("", Seq(""), Seq.empty),
      ("A", Seq("A"), Seq.empty),
      ("A-B", Seq("A", "B"), Seq((0, 1))),
      ("A --- B", Seq("A", "B"), Seq((0, 1))),
      ("A--B, C--D, E--F, G--H, I, J, K",
        Seq("A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K"),
        Seq((0, 1), (2, 3), (4, 5), (6, 7))),
      ("A:B:C:D -- A:B:C:D", Seq("A", "B", "C", "D"),
        Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))),
      ("A -> B -> C", Seq("A", "B", "C"), Seq((0, 1), (1, 2))),
      ("A <- B -> C", Seq("A", "B", "C"), Seq((1, 0), (1, 2))),
      ("A <- B -- C", Seq("A", "B", "C"), Seq((1, 0))),
      ("A <-> B <---> C <> D", Seq("A", "B", "C", "D"),
        Seq((0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2))),
      ("'this is' <- 'a silly' -> 'graph here'",
        Seq("this is", "a silly", "graph here"), Seq((1, 0), (1, 2))),
      ("Alice-Bob-Cecil-Alice, Daniel-Cecil-Eugene, Cecil-Gordon",
        Seq("Alice", "Bob", "Cecil", "Daniel", "Eugene", "Gordon"),
        Seq((0, 1), (1, 2), (0, 2), (2, 3), (2, 4), (2, 5))),
      ("Alice-Bob:Cecil:Daniel, Cecil:Daniel-Eugene:Gordon",
        Seq("Alice", "Bob", "Cecil", "Daniel", "Eugene", "Gordon"),
        Seq((0, 1), (0, 2), (0, 3), (2, 4), (2, 5), (3, 4), (3, 5))),
      ("Alice <-> Bob --> Cecil <-- Daniel, Eugene --> Gordon:Helen",
        Seq("Alice", "Bob", "Cecil", "Daniel", "Eugene", "Gordon", "Helen"),
        Seq((0, 1), (1, 0), (1, 2), (3, 2), (4, 5), (4, 6))),
      ("Alice -- Bob -- Daniel, Cecil:Gordon, Helen",
        Seq("Alice", "Bob", "Daniel", "Cecil", "Gordon", "Helen"),
        Seq((0, 1), (1, 2))),
      ("\"+\" -- \"-\", \"*\" -- \"/\", \"%%\" -- \"%/%\"",
        Seq("+", "-", "*", "/", "%%", "%/%"), Seq((0, 1), (2, 3), (4, 5))),
      ("A-B-C\nC-D", Seq("A", "B", "C", "D"), Seq((0, 1), (1, 2), (2, 3))),
      ("A-B-C\n    C-D", Seq("A", "B", "C", "D"), Seq((0, 1), (1, 2), (2, 3))))
    cases.foreach { case (f, names, edges) =>
      val r = Formula(spark, f)
      assert(r.names == names, s"formula '$f' names")
      assert(edgeList(r.graph) == edges.map { case (a, b) => (a.toLong, b.toLong) }.sorted,
        s"formula '$f' edges")
    }
    // the None analog: empty graph
    val none = Formula(spark, None)
    assert(none.names.isEmpty && none.graph.vcount() == 0)
  }

  test("community_optimal_modularity: bull golden [0,0,1,0,1], q = 0.08 (test_decomposition.py:332-343)") {
    import graft.algos.{CommunityKernels, Modularity}
    val bull = Generators.famous(spark, "bull")
    val (memb, q) = CommunityKernels.optimalModularity(bull)
    assert(TestSession.reindex(memb.toSeq.map(_.toLong)) == Seq(0, 0, 1, 0, 1))
    assert(math.abs(q - 0.08) < 1e-7)
    // q must equal the engine's distributed modularity of the same membership
    import spark.implicits._
    val mdf = memb.zipWithIndex.map { case (l, v) => (v.toLong, l.toLong) }.toSeq.toDF("id", "label")
    assert(math.abs(Modularity.modularity(bull, mdf) - q) < 1e-9)
    // gate
    val big = LinkGraph(spark, 13, Seq((0L, 1L)), directed = false)
    intercept[IllegalArgumentException](CommunityKernels.optimalModularity(big))
  }
}
