package graft

import graft.ingest.Formats
import org.scalatest.funsuite.AnyFunSuite

/** Foreign-format fixtures ported from `tests/test_foreign.py:26-356`. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmp(content: String, ext: String): String = {
    val f = java.io.File.createTempFile("graft", "." + ext)
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, content.stripMargin)
    f.getAbsolutePath
  }

  private def namedEdges(fg: Formats.ForeignGraph): Seq[(String, String)] = {
    val nameOf = fg.names.get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fg.graph.edges.collect().map(r => (nameOf(r.getLong(0)), nameOf(r.getLong(1)))).toSeq.sorted
  }

  test("DIMACS max-flow fixture (test_foreign.py:26-53) + round-trip") {
    val p = tmp(
      """c comment
        |p max 4 5
        |n 1 s
        |n 4 t
        |a 1 2 4
        |a 1 3 2
        |a 2 3 2
        |a 2 4 3
        |a 3 4 5
        |""", "max")
    val r = Formats.readDimacs(spark, p)
    assert(r.graph.vcount() == 4 && r.graph.ecount() == 5)
    assert(r.source == 0 && r.target == 3)
    val caps = r.capacities.orderBy("src", "dst").collect().map(_.getDouble(2)).toSeq
    assert(caps == Seq(4.0, 2.0, 2.0, 3.0, 5.0))
    val out = tmp("", "max")
    Formats.writeDimacs(r, out)
    val r2 = Formats.readDimacs(spark, out)
    assert(r2.graph.vcount() == 4 && r2.graph.ecount() == 5 && r2.source == 0 && r2.target == 3)
  }

  test("DL fullmatrix embedded + labels-block + edgelist1 (test_foreign.py:55-151)") {
    val m1 = Formats.readDl(spark, tmp(
      """dl n=5
        |format = fullmatrix
        |labels embedded
        |data:
        |larry david lin pat russ
        |Larry 0 1 1 1 0
        |david 1 0 0 0 1
        |Lin 1 0 0 1 0
        |Pat 1 0 1 0 1
        |russ 0 1 0 1 0
        |""", "dl"))
    assert(m1.graph.vcount() == 5 && m1.graph.ecount() == 12 && m1.graph.directed)
    val el1 = m1.graph.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(el1 == Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (1L, 4L), (2L, 0L),
      (2L, 3L), (3L, 0L), (3L, 2L), (3L, 4L), (4L, 1L), (4L, 3L)))

    val m2 = Formats.readDl(spark, tmp(
      """dl n=5
        |format = fullmatrix
        |labels:
        |barry,david
        |lin,pat
        |russ
        |data:
        |0 1 1 1 0
        |1 0 0 0 1
        |1 0 0 1 0
        |1 0 1 0 1
        |0 1 0 1 0
        |""", "dl"))
    assert(m2.graph.vcount() == 5 && m2.graph.ecount() == 12)

    val e1 = Formats.readDl(spark, tmp(
      """DL n=5
        |format = edgelist1
        |labels:
        |george, sally, jim, billy, jane
        |labels embedded:
        |data:
        |george sally 2
        |george jim 3
        |sally jim 4
        |billy george 5
        |jane jim 6
        |""", "dl"), directed = false)
    assert(e1.graph.vcount() == 5 && e1.graph.ecount() == 5 && !e1.graph.directed)
    val el = e1.graph.edges.collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSeq.sorted
    assert(el == Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 4L)))
  }

  test("LGL fixture incl. weights and the not-an-LGL error (test_foreign.py:204-246)") {
    val fg = Formats.readLgl(spark, tmp(
      """# eggs
        |spam 1
        |# ham
        |eggs 2
        |bacon
        |# bacon
        |spam 3
        |# spam
        |spam""", "lgl"))
    assert(fg.graph.vcount() == 4 && fg.graph.ecount() == 5 && fg.weighted)
    // first-seen name order, like the reference
    assert(fg.names.get.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("eggs", "spam", "ham", "bacon"))
    val ws = fg.graph.weighted.collect().map(_.getDouble(2)).sorted.toSeq
    assert(ws == Seq(1.0, 1.0, 1.0, 2.0, 3.0)) // missing weights default 1
    assertThrows[IllegalArgumentException] {
      Formats.readLgl(spark, tmp("1 2\n1 3\n", "lgl"))
    }
    // round-trip
    val out = tmp("", "lgl")
    Formats.writeLgl(fg.graph, fg.names.get, out)
    val fg2 = Formats.readLgl(spark, out)
    assert(namedEdges(fg2) == namedEdges(fg))
  }

  test("GraphML fixture + round-trip (test_foreign.py:297-356)") {
    val fg = Formats.readGraphml(spark, tmp(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
        |<key id="v_name" for="node" attr.name="name" attr.type="string"/>
        |<graph id="G" edgedefault="undirected">
        |<node id="n0"><data key="v_name">a</data></node>
        |<node id="n1"><data key="v_name">b</data></node>
        |<node id="n2"><data key="v_name">c</data></node>
        |<node id="n3"><data key="v_name">d</data></node>
        |<node id="n4"><data key="v_name">e</data></node>
        |<node id="n5"><data key="v_name">f</data></node>
        |<edge source="n0" target="n1"></edge>
        |<edge source="n0" target="n2"></edge>
        |<edge source="n0" target="n3"></edge>
        |<edge source="n1" target="n2"></edge>
        |<edge source="n3" target="n4"></edge>
        |<edge source="n3" target="n5"></edge>
        |<edge source="n4" target="n5"></edge>
        |</graph>
        |</graphml>
        |""", "graphml"))
    assert(fg.graph.vcount() == 6 && fg.graph.ecount() == 7 && !fg.graph.directed)
    assert(fg.names.get.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b", "c", "d", "e", "f"))
    val out = tmp("", "graphml")
    Formats.writeGraphml(fg.graph, fg.names.get, out)
    val fg2 = Formats.readGraphml(spark, out)
    assert(namedEdges(fg2) == namedEdges(fg))
  }

  test("GML parse + round-trip") {
    val fg = Formats.readGml(spark, tmp(
      """graph [
        |  directed 1
        |  node [ id 7 label "alpha" ]
        |  node [ id 9 label "beta" ]
        |  node [ id 11 label "gamma" ]
        |  edge [ source 7 target 9 value 2.5 ]
        |  edge [ source 9 target 11 ]
        |]
        |""", "gml"))
    assert(fg.graph.vcount() == 3 && fg.graph.ecount() == 2 && fg.graph.directed && fg.weighted)
    assert(namedEdges(fg) == Seq(("alpha", "beta"), ("beta", "gamma")))
    val out = tmp("", "gml")
    Formats.writeGml(fg.graph, fg.names, out)
    assert(namedEdges(Formats.readGml(spark, out)) == namedEdges(fg))
  }

  test("Pajek parse (1-based, arcs+edges) + round-trip") {
    val fg = Formats.readPajek(spark, tmp(
      """*Vertices 3
        |1 "x"
        |2 "y"
        |3 "z"
        |*Arcs
        |1 2 1.5
        |*Edges
        |2 3
        |""", "net"))
    assert(fg.graph.directed && fg.graph.vcount() == 3 && fg.graph.ecount() == 3)
    val out = tmp("", "net")
    Formats.writePajek(fg.graph, fg.names, out)
    assert(namedEdges(Formats.readPajek(spark, out)).toSet == namedEdges(fg).toSet)
  }

  test("Adjacency matrix: plain vs attribute (test_foreign.py:266-295) + round-trip") {
    val content =
      """# Test comment line
        |0 1 1 0 0 0
        |1 0 1 0 0 0
        |1 1 0 0 0 0
        |0 0 0 0 2 2
        |0 0 0 2 0 2
        |0 0 0 2 2 0
        |"""
    val plain = Formats.readAdjacency(spark, tmp(content, "adj"))
    assert(plain.graph.vcount() == 6 && plain.graph.ecount() == 18 && plain.graph.directed)
    val weighted = Formats.readAdjacency(spark, tmp(content, "adj"), attribute = Some("weight"))
    assert(weighted.graph.ecount() == 12)
    val ws = weighted.graph.weighted.collect().map(_.getDouble(2)).sorted.toSeq
    assert(ws == Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0))
    val out = tmp("", "adj")
    Formats.writeAdjacency(weighted.graph, out)
    val again = Formats.readAdjacency(spark, out, attribute = Some("weight"))
    assert(again.graph.ecount() == 12)
  }

  test("GraphDB: 16-bit LE binary parse + round-trip + dispatch (graphobject.c:14913)") {
    // hand-built file: n=3; node0 -> {1,2}, node1 -> {2}, node2 -> {}
    val bytes = Array[Int](3, 2, 1, 2, 1, 2, 0)
      .flatMap(w => Array((w & 0xff).toByte, ((w >> 8) & 0xff).toByte))
    val f = java.io.File.createTempFile("graft", ".graphdb")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bytes)
    val fg = Formats.readGraphDb(spark, f.getAbsolutePath)
    assert(fg.graph.vcount() == 3 && fg.graph.ecount() == 3 && !fg.graph.directed)
    assert(fg.graph.weighted.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    // dispatch by extension + directed reader variant
    assert(Formats.read(spark, f.getAbsolutePath).graph.ecount() == 3)
    assert(Formats.readGraphDb(spark, f.getAbsolutePath, directed = true).graph.directed)
    // round-trip through the writer extension
    val out = java.io.File.createTempFile("graft", ".graphdb")
    out.deleteOnExit()
    Formats.writeGraphDb(fg.graph, out.getAbsolutePath)
    val again = Formats.readGraphDb(spark, out.getAbsolutePath)
    assert(again.graph.weighted.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    // truncation fails loudly
    java.nio.file.Files.write(f.toPath, bytes.dropRight(3))
    assertThrows[IllegalArgumentException] { Formats.readGraphDb(spark, f.getAbsolutePath) }
  }

  test("DOT writer: digraph/graph blocks, quoted names, weight attrs (graphobject.c:15006)") {
    val spark0 = spark
    import spark0.implicits._
    val g = graft.core.LinkGraph.weighted(spark, 3, Seq((0L, 1L, 2.5), (1L, 2L, 1.0)), directed = true)
    val names = Seq((0L, "a \"quoted\" name"), (1L, "b"), (2L, "c")).toDF("id", "name")
    val f = java.io.File.createTempFile("graft", ".dot"); f.deleteOnExit()
    Formats.writeDot(g, Some(names), f.getAbsolutePath, withWeights = true)
    val text = java.nio.file.Files.readString(f.toPath)
    assert(text ==
      "digraph {\n  0 [name=\"a \\\"quoted\\\" name\"];\n  1 [name=\"b\"];\n  2 [name=\"c\"];\n" +
        "  0 -> 1 [weight=2.5];\n  1 -> 2 [weight=1.0];\n}\n")
    val u = graft.core.LinkGraph(spark, 2, Seq((0L, 1L)), directed = false)
    Formats.writeDot(u, None, f.getAbsolutePath)
    assert(java.nio.file.Files.readString(f.toPath) == "graph {\n  0;\n  1;\n  0 -- 1;\n}\n")
  }

  test("LEDA: write + round-trip read + .gw dispatch, names/weights/void variants (graphobject.c:15081)") {
    val spark0 = spark
    import spark0.implicits._
    val g = graft.core.LinkGraph.weighted(spark, 3, Seq((0L, 1L, 2.5), (2L, 0L, 1.5)), directed = true)
    val names = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("id", "name")
    val f = java.io.File.createTempFile("graft", ".gw"); f.deleteOnExit()
    Formats.writeLeda(g, Some(names), f.getAbsolutePath)
    val text = java.nio.file.Files.readString(f.toPath)
    assert(text.startsWith("LEDA.GRAPH\nstring\ndouble\n-1\n3\n"))
    assert(text.contains("|{x}|") && text.contains("1 2 0 |{2.5}|") && text.contains("3 1 0 |{1.5}|"))
    val fg = Formats.read(spark, f.getAbsolutePath) // dispatch by .gw extension
    assert(fg.graph.directed && fg.weighted)
    assert(fg.graph.weighted.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq == Seq((0L, 1L, 2.5), (2L, 0L, 1.5)))
    assert(fg.names.get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(0L -> "x", 1L -> "y", 2L -> "z"))
    // void vertex attr / void edge attr, undirected
    val u = graft.core.LinkGraph(spark, 2, Seq((0L, 1L)), directed = false)
    Formats.writeLeda(u, None, f.getAbsolutePath, withWeights = false)
    val fu = Formats.readLeda(spark, f.getAbsolutePath)
    assert(!fu.graph.directed && !fu.weighted && fu.names.isEmpty && fu.graph.ecount() == 1L)
    // a non-LEDA file fails loudly
    assertThrows[IllegalArgumentException] {
      Formats.readLeda(spark, tmp("not a leda file\n", "gw"))
    }
  }

  test("DOT/LEDA writers remap non-dense vertex ids to dense positions") {
    val spark0 = spark
    import spark0.implicits._
    // vertex ids 5, 10, 42 — raw emission would write LEDA endpoints
    // outside [1, n] (corrupt) and DOT edges over undeclared nodes
    val e = Seq((5L, 10L), (10L, 42L)).toDF("src", "dst")
    val g = graft.core.LinkGraph(e, directed = false, None)
    val f = java.io.File.createTempFile("graft", ".gw"); f.deleteOnExit()
    Formats.writeLeda(g, None, f.getAbsolutePath, withWeights = false)
    val fg = Formats.readLeda(spark, f.getAbsolutePath)
    assert(fg.graph.ecount() == 2)
    assert(fg.graph.weighted.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 1L), (1L, 2L))) // 5,10,42 -> 0,1,2 preserving the path shape
    val fd = java.io.File.createTempFile("graft", ".dot"); fd.deleteOnExit()
    Formats.writeDot(g, None, fd.getAbsolutePath)
    assert(java.nio.file.Files.readString(fd.toPath) ==
      "graph {\n  0;\n  1;\n  2;\n  0 -- 1;\n  1 -- 2;\n}\n")
  }

  test("Graph.Read dispatch by extension (__init__.py:2895-2930)") {
    val p = tmp("a b 1\nb c 2\n", "ncol")
    val fg = Formats.read(spark, p)
    assert(fg.graph.ecount() == 2 && fg.weighted)
    assertThrows[IllegalArgumentException] { Formats.read(spark, "x.unknownext") }
  }

  test("GraphMLz: gzip round-trip + Graph.Read dispatch (__init__.py:2304-2317)") {
    val plain = tmp(
      """<?xml version="1.0" encoding="UTF-8"?>
        |<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
        |<key id="v_name" for="node" attr.name="name" attr.type="string"/>
        |<graph id="G" edgedefault="undirected">
        |<node id="n0"><data key="v_name">a</data></node>
        |<node id="n1"><data key="v_name">b</data></node>
        |<edge source="n0" target="n1"></edge>
        |</graph>
        |</graphml>
        |""", "graphml")
    val gz = java.io.File.createTempFile("graft", ".graphml.gz")
    gz.deleteOnExit()
    val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(gz))
    try java.nio.file.Files.copy(java.nio.file.Paths.get(plain), out) finally out.close()
    val fg = Formats.read(spark, gz.getAbsolutePath)
    assert(fg.graph.vcount() == 2 && fg.graph.ecount() == 1)
    assert(namedEdges(fg) == Seq(("a", "b")))
    // writer round-trip
    val gz2 = java.io.File.createTempFile("graft", ".graphmlz")
    gz2.deleteOnExit()
    Formats.writeGraphmlz(fg.graph, fg.names.get, gz2.getAbsolutePath)
    assert(namedEdges(Formats.readGraphmlz(spark, gz2.getAbsolutePath)) == namedEdges(fg))
  }

  test("Graph.DictList: named vertices/edges with attrs (__init__.py:2992-3115)") {
    import spark.implicits._
    val verts = Seq(("apple", 10.0), ("pear", 20.0), ("plum", 30.0)).toDF("name", "size")
    val edges = Seq(("apple", "pear", 1.5), ("pear", "plum", 2.5), ("cherry", "apple", 3.5))
      .toDF("source", "target", "weight")
    val r = graft.ingest.Foreign.dictList(Some(verts), edges, directed = true)
    // cherry appears only in edges and is auto-created
    assert(r.graph.vcount() == 4 && r.graph.ecount() == 3 && r.graph.directed)
    val nameOf = r.vertices.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val got = r.graph.weighted.collect()
      .map(x => (nameOf(x.getLong(0)), nameOf(x.getLong(1)), x.getDouble(2))).toSet
    assert(got === Set(("apple", "pear", 1.5), ("pear", "plum", 2.5), ("cherry", "apple", 3.5)))
    // vertex attrs survive re-keying; auto-created vertex has null attr
    val sizes = r.vertices.collect().map(x => x.getString(1) -> Option(x.get(2))).toMap
    assert(sizes("apple") === Some(10.0) && sizes("cherry") === None)
  }
}
