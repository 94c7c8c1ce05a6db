package graft

import graft.core.{GraphOps, LinkGraph, Mode}
import graft.ingest.Foreign
import graft.ops.Select
import graft.streaming.EdgeStream
import org.scalatest.funsuite.AnyFunSuite

/** Select DSL, foreign formats, streaming, dyad census, assortativity. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("es.select: _within / _between / _source semantics (__init__.py:4674-4988)") {
    val gdir = LinkGraph(spark, 4,
      Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 1L), (0L, 3L), (1L, 3L), (3L, 0L)), directed = true)
    assert(Select.es(gdir).within(Seq(1L, 2L)).result.count() == 2) // 1->2, 2->1
    assert(Select.es(gdir).source(Seq(0L)).result.count() == 3)
    assert(Select.es(gdir).target(Seq(3L)).result.count() == 2)
    assert(Select.es(gdir).between(Seq(0L), Seq(3L)).result.count() == 2) // 0->3, 3->0
    // undirected: _source degrades to _incident
    val und = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = false)
    assert(Select.es(und).source(Seq(1L)).result.count() == 2)
  }

  test("vs.select: attr ops + computed _degree_gt (__init__.py:4426-4559)") {
    val g = LinkGraph(spark, 4, Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L)), directed = false)
    val attrs = Seq((0L, "red"), (1L, "blue"), (2L, "red"), (3L, "blue")).toDF("id", "color")
    assert(Select.vs(g, Some(attrs)).attr("color", "eq", "red").ids.count() == 2)
    assert(Select.vs(g, Some(attrs)).attr("color", "ne", "red").ids.count() == 2)
    // degree: [3,2,2,1]; _degree_gt=1 -> {0,1,2}
    val sel = Select.vs(g).degree("gt", 1)
    assert(sel.ids.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    // subgraph of the selection
    assert(sel.subgraph().ecount() == 3)
  }

  test("NCOL reader: weight-presence inference + named dictionary (test_foreign.py:180-203)") {
    val dir = java.nio.file.Files.createTempDirectory("ncol").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/g.ncol"),
      "eggs spam 1\nham eggs 2\nham bacon\nbacon spam 3\nspam spam\n")
    val r = Foreign.readNcol(spark, s"$dir/g.ncol")
    assert(r.weighted)
    assert(r.vertices.count() == 4)
    assert(r.graph.ecount() == 5)
    // loop present
    assert(!r.graph.edges.where($"src" === $"dst").isEmpty)
    // unweighted file => weighted=false
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/g2.ncol"),
      "a b\nb c\n")
    assert(!Foreign.readNcol(spark, s"$dir/g2.ncol").weighted)
    // round-trip via write_ncol
    Foreign.writeNcol(r.graph, r.vertices, s"$dir/out")
    val back = Foreign.readNcol(spark, s"$dir/out")
    assert(back.graph.ecount() == 5 && back.weighted)
  }

  test("edgelist read/write round-trip (graphobject.c:14903)") {
    val dir = java.nio.file.Files.createTempDirectory("el").toString
    val g = LinkGraph(spark, 5, Seq((0L, 1L), (1L, 2L), (3L, 4L)), directed = true)
    Foreign.writeEdgelist(g, s"$dir/e")
    val back = Foreign.readEdgelist(spark, s"$dir/e")
    assert(back.ecount() == 3)
    assert(back.edges.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == Seq((0L, 1L), (1L, 2L), (3L, 4L)))
  }

  test("dyad census (graphobject.c:14342)") {
    // 0<->1 mutual, 0->2 asym, 3 isolated: n=4 -> pairs=6, null=4
    val g = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 0L), (0L, 2L)), directed = true)
    assert(GraphOps.dyadCensus(g) == (1L, 1L, 4L))
  }

  test("degree assortativity: star is perfectly disassortative") {
    val star = LinkGraph.star(spark, 6)
    assert(GraphOps.assortativityDegree(star) == -1.0 ||
      math.abs(GraphOps.assortativityDegree(star) + 1.0) < 1e-9)
  }

  test("streaming ingest: pages stream -> edge parquet sink, byte-identical extract") {
    val base = java.nio.file.Files.createTempDirectory("stream").toString
    val pagesDir = s"$base/pages"; val sink = s"$base/edges"; val ckpt = s"$base/ckpt"
    // write two micro-batches of deterministic pages
    graft.ingest.Pages.generate(spark, 100, partitions = 2)
      .write.parquet(pagesDir)
    val q = EdgeStream.ingest(spark, pagesDir, sink, ckpt)
    q.processAllAvailable()
    // second batch arrives
    graft.ingest.Pages.generate(spark, 150, partitions = 2)
      .filter(_.url.endsWith("9")) // distinct subset, avoids duplicate files
      .write.mode("append").parquet(pagesDir)
    q.processAllAvailable()
    q.stop()
    val edges = spark.read.parquet(sink)
    assert(edges.count() > 100)
    assert(edges.columns.toSeq == Seq("src_url", "dst_url"))
  }

  test("streaming windowed event stats (watermark + window)") {
    val base = java.nio.file.Files.createTempDirectory("evstream").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val agg = EdgeStream.windowedEventStats(stream)
    val q = agg.writeStream.outputMode("update").format("memory").queryName("evagg").start()
    q.processAllAvailable(); q.stop()
    val out = spark.sql("select * from evagg")
    assert(out.count() > 0)
    assert(out.columns.contains("event_type"))
  }

  test("streaming dedup: flatMapGroupsWithState drops cross-batch duplicates") {
    val base = java.nio.file.Files.createTempDirectory("dedupstream").toString
    Seq((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text"))
      .toDF("doc_id", "text").write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val q = EdgeStream.dedupStream(stream)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("dd").start()
    q.processAllAvailable()
    // batch 2: one duplicate of batch 1, one new doc
    Seq((4L, "alpha text"), (5L, "gamma text"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$base/in")
    q.processAllAvailable(); q.stop()
    val got = spark.sql("select doc_id from dd").collect().map(_.getLong(0)).toSet
    // 1 (keep-min of the alpha pair in batch 1), 2, 5; 3 and 4 are dupes
    assert(got === Set(1L, 2L, 5L))
  }

  test("streaming near-dup candidates: LSH bucket anchors pair duplicates across batches") {
    val base = java.nio.file.Files.createTempDirectory("neardupstream").toString
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (5L, "the quick brown fox jumps over the lazy dog"), // same-batch dupe
        (2L, "completely different words appear in this one"))
      .toDF("doc_id", "text").write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val q = EdgeStream.nearDupCandidatesStream(stream)
      .toDF("a", "b", "band")
      .writeStream.outputMode("append").format("memory").queryName("nd").start()
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate of doc 1 and a fresh document
    Seq((3L, "the quick brown fox jumps over the lazy dog"),
        (4L, "nothing in common with anything else at all"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$base/in")
    q.processAllAvailable(); q.stop()
    val pairs = spark.sql("select a, b from nd").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 1 is the anchor of every bucket it occupies (min id in batch 1);
    // 5 pairs within-batch, 3 across batches; 2 and 4 pair with nothing
    assert(pairs === Set((1L, 5L), (1L, 3L)))
    // identical text -> every one of the 8 bands collides
    val bandCount = spark.sql("select count(*) from nd where b = 3").collect()(0).getLong(0)
    assert(bandCount === 8L)
  }

  test("streaming running degrees: mapGroupsWithState accumulates across batches") {
    val base = java.nio.file.Files.createTempDirectory("degstream").toString
    Seq((0L, 1L), (0L, 2L)).toDF("src", "dst").write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val q = EdgeStream.runningDegrees(stream)
      .toDF("id", "degree")
      .writeStream.outputMode("update").format("memory").queryName("rd").start()
    q.processAllAvailable()
    Seq((0L, 3L)).toDF("src", "dst").write.mode("append").parquet(s"$base/in")
    q.processAllAvailable(); q.stop()
    // latest update per id wins
    val rows = spark.sql("select id, degree from rd").collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(1)).max }
    assert(rows(0L) === 3L) // 0 seen in all three edges
    assert(rows(3L) === 1L)
  }

  test("es.select computed-metric filter (_edge_betweenness_ge style, __init__.py:4551-4553)") {
    import org.apache.spark.sql.functions.col
    // path 0-1-2-3: edge betweenness [3, 4, 3]
    val g = graft.core.LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (2L, 3L)), directed = false)
    val ebm = graft.algos.Betweenness.edgeBetweenness(g)
    val kept = graft.ops.Select.es(g).metric(ebm, "betweenness", "ge", 4.0).result
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((1L, 2L)))
    // directed graphs key the metric on (src, dst) directly
    val gd = graft.core.LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L)), directed = true)
    val ebd = graft.algos.Betweenness.edgeBetweenness(gd)
    val keptD = graft.ops.Select.es(gd).metric(ebd, "betweenness", "gt", 1.5).result
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0->1 carries paths {0->1, 0->2}; 1->2 carries {1->2, 0->2} -> both 2.0
    assert(keptD == Set((0L, 1L), (1L, 2L)))
    // chained with structural selectors
    val both = graft.ops.Select.es(g).metric(ebm, "betweenness", "ge", 3.0)
      .incident(Seq(0L)).result.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(both == Set((0L, 1L)))
  }
}
