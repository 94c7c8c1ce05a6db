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

  test("general assortativity: equals degree variant with values = deg-1; hand-computed directed case") {
    import org.apache.spark.sql.functions._
    // undirected fixture: assortativity(deg-1) must equal assortativityDegree
    val g = LinkGraph(spark, 6,
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L), (4L, 5L)), directed = false)
    val degm1 = GraphOps.degrees(g, graft.core.Mode.All, loops = false)
      .select(col("id"), (col("degree") - 1).cast("double").as("v"))
    assert(math.abs(GraphOps.assortativity(g, degm1, None, directed = false)
      - GraphOps.assortativityDegree(g)) < 1e-12)
    // directed, two value vectors: corr over (v1(src), v2(dst)) edge pairs.
    // Edges (0->1),(1->2),(2->0); v1 = id, v2 = id*id
    // pairs: x=[0,1,2], y=[1*1,2*2,0*0]=[1,4,0]; Pearson by hand:
    // mx=1, my=5/3; cov*3 = (0-1)(1-5/3)+(1-1)(4-5/3)+(2-1)(0-5/3) = 2/3-5/3 = -1
    // sxx*3 = 2, syy*3 = (1-5/3)^2+(4-5/3)^2+(0-5/3)^2 = 4/9+49/9+25/9 = 78/9
    // r = -1 / sqrt(2*78/9) = -1/sqrt(156/9) = -3/sqrt(156)
    val d = LinkGraph(spark, 3, Seq((0L, 1L), (1L, 2L), (2L, 0L)), directed = true)
    val v1 = d.vertices.select(col("id"), col("id").cast("double").as("v"))
    val v2 = d.vertices.select(col("id"), (col("id") * col("id")).cast("double").as("v"))
    assert(math.abs(GraphOps.assortativity(d, v1, Some(v2))
      - (-3.0 / math.sqrt(156.0))) < 1e-12)
    // values2 on an undirected graph is rejected (reference parity)
    intercept[IllegalArgumentException](GraphOps.assortativity(g, degm1, Some(degm1)))
  }

  test("diversity: entropy/ln(degree) hand case; reference gates") {
    import org.apache.spark.sql.functions._
    // path 0-1-2, w(0,1)=1, w(1,2)=3: ends deg-1 -> 0;
    // middle: S=4, H = ln4 - 3*ln3/4, diversity = H/ln2
    val g = LinkGraph.weighted(spark, 3, Seq((0L, 1L, 1.0), (1L, 2L, 3.0)), directed = false)
    val d = GraphOps.diversity(g).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(0L) == 0.0 && d(2L) == 0.0)
    assert(math.abs(d(1L) - (math.log(4) - 3 * math.log(3) / 4) / math.log(2)) < 1e-12)
    // unit weights: uniform entropy -> exactly 1.0 for every deg>=2 vertex
    val ring = LinkGraph(spark, 4, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), directed = false)
    assert(GraphOps.diversity(ring).collect().forall(_.getDouble(1) == 1.0))
    // gates: directed / multigraph / loops rejected (reference parity)
    intercept[IllegalArgumentException](GraphOps.diversity(
      LinkGraph(spark, 2, Seq((0L, 1L)), directed = true)))
    intercept[IllegalArgumentException](GraphOps.diversity(
      LinkGraph(spark, 2, Seq((0L, 1L), (1L, 0L)), directed = false)))
    intercept[IllegalArgumentException](GraphOps.diversity(
      LinkGraph(spark, 2, Seq((0L, 1L), (1L, 1L)), directed = false)))
    // zero/negative weights would silently vanish from the entropy sum
    // (log(w) -> NULL, sum skips NULLs) — gated loudly instead
    intercept[IllegalArgumentException](GraphOps.diversity(
      LinkGraph.weighted(spark, 3, Seq((0L, 1L, 0.0), (1L, 2L, 1.0)), directed = false)))
    intercept[IllegalArgumentException](GraphOps.diversity(
      LinkGraph.weighted(spark, 3, Seq((0L, 1L, -2.0), (1L, 2L, 1.0)), directed = false)))
  }

  test("edge multiplicity: is_loop / is_multiple / count_multiple, directed + undirected") {
    val d = LinkGraph(spark, 3,
      Seq((0L, 1L), (0L, 1L), (1L, 0L), (2L, 2L), (0L, 2L)), directed = true)
    val rows = graft.ops.Extras.edgeMultiplicity(d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(rows.length == 5)
    val m = rows.toMap
    assert(m((0L, 1L)) == ((0L, 2L, 1L)))  // directed: (0,1) x2
    assert(m((1L, 0L)) == ((0L, 1L, 0L)))  // reverse arc NOT merged
    assert(m((2L, 2L)) == ((1L, 1L, 0L)))  // loop, single
    assert(m((0L, 2L)) == ((0L, 1L, 0L)))
    val u = LinkGraph(d.edges, directed = false, Some(3L))
    val um = graft.ops.Extras.edgeMultiplicity(u).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(um((0L, 1L)) == 3L && um((1L, 0L)) == 3L) // canonicalized pair
  }

  test("get_eids: batch lookup matches get_eid, -1 for absent") {
    val g = LinkGraph(spark, 5, Seq((0L, 1L), (1L, 2L), (3L, 4L)), directed = true)
    val out = GraphOps.getEids(g, Seq((1L, 2L), (0L, 1L), (2L, 1L), (3L, 4L)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) == GraphOps.getEid(g, 1L, 2L))
    assert(out(1L) == GraphOps.getEid(g, 0L, 1L))
    assert(out(2L) == -1L) // directed: reverse pair absent
    assert(out(3L) == GraphOps.getEid(g, 3L, 4L))
    // undirected: reverse pair resolves
    val ug = LinkGraph(g.edges, directed = false, Some(5L))
    val uo = GraphOps.getEids(ug, Seq((2L, 1L))).collect().head.getLong(3)
    assert(uo == GraphOps.getEid(ug, 1L, 2L))
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

  test("streaming PII scrub: stateless map stage masks at ingest, batch == stream results") {
    // redactPii is a pure Column projection, so it lifts onto readStream
    // unchanged — the ingest-time anonymization stage of a crawl pipeline
    val base = java.nio.file.Files.createTempDirectory("piistream").toString
    Seq((1L, "mail me at spam@trap.net today"), (2L, "nothing sensitive here"))
      .toDF("doc_id", "text").write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val q = graft.text.TextOps.redactPii(stream)
      .writeStream.outputMode("append").format("memory").queryName("pii").start()
    q.processAllAvailable()
    Seq((3L, "server 10.1.2.3 or call +1 555-867-5309"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$base/in")
    q.processAllAvailable(); q.stop()
    val got = spark.sql("select doc_id, n_emails, n_phones, n_ips, clean_text from pii")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((1L, 0L, 0L, "mail me at <EMAIL> today")))
    assert(got(2L) == ((0L, 0L, 0L, "nothing sensitive here")))
    assert(got(3L) == ((0L, 1L, 1L, "server <IP> or call <PHONE>")))
    // stream output == batch output on the same rows (determinism of the stage)
    val batch = graft.text.TextOps.redactPii(spark.read.parquet(s"$base/in"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(batch == got)
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

  test("streaming frontier: cross-batch counters equal the batch frontier op") {
    val base = java.nio.file.Files.createTempDirectory("frontstream").toString
    Seq((0L, 10L), (0L, 11L), (1L, 10L)).toDF("src", "dst")
      .write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val q = EdgeStream.frontierStream(stream)
      .toDF("id", "crawled", "n_inlinks")
      .writeStream.outputMode("update").format("memory").queryName("fs").start()
    q.processAllAvailable()
    // batch 2: 10 gets crawled (leaves the frontier), links to 11 and 12
    Seq((10L, 11L), (10L, 12L)).toDF("src", "dst")
      .write.mode("append").parquet(s"$base/in")
    q.processAllAvailable(); q.stop()
    // both state fields are monotone, so max-fold the per-id updates
    // (memory-sink row order across batches is not contractual)
    val latest = spark.sql("select * from fs").collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> (rs.exists(_.getBoolean(1)), rs.map(_.getLong(2)).max) }
    // frontier now: 11 (inlinks from 0 and 10), 12 (from 10); 10 crawled
    assert(latest(10L)._1 && latest(10L)._2 == 2L) // crawled, keeps its count
    assert(latest(11L) == ((false, 2L)))
    assert(latest(12L) == ((false, 1L)))
    // stream == batch: same totals as WebOps.frontier on the full edge set
    val edges = spark.read.parquet(s"$base/in")
    val crawled = edges.select(org.apache.spark.sql.functions.col("src").as("id")).distinct()
    val batch = graft.text.WebOps.frontier(edges, crawled, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamFrontier = latest.collect { case (id, (false, c)) if c > 0 => id -> c }.toMap
    assert(streamFrontier == batch)
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
