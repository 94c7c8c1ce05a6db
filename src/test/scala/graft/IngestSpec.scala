package graft

import graft.algos.PageRank
import graft.core.Ids
import graft.ingest.{Extract, Pages}
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion pipeline: byte-identical extraction invariant (BASELINE.json
  * input_hint), link parsing, dense dictionary, end-to-end pages->PageRank.
  */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("extract(html) == text byte-identically for every synthetic page") {
    val pages = Pages.generate(spark, n = 500, partitions = 8)
    assert(Pages.extractionViolations(pages) == 0L)
  }

  test("extraction drops tags/script/style, decodes entities, collapses whitespace") {
    val html = "<html><head><style>a{}</style><script>x&amp;y</script></head>" +
      "<body> <h1>A&amp;B</h1>\n\n <p>c  d</p></body></html>"
    assert(Extract.text(html.getBytes("UTF-8")) == "A&B c d")
  }

  test("link parse returns anchors in document order incl. duplicates") {
    val html = """<a href="https://a.example/1">x</a><a href="#frag">n</a>
                 |<a href="https://b.example/2">y</a><a href="https://a.example/1">z</a>"""
      .stripMargin.getBytes("UTF-8")
    assert(Extract.links(html) == Seq("https://a.example/1", "https://b.example/2", "https://a.example/1"))
  }

  test("generation is a pure function of (seed, id): same corpus at any parallelism") {
    val a = Pages.generate(spark, 200, partitions = 2).collect().sortBy(_.url)
    val b = Pages.generate(spark, 200, partitions = 16).collect().sortBy(_.url)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.url == y.url && x.text == y.text && java.util.Arrays.equals(x.html, y.html))
    }
  }

  test("dense dictionary: ids are 0..n-1, unique, deterministic sort order") {
    import spark.implicits._
    val urls = (0 until 1000).map(i => s"https://u${(i * 37) % 500}.example").toDF("url")
    val dict = Ids.assignDense(urls, "url", partitions = 8).collect()
    assert(dict.length == 500)
    val ids = dict.map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 500L))
    // deterministic: sorted by url
    val byUrl = dict.sortBy(_.getString(1)).map(_.getLong(0))
    assert(byUrl.toSeq == (0L until 500L))
  }

  test("pages -> edges -> PageRank end-to-end (slice 0): mass conserved, hubs ranked") {
    val pages = Pages.generate(spark, n = 300, avgDeg = 6, partitions = 4)
    val (dict, g) = Pages.toGraph(pages)
    assert(dict.count() == 300) // all targets are in-corpus urls
    val m = g.ecount()
    assert(m > 300, s"edges=$m")
    val r = PageRank.run(g, tol = 1e-8, maxIter = 60)
    val sum = r.ranks.agg(org.apache.spark.sql.functions.sum("rank")).head.getDouble(0)
    assert(math.abs(sum - 1.0) < 1e-6)
    assert(r.iterations < 60, "should converge")
  }
}
