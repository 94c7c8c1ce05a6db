package graft.ingest

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import graft.core.LinkGraph
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One synthetic Common-Crawl-style page row (the input_hint schema). */
final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic synthetic web corpus + the pages -> edges pipeline.
  *
  * Corpus contract (FIXTURES.md §1): page i has
  * `url = https://site{i % nSites}.example/p/{i}`; its outlinks are drawn
  * from a seeded Zipfian over vertex ids (exponent ~2.2 — web-graph degree
  * lore), so hub skew is built in and exercises the salting/AQE paths. Every
  * page is a pure function of (seed, i): the same corpus materializes at any
  * parallelism, which is what lets the two-cluster-size bench run on
  * identical input.
  *
  * The pipeline replaces the reference's `Graph.TupleList` ingest
  * (`__init__.py:3116-3206`): extract text (byte-identical invariant), parse
  * links, build the url -> dense-id dictionary, join twice, emit Edge rows.
  */
object Pages {

  val DefaultSeed = 42L

  // --- pure deterministic generation -------------------------------------

  /** splitmix64: the standard 64-bit finalizer; pure, stable across JVMs. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** uniform double in (0, 1] from a hash */
  private def u01(h: Long): Double = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble

  /** Zipf-ish target id: inverse-CDF power-law over ranks 1..n with exponent
    * `alpha`, rank -> id spread by a multiplicative permutation so hub ids
    * are scattered across the id space (and across hash partitions).
    */
  def zipfTarget(seed: Long, page: Long, j: Int, n: Long, alpha: Double): Long = {
    val u = u01(mix64(seed ^ mix64(page * 1000003L + j)))
    val rank = math.min(n.toDouble, math.floor(math.pow(u, -1.0 / (alpha - 1.0)))).toLong
    ((rank - 1) * 2654435761L) % n
  }

  def urlOf(i: Long, nSites: Long): String = s"https://site${i % nSites}.example/p/$i"

  /** Parse a corpus url back to its page id (inverse of [[urlOf]]). */
  def idOfUrl(url: String): Long = url.substring(url.lastIndexOf('/') + 1).toLong

  private val langs = Array("en", "de", "fr", "es", "zh", "ru", "pt", "ja")
  private val words = Array("graph", "vertex", "edge", "rank", "crawl", "link", "web",
    "page", "spark", "shuffle", "join", "iterate", "converge", "cluster", "label")

  /** Out-degree of page i: 1 + hash % (2*avgDeg - 1) => mean ~ avgDeg. */
  def outDegree(seed: Long, i: Long, avgDeg: Int): Int =
    1 + (java.lang.Long.remainderUnsigned(mix64(seed ^ (i * 7919L)), (2L * avgDeg - 1).toLong)).toInt

  /** Outlink target ids of page i (may repeat => multi-edges, may self-loop). */
  def outLinks(seed: Long, i: Long, n: Long, avgDeg: Int, alpha: Double = 2.2): Seq[Long] =
    (0 until outDegree(seed, i, avgDeg)).map(j => zipfTarget(seed, i, j, n, alpha))

  /** Deterministic HTML for page i; `Extract.text` of it is the `text` col. */
  def htmlOf(seed: Long, i: Long, n: Long, nSites: Long, avgDeg: Int): Array[Byte] = {
    val body = (0 until 8).map { k =>
      words((java.lang.Long.remainderUnsigned(mix64(seed ^ (i * 31L + k)), words.length.toLong)).toInt)
    }.mkString(" ")
    val anchors = outLinks(seed, i, n, avgDeg).zipWithIndex.map { case (t, j) =>
      s"""<a href="${urlOf(t, nSites)}">ref$j</a>"""
    }.mkString("\n")
    val html =
      s"""<html><head><title>page $i</title><script>var x=$i;</script></head>
         |<body><h1>Page $i</h1>
         |<p>$body</p>
         |$anchors
         |</body></html>""".stripMargin
    html.getBytes(StandardCharsets.UTF_8)
  }

  def langOf(seed: Long, i: Long): String =
    langs((java.lang.Long.remainderUnsigned(mix64(seed ^ ~i), langs.length.toLong)).toInt)

  /** Materialize the pages table: n rows, distributed generation (each
    * partition generates its id range — no driver-side data).
    */
  def generate(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
               nSites: Long = 100L, avgDeg: Int = 10, partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val html = htmlOf(seed, i, n, nSites, avgDeg)
      Page(
        url = urlOf(i, nSites),
        warc_ts = new Timestamp(1700000000000L + (java.lang.Long.remainderUnsigned(mix64(seed ^ (i + 17)), 86400000L))),
        html = html,
        text = Extract.text(html),
        lang = langOf(seed, i))
    }
  }

  /** Zero-padded url so lexicographic dictionary order == numeric page
    * order (id == page number) — the oracle-mode corpus url scheme.
    */
  def urlOfPadded(i: Long): String = f"https://oracle.test/p/$i%08d"

  /** Oracle-mode corpus: page i links to (i*31 + 7j + 1) mod n for
    * j < outDeg — pure integer arithmetic a SQL oracle reproduces exactly,
    * while still exercising the full html -> extract -> link-parse ->
    * dictionary pipeline (the links only exist inside the generated html).
    */
  def generateArithmetic(spark: SparkSession, n: Long, outDeg: Int = 8,
                         partitions: Int = 8): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val anchors = (0 until outDeg).map { j =>
        s"""<a href="${urlOfPadded((i * 31 + 7 * j + 1) % n)}">r$j</a>"""
      }.mkString("\n")
      val html =
        s"""<html><head><title>p $i</title></head>
           |<body><p>page $i</p>
           |$anchors
           |</body></html>""".stripMargin.getBytes(StandardCharsets.UTF_8)
      Page(urlOfPadded(i), new Timestamp(1700000000000L), html, Extract.text(html), "en")
    }
  }

  // --- pages -> edges pipeline --------------------------------------------

  /** Url-level edge list: (src_url, dst_url), one row per anchor. */
  def urlEdges(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => Extract.links(p.html).map(t => (p.url, t)))
      .toDF("src_url", "dst_url")
  }

  /** Build the dense url -> id dictionary and the Long edge table.
    *
    * Dictionary: distinct urls get dense ids 0..n-1 in a deterministic sort
    * order (documented replacement for the reference's first-seen-order
    * `UniqueIdGenerator`, `datatypes.py:656-733`). Assignment is
    * range-partition + per-partition offsets — no global single-partition
    * window, so it scales to 10^12 urls.
    *
    * @return (vertices(id, url), graph with edges(src, dst, weight=1))
    */
  def toGraph(pages: Dataset[Page], partitions: Int = 32): (DataFrame, LinkGraph) = {
    val spark = pages.sparkSession
    val ue = urlEdges(pages)
    val urls = pages.select(col("url"))
      .union(ue.select(col("dst_url").as("url")))
      .distinct()
    val dict = graft.core.Ids.assignDense(urls, "url", partitions) // already materialized (Lineage.cut inside)
    val e = ue
      .join(dict.select(col("url").as("src_url"), col("id").as("src")), Seq("src_url"))
      .join(dict.select(col("url").as("dst_url"), col("id").as("dst")), Seq("dst_url"))
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    (dict, LinkGraph(e, directed = true, Some(dict.count())))
  }

  /** Per-row extraction invariant: count of rows where extract(html) is NOT
    * byte-identical to the stored text (must be 0).
    */
  def extractionViolations(pages: Dataset[Page]): Long = {
    import pages.sparkSession.implicits._
    pages.filter(p => Extract.text(p.html) != p.text).count()
  }
}
