package graft.ingest

import java.nio.charset.StandardCharsets

/** Deterministic HTML -> text and link extraction.
  *
  * The north_rule input is a pages table (url, warc_ts, html, text, lang)
  * where `text` must equal our extraction of `html` **byte-for-byte per url**
  * (BASELINE.json input_hint). That forbids locale-/library-dependent paths:
  * everything here is pure JVM Scala over explicit UTF-8 bytes, no external
  * parser, no regex flags that vary by engine version. The reference has no
  * HTML layer (it starts at edge lists); this is the engine's ingestion
  * front-end feeding `Graph.TupleList`-style named-edge construction
  * (`__init__.py:3116-3206`).
  */
object Extract {

  /** Extract visible text from HTML bytes: drop <script>/<style> blocks,
    * strip tags, decode the five standard entities, collapse whitespace runs
    * to single spaces, trim. Deterministic by construction.
    */
  def text(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    val sb = new StringBuilder(s.length)
    var i = 0
    var skipUntil: String = null // closing tag we are inside of
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i)
        if (close < 0) { i = s.length } // malformed trailing tag: drop rest
        else {
          val tag = s.substring(i + 1, close).trim.toLowerCase
          if (skipUntil == null && (tag.startsWith("script") || tag.startsWith("style"))) {
            skipUntil = if (tag.startsWith("script")) "/script" else "/style"
          } else if (skipUntil != null && tag.startsWith(skipUntil)) {
            skipUntil = null
          }
          i = close + 1
        }
      } else {
        if (skipUntil == null) sb.append(c)
        i += 1
      }
    }
    val decoded = sb.toString
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
    collapseWs(decoded)
  }

  private def collapseWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') pendingSpace = true
      else {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c); started = true; pendingSpace = false
      }
      i += 1
    }
    sb.toString
  }

  /** All <a href="..."> targets, in document order, duplicates preserved
    * (multi-edges are legal in the data model, `graphobject.c:12275-12335`).
    * Only double-quoted absolute http(s) hrefs — the synthetic corpus and
    * Common-Crawl WAT-style extraction both guarantee this shape.
    */
  def links(html: Array[Byte]): Seq[String] = {
    val s = new String(html, StandardCharsets.UTF_8)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val marker = "href=\""
    while (i < s.length) {
      val at = s.indexOf(marker, i)
      if (at < 0) i = s.length
      else {
        val start = at + marker.length
        val end = s.indexOf('"', start)
        if (end < 0) i = s.length
        else {
          val href = s.substring(start, end)
          if (href.startsWith("http://") || href.startsWith("https://")) out += href
          i = end + 1
        }
      }
    }
    out.toSeq
  }
}
