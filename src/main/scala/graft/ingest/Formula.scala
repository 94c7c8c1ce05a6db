package graft.ingest

import graft.core.LinkGraph
import org.apache.spark.sql.SparkSession

/** `Graph.Formula("A-B:C, ...")` (`formula.py:21-222`; goldens
  * `test_generators.py:46-107`): the igraph-R-style edge DSL. A tiny local
  * parser — SURVEY §2.2 scoped it as exactly that.
  *
  * Semantics (all pinned by the ported goldens):
  *  - parts are separated by commas or newlines; a part is a chain of
  *    vertex GROUPS (names joined by `:`) linked by connectors;
  *  - a connector is a run of `-<>+`; `<` / `>` are arrowheads;
  *  - the graph is DIRECTED iff any connector in the whole formula carries
  *    an arrowhead; in a directed formula an arrowless `--` contributes NO
  *    edge (reference behavior: "A <- B -- C" has one edge);
  *  - consecutive groups connect by cross product; `<->`/`<>` emit both
  *    arcs; edges are deduplicated (canonicalized for undirected);
  *  - names are bare identifiers or quoted strings ('x' or "x"); vertex
  *    ids are assigned in first-appearance order;
  *  - `None`-analog (absent formula) = empty graph; `""` = one vertex
  *    named "".
  */
object Formula {

  final case class Result(graph: LinkGraph, names: Seq[String])

  def apply(spark: SparkSession, formula: Option[String]): Result = formula match {
    case None    => Result(LinkGraph(spark, 0L, Seq.empty, directed = false), Seq.empty)
    case Some(f) => apply(spark, f)
  }

  def apply(spark: SparkSession, formula: String): Result = {
    val names = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def id(n: String): Long = names.getOrElseUpdate(n, names.size.toLong)
    // part -> alternating groups/connectors
    final case class Part(groups: Seq[Seq[String]], connectors: Seq[String])
    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    formula.split("[,\n]", -1).foreach { raw =>
      val s = raw.trim
      val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      val conns = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      def flushGroup(): Unit =
        if (cur.nonEmpty) { groups += cur.toSeq; cur.clear() }
      while (i < s.length) {
        val c = s.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '\'' || c == '"') {
          val end = s.indexOf(c, i + 1)
          require(end > i, s"unterminated quote in formula part: $s")
          cur += s.substring(i + 1, end)
          i = end + 1
        } else if ("-<>+".contains(c)) {
          val start = i
          while (i < s.length && "-<>+".contains(s.charAt(i))) i += 1
          flushGroup()
          conns += s.substring(start, i)
        } else if (c == ':') i += 1 // group joiner: next name joins cur
        else {
          val start = i
          while (i < s.length && !":-<>+\'\"".contains(s.charAt(i)) &&
            !s.charAt(i).isWhitespace) i += 1
          cur += s.substring(start, i)
        }
      }
      flushGroup()
      // "" formula: the whole part is empty -> one vertex named ""
      if (groups.isEmpty && conns.isEmpty) groups += Seq("")
      require(groups.size == conns.size + 1,
        s"malformed formula part: '$s' (${groups.size} groups, ${conns.size} connectors)")
      parts += Part(groups.toSeq, conns.toSeq)
    }
    // trailing-comma artifact: drop extra empty parts unless the formula is
    // exactly "" (one empty part)
    val kept =
      if (parts.size > 1) parts.filterNot(p => p.groups == Seq(Seq(""))) else parts
    val directed = kept.exists(_.connectors.exists(c => c.contains('<') || c.contains('>')))
    val edges = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    kept.foreach { p =>
      p.groups.foreach(_.foreach(id)) // register vertices in order
      p.connectors.zipWithIndex.foreach { case (conn, k) =>
        val left = p.groups(k).map(id)
        val right = p.groups(k + 1).map(id)
        val aLeft = conn.contains('<')
        val aRight = conn.contains('>')
        for (a <- left; b <- right if a != b) {
          if (!directed) edges += ((math.min(a, b), math.max(a, b)))
          else {
            if (aRight) edges += ((a, b))
            if (aLeft) edges += ((b, a))
          }
        }
      }
    }
    val nameSeq = names.keys.toSeq
    Result(LinkGraph(spark, names.size.toLong, edges.toSeq, directed), nameSeq)
  }
}
