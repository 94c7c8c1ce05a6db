package graft.ingest

import graft.core.LinkGraph
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side parsers/writers for the small graph-interchange formats:
  * GraphML, GML, Pajek, LGL, UCINET DL, DIMACS, adjacency matrix — plus
  * the `Graph.Read` extension dispatch.
  *
  * Reference: `Read_GraphML/GML/Pajek/Lgl/DL/DIMACS/Adjacency` and their
  * writers (`graphobject.c:14877-15101`, dispatch `__init__.py:2895-2930`,
  * format table `__init__.py:4239-4263`); fixtures
  * `tests/test_foreign.py:26-356`.
  *
  * Design note: these formats are sequential/stateful by construction
  * (header-scoped sections, document order, 1-based index blocks), so they
  * are parsed on the driver from a whole-file read and parallelized
  * afterwards. They are interchange formats — the petabyte ingest path is
  * parquet/Iceberg + the [[Pages]] pipeline, never these.
  */
object Formats {

  /** Parsed foreign graph: edge table + optional (id, name) vertex names. */
  final case class ForeignGraph(graph: LinkGraph, names: Option[DataFrame], weighted: Boolean)

  private def wholeFile(spark: SparkSession, path: String): String =
    spark.read.option("wholetext", "true").text(path).head().getString(0)

  private def toGraph(spark: SparkSession, n: Long,
                      edges: Seq[(Long, Long, Double)], directed: Boolean,
                      names: Option[Seq[String]], weighted: Boolean): ForeignGraph = {
    import spark.implicits._
    val g = LinkGraph(edges.toDF("src", "dst", "weight"), directed, Some(n))
    ForeignGraph(g, names.map(ns => ns.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")),
      weighted)
  }

  // ------------------------------------------------------------------ LGL

  /** LGL: `# vertex` header lines, each followed by its neighbors
    * (`name [weight]` lines). First-seen name order gives dense ids,
    * matching the reference's numbering (`graphobject.c:14964`).
    */
  def readLgl(spark: SparkSession, path: String, directed: Boolean = false): ForeignGraph = {
    val lines = wholeFile(spark, path).split("\n").map(_.trim).filter(_.nonEmpty)
    val idOf = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def id(name: String): Long = idOf.getOrElseUpdate(name, idOf.size.toLong)
    var cur: Option[Long] = None
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var weighted = false
    for (line <- lines) {
      if (line.startsWith("#")) cur = Some(id(line.drop(1).trim))
      else {
        require(cur.isDefined, s"not an LGL file: neighbor line before any '# vertex' header: $line")
        val f = line.split("\\s+")
        val w = if (f.length >= 2) { weighted = true; f(1).toDouble } else 1.0
        edges += ((cur.get, id(f(0)), w))
      }
    }
    toGraph(spark, idOf.size.toLong, edges.toSeq, directed, Some(idOf.keys.toSeq), weighted)
  }

  /** write_lgl: `# source` header + neighbor lines. */
  def writeLgl(g: LinkGraph, names: DataFrame, path: String, withWeights: Boolean = true): Unit = {
    val nameOf = names.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sb = new StringBuilder
    g.weighted.collect().groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach { case (src, rows) =>
      sb.append(s"# ${nameOf(src)}\n")
      rows.foreach { r =>
        sb.append(nameOf(r.getLong(1)))
        if (withWeights) sb.append(" " + r.getDouble(2))
        sb.append("\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  // -------------------------------------------------------------- GraphML

  /** GraphML via the JDK DOM parser: nodes in document order get dense ids
    * (like the reference); `name` vertex data and `weight` edge data are
    * honored; `edgedefault` sets directedness.
    */
  def readGraphml(spark: SparkSession, path: String): ForeignGraph = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(new java.io.File(path))
    def elems(parent: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
      val nl = parent.getElementsByTagName(tag)
      (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
    }
    val root = doc.getDocumentElement
    // key id -> attr.name
    val keyName = elems(root, "key").map(k => k.getAttribute("id") -> k.getAttribute("attr.name")).toMap
    val graphEl = elems(root, "graph").head
    val directed = graphEl.getAttribute("edgedefault") == "directed"
    def dataOf(e: org.w3c.dom.Element): Map[String, String] =
      elems(e, "data").map(d => keyName.getOrElse(d.getAttribute("key"), d.getAttribute("key"))
        -> d.getTextContent.trim).toMap
    val nodes = elems(graphEl, "node")
    val idOf = nodes.zipWithIndex.map { case (nd, i) => nd.getAttribute("id") -> i.toLong }.toMap
    val names = nodes.map(nd => dataOf(nd).getOrElse("name", nd.getAttribute("id")))
    var weighted = false
    val edges = elems(graphEl, "edge").map { ed =>
      val w = dataOf(ed).get("weight").map { s => weighted = true; s.toDouble }.getOrElse(1.0)
      (idOf(ed.getAttribute("source")), idOf(ed.getAttribute("target")), w)
    }
    toGraph(spark, nodes.size.toLong, edges, directed, Some(names), weighted)
  }

  /** write_graphml (igraph-style v_name/e_weight keys). */
  def writeGraphml(g: LinkGraph, names: DataFrame, path: String): Unit = {
    val nameOf = names.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">\n")
    sb.append("<key id=\"v_name\" for=\"node\" attr.name=\"name\" attr.type=\"string\"/>\n")
    sb.append("<key id=\"e_weight\" for=\"edge\" attr.name=\"weight\" attr.type=\"double\"/>\n")
    sb.append(s"""<graph id="G" edgedefault="${if (g.directed) "directed" else "undirected"}">\n""")
    nameOf.toSeq.sortBy(_._1).foreach { case (i, nm) =>
      sb.append(s"""<node id="n$i"><data key="v_name">${esc(nm)}</data></node>\n""")
    }
    g.weighted.collect().foreach { r =>
      sb.append(s"""<edge source="n${r.getLong(0)}" target="n${r.getLong(1)}">""")
      sb.append(s"""<data key="e_weight">${r.getDouble(2)}</data></edge>\n""")
    }
    sb.append("</graph>\n</graphml>\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** Read_GraphMLz (`__init__.py:2304-2317`): gunzip to a temp file, then
    * the plain GraphML reader.
    */
  def readGraphmlz(spark: SparkSession, path: String): ForeignGraph = {
    val tmp = java.nio.file.Files.createTempFile("graft-graphmlz", ".graphml")
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(path))
    try java.nio.file.Files.copy(in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    try readGraphml(spark, tmp.toString)
    finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** write_graphmlz: gzip-compressed [[writeGraphml]]. */
  def writeGraphmlz(g: LinkGraph, names: DataFrame, path: String): Unit = {
    val tmp = java.nio.file.Files.createTempFile("graft-graphmlz", ".graphml")
    try {
      writeGraphml(g, names, tmp.toString)
      val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(path))
      try java.nio.file.Files.copy(tmp, out)
      finally out.close()
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  // ------------------------------------------------------------------ GML

  /** Minimal GML: `graph [ directed 0|1  node [ id N label "x" ]
    * edge [ source A target B value W ] ]`.
    */
  def readGml(spark: SparkSession, path: String): ForeignGraph = {
    val text = wholeFile(spark, path)
    val tokens = "\"[^\"]*\"|\\[|\\]|[^\\s\\[\\]]+".r.findAllIn(text).toVector
    // recursive descent: a block is a flat list of (key, scalar-or-block)
    var pos = 0
    def parseBlock(): Seq[(String, Any)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Any)]
      while (pos < tokens.length && tokens(pos) != "]") {
        val key = tokens(pos); pos += 1
        if (pos < tokens.length && tokens(pos) == "[") { pos += 1; out += key -> parseBlock() }
        else { out += key -> tokens(pos); pos += 1 }
      }
      if (pos < tokens.length) pos += 1 // consume ']'
      out.toSeq
    }
    val top = parseBlock()
    val graph = top.collectFirst { case ("graph", b: Seq[_]) => b.asInstanceOf[Seq[(String, Any)]] }
      .getOrElse(throw new IllegalArgumentException("not a GML file: no graph block"))
    def scalar(b: Seq[(String, Any)], k: String): Option[String] =
      b.collectFirst { case (`k`, v: String) => v.stripPrefix("\"").stripSuffix("\"") }
    val directed = scalar(graph, "directed").contains("1")
    val nodes = graph.collect { case ("node", b: Seq[_]) => b.asInstanceOf[Seq[(String, Any)]] }
    val gmlIds = nodes.map(b => scalar(b, "id").get.toLong)
    val idOf = gmlIds.zipWithIndex.map { case (gid, i) => gid -> i.toLong }.toMap
    val names = nodes.zip(gmlIds).map { case (b, gid) => scalar(b, "label").getOrElse(gid.toString) }
    var weighted = false
    val edges = graph.collect { case ("edge", b: Seq[_]) => b.asInstanceOf[Seq[(String, Any)]] }.map { b =>
      val w = scalar(b, "value").orElse(scalar(b, "weight")).map { s => weighted = true; s.toDouble }.getOrElse(1.0)
      (idOf(scalar(b, "source").get.toLong), idOf(scalar(b, "target").get.toLong), w)
    }
    toGraph(spark, nodes.size.toLong, edges, directed, Some(names), weighted)
  }

  def writeGml(g: LinkGraph, names: Option[DataFrame], path: String): Unit = {
    val nameOf = names.map(_.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
      .getOrElse(Map.empty)
    val sb = new StringBuilder
    sb.append("graph [\n").append(s"  directed ${if (g.directed) 1 else 0}\n")
    val vs = g.vertices.collect().map(_.getLong(0)).sorted
    vs.foreach { i =>
      sb.append(s"  node [ id $i")
      nameOf.get(i).foreach(nm => sb.append(s""" label "$nm""""))
      sb.append(" ]\n")
    }
    g.weighted.collect().foreach { r =>
      sb.append(s"  edge [ source ${r.getLong(0)} target ${r.getLong(1)} value ${r.getDouble(2)} ]\n")
    }
    sb.append("]\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  // ---------------------------------------------------------------- Pajek

  /** Pajek .net: `*Vertices n` (+ optional `idx "label"` lines), then
    * `*Arcs` (directed) and/or `*Edges` (undirected, loaded symmetrically
    * when arcs exist) sections of 1-based `src dst [weight]` lines.
    */
  def readPajek(spark: SparkSession, path: String): ForeignGraph = {
    val lines = wholeFile(spark, path).split("\n").map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("%"))
    var n = 0L
    var section = ""
    val names = scala.collection.mutable.Map.empty[Long, String]
    val arcs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val undir = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var weighted = false
    for (line <- lines) {
      val low = line.toLowerCase
      if (low.startsWith("*vertices")) { section = "v"; n = line.split("\\s+")(1).toLong }
      else if (low.startsWith("*arcs")) section = "a"
      else if (low.startsWith("*edges")) section = "e"
      else if (low.startsWith("*")) section = "?"
      else section match {
        case "v" =>
          val m = "^(\\d+)\\s+\"([^\"]*)\"".r.findFirstMatchIn(line)
            .orElse("^(\\d+)\\s+(\\S+)".r.findFirstMatchIn(line))
          m.foreach(mm => names(mm.group(1).toLong - 1) = mm.group(2))
        case "a" | "e" =>
          val f = line.split("\\s+")
          val w = if (f.length >= 3) { weighted = true; f(2).toDouble } else 1.0
          val t = (f(0).toLong - 1, f(1).toLong - 1, w)
          if (section == "a") arcs += t else undir += t
        case _ =>
      }
    }
    val directed = arcs.nonEmpty
    // in a directed file, *Edges rows mean symmetric pairs
    val edges = if (directed) arcs.toSeq ++ undir.flatMap(t => Seq(t, (t._2, t._1, t._3)))
                else undir.toSeq
    val nameSeq = (0L until n).map(i => names.getOrElse(i, (i + 1).toString))
    toGraph(spark, n, edges, directed, Some(nameSeq), weighted)
  }

  def writePajek(g: LinkGraph, names: Option[DataFrame], path: String): Unit = {
    val nameOf = names.map(_.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
      .getOrElse(Map.empty)
    val n = g.vcount()
    val sb = new StringBuilder
    sb.append(s"*Vertices $n\n")
    (0L until n).foreach(i => sb.append(s"${i + 1} \"${nameOf.getOrElse(i, (i + 1).toString)}\"\n"))
    sb.append(if (g.directed) "*Arcs\n" else "*Edges\n")
    g.weighted.collect().foreach(r =>
      sb.append(s"${r.getLong(0) + 1} ${r.getLong(1) + 1} ${r.getDouble(2)}\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  // ------------------------------------------------------------- UCINET DL

  /** UCINET DL, the two fixture dialects: `format = fullmatrix` (labels
    * embedded or in a `labels:` block) and `format = edgelist1` (named
    * endpoints, optional weight). Case-insensitive label resolution.
    */
  def readDl(spark: SparkSession, path: String, directed: Boolean = true): ForeignGraph = {
    val lines = wholeFile(spark, path).split("\n").map(_.trim).filter(_.nonEmpty)
    val header = lines.head.toLowerCase
    require(header.startsWith("dl"), "not a DL file")
    val n = "n\\s*=\\s*(\\d+)".r.findFirstMatchIn(header).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException("DL: missing n="))
    var format = "fullmatrix"
    var labels = Vector.empty[String]
    var inLabels = false
    var dataAt = -1
    for ((line, i) <- lines.zipWithIndex.drop(1) if dataAt < 0) {
      val low = line.toLowerCase
      if (low.startsWith("format")) { format = low.split("=")(1).trim; inLabels = false }
      else if (low.startsWith("labels") && low.contains("embedded")) inLabels = false
      else if (low.startsWith("labels")) inLabels = true
      else if (low.startsWith("data")) dataAt = i + 1
      else if (inLabels) labels = labels ++ line.split("[,\\s]+").filter(_.nonEmpty)
    }
    val data = lines.drop(dataAt)
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var weighted = false
    if (format.startsWith("fullmatrix")) {
      var rows = data
      if (labels.isEmpty) { labels = rows.head.split("[,\\s]+").filter(_.nonEmpty).toVector; rows = rows.tail }
      require(labels.size == n, s"DL: ${labels.size} labels for n=$n")
      rows.take(n).zipWithIndex.foreach { case (row, i) =>
        var vals = row.split("\\s+").toSeq
        if (vals.length == n + 1) vals = vals.tail // embedded row label
        vals.take(n).zipWithIndex.foreach { case (v, j) =>
          if (v.toDouble != 0.0) edges += ((i.toLong, j.toLong, v.toDouble))
        }
      }
    } else { // edgelist1
      require(labels.size == n, s"DL: ${labels.size} labels for n=$n")
      val idOf = labels.map(_.toLowerCase).zipWithIndex.toMap
      data.foreach { line =>
        val f = line.split("\\s+")
        val w = if (f.length >= 3) { weighted = true; f(2).toDouble } else 1.0
        edges += ((idOf(f(0).toLowerCase).toLong, idOf(f(1).toLowerCase).toLong, w))
      }
    }
    toGraph(spark, n.toLong, edges.toSeq, directed, Some(labels), weighted)
  }

  // --------------------------------------------------------------- DIMACS

  final case class DimacsResult(graph: LinkGraph, source: Long, target: Long, capacities: DataFrame)

  /** DIMACS max-flow: `p max n m`, `n <id> s|t`, `a u v capacity`
    * (1-based). Capacity is carried as the edge weight too.
    */
  def readDimacs(spark: SparkSession, path: String, directed: Boolean = true): DimacsResult = {
    import spark.implicits._
    val lines = wholeFile(spark, path).split("\n").map(_.trim).filter(_.nonEmpty)
    var n = 0L
    var src = -1L
    var dst = -1L
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    lines.foreach { line =>
      val f = line.split("\\s+")
      f(0) match {
        case "p" => n = f(2).toLong
        case "n" => if (f(2) == "s") src = f(1).toLong - 1 else if (f(2) == "t") dst = f(1).toLong - 1
        case "a" => edges += ((f(1).toLong - 1, f(2).toLong - 1, f(3).toDouble))
        case _ => // comments
      }
    }
    val df = edges.toSeq.toDF("src", "dst", "weight")
    DimacsResult(LinkGraph(df, directed, Some(n)), src, dst,
      df.withColumnRenamed("weight", "capacity"))
  }

  def writeDimacs(r: DimacsResult, path: String): Unit = {
    val rows = r.capacities.collect()
    val sb = new StringBuilder
    sb.append(s"p max ${r.graph.vcount()} ${rows.length}\n")
    sb.append(s"n ${r.source + 1} s\n").append(s"n ${r.target + 1} t\n")
    rows.foreach(x => sb.append(s"a ${x.getLong(0) + 1} ${x.getLong(1) + 1} ${x.getDouble(2)}\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  // ------------------------------------------------------------ adjacency

  /** Read_Adjacency: dense numeric matrix (comment lines skipped). Without
    * `attribute`, a cell value k produces k parallel unweighted edges
    * (reference fixture: ecount 18); with one, a single weighted edge.
    */
  def readAdjacency(spark: SparkSession, path: String, attribute: Option[String] = None): ForeignGraph = {
    val rows = wholeFile(spark, path).split("\n").map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\\s+").map(_.toDouble))
    val n = rows.length.toLong
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for ((row, i) <- rows.zipWithIndex; (v, j) <- row.zipWithIndex if v != 0.0) {
      if (attribute.isDefined) edges += ((i.toLong, j.toLong, v))
      else (0 until v.toInt).foreach(_ => edges += ((i.toLong, j.toLong, 1.0)))
    }
    toGraph(spark, n, edges.toSeq, directed = true, None, weighted = attribute.isDefined)
  }

  def writeAdjacency(g: LinkGraph, path: String): Unit = {
    val n = g.vcount().toInt
    val m = Array.fill(n, n)(0.0)
    g.weighted.collect().foreach(r => m(r.getLong(0).toInt)(r.getLong(1).toInt) += r.getDouble(2))
    val sb = new StringBuilder
    m.foreach(row => sb.append(row.mkString(" ")).append("\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  // -------------------------------------------------------------- graphdb

  /** `Read_GraphDB` (`graphobject.c:14913`, reader doc at :8167): the VF2
    * graph-database binary format (MIVIA ARG benchmark suite) — all values
    * 16-bit little-endian words; first word = node count, then per node the
    * out-edge count followed by that many target ids. The reference has no
    * writer; [[writeGraphDb]] is this engine's round-trip extension.
    */
  def readGraphDb(spark: SparkSession, path: String, directed: Boolean = false): ForeignGraph = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    var p = 0
    def word(): Int = {
      require(p + 1 < bytes.length, s"truncated GraphDB file at byte $p")
      val w = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      p += 2
      w
    }
    val n = word()
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for (i <- 0 until n) {
      val k = word()
      for (_ <- 0 until k) {
        val j = word()
        require(j < n, s"GraphDB target $j out of range (n=$n)")
        edges += ((i.toLong, j.toLong, 1.0))
      }
    }
    toGraph(spark, n.toLong, edges.toSeq, directed, None, weighted = false)
  }

  def writeGraphDb(g: LinkGraph, path: String): Unit = {
    val n = g.vcount().toInt
    require(n < 65536, s"GraphDB words are 16-bit; graph has $n vertices")
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    g.weighted.select("src", "dst").collect()
      .foreach(r => adj(r.getLong(0).toInt) += r.getLong(1).toInt)
    val out = new java.io.ByteArrayOutputStream()
    def word(w: Int): Unit = { out.write(w & 0xff); out.write((w >> 8) & 0xff) }
    word(n)
    adj.foreach { ts => word(ts.size); ts.sorted.foreach(word) }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }

  // ------------------------------------------------------------------ DOT

  /** `write_dot` (`graphobject.c:15006`; dispatch `__init__.py:4246-4247`):
    * GraphViz output — a `digraph`/`graph` block, one line per vertex (with
    * a quoted `name` attribute when names are given), one line per edge
    * (`->`/`--`) carrying the weight attribute when requested. DOT is
    * write-only in the reference too (format table maps the reader to None);
    * the golden asserts the emitted text parses back to the same edges.
    */
  def writeDot(g: LinkGraph, names: Option[DataFrame], path: String,
               withWeights: Boolean = false): Unit = {
    val nameOf = names.map(_.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    def q(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val (kw, arrow) = if (g.directed) ("digraph", "->") else ("graph", "--")
    // non-dense vertex ids are remapped to 0..n-1 positions (identity on
    // dense graphs) so emitted node ids always cover exactly the vertex
    // lines — raw ids would write edges whose endpoints were never declared
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val pos = ids.zipWithIndex.toMap
    val sb = new StringBuilder
    sb.append(s"$kw {\n")
    ids.foreach { v =>
      nameOf.flatMap(_.get(v)) match {
        case Some(nm) => sb.append(s"  ${pos(v)} [name=${q(nm)}];\n")
        case None     => sb.append(s"  ${pos(v)};\n")
      }
    }
    g.weighted.collect().sortBy(r => (r.getLong(0), r.getLong(1))).foreach { r =>
      sb.append(s"  ${pos(r.getLong(0))} $arrow ${pos(r.getLong(1))}")
      if (withWeights) sb.append(s" [weight=${r.getDouble(2)}]")
      sb.append(";\n")
    }
    sb.append("}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  // ----------------------------------------------------------------- LEDA

  /** `write_leda(names, weights)` (`graphobject.c:15081`; extensions
    * gw/leda/lgr, `__init__.py:4259-4261`): the LEDA.GRAPH native format —
    * `LEDA.GRAPH` header, vertex/edge attribute type lines (`void` when no
    * attribute is stored), `-1` directed / `-2` undirected, the vertex
    * count + one `|{attr}|` line per vertex, the edge count + one
    * `src dst 0 |{attr}|` line per edge with 1-based endpoints (the third
    * field is LEDA's reversal-edge slot, 0 = none). LEDA stores at most one
    * attribute per vertex/edge, mirrored here.
    */
  def writeLeda(g: LinkGraph, names: Option[DataFrame], path: String,
                withWeights: Boolean = true): Unit = {
    val nameOf = names.map(_.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    val sb = new StringBuilder
    sb.append("LEDA.GRAPH\n")
    sb.append(if (nameOf.isDefined) "string\n" else "void\n")
    sb.append(if (withWeights) "double\n" else "void\n")
    sb.append(if (g.directed) "-1\n" else "-2\n")
    // LEDA endpoints are 1-based positions into the vertex lines — remap
    // (identity + 1 on dense ids) so non-dense graphs stay within [1, n]
    // and round-trip through readLeda instead of corrupting the file
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val pos = ids.zipWithIndex.toMap
    sb.append(s"${ids.length}\n")
    ids.foreach(v => sb.append(s"|{${nameOf.flatMap(_.get(v)).getOrElse("")}}|\n"))
    val rows = g.weighted.collect().sortBy(r => (r.getLong(0), r.getLong(1)))
    sb.append(s"${rows.length}\n")
    rows.foreach { r =>
      val a = if (withWeights) r.getDouble(2).toString else ""
      sb.append(s"${pos(r.getLong(0)) + 1} ${pos(r.getLong(1)) + 1} 0 |{$a}|\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** LEDA reader — the reference has no Read_Leda (dispatch maps it to
    * None); this is this engine's round-trip extension, like
    * [[writeGraphDb]]. Parses exactly what [[writeLeda]] emits plus the
    * published LEDA.GRAPH grammar (comment `#` lines skipped).
    */
  def readLeda(spark: SparkSession, path: String): ForeignGraph = {
    val lines = wholeFile(spark, path).split("\n").map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    require(lines.headOption.exists(_.startsWith("LEDA.GRAPH")), "not a LEDA.GRAPH file")
    val vType = lines(1); val eType = lines(2)
    val directed = lines(3).toInt == -1
    var p = 4
    val n = lines(p).toInt; p += 1
    def attr(line: String): String = {
      val i = line.indexOf("|{"); val j = line.lastIndexOf("}|")
      require(i >= 0 && j > i, s"bad LEDA attribute line: $line")
      line.substring(i + 2, j)
    }
    val names = (0 until n).map(i => attr(lines(p + i)))
    p += n
    val m = lines(p).toInt; p += 1
    val weighted = eType == "double" || eType == "long" || eType == "int"
    val edges = (0 until m).map { i =>
      val line = lines(p + i)
      val f = line.split("\\s+")
      val w = if (weighted) { val a = attr(line); if (a.isEmpty) 1.0 else a.toDouble } else 1.0
      (f(0).toLong - 1, f(1).toLong - 1, w)
    }
    toGraph(spark, n.toLong, edges, directed,
      if (vType == "string") Some(names) else None, weighted)
  }

  // ------------------------------------------------------------- dispatch

  /** `Graph.Read(path)` extension dispatch (`__init__.py:2895-2930`). */
  def read(spark: SparkSession, path: String, format: Option[String] = None): ForeignGraph = {
    val fmt = format.getOrElse(path.toLowerCase.split("\\.").last)
    fmt match {
      case "ncol" =>
        val r = Foreign.readNcol(spark, path)
        ForeignGraph(r.graph, Some(r.vertices), r.weighted)
      case "lgl"               => readLgl(spark, path)
      case "graphml" | "xml"   => readGraphml(spark, path)
      case "graphmlz"          => readGraphmlz(spark, path)
      case "gz" if path.toLowerCase.endsWith(".graphml.gz") => readGraphmlz(spark, path)
      case "gml"               => readGml(spark, path)
      case "net" | "pajek"     => readPajek(spark, path)
      case "dl"                => readDl(spark, path)
      case "dimacs" | "max"    => val r = readDimacs(spark, path); ForeignGraph(r.graph, None, weighted = true)
      case "adj" | "adjacency" => readAdjacency(spark, path)
      case "graphdb"           => readGraphDb(spark, path)
      case "gw" | "leda" | "lgr" => readLeda(spark, path)
      case "edges" | "edgelist" | "txt" =>
        ForeignGraph(Foreign.readEdgelist(spark, path), None, weighted = false)
      case other => throw new IllegalArgumentException(s"unknown graph format: $other")
    }
  }
}
