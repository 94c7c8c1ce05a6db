package graft.ops

import graft.core.{GraphOps, LinkGraph, Mode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's vertex/edge query DSL re-expressed as lazy DataFrame
  * filters.
  *
  * `vs.select(**kwds)` (`__init__.py:4426-4559`) supports keyword filters
  * `attr_op=value` with ops {eq ne lt gt le ge in notin}
  * (`__init__.py:4531-4540`) plus computed `_method_op` pseudo-columns
  * (`__init__.py:4551-4553`); `es.select` adds structural selectors
  * `_source/_target/_within/_between/_incident` (`__init__.py:4674-4988`).
  *
  * Here every op is a native `Column` predicate, so Catalyst pushes the
  * whole chain into the scan — the fast paths the reference hand-codes
  * (`__init__.py:4869-4891`) fall out for free (SURVEY §3 trace 2).
  */
object Select {

  /** Column predicate for one (op, value) pair — the reference's op table. */
  private def opPredicate(c: Column, op: String, value: Any): Column = op match {
    case "eq"    => c === lit(value)
    case "ne"    => c =!= lit(value)
    case "lt"    => c < lit(value)
    case "gt"    => c > lit(value)
    case "le"    => c <= lit(value)
    case "ge"    => c >= lit(value)
    case "in"    => c.isin(value.asInstanceOf[Seq[Any]]: _*)
    case "notin" => !c.isin(value.asInstanceOf[Seq[Any]]: _*)
    case other   => throw new IllegalArgumentException(s"unknown op: $other")
  }

  /** Lazy vertex selection over a vertex-attribute frame (id + attr cols). */
  final case class Vs(g: LinkGraph, attrs: DataFrame) {

    /** `vs.select(attr_op = value)`. */
    def attr(name: String, op: String, value: Any): Vs =
      copy(attrs = attrs.where(opPredicate(col(name), op, value)))

    /** `vs.select(_degree_gt = k)` — computed-metric filter: join the degree
      * aggregate, filter, project back (`__init__.py:4551-4553`).
      */
    def degree(op: String, value: Any, mode: Mode = Mode.All): Vs = {
      val d = GraphOps.degrees(g, mode)
      val kept = attrs.join(d, Seq("id")).where(opPredicate(col("degree"), op, value))
      copy(attrs = kept.drop("degree"))
    }

    /** Arbitrary computed metric (id, <metricCol>) filter. */
    def metric(metricDf: DataFrame, metricCol: String, op: String, value: Any): Vs = {
      val kept = attrs.join(metricDf, Seq("id"))
        .where(opPredicate(col(metricCol), op, value))
      copy(attrs = kept.drop(metricCol))
    }

    def result: DataFrame = attrs
    def ids: DataFrame = attrs.select("id")

    /** `vs.find(...)`: first match in id order, or None
      * (`__init__.py:4375-4424`). The name-indexed fast path of the
      * reference is [[findByName]] — a pushed-down point filter on the
      * dictionary instead of a hash lookup.
      */
    def find(): Option[org.apache.spark.sql.Row] =
      attrs.orderBy("id").limit(1).collect().headOption

    /** `vs.find(name=...)` against a (id, name) dictionary frame. */
    def findByName(names: DataFrame, name: String): Option[Long] =
      attrs.join(names.where(col("name") === name), Seq("id"))
        .select("id").limit(1).collect().headOption.map(_.getLong(0))

    /** `g.vs.select(...).subgraph()` — induced subgraph of the selection. */
    def subgraph(): LinkGraph = GraphOps.inducedSubgraph(g, ids)
  }

  /** Lazy edge selection over the edge frame (src, dst + attr cols). */
  final case class Es(g: LinkGraph, edges: DataFrame) {

    def attr(name: String, op: String, value: Any): Es =
      copy(edges = edges.where(opPredicate(col(name), op, value)))

    /** `_source` / `_from`: edges whose source is in the set (directed);
      * undirected degrades to incident, as the reference documents
      * (`__init__.py:4856-4867`).
      */
    def source(s: Seq[Long]): Es =
      if (g.directed) copy(edges = edges.where(col("src").isin(s: _*)))
      else incident(s)

    /** `_target` / `_to`. */
    def target(s: Seq[Long]): Es =
      if (g.directed) copy(edges = edges.where(col("dst").isin(s: _*)))
      else incident(s)

    /** `_incident`: either endpoint in the set. */
    def incident(s: Seq[Long]): Es =
      copy(edges = edges.where(col("src").isin(s: _*) || col("dst").isin(s: _*)))

    /** `_within = S`: both endpoints in S (`__init__.py:4912-4938`). For
      * large S pass a DataFrame via [[withinDf]] (semi-joins instead of
      * an IN literal list).
      */
    def within(s: Seq[Long]): Es =
      copy(edges = edges.where(col("src").isin(s: _*) && col("dst").isin(s: _*)))

    def withinDf(s: DataFrame): Es = {
      val ids = s.select(col(s.columns.head).as("id"))
      copy(edges = edges
        .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi"))
    }

    /** `_between = (S1, S2)`: one endpoint in each (symmetric). */
    def between(s1: Seq[Long], s2: Seq[Long]): Es =
      copy(edges = edges.where(
        (col("src").isin(s1: _*) && col("dst").isin(s2: _*)) ||
          (col("src").isin(s2: _*) && col("dst").isin(s1: _*))))

    /** Computed edge-metric filter — `es.select(_edge_betweenness_ge=2)`
      * style pseudo-columns (`__init__.py:4551-4553`), mirroring
      * [[Vs.metric]]: join a metric frame keyed by (src, dst), filter,
      * project back. Undirected metric frames (e.g. [[
      * graft.algos.Betweenness.edgeBetweenness]]) are canonical src < dst,
      * so the join key canonicalizes when the graph is undirected.
      */
    def metric(metricDf: DataFrame, metricCol: String, op: String, value: Any): Es = {
      val keyed =
        if (g.directed) edges
        else edges.withColumn("__s", least(col("src"), col("dst")))
          .withColumn("__d", greatest(col("src"), col("dst")))
      val m =
        if (g.directed) metricDf
        else metricDf.select(col("src").as("__s"), col("dst").as("__d"), col(metricCol))
      val joinKeys = if (g.directed) Seq("src", "dst") else Seq("__s", "__d")
      val kept = keyed.join(m, joinKeys)
        .where(opPredicate(col(metricCol), op, value))
        .drop(metricCol).drop("__s").drop("__d")
      copy(edges = kept)
    }

    def result: DataFrame = edges

    /** `es.find(...)`: first match in (src, dst) order (`__init__.py:4647`). */
    def find(): Option[org.apache.spark.sql.Row] =
      edges.orderBy("src", "dst").limit(1).collect().headOption

    /** `subgraph_edges(...)` analog (`graphobject.c:14018`). */
    def subgraph(): LinkGraph = LinkGraph(edges, g.directed, g.numVertices)
  }

  def vs(g: LinkGraph, attrs: Option[DataFrame] = None): Vs =
    Vs(g, attrs.getOrElse(g.vertices))

  def es(g: LinkGraph): Es = Es(g, g.weighted)
}
