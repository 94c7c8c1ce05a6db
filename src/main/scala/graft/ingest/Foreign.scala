package graft.ingest

import graft.core.{Ids, LinkGraph}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Foreign graph formats: NCOL named edge lists and numeric edge lists.
  *
  * Reference: `Read_Ncol(names=True, weights="if_present")`
  * (`graphobject.c:14939-14962`; weight-presence inference fixture
  * `tests/test_foreign.py:180-203`), `Read_Edgelist` (`14903-14912`),
  * `write_ncol`/`write_edgelist` (`14995-15101`).
  */
object Foreign {

  final case class NcolResult(vertices: DataFrame, graph: LinkGraph, weighted: Boolean)

  /** Whitespace-separated `src dst [weight]` named edge list.
    * Weight column is present iff ANY row carries a third field
    * (`weights="if_present"`); names get dense ids via the distributed
    * dictionary (deterministic sort order — documented difference from the
    * reference's first-seen order, SURVEY §3 trace 3).
    */
  def readNcol(spark: SparkSession, path: String, directed: Boolean = false): NcolResult = {
    val raw = spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .where(size(col("f")) >= 2)
      .select(col("f").getItem(0).as("src_name"), col("f").getItem(1).as("dst_name"),
        when(size(col("f")) >= 3, col("f").getItem(2).cast("double")).as("w"))
    val weighted = !raw.where(col("w").isNotNull).isEmpty
    val names = raw.select(col("src_name").as("name"))
      .union(raw.select(col("dst_name").as("name")))
    val dict = Ids.assignDense(names, "name").localCheckpoint(true)
    val edges = raw
      .join(dict.select(col("name").as("src_name"), col("id").as("src")), Seq("src_name"))
      .join(dict.select(col("name").as("dst_name"), col("id").as("dst")), Seq("dst_name"))
      .select(col("src"), col("dst"), coalesce(col("w"), lit(1.0)).as("weight"))
    NcolResult(dict.select(col("id"), col("name")), LinkGraph(edges, directed, Some(dict.count())), weighted)
  }

  /** Numeric `src dst` edge list (`Read_Edgelist`). */
  def readEdgelist(spark: SparkSession, path: String, directed: Boolean = true): LinkGraph = {
    val e = spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .where(size(col("f")) >= 2)
      .select(col("f").getItem(0).cast("long").as("src"), col("f").getItem(1).cast("long").as("dst"))
    LinkGraph(e, directed, None)
  }

  /** write_ncol: `name1 name2 [weight]` text lines. */
  def writeNcol(g: LinkGraph, names: DataFrame, path: String, withWeights: Boolean = true): Unit = {
    val e = g.weighted
      .join(names.select(col("id").as("src"), col("name").as("sn")), Seq("src"))
      .join(names.select(col("id").as("dst"), col("name").as("dn")), Seq("dst"))
    val lines =
      if (withWeights) e.select(concat_ws(" ", col("sn"), col("dn"), col("weight").cast("string")).as("value"))
      else e.select(concat_ws(" ", col("sn"), col("dn")).as("value"))
    lines.write.mode(SaveMode.Overwrite).text(path)
  }

  /** write_edgelist: numeric `src dst` lines. */
  def writeEdgelist(g: LinkGraph, path: String): Unit =
    g.edges.select(concat_ws(" ", col("src"), col("dst")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  final case class DictListResult(vertices: DataFrame, edges: DataFrame, graph: LinkGraph)

  /** `Graph.DictList(vertices, edges)` (`__init__.py:2992-3115`): vertex
    * rows carry a `name` column plus arbitrary attribute columns; edge rows
    * carry `source`/`target` name columns plus attributes. Names resolve
    * through the distributed dictionary; `useVids=false` semantics (name
    * lookup), vertices mentioned only by edges are auto-created like the
    * reference's `Graph.TupleList`. Returns the attribute tables re-keyed
    * by dense id alongside the graph.
    */
  def dictList(vertices: Option[DataFrame], edges: DataFrame,
               directed: Boolean = false): DictListResult = {
    val edgeNames = edges.select(col("source").as("name"))
      .union(edges.select(col("target").as("name")))
    val names = vertices.map(v => edgeNames.union(v.select(col("name")))).getOrElse(edgeNames)
    val dict = Ids.assignDense(names, "name").localCheckpoint(true)
    val e = edges
      .join(dict.select(col("name").as("source"), col("id").as("src")), Seq("source"))
      .join(dict.select(col("name").as("target"), col("id").as("dst")), Seq("target"))
      .drop("source", "target")
    val vAttrs = vertices match {
      case Some(v) => dict.join(v, Seq("name"), "left")
      case None    => dict
    }
    val weightCol = if (e.columns.contains("weight")) col("weight").cast("double") else lit(1.0)
    val g = LinkGraph(e.select(col("src"), col("dst"), weightCol.as("weight")),
      directed, Some(dict.count()))
    DictListResult(vAttrs.select((col("id") +: vAttrs.columns.filter(_ != "id").map(col)): _*), e, g)
  }
}
