package graft.data

import graft.core.LinkGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md) and the two
  * derived edge tables every verification query runs on. The same
  * derivations are written as SQL CTEs in [[graft.SparkEntry.oracleSql]] so
  * DuckDB reproduces them bit-for-bit.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Directed multigraph from `events`: src = user_id,
    * dst = floor(value) % 97 — deterministic, cyclic, hub-skewed (value is
    * non-negative), identical in Spark and DuckDB SQL.
    */
  def eventsGraph(spark: SparkSession, dir: String): LinkGraph = {
    val e = read(spark, dir, "events").select(
      col("user_id").as("src"),
      (floor(col("value")).cast("long") % 97).as("dst"),
      lit(1.0).as("weight"))
    LinkGraph(e, directed = true, None)
  }

  /** SQL CTE mirroring [[eventsGraph]] (+ its vertex set). */
  val eventsGraphSql: String =
    """e AS MATERIALIZED (SELECT user_id AS src, CAST(FLOOR(value) AS BIGINT) % 97 AS dst, CAST(1.0 AS DOUBLE) AS weight FROM events),
      |v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))""".stripMargin

  /** Undirected simple "co-part" graph from `lineitem`: an edge between two
    * parts iff they appear in the same order; canonical src < dst.
    */
  def copartGraph(spark: SparkSession, dir: String): LinkGraph = {
    // fixed-width repartition BEFORE the expanding self-join: AQE coalesces
    // the exchange on PRE-join bytes (600k rows -> 3 partitions at sf0.1)
    // and serializes the O(items-per-order²) pair expansion onto those few
    // tasks; an explicit numPartitions repartition is exempt from AQE
    // coalescing, and the aliased join reuses the single exchange
    // (same pathology and fix as the r5 wedge/shingle expansion joins)
    val li = read(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(spark.sparkContext.defaultParallelism, col("ok"))
    val e = li.alias("a").join(li.alias("b"), Seq("ok"))
      .where(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
      // materialize the self-join ONCE: LinkGraph derives vertices /
      // weighted / bidirected views lazily, so without this every
      // downstream action re-runs the O(|lineitem| per order²) pair build
      .transform(graft.core.Lineage.cut)
    // src < dst distinct by construction -> consumers skip re-canonicalizing
    LinkGraph(e, directed = false, None, canonicalSimple = true)
  }

  /** Sparse tree-plus-chords graph over `events` user ids: binary-tree
    * edges u -> u/2 (u > 0) plus chords (u-1, u) when u % 7 == 0 —
    * guaranteed to contain bridges (uncovered tree edges) and reproducible
    * in SQL; the q_bridges verification graph.
    */
  def bridgeGraph(spark: SparkSession, dir: String): LinkGraph = {
    val users = read(spark, dir, "events").select(col("user_id").as("u")).distinct()
    val tree = users.where(col("u") > 0)
      .select((col("u") / 2).cast("long").as("src"), col("u").as("dst"))
    val chords = users.where(col("u") > 0 && col("u") % 7 === 0)
      .select((col("u") - 1).as("src"), col("u").as("dst"))
    LinkGraph(tree.union(chords).distinct(), directed = false, None)
  }

  /** Tiny weighted undirected flow fixture (13 vertices): a ring 0-1-…-12-0
    * (weight 1) guaranteeing connectivity, plus every events-graph edge with
    * both endpoints < 13, canonicalized src < dst with multiplicity as
    * capacity. Small by construction so DuckDB can brute-force min s-t cuts
    * by subset enumeration (2^11 subsets per pair) — the value oracle for
    * the flow family, which at scale only gets rows-only checks.
    */
  def flowGraph(spark: SparkSession, dir: String): LinkGraph = {
    val data = read(spark, dir, "events").select(
        col("user_id").as("a"),
        (floor(col("value")).cast("long") % 97).as("b"))
      .where(col("a") < 13 && col("b") < 13 && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"), greatest(col("a"), col("b")).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("weight"))
    val ring = spark.range(13).select(
        least(col("id"), (col("id") + 1) % 13).as("src"),
        greatest(col("id"), (col("id") + 1) % 13).as("dst"),
        lit(1.0).as("weight"))
    val e = data.unionByName(ring)
      .groupBy("src", "dst").agg(sum("weight").as("weight"))
    LinkGraph(e, directed = false, None)
  }

  /** SQL CTE mirroring [[flowGraph]]. */
  val flowGraphSql: String =
    """fg AS MATERIALIZED (
      |  SELECT src, dst, SUM(w) AS w FROM (
      |    SELECT LEAST(a, b) AS src, GREATEST(a, b) AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      |    FROM (SELECT user_id AS a, CAST(FLOOR(value) AS BIGINT) % 97 AS b FROM events)
      |    WHERE a < 13 AND b < 13 AND a <> b GROUP BY 1, 2
      |    UNION ALL
      |    SELECT LEAST(i, (i + 1) % 13), GREATEST(i, (i + 1) % 13), CAST(1.0 AS DOUBLE)
      |    FROM range(13) t(i)
      |  ) GROUP BY 1, 2)""".stripMargin

  /** Small DIRECTED dominator fixture (13 vertices): the directed ring
    * 0->1->...->12->0 guarantees every vertex is reachable from root 0, and
    * every events-derived arc with both endpoints < 13 adds shortcuts that
    * make the dominator tree non-trivial. Small by construction so DuckDB
    * can verify immediate dominators straight from the definition (u
    * dominates v iff v is unreachable from the root once u is removed).
    */
  def domGraph(spark: SparkSession, dir: String): LinkGraph = {
    val data = read(spark, dir, "events").select(
        col("user_id").as("src"),
        (floor(col("value")).cast("long") % 97).as("dst"))
      .where(col("src") < 13 && col("dst") < 13 && col("src") =!= col("dst"))
    val ring = spark.range(13).select(col("id").as("src"), ((col("id") + 1) % 13).as("dst"))
    LinkGraph(data.unionByName(ring).distinct(), directed = true, Some(13L))
  }

  /** SQL CTE mirroring [[domGraph]]. */
  val domGraphSql: String =
    """dg AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
      |  SELECT user_id AS src, CAST(FLOOR(value) AS BIGINT) % 97 AS dst FROM events
      |    WHERE user_id < 13 AND CAST(FLOOR(value) AS BIGINT) % 97 < 13
      |      AND user_id <> CAST(FLOOR(value) AS BIGINT) % 97
      |  UNION ALL
      |  SELECT i, (i + 1) % 13 FROM range(13) t(i)))""".stripMargin

  /** SQL CTE mirroring [[copartGraph]]. */
  val copartGraphSql: String =
    """pe AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |        FROM lineitem a JOIN lineitem b
      |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |pv AS (SELECT DISTINCT id FROM (SELECT src AS id FROM pe UNION ALL SELECT dst FROM pe))""".stripMargin
}
