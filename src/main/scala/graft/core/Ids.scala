package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dense-id dictionary assignment — the engine's replacement for the
  * reference's name -> id hash index (`attributes.h:39,83-85`) and
  * `UniqueIdGenerator` first-seen numbering (`datatypes.py:656-733`).
  *
  * Ids are assigned 0..n-1 in the deterministic sort order of the key
  * (documented semantic difference from first-seen order; golden tests that
  * depend on ordering pin their fixtures explicitly).
  *
  * Scale: a naive `row_number() over (order by key)` collapses to a single
  * partition. Instead: range-repartition by key, sort within partitions,
  * then add per-partition offsets computed from a collected (tiny) partition
  * histogram — the standard distributed dense-ranking pattern; every stage
  * is O(n/p) per task.
  */
object Ids {

  /** @param df any DataFrame containing `keyCol` (distinct not required)
    * @return (id: Long, keyCol) with dense ids 0..n-1 by key order
    */
  def assignDense(df: DataFrame, keyCol: String, partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    // persist the distinct+range-partition+sort result: the counts pass and
    // the row-emit pass below would otherwise each recompute it (2x the
    // dictionary-build cost on the ingest critical path)
    val keys = df.select(col(keyCol)).distinct()
      .repartitionByRange(partitions, col(keyCol))
      .sortWithinPartitions(keyCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = keys.schema
    // per-partition counts -> cumulative offsets (tiny, driver-side)
    val counts = keys.rdd.mapPartitionsWithIndex { (pi, it) =>
      Iterator((pi, it.size.toLong))
    }.collect().sortBy(_._1)
    val offsetByPart: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pi, c) => val o = (pi, acc); acc += c; o }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsetByPart)
    val rows = keys.rdd.mapPartitionsWithIndex { (pi, it) =>
      var i = bc.value.getOrElse(pi, 0L)
      it.map { r => val out = org.apache.spark.sql.Row.fromSeq(i +: r.toSeq); i += 1; out }
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id", LongType, nullable = false) +: schema.fields)
    // materialize off the cache before unpersisting (the emit pass reads the
    // cached sorted partitions exactly once; the result is then independent)
    val out = Lineage.cut(spark.createDataFrame(rows, outSchema))
    keys.unpersist()
    out
  }

  /** Relabel a graph's vertex ids to dense 0..n-1 (used after subgraphing;
    * the reference renumbers on delete, `__init__.py:3841-3849`).
    * @return (mapping(old_id, id), relabeled graph)
    */
  def relabel(g: LinkGraph): (DataFrame, LinkGraph) = {
    val mapping = assignDense(g.vertices.withColumnRenamed("id", "old_id"), "old_id")
      .select(col("old_id"), col("id"))
    val e = g.weighted
      .join(mapping.select(col("old_id").as("src"), col("id").as("nsrc")), Seq("src"))
      .join(mapping.select(col("old_id").as("dst"), col("id").as("ndst")), Seq("dst"))
      .select(col("nsrc").as("src"), col("ndst").as("dst"), col("weight"))
    (mapping, LinkGraph(e, g.directed, Some(mapping.count())))
  }
}
