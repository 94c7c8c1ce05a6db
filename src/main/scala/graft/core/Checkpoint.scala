package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._

/** Versioned vertex-state checkpoint store for iterative algorithms.
  *
  * Every iteration of PageRank/WCC/LPA writes its vertex state plus
  * per-partition lineage/metrics rows to a snapshot directory, so a run can
  * resume mid-computation (BASELINE.json north_rule: "resumable from
  * checkpoint with per-partition lineage + metrics"). The layout is an
  * Iceberg-style snapshot log realized on plain parquet because the sandbox
  * ships no Iceberg runtime; on a real cluster the same writes target
  * `writeTo(table).overwritePartitions()` with `iter` as partition column.
  *
  * Layout:
  *   root/state/iter=K/        vertex state parquet for iteration K
  *   root/metrics/             append-only (run_id, iter, partition, rows, ms)
  */
final class CheckpointStore(val root: String, val runId: String) {

  private def stateDir(iter: Int) = s"$root/state/iter=$iter"
  private def metricsDir = s"$root/metrics"

  /** Write state for iteration `iter`; returns the re-read DataFrame, which
    * also truncates plan lineage (the driver-loop analog of Pregel
    * superstep barriers).
    */
  def save(spark: SparkSession, iter: Int, state: DataFrame, startedAtMs: Long): DataFrame = {
    state.write.mode(SaveMode.Overwrite).parquet(stateDir(iter))
    val reread = spark.read.parquet(stateDir(iter))
    // per-partition lineage/metrics: rows per parquet file partition
    val m = reread
      .withColumn("partition", spark_partition_id())
      .groupBy("partition").agg(count(lit(1)).as("rows"))
      .withColumn("run_id", lit(runId))
      .withColumn("iter", lit(iter))
      .withColumn("ms", lit(System.currentTimeMillis() - startedAtMs))
    m.write.mode(SaveMode.Append).parquet(metricsDir)
    reread
  }

  /** Latest checkpointed iteration, if any — the resume point. */
  def latestIter(spark: SparkSession): Option[Int] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$root/state")
    if (!fs.exists(p)) None
    else {
      // only fully committed snapshots are resume candidates: a crash during
      // a state write leaves a partial iter=K dir with no _SUCCESS marker;
      // resuming from it would silently misattribute missing vertices' mass
      val iters = fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("iter="))
        .filter(name => fs.exists(new org.apache.hadoop.fs.Path(s"$root/state/$name/_SUCCESS")))
        .map(_.stripPrefix("iter=").toInt)
      if (iters.isEmpty) None else Some(iters.max)
    }
  }

  def load(spark: SparkSession, iter: Int): DataFrame =
    spark.read.parquet(stateDir(iter))

  def metrics(spark: SparkSession): DataFrame = spark.read.parquet(metricsDir)
}

/** In-memory lineage truncation for iterative loops.
  *
  * NOT `localCheckpoint`: that rewrites the new LogicalRDD's statistics from
  * the origin plan, and join-size estimates are *products* of child
  * `sizeInBytes` — chained across supersteps the estimate's digit count
  * doubles every iteration, and by iteration ~20 Catalyst burns CPU
  * multiplying million-digit BigInts (observed: Toom-Cook multiplication
  * dominating an LPA run on a 10-vertex graph). Persisting the RDD and
  * wrapping it in a fresh `createDataFrame` resets stats to the default
  * leaf estimate each superstep, keeping planning O(1) per iteration.
  */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    // Dataset.localCheckpoint(eager=true) truncates BOTH the logical plan
    // (flat LogicalRDD — constant plan depth per superstep) and the RDD
    // lineage, exactly like the previous `df.rdd` + `createDataFrame` pair,
    // but with two structural advantages (guide §1.4/§2.4):
    //  - it checkpoints the INTERNAL UnsafeRow RDD, so no per-superstep
    //    InternalRow -> external Row -> InternalRow codec round-trip
    //    (DeserializeToObject/SerializeFromObject pairs disappear from every
    //    iterative plan);
    //  - the LogicalRDD keeps the physical plan's output partitioning and
    //    ordering, so a loop whose state is already hash-partitioned on the
    //    next join key (ranks on id, membership on nbr, frontier on src)
    //    re-enters the superstep join with NO new Exchange.
    // The raw checkpoint must NOT be returned as-is: since SPARK-39748 its
    // LogicalRDD carries the origin plan's statistics, and chained across
    // supersteps those estimates compound multiplicatively until Catalyst
    // spends minutes on million-digit BigInt products (the failure mode
    // this object's docstring documents — it bit again the first time cut
    // used localCheckpoint directly). dropOriginStats rebuilds the
    // LogicalRDD with fresh leaf stats, keeping the rows + partitioning.
    org.apache.spark.sql.execution.GraftLogicalRdd.dropOriginStats(
      df.localCheckpoint(true))

  /** Cheap materialization without plan truncation: persist + count. The
    * cached InMemoryRelation carries REAL size stats (no estimate
    * compounding), so joins against it broadcast when it is genuinely
    * small. ONLY for state computed once and reused (a loop that soft-cuts
    * its per-iteration state keeps full lineage: a state referenced twice
    * per step doubles the logical plan every iteration, and analysis /
    * cache-canonicalization cost grows exponentially — observed as an
    * effective hang by sweep ~12).
    */
  def soft(df: DataFrame): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  /** Hard [[cut]] that collapses provably tiny state to a driver-local
    * relation. The superstep state is materialized exactly as in [[cut]];
    * if its schema-estimated size is at most `maxLocalBytes` (default 4 MB,
    * under the 10 MB autoBroadcastJoinThreshold) the rows are pulled to the
    * driver and re-emitted as a LocalRelation, whose REAL tiny stats make
    * every downstream join a static broadcast-hash-join — no exchange on
    * either side when the other side is cached. Otherwise this IS [[cut]].
    *
    * Use ONLY for state that is tiny BY CONSTRUCTION (k-means centroids:
    * k·d rows regardless of corpus size — [[graft.sim.KMeans]]). Do NOT
    * use it for corpus-sized loop state that merely happens to be small at
    * the test scale: an A/B at sf0.1 showed Louvain's per-sweep membership
    * through this path regressing 21.9 s -> 38.1 s (the per-sweep
    * collect + single-slice LocalRelation costs more than the distributed
    * cut it replaced), so Louvain/Leiden stay on [[cut]].
    */
  def cutAdaptive(df: DataFrame, maxLocalBytes: Long = 4L << 20): DataFrame = {
    val spark = df.sparkSession
    val rowBytes = df.schema.map(_.dataType.defaultSize).sum.max(1)
    val maxRows = maxLocalBytes / rowBytes
    // checkpoint once (one full execution); the count and the tiny-case
    // collect both read the checkpointed UnsafeRows, so they are cheap
    // cache-scan jobs, not re-executions of the plan
    val cp = org.apache.spark.sql.execution.GraftLogicalRdd.dropOriginStats(
      df.localCheckpoint(true))
    if (cp.count() <= maxRows) {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(cp.collect().toSeq.asJava, df.schema)
    } else cp
  }

  /** Collect-to-LocalRelation cut for state that is tiny BY CONSTRUCTION
    * (k-means centroids: k·d rows at any corpus size; PQ codebooks). ONE
    * job, and the LocalRelation's real tiny stats make every downstream
    * join a static broadcast. Never use for corpus-sized state.
    */
  def cutLocal(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }
}

/** Driver-side loop helper: lineage truncation for in-memory iteration
  * (tests / benchmarks), optional durable store.
  */
object Iterate {

  /** Truncate lineage; durable when a store is given, in-memory otherwise. */
  def cut(state: DataFrame, iter: Int, store: Option[CheckpointStore], t0: Long): DataFrame =
    store match {
      case Some(s) => s.save(state.sparkSession, iter, state, t0)
      case None    => Lineage.cut(state)
    }
}
