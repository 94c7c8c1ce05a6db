package graft

import graft.algos.PageRank
import graft.core.LinkGraph
import graft.ingest.Pages
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Two sections:
  *  1. `queries`: wall seconds for representative SparkEntry queries on
  *     SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS threads.
  *  2. `scaling`: the BASELINE.json north metric — PageRank edges/sec per
  *     power iteration on the deterministic synthetic power-law web graph
  *     (seed 42, FIXTURES.md §4), run at local[8] and local[32] on the
  *     IDENTICAL input (pure function of (seed,id) — no data movement
  *     between runs), plus throughput scaling efficiency
  *     = (eps_32 / eps_8) / 4, the sandbox stand-in for N -> 4N executors.
  */
object Bench {

  /** Edge table of the synthetic power-law graph, generated distributedly. */
  def synthEdges(spark: SparkSession, n: Long, avgDeg: Int, partitions: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .flatMap(i => Pages.outLinks(Pages.DefaultSeed, i, n, avgDeg).map(t => (i, t)))
      .toDF("src", "dst")
  }

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // the iterative joins hit a pre-partitioned cached side: hash join
      // avoids re-sorting the big cached relation every superstep
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** PageRank steady-state seconds/iteration at a given parallelism (fresh
    * session): per-iteration wall times come from the loop itself; the first
    * two iterations (JIT/codegen/cache warmup) are dropped.
    */
  private def prSecPerIter(cpus: Int, n: Long, avgDeg: Int, iters: Int): (Double, Long) = {
    val spark = session(cpus)
    try {
      val edges = synthEdges(spark, n, avgDeg, partitions = math.max(cpus * 2, 16)).persist()
      val g = LinkGraph(edges, directed = true, Some(n))
      val m = g.ecount() // also materializes the edge cache
      val strategy = sys.env.getOrElse("SPARK_GRAFT_STRATEGY", "edge") match {
        case "csr"  => PageRank.CsrBlocks(math.max(cpus * 2, 16))
        case "hub"  => PageRank.HubBroadcast(10000)
        case _      => PageRank.EdgeJoin
      }
      // per-iteration timing from the loop itself; drop the first two
      // (JIT/codegen/cache warmup), average the steady-state tail
      val r = PageRank.run(g, fixedIters = Some(iters + 2), strategy = strategy)
      edges.unpersist()
      val steady = r.perIterSec.drop(2)
      (steady.sum / steady.size, m)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "16000000").toLong
    val benchIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "4").toInt

    // --- section 1: representative operator timings on the sf tables ------
    val headline =
      if (sys.env.get("SPARK_GRAFT_BENCH_ONLY").contains("scaling")) Seq.empty[String]
      else Seq("q_pagerank", "q_wcc", "q_triangles", "q_local_cc",
        "q_lpa", "q_dedup_exact", "q_minhash_cand", "q_simhash", "q_ann_brute", "q_ann_lsh")
    val spark = session(cpus)
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // --- section 2: PageRank throughput at two parallelism levels ---------
    val (sec8, m) = prSecPerIter(8, benchN, avgDeg = 10, benchIters)
    val (sec32, _) = prSecPerIter(32, benchN, avgDeg = 10, benchIters)
    val eps8 = m / sec8
    val eps32 = m / sec32
    val efficiency = (eps32 / eps8) / 4.0

    val qJson = results.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"pagerank_edges_per_sec_per_iter","value":${"%.0f".format(eps32)},"unit":"edges/sec/iter","queries":$qJson,"sf":"$sfDir","total_query_sec":${"%.2f".format(total)},"scaling":{"n_vertices":$benchN,"n_edges":$m,"iters":$benchIters,"sec_per_iter_local8":${"%.3f".format(sec8)},"sec_per_iter_local32":${"%.3f".format(sec32)},"eps_local8":${"%.0f".format(eps8)},"eps_local32":${"%.0f".format(eps32)},"efficiency_8_to_32":${"%.3f".format(efficiency)}}}"""
    println(json)
    // belt-and-braces for the driver's parser: also drop the line in a file
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), json + "\n")
  }
}
