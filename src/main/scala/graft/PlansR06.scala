package graft

import org.apache.spark.sql.SparkSession

/** Round-6 plan-dump helper: writes `plans/r06/<query>_<tag>.txt` with the
  * `.explain("formatted")` output of each named SparkEntry query — the
  * before/after plan evidence the optimization round's deliverables require.
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.PlansR06 before q_pagerank,q_wcc,..."
  * Defaults: tag = "before", queries = the Bench headline set + q_domain_cap.
  */
object PlansR06 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q_pagerank", "q_wcc", "q_triangles", "q_local_cc", "q_lpa",
        "q_louvain", "q_leiden", "q_dedup_exact", "q_minhash_cand", "q_simhash",
        "q_embed_dedup_lsh", "q_ann_brute", "q_ann_lsh", "q_gopher",
        "q_url_dedup", "q_pii", "q_token_bpe", "q_kmeans", "q_semdedup",
        "q_pq", "q_unigram_lm", "q_dsir", "q_mixture", "q_domain_cap")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plans-r06")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", "r06")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"plan: $name")
      // The final frame of an iterative query only shows the last superstep
      // (lineage is cut each round); that IS the steady-state plan shape the
      // optimization targets, so it is what we record.
      val txt =
        try SparkEntry.queries(name)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"ERROR building $name: ${e.getMessage}" }
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"wrote ${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
