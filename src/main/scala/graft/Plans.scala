package graft

import graft.data.Tables
import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans of the hot operators — the
  * explain-and-iterate loop the build guide mandates. Run:
  * `sbt -batch "runMain graft.Plans"` and check:
  *   - parquet scans show PushedFilters / pruned ReadSchema;
  *   - WholeStageCodegen spans cover the joins/aggs;
  *   - no unexpected Exchange (shuffle) nodes.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=============== $name ===============")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    // column pruning / filter pushdown on the raw scan
    dump("events scan + filter",
      Tables.read(spark, dir, "events")
        .where(org.apache.spark.sql.functions.col("user_id") < 10)
        .select("user_id", "value"))

    // one PageRank superstep: links join + agg + update
    val g = Tables.eventsGraph(spark, dir)
    import org.apache.spark.sql.functions._
    val e = g.outView
    val outw = e.groupBy("src").agg(sum("weight").as("outw"))
    val links = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("weight") / col("outw")).as("p"))
      .repartition(col("src")).persist()
    links.count()
    val ranks = g.vertices.select(col("id"), lit(0.01).as("rank")).localCheckpoint(true)
    val msgs = links.join(ranks, links("src") === ranks("id"))
      .groupBy(col("dst").as("id")).agg(sum(col("p") * col("rank")).as("msg"))
    dump("pagerank superstep (links ⋈ ranks → agg)", msgs)

    // triangle pipeline
    dump("triangle count", graft.algos.Triangles.triangleTriples(Tables.copartGraph(spark, dir)))

    // dedup
    dump("exact dedup", graft.text.TextOps.dedupExact(Tables.read(spark, dir, "documents")))

    // VERDICT r01 "what's wrong" #1/#6: edge-id assignment and membership
    // canonicalization must show NO single-partition Exchange — both now go
    // through Ids.assignDense (range partition + per-partition offsets)
    dump("line graph (dense edge ids, no global Window)",
      graft.ops.Extras.lineGraph(graft.core.LinkGraph(
        g.weighted.select("src", "dst").distinct(), directed = true, None)).edges)
    dump("canonicalizeMembership (dense labels, no global Window)",
      graft.core.GraphOps.canonicalizeMembership(
        graft.algos.Components.wcc(g)))

    // round-2 additions: the new distributed operators' hot joins
    // Leiden gain sweep: kvc aggregate + ctot join (the per-sweep core)
    val lg = Tables.copartGraph(spark, dir)
    dump("leiden local-move sweep (1 fixed sweep)",
      graft.algos.Leiden.localMove(lg,
        lg.vertices.select(col("id"), lit(1.0).as("nw")), gammaEff = 0.5,
        fixedSweeps = Some(1)))
    // embedding near-dup LSH candidates: bucket equi-join, no cross join
    dump("embedding near-dup LSH (1 table)",
      graft.sim.Ann.nearDupPairsLsh(
        Tables.read(spark, dir, "embeddings"), 0.45, nBits = 4, tables = 1))

    // round-3 pipeline ops: the document-dedup / corpus-prep hot paths
    // end-to-end minhash dedup: band bucket joins + ONE shingle-array join
    // after the candidate distinct (never the all-pairs shingle self-join)
    dump("minhash dedup end-to-end (cand → confirm → wcc)",
      graft.text.TextOps.dedupNearMinhash(Tables.read(spark, dir, "documents")))
    // stratified sampling: a pure scan — no Exchange at all
    dump("stratified sampling (zero-shuffle scan)",
      graft.text.TextOps.stratifiedSample(
        Tables.read(spark, dir, "documents"), Map("en" -> 0.5, "de" -> 0.25)))
    // shard packing: range partition + per-partition offsets, no global Window
    dump("token-budget shard packing (distributed prefix sum)",
      graft.text.TextOps.packShards(Tables.read(spark, dir, "documents"), 2000L))

    // round-4 crawl-hygiene ops
    // gopher stats: the per-doc branch is map-only (one scan, array
    // expressions inside WholeStageCodegen); the top-gram branch is one
    // partial-agg shuffle on (doc_id, gram) then doc_id
    dump("gopher repetition/quality stats",
      graft.text.TextOps.gopherStats(Tables.read(spark, dir, "documents")))
    // url dedup: normalization inside the scan projection, ONE Exchange on
    // the normalized key
    dump("url dedup (normalize → one hash shuffle)",
      graft.text.WebOps.urlDedup(
        Tables.read(spark, dir, "documents")
          .select(col("doc_id"), concat(lit("https://e.com/p/"),
            col("doc_id").cast("string"), lit("?utm_source=x")).as("url"))))

    // late-round-4 pipeline ops
    // PII masking: map-only — the whole op must live inside ONE
    // WholeStageCodegen project over the scan, zero Exchange
    dump("pii masking (map-only regexp chain)",
      graft.text.TextOps.redactPii(Tables.read(spark, dir, "documents")))
    // BPE-ish token stats: same shape — one scan, one codegen'd project
    dump("bpe token stats (map-only regexp_extract_all)",
      graft.text.TextOps.bpeStats(Tables.read(spark, dir, "documents")))
    // feedback arc set: two degree aggregates + dense rank (range exchange,
    // no single-partition Window) + two broadcast-eligible rank joins
    dump("feedback arc set (degree-delta rank → backward arcs)",
      graft.ops.Extras.feedbackArcSet(g))

    // round-5 web-graph ops
    // anchor text: explode is map-only; ONE partial-combine hash agg on
    // (dst, term); the window runs over the already-aggregated per-target
    // vocabulary (small), never the raw inlink rows
    dump("anchor-text top-k (explode → partial agg → bounded window)",
      graft.text.WebOps.anchorText(
        Tables.read(spark, dir, "documents")
          .select((col("doc_id") % 97).as("dst"), col("text").as("anchor")),
        topK = 3))
    // redirect resolution: each pointer-doubling round is ONE hash
    // self-join on the current-target key — ceil(log2 n)+1 rounds total,
    // lineage cut by localCheckpoint so the plan below is one round deep
    dump("redirect resolution (one pointer-doubling round)",
      graft.text.WebOps.resolveRedirects(
        Tables.read(spark, dir, "documents").where(col("doc_id") % 4 =!= 0)
          .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst"))))
    spark.stop()
  }
}
