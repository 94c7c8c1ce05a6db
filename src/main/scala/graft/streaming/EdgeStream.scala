package graft.streaming

import graft.ingest.{Extract, Page}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming front-end: incremental page ingest and windowed
  * event statistics.
  *
  * The reference is a batch library (its only streaming artifact is the
  * Gephi JSON sink, `remote/gephi.py`); this module is the engine's P2
  * extension (SURVEY §2.12): append-only page arrivals become incremental
  * edge-table appends — at scale, micro-batches append to the Iceberg edge
  * table and the iterative algorithms pick up the newest snapshot.
  */
object EdgeStream {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Streaming pages source from a directory of parquet files. */
  def pages(spark: SparkSession, dir: String): Dataset[Page] = {
    import spark.implicits._
    spark.readStream.schema(pageSchema).parquet(dir).as[Page]
  }

  /** Streaming url-level edge extraction (same pure function as batch —
    * byte-identical invariant holds per micro-batch).
    */
  def urlEdges(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => Extract.links(p.html).map(t => (p.url, t)))
      .toDF("src_url", "dst_url")
  }

  /** Run the streaming ingest into a parquet edge sink; returns the query.
    * Caller stops it (tests use processAllAvailable).
    */
  def ingest(spark: SparkSession, pagesDir: String, sinkDir: String, checkpointDir: String) = {
    urlEdges(pages(spark, pagesDir))
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** Watermarked sliding-window event counts over the `events` stream —
    * the standard Structured Streaming aggregation shape (10 min watermark,
    * 5 min windows).
    */
  def windowedEventStats(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // watermark rejects TIMESTAMP_NTZ
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup over a `(doc_id, text)` document stream: custom
    * keyed state via `flatMapGroupsWithState` — the first document with a
    * given content hash passes, every later duplicate (same or later
    * micro-batch) is dropped. This is the streaming face of
    * [[graft.text.TextOps.dedupExact]]: state is one boolean per content
    * hash, partitioned by the hash — exactly the layout a 100 TB ingest
    * dedup needs (state scales with distinct content, not stream length).
    */
  def dedupStream(docs: DataFrame): Dataset[(Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    docs.select(md5(col("text")).as("h"), col("doc_id").cast("long"), col("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // content already emitted in an earlier batch
          else {
            state.update(true)
            // within a batch, keep the smallest doc_id (batch dedup keep-min)
            val first = rows.minBy(_._2)
            Iterator((first._2, first._3))
          }
      }
  }

  /** Streaming MinHash-LSH near-duplicate CANDIDATE detection over a
    * `(doc_id, text)` document stream — the streaming face of
    * [[graft.text.TextOps.minhashCandidates]].
    *
    * The signature is computed per ROW (array_min over transform'd shingle
    * hashes — no aggregation), because a streaming query admits only one
    * stateful operator: the band-bucket state below. Each (band, bandhash)
    * bucket keeps ONE long of state — the first (anchor) doc_id — and every
    * later arrival in the bucket emits the candidate pair (anchor, doc,
    * band), same or later micro-batch. Anchor-pairing (not all-pairs) keeps
    * state O(distinct buckets) rather than O(docs); transitive near-dups
    * still cluster through the anchor in the downstream batch
    * confirm → WCC step, which is the consumer of this stream.
    */
  def nearDupCandidatesStream(docs: DataFrame, n: Int = 3, k: Int = 16,
                              bands: Int = 8): Dataset[(Long, Long, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val rows = k / bands
    val sh = graft.text.TextOps.shingles(col("text"), n)
    val bandCols = (0 until bands).map { b =>
      val slotMins = (b * rows until (b + 1) * rows).map { i =>
        array_min(transform(sh, s => xxhash64(lit(i), s)))
      }
      struct(lit(b).as("band"), xxhash64(slotMins: _*).as("bh"))
    }
    docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(array(bandCols: _*)).as("bk"))
      .select(concat_ws("|", col("bk.band"), col("bk.bh")).as("key"),
        col("bk.band").as("band"), col("doc_id"))
      .as[(String, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(String, Int, Long)], state: GroupState[Long]) =>
          val here = it.toSeq.sortBy(_._3)
          val (anchor, later) = state.getOption match {
            case Some(a) => (a, here)
            case None =>
              val a = here.head._3
              state.update(a)
              (a, here.tail)
          }
          later.iterator.filter(_._3 != anchor).map(t => (anchor, t._3, t._2))
      }
  }

  /** Stateful per-vertex running degree over an append-only edge stream
    * (`mapGroupsWithState`): each micro-batch updates a per-vertex counter;
    * emits (id, degree) totals as of the latest batch. State = one long per
    * vertex, partitioned by vertex id — the streaming analog of
    * `GraphOps.degrees` for a growing web graph.
    */
  def runningDegrees(edges: DataFrame): Dataset[(Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    edges.select(explode(array(col("src"), col("dst"))).as("id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val d = state.getOption.getOrElse(0L) + rows.size
          state.update(d)
          (id, d)
      }
  }

  /** Streaming crawl-frontier counters — the continuous-crawl face of
    * [[graft.text.WebOps.frontier]]. Input is the crawl's discovery stream:
    * each record (src, dst) means page `src` was just crawled and links to
    * `dst`. Per-vertex state = (crawled, inlinks-from-crawled); a vertex
    * emits an updated (id, crawled, n_inlinks) row whenever either changes.
    * Frontier members at any instant are the rows with `crawled = false`
    * and `n_inlinks > 0` — rank downstream exactly as the batch op does.
    * After any prefix of the stream, the counters equal the batch
    * `frontier` on that prefix with crawled = the srcs seen so far
    * (stream == batch tested).
    *
    * Delivery contract: the `cnt += inc` counter is NOT replay-idempotent —
    * the stream == batch equality above assumes exactly-once processing
    * (the checkpointed micro-batch pipeline with an exactly-once sink).
    * Under an at-least-once sink with batch replays, inlink counts can
    * double-count; if replays must be tolerated, dedup (src, dst) pairs
    * upstream (e.g. [[dedupStream]] / a watermarked dropDuplicates) before
    * feeding this operator.
    */
  def frontierStream(crawl: DataFrame): Dataset[(Long, Boolean, Long)] = {
    val spark = crawl.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    crawl.select(explode(array(
        struct(col("src").as("id"), lit(true).as("crawled"), lit(0L).as("inc")),
        struct(col("dst").as("id"), lit(false).as("crawled"), lit(1L).as("inc")))).as("e"))
      .select(col("e.id"), col("e.crawled"), col("e.inc"))
      .as[(Long, Boolean, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Boolean, Long), (Long, Boolean, Long)](GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Boolean, Long)], state: GroupState[(Boolean, Long)]) =>
          var (crawled, cnt) = state.getOption.getOrElse((false, 0L))
          rows.foreach { r => crawled ||= r._2; cnt += r._3 }
          state.update((crawled, cnt))
          (id, crawled, cnt)
      }
  }
}
