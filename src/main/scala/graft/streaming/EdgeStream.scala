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
}
