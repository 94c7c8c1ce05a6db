package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One partition-local CSR block: all out-edges of the vertices hashed to
  * one partition, as flat arrays inside DataFrame columns (north_star:
  * "edges stored as partition-local CSR blocks inside DataFrame columns").
  *
  * `srcIds(i)`'s neighbors are `neighbors[offsets(i) until offsets(i+1))`
  * with matching `weights`; `offsets` has length srcIds.length + 1.
  */
final case class CsrBlock(
    part: Int,
    srcIds: Array[Long],
    offsets: Array[Int],
    neighbors: Array[Long],
    weights: Array[Double])

/** CSR-block construction + message expansion.
  *
  * Why this exists: the plain edge-table PageRank joins a (huge) link table
  * with the rank vector every superstep. Packing each hash partition's
  * adjacency into array-backed block rows (a) replaces the per-edge join by
  * a per-partition zip of blocks with the co-partitioned rank slice, and
  * (b) amortizes Tungsten row overhead: a handful of block rows per
  * partition instead of millions of edge rows. The igraph C core stores
  * exactly this layout inside `igraph_t` (SURVEY §0/§4); here it lives
  * inside DataFrame columns so everything around it stays Catalyst-planned.
  * The per-partition kernel is the one sanctioned `mapPartitions` use
  * (SURVEY §7.3: "mapPartitions for the CSR kernel").
  */
object Csr {

  /** Build CSR blocks from an edge table, `p` blocks by `pmod(src, p)`.
    * One shuffle (the repartition); arrays sorted by (src, dst) for
    * determinism. Each partition may emit several blocks of at most
    * `maxEdgesPerBlock` edges to bound row size (Tungsten rows must stay
    * well under 2 GiB; hub partitions of a 100 TB graph would overflow a
    * single row otherwise).
    */
  def build(edges: DataFrame, p: Int, maxEdgesPerBlock: Int = 4 << 20): Dataset[CsrBlock] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("src"), col("dst"),
      coalesce(col("weight"), lit(1.0)).as("weight"),
      pmod(col("src"), lit(p.toLong)).cast("int").as("part"))
      .repartition(p, col("part"))
      .as[(Long, Long, Double, Int)]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val part = rows.head._4
          val bySrc = rows.sortBy(r => (r._1, r._2))
          // split into blocks on src boundaries, each <= maxEdgesPerBlock
          val out = scala.collection.mutable.ArrayBuffer.empty[CsrBlock]
          var lo = 0
          while (lo < bySrc.length) {
            var hi = math.min(lo + maxEdgesPerBlock, bySrc.length)
            // extend to the end of the current src run (a src never splits)
            while (hi < bySrc.length && bySrc(hi)._1 == bySrc(hi - 1)._1) hi += 1
            val srcIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val offsets = scala.collection.mutable.ArrayBuffer(0)
            val neighbors = new Array[Long](hi - lo)
            val weights = new Array[Double](hi - lo)
            var i = lo
            var cur = Long.MinValue
            while (i < hi) {
              val r = bySrc(i)
              if (r._1 != cur) { srcIds += r._1; if (srcIds.length > 1) offsets += (i - lo); cur = r._1 }
              neighbors(i - lo) = r._2
              weights(i - lo) = r._3
              i += 1
            }
            offsets += (hi - lo)
            out += CsrBlock(part, srcIds.toArray, offsets.toArray, neighbors, weights)
            lo = hi
          }
          out.iterator
        }
      }
  }

  /** One superstep's messages: the rank vector is repartitioned with the
    * same `pmod(id, p)` expression as the blocks, the two RDDs are zipped
    * partition-by-partition (no join — Spark hashes equal expressions to
    * equal partition indices within a version), and each block streams out
    * (dst, rank * w / outStrength) rows. The caller completes the superstep
    * with the repartition-by-destination `groupBy(id).sum`.
    */
  def messages(blocks: Dataset[CsrBlock], ranks: DataFrame, p: Int): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val rankRdd = ranks.select(col("id"), col("rank"),
      pmod(col("id"), lit(p.toLong)).cast("int").as("part"))
      .repartition(p, col("part"))
      .as[(Long, Double, Int)].rdd
    val blkRdd = blocks.repartition(p, col("part")).rdd
    val msgs = blkRdd.zipPartitions(rankRdd) { (bit, rit) =>
      val rankMap = new java.util.HashMap[Long, java.lang.Double]()
      rit.foreach { case (id, r, _) => rankMap.put(id, r) }
      bit.flatMap { b =>
        (0 until b.srcIds.length).iterator.flatMap { i =>
          val rv = rankMap.get(b.srcIds(i))
          val start = b.offsets(i); val end = b.offsets(i + 1)
          if (rv == null || end == start) Iterator.empty
          else {
            var s = 0.0
            var j = start
            while (j < end) { s += b.weights(j); j += 1 }
            val scale = rv.doubleValue() / s
            (start until end).iterator.map(j => (b.neighbors(j), b.weights(j) * scale))
          }
        }
      }
    }
    spark.createDataFrame(msgs).toDF("id", "msg")
  }
}
