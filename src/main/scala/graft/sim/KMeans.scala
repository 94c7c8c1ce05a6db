package graft.sim

import graft.core.Lineage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding table and SemDeDup-style semantic
  * deduplication built on it (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication" — cluster first so
  * the quadratic near-dup scan runs within small clusters, never all-pairs).
  *
  * Everything is deterministic and oracle-friendly:
  *   - init = the k smallest vec_ids, cluster ids 0..k-1 in that order;
  *   - a FIXED number of assignment rounds (no convergence test), so the
  *     DuckDB oracle unrolls the exact same math iteration by iteration;
  *   - argmin ties break to the smallest cluster id.
  *
  * Scale shape: the embedding table is exploded once to (vec_id, dim, x)
  * rows — assignment is a join against the k·d centroid rows (broadcast:
  * k·d is tiny by construction at any corpus size) followed by a
  * (vec_id, cid) hash aggregate with map-side partial combine; the centroid
  * update is a (cid, dim) aggregate that reduces N·d rows to k·d with
  * map-side combine. No step materializes anything larger than the
  * exploded input, and nothing is quadratic in N.
  */
object KMeans {

  /** Exploded (vec_id, i, x) view of (vec_id, embedding). Deliberately NOT
    * pre-repartitioned: an A/B at sf0.1 showed the extra exchange+stage per
    * lloyd() call costing more than the per-round exchange it saved (the
    * per-round aggregates shuffle only N·k tiny rows).
    */
  private def exploded(vectors: DataFrame): DataFrame =
    vectors.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("col").as("x"))

  /** Final cluster assignment (vec_id, cluster) after `iters` rounds of
    * Lloyd's algorithm: assign-then-update `iters - 1` times, then one last
    * assignment against the final centroids.
    */
  def assign(vectors: DataFrame, k: Int, iters: Int): DataFrame =
    lloyd(vectors, k, iters)._1

  /** Lloyd's loop exposing both results: the final assignment (vec_id,
    * cluster) AND the centroid table (cid, i, cx — 1-based dim) that final
    * assignment was computed against. [[graft.sim.Pq]] uses the centroids
    * as its per-subspace codebook; [[assign]] keeps only the membership.
    */
  def lloyd(vectors: DataFrame, k: Int, iters: Int,
            smallThreshold: Long = 8000000L): (DataFrame, DataFrame) = {
    require(k >= 1 && iters >= 1, s"kmeans: need k >= 1 and iters >= 1, got k=$k iters=$iters")
    // Gated driver kernel (r5/r6 kernel posture — Brandes / fixed-sweep
    // Louvain / fixed-iter PageRank precedent): each distributed Lloyd
    // round costs ~4 scheduled jobs (assignment cutAdaptive, centroid
    // cutLocal collect, plus their AQE stages) — and Pq.encode runs the
    // whole loop once PER SUBSPACE. Under the gate one collect + array
    // loops replace them all; the math is identical (same seeds, same
    // argmin tie-break to the smaller cid, same empty-cluster drop, same
    // mean update), per-sum IEEE order differs exactly as it does between
    // two distributed runs, and the parity spec pins kernel == distributed
    // at 1e-9. Above the gate nothing changes.
    val vCast = vectors.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val nVec = vCast.count()
    if (nVec > 0 && nVec <= smallThreshold) {
      val spark = vectors.sparkSession
      import spark.implicits._
      val rows = vCast.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      val n = rows.length
      val nc = math.min(k, n)
      val dims = rows(0)._2.length
      val cent = Array.tabulate(nc)(i => rows(i)._2.clone())
      val active = Array.fill(nc)(true)
      val asg = new Array[Int](n)
      var t = 0
      while (t < iters) {
        var v = 0
        while (v < n) {
          val e = rows(v)._2
          var best = -1; var bestD2 = Double.MaxValue
          var c = 0
          while (c < nc) {
            if (active(c)) {
              var d2 = 0.0; var j = 0
              val cc = cent(c)
              while (j < dims) { val dx = e(j) - cc(j); d2 += dx * dx; j += 1 }
              if (best < 0 || d2 < bestD2) { best = c; bestD2 = d2 }
            }
            c += 1
          }
          asg(v) = best
          v += 1
        }
        if (t < iters - 1) {
          val sums = Array.fill(nc)(new Array[Double](dims))
          val cnts = new Array[Long](nc)
          v = 0
          while (v < n) {
            val c = asg(v); val e = rows(v)._2
            cnts(c) += 1
            var j = 0
            while (j < dims) { sums(c)(j) += e(j); j += 1 }
            v += 1
          }
          var c = 0
          while (c < nc) {
            if (cnts(c) > 0) {
              var j = 0
              while (j < dims) { cent(c)(j) = sums(c)(j) / cnts(c); j += 1 }
            } else active(c) = false
            c += 1
          }
        }
        t += 1
      }
      val asgDf = spark.createDataset(spark.sparkContext.parallelize(
        rows.indices.map(i => (rows(i)._1, asg(i).toLong)).toSeq,
        spark.sparkContext.defaultParallelism)).toDF("vec_id", "cluster")
      val centDf = (0 until nc).filter(active)
        .flatMap(c => (0 until dims).map(j => (c.toLong, j + 1, cent(c)(j))))
        .toDF("cid", "i", "cx")
      return (asgDf, centDf)
    }
    val ex = Lineage.soft(exploded(vectors))
    // deterministic seed: the k smallest vec_ids, cid in vec_id order
    val w = Window.orderBy("vec_id")
    val seeds = vectors.select(col("vec_id")).orderBy("vec_id").limit(k)
      .select(col("vec_id"), (row_number().over(w) - 1).cast("long").as("cid"))
    // hard-cut the iterating state (centroids are k*d rows BY CONSTRUCTION
    // -> one-job collect to LocalRelation; assignments are N rows ->
    // distributed cut): keeps each round's plan constant-size instead of
    // doubling per round, at one job per cut instead of the old
    // count-then-collect pair
    var cent = Lineage.cutLocal(ex.join(seeds, Seq("vec_id"))
      .select(col("cid"), col("i"), col("x").as("cx")))

    def assignTo(c: DataFrame): DataFrame = {
      val d = ex.join(broadcast(c), Seq("i"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
      d.groupBy("vec_id")
        .agg(min(struct(col("d2"), col("cid"))).as("b"))
        .select(col("vec_id"), col("b.cid").as("cluster"))
    }

    var asg: DataFrame = null
    var t = 0
    while (t < iters) {
      // cutAdaptive: tiny assignments come back as a LocalRelation whose
      // real stats make the centroid-update join a static broadcast;
      // corpus-sized assignments stay a distributed cut
      asg = Lineage.cutAdaptive(assignTo(cent))
      if (t < iters - 1)
        cent = Lineage.cutLocal(
          ex.join(asg.select(col("vec_id"), col("cluster").as("cid")), Seq("vec_id"))
            .groupBy("cid", "i").agg(avg("x").as("cx")))
      t += 1
    }
    val out = asg.select(col("vec_id"), col("cluster"))
    ex.unpersist()
    // cent was cutAdaptive-materialized, so it survives the unpersist of ex
    (out, cent)
  }

  /** SemDeDup: k-means cluster, then inside each cluster drop every vector
    * that has a semantically-near twin (cosine >= tau) with a SMALLER
    * vec_id — the same greedy keep-min convention as the exact/MinHash
    * dedup family. Returns every input row as (vec_id, cluster, keep).
    *
    * The pairwise scan is cluster-local: cost is sum over clusters of
    * |c|^2, the SemDeDup trade — k controls the quadratic term, and the
    * self-join key is the cluster id, so it is one shuffle at N rows.
    */
  def semDedup(vectors: DataFrame, k: Int, iters: Int, tau: Double): DataFrame = {
    val asg = assign(vectors, k, iters)
    // norms bound once per VECTOR (Ann.cosine inline would refold both
    // norms per PAIR on the cluster-local quadratic scan), and the dot as
    // the unrolled codegen'd tree — identical fold order, so the cosine
    // compared against tau is bit-for-bit the same
    val v = vectors.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("nrm", sqrt(Ann.norm2F(col("emb"))))
      .join(asg, Seq("vec_id"))
    val a = v.select(col("cluster"), col("vec_id").as("a_id"), col("emb").as("a_emb"),
      col("nrm").as("a_nrm"))
    val b = v.select(col("cluster"), col("vec_id").as("b_id"), col("emb").as("b_emb"),
      col("nrm").as("b_nrm"))
    val drops = a.join(b, Seq("cluster"))
      .where(col("a_id") < col("b_id"))
      .where(Ann.dotF(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")) >= tau)
      .select(col("b_id").as("vec_id")).distinct()
    v.join(drops.withColumn("dropped", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        not(coalesce(col("dropped"), lit(false))).as("keep"))
  }
}
