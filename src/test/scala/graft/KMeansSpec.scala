package graft

import graft.sim.KMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's k-means + SemDeDup (Abbas et al. 2023) over an embedding table:
  * brute-force parity, determinism, and the cluster-local drop semantics.
  */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Two well-separated blobs on a line plus their ids. */
  private def blobs = Seq(
    (0L, Array(0.0f, 0.1f)), (1L, Array(0.1f, 0.0f)), (2L, Array(0.05f, 0.05f)),
    (3L, Array(10.0f, 10.1f)), (4L, Array(10.1f, 10.0f)), (5L, Array(9.95f, 10.05f))
  ).toDF("vec_id", "embedding")

  /** Driver-side Lloyd's with the same seed/tie rules, for parity checks. */
  private def bruteKMeans(vecs: Seq[(Long, Array[Double])], k: Int, iters: Int): Map[Long, Long] = {
    val sorted = vecs.sortBy(_._1)
    var cent: Seq[(Long, Array[Double])] =
      sorted.take(k).zipWithIndex.map { case ((_, v), c) => (c.toLong, v.clone()) }
    var asg: Map[Long, Long] = Map.empty
    def assignAll(): Map[Long, Long] = vecs.map { case (id, v) =>
      val best = cent.map { case (c, cv) =>
        (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.minBy(identity)
      id -> best._2
    }.toMap
    for (t <- 1 to iters) {
      asg = assignAll()
      if (t < iters) {
        cent = asg.groupBy(_._2).toSeq.map { case (c, members) =>
          val vs = members.keys.toSeq.map(id => vecs.find(_._1 == id).get._2)
          val dim = vs.head.length
          (c, Array.tabulate(dim)(i => vs.map(_(i)).sum / vs.size))
        }.sortBy(_._1)
      }
    }
    asg
  }

  test("k-means separates two obvious blobs, seed-deterministic") {
    val got = KMeans.assign(blobs, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeds are vec_id 0 (cid 0) and vec_id 1 (cid 1); after one update the
    // far blob pulls whichever centroid it captured — both blobs must be
    // internally uniform and mutually distinct
    assert(Set(got(0L), got(1L), got(2L)).size == 1)
    assert(Set(got(3L), got(4L), got(5L)).size == 1)
    assert(got(0L) != got(3L))
    val again = KMeans.assign(blobs, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("k-means matches driver-side brute Lloyd's on a seeded random set") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextDouble()))).toSeq
    val df = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
    for (iters <- Seq(1, 2, 4)) {
      val want = bruteKMeans(vecs, k = 3, iters = iters)
      val got = KMeans.assign(df, k = 3, iters = iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"iters=$iters")
    }
  }

  test("lloyd: gated driver kernel == distributed loop (labels exact, centroids 1e-9)") {
    // seeded random set (including a k > #distinct-points shape that empties
    // clusters); smallThreshold = 0 pins the distributed Lloyd loop as the
    // reference for the r6 gated kernel
    val rnd = new scala.util.Random(7)
    val pts = (0L until 40L).map(i =>
      (i, Array.fill(5)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val tiny = Seq((0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(5.0f, 5.0f))).toDF("vec_id", "embedding")
    for ((df, k, iters) <- Seq((pts, 4, 3), (pts, 4, 1), (tiny, 3, 3))) {
      val (ka, kc) = KMeans.lloyd(df, k, iters)
      val (da, dc) = KMeans.lloyd(df, k, iters, smallThreshold = 0L)
      val kaM = ka.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val daM = da.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(kaM == daM, s"labels k=$k iters=$iters")
      val kcM = kc.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val dcM = dc.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(kcM.keySet == dcM.keySet, s"centroid keys k=$k iters=$iters")
      val drift = kcM.map { case (key, v) => math.abs(v - dcM(key)) }.max
      assert(drift < 1e-9, s"centroid drift $drift k=$k iters=$iters")
    }
  }

  test("semDedup drops the larger id of a near-identical pair, cluster-local only") {
    // 0/1 nearly identical (cos ~1), 2 orthogonal-ish, far blob 3/4 identical
    val df = Seq(
      (0L, Array(1.0f, 0.001f)), (1L, Array(1.0f, 0.002f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(-50.0f, -50.0f)), (4L, Array(-50.0f, -50.0f))
    ).toDF("vec_id", "embedding")
    val got = KMeans.semDedup(df, k = 2, iters = 2, tau = 0.95).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got(0L) && !got(1L), "larger id of the near pair is dropped")
    assert(got(2L), "orthogonal vector kept")
    assert(got(3L) && !got(4L), "identical far pair: keep-min")
  }

  test("semDedup keeps everything when tau exceeds all similarities") {
    val kept = KMeans.semDedup(blobs, k = 2, iters = 2, tau = 1.1)
      .where(col("keep")).count()
    assert(kept == 6L)
  }
}
