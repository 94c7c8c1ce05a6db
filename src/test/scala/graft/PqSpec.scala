package graft

import graft.sim.Pq
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (Jégou et al. 2011): encode/codebook shape, ADC
  * brute-force parity, blob-recall sanity, determinism.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Driver-side per-subspace Lloyd's + ADC, same seed/tie rules. */
  private def brutePq(vecs: Seq[(Long, Array[Double])], m: Int, k: Int,
                      iters: Int): (Map[Long, Seq[Int]], Map[(Int, Int), Array[Double]]) = {
    val dims = vecs.head._2.length
    val dsub = dims / m
    val sorted = vecs.sortBy(_._1)
    val codes = scala.collection.mutable.Map[Long, Vector[Int]]()
      .withDefaultValue(Vector.empty)
    val book = scala.collection.mutable.Map[(Int, Int), Array[Double]]()
    for (s <- 0 until m) {
      val sub = vecs.map { case (id, v) => (id, v.slice(s * dsub, (s + 1) * dsub)) }
      var cent: Seq[(Int, Array[Double])] =
        sorted.take(k).zipWithIndex.map { case ((id, _), c) =>
          (c, vecs.find(_._1 == id).get._2.slice(s * dsub, (s + 1) * dsub).clone()) }
      var asg: Map[Long, Int] = Map.empty
      for (t <- 1 to iters) {
        asg = sub.map { case (id, v) =>
          id -> cent.map { case (c, cv) =>
            (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, c)
          }.minBy(identity)._2
        }.toMap
        if (t < iters) {
          cent = asg.groupBy(_._2).toSeq.map { case (c, members) =>
            val vs = members.keys.toSeq.map(id => sub.find(_._1 == id).get._2)
            (c, Array.tabulate(dsub)(i => vs.map(_(i)).sum / vs.size))
          }.sortBy(_._1)
        }
      }
      cent.foreach { case (c, cv) => book((s, c)) = cv }
      sub.foreach { case (id, _) => codes(id) = codes(id) :+ asg(id) }
    }
    (codes.toMap, book.toMap)
  }

  test("ADC top-k matches driver-side brute PQ on a seeded random set") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextDouble()))).toSeq
    val df = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
    val (m, k, iters, topK) = (2, 3, 2, 4)
    val (codes, book) = brutePq(vecs, m, k, iters)
    val dsub = 8 / m
    def adc(q: Array[Double], nid: Long): Double =
      (0 until m).map { s =>
        val cw = book((s, codes(nid)(s)))
        q.slice(s * dsub, (s + 1) * dsub).zip(cw)
          .map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    val queries = df.where($"vec_id" < 3)
    val got = Pq.adcTopK(df, queries, m, k, iters, topK).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))).toMap
    for (q <- 0L until 3L) {
      val qv = vecs.find(_._1 == q).get._2
      val want = vecs.map(_._1).filter(_ != q)
        .map(nid => (adc(qv, nid), nid)).sorted.take(topK)
      want.zipWithIndex.foreach { case ((d, nid), i) =>
        val (gd, gr) = got((q, nid))
        assert(gr == i + 1, s"q=$q nid=$nid rank")
        assert(math.abs(gd - d) < 1e-6, s"q=$q nid=$nid dist $gd vs $d")
      }
    }
  }

  test("ADC finds blob-mates first on well-separated blobs; deterministic") {
    val blob = (off: Double, base: Long) => (0 until 5).map(i =>
      (base + i, Array.fill(4)((off + i * 0.01).toFloat)))
    val df = (blob(0.0, 0L) ++ blob(50.0, 10L) ++ blob(-40.0, 20L))
      .toDF("vec_id", "embedding")
    val res = Pq.adcTopK(df, df.where($"vec_id" === 12L), m = 2, k = 3, iters = 3, topK = 4)
    val neigh = res.collect().map(_.getLong(1)).toSet
    assert(neigh == Set(10L, 11L, 13L, 14L), s"got $neigh")
    val again = Pq.adcTopK(df.repartition(7), df.where($"vec_id" === 12L),
      m = 2, k = 3, iters = 3, topK = 4).collect().map(_.getLong(1)).toSet
    assert(again == neigh)
  }

  /** Driver-side Lloyd's over full vectors, returning the final assignment
    * AND the centroids it was computed against (KMeans.lloyd's contract).
    */
  private def bruteLloydFull(vecs: Seq[(Long, Array[Double])], k: Int,
                             iters: Int): (Map[Long, Int], Map[Int, Array[Double]]) = {
    val dims = vecs.head._2.length
    var cent: Seq[(Int, Array[Double])] =
      vecs.sortBy(_._1).take(k).zipWithIndex.map { case ((_, v), c) => (c, v.clone()) }
    var asg: Map[Long, Int] = Map.empty
    for (t <- 1 to iters) {
      asg = vecs.map { case (id, v) =>
        id -> cent.map { case (c, cv) =>
          (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }.minBy(identity)._2
      }.toMap
      if (t < iters) {
        cent = asg.groupBy(_._2).toSeq.map { case (c, members) =>
          val vs = members.keys.toSeq.map(id => vecs.find(_._1 == id).get._2)
          (c, Array.tabulate(dims)(i => vs.map(_(i)).sum / vs.size))
        }.sortBy(_._1)
      }
    }
    (asg, cent.toMap)
  }

  test("IVF-PQ ADC (residual encoding) matches driver-side brute implementation") {
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextDouble()))).toSeq
    val df = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
    val (kc, citers, m, k, iters, nprobe, topK) = (3, 2, 2, 3, 2, 2, 4)
    val dsub = 8 / m
    // brute: coarse lloyd -> residuals -> per-subspace lloyd -> probe + ADC
    val (casg, ccent) = bruteLloydFull(vecs, kc, citers)
    val res = vecs.map { case (id, v) =>
      (id, v.zip(ccent(casg(id))).map { case (a, b) => a - b }) }
    val (codes, book) = brutePq(res, m, k, iters)
    val got = Pq.ivfAdcTopK(df, df.where($"vec_id" < 2), kc, citers, m, k, iters, nprobe, topK)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))).toMap
    for (q <- 0L until 2L) {
      val qv = vecs.find(_._1 == q).get._2
      val probed = ccent.toSeq.map { case (c, cv) =>
        (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.sorted.take(nprobe).map(_._2).toSet
      val want = vecs.map(_._1)
        .filter(id => id != q && probed.contains(casg(id)))
        .map { id =>
          val qr = qv.zip(ccent(casg(id))).map { case (a, b) => a - b }
          val adc = (0 until m).map { s =>
            val cw = book((s, codes(id)(s)))
            qr.slice(s * dsub, (s + 1) * dsub).zip(cw)
              .map { case (a, b) => (a - b) * (a - b) }.sum
          }.sum
          (adc, id)
        }.sorted.take(topK)
      want.zipWithIndex.foreach { case ((d, nid), i) =>
        val (gd, gr) = got((q, nid))
        assert(gr == i + 1, s"q=$q nid=$nid rank $gr vs ${i + 1}")
        assert(math.abs(gd - d) < 1e-6, s"q=$q nid=$nid dist $gd vs $d")
      }
      assert(got.keys.count(_._1 == q) == math.min(topK, want.size))
    }
  }

  test("encode: m codes per vector, codes < k, codebook dims 1-based per subspace") {
    val rnd = new scala.util.Random(5)
    val df = (0L until 20L).map(i => (i, Array.fill(6)(rnd.nextFloat()))).toSeq
      .toDF("vec_id", "embedding")
    val (codes, book) = Pq.encode(df, m = 3, k = 4, iters = 2)
    val rows = codes.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length == 3 && cs.forall(c => c >= 0 && c < 4))
    }
    val bk = book.collect().map(r => (r.getInt(0), r.getAs[Number]("i").longValue)).toSet
    assert(bk.subsetOf((0 until 3).flatMap(s => (1 to 2).map(i => (s, i.toLong))).toSet))
  }
}
