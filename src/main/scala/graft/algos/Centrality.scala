package graft.algos

import graft.core.{Lineage, LinkGraph, Mode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral centralities by power iteration on the same message-passing
  * engine as PageRank.
  *
  * Reference: `eigenvector_centrality(scale=True)` (`graphobject.c:13457`;
  * ARPACK in the reference, `arpackobject.c` — power iteration here, same
  * fixpoint), `hub_score`/`authority_score` HITS (`graphobject.c:13602,
  * 13106`). Goldens: Star(11) evcent max 1.0 at hub, leaf/hub ratio 0.3162,
  * eigenvalue 3.162 (`test_structural.py:406-417`).
  */
object Centrality {

  final case class Spectral(scores: DataFrame, eigenvalue: Double, iterations: Int)

  /** Eigenvector centrality on the undirected (or out-) adjacency; scaled so
    * max = 1 like the reference default.
    *
    * Power iteration runs on (A + I): bipartite graphs (e.g. stars) have
    * eigenvalues ±λ1, so unshifted iteration oscillates with period 2; the
    * +I shift preserves eigenvectors and separates |λ1 + 1| > |−λ1 + 1|.
    * Reported eigenvalue = ||(A+I)x|| − 1.
    */
  /** @param fixedIters run exactly this many iterations and skip the
    *                    convergence delta (the oracle-mirrored mode).
    */
  def eigenvector(g: LinkGraph, tol: Double = 1e-9, maxIter: Int = 200,
                  fixedIters: Option[Int] = None): Spectral = {
    val shift = 1.0
    val adj = g.bidirected.select(col("src"), col("dst"), col("weight"))
      .repartition(col("src")).persist()
    adj.count()
    val vertices = g.vertices.localCheckpoint(true)
    val n = vertices.count()
    var x = vertices.select(col("id"), lit(1.0 / math.sqrt(n.toDouble)).as("v"))
      .transform(Lineage.cut)
    var lambda = 0.0
    var iter = 0
    var delta = Double.MaxValue
    val cap = fixedIters.getOrElse(maxIter)
    while (iter < cap && (fixedIters.isDefined || delta > tol)) {
      val y = adj.join(x, adj("src") === x("id"))
        .groupBy(col("dst").as("id")).agg(sum(col("weight") * col("v")).as("y"))
      // previous value rides as `old` (x is already joined for the shift
      // term) so the convergence delta is a scan, not a join per iteration
      val yAll = vertices.join(y, Seq("id"), "left").join(x, Seq("id"))
        .select(col("id"), (coalesce(col("y"), lit(0.0)) + lit(shift) * col("v")).as("y"),
          col("v").as("old"))
        .transform(Lineage.cut)
      val norm = math.sqrt(yAll.agg(sum(col("y") * col("y"))).head.getDouble(0))
      if (norm == 0.0) { iter = cap; delta = 0.0 } // zero vector: no edges
      else {
        lambda = norm - shift // ||(A+I)x|| with ||x||=1 -> λ1 + shift
        if (fixedIters.isEmpty)
          delta = yAll.agg(max(abs(col("y") / norm - col("old")))).head.getDouble(0)
        x = yAll.select(col("id"), (col("y") / norm).as("v")).transform(Lineage.cut)
        iter += 1
      }
    }
    adj.unpersist()
    val mx = x.agg(max(abs(col("v")))).head.getDouble(0)
    val scaled =
      if (mx == 0.0) x.select(col("id"), col("v").as("centrality"))
      else x.select(col("id"), (abs(col("v")) / mx).as("centrality"))
    Spectral(scaled, lambda, iter)
  }

  /** HITS hubs & authorities (alternating power iteration), both scaled to
    * max = 1. Returns (id, hub, authority).
    */
  def hits(g: LinkGraph, tol: Double = 1e-9, maxIter: Int = 100,
           fixedIters: Option[Int] = None): DataFrame = {
    val e = (if (g.directed) g.weighted else g.bidirected)
      .select(col("src"), col("dst"), col("weight")).repartition(col("src")).persist()
    e.count()
    val vertices = g.vertices.localCheckpoint(true)
    val n = vertices.count()
    var hub = vertices.select(col("id"), lit(1.0 / math.sqrt(n.toDouble)).as("h"))
      .transform(Lineage.cut)
    var auth = hub.withColumnRenamed("h", "a")
    var iter = 0
    var delta = Double.MaxValue
    val cap = fixedIters.getOrElse(maxIter)
    while (iter < cap && (fixedIters.isDefined || delta > tol)) {
      // authority = sum of hub scores of in-neighbors
      val aRaw = e.join(hub, e("src") === hub("id"))
        .groupBy(col("dst").as("id")).agg(sum(col("weight") * col("h")).as("x"))
      val aNorm = normalize(vertices, aRaw)
      // hub = sum of authority scores of out-neighbors; the old hub score
      // rides through the normalization join so the convergence delta is a
      // scan of the checkpointed frame, not a join per iteration
      val a2 = aNorm.select(col("id").as("aid"), col("v").as("a2"))
      val hRaw = e.join(a2, e("dst") === a2("aid"))
        .groupBy(e("src").as("id")).agg(sum(col("weight") * col("a2")).as("x"))
      val hAll = vertices.join(hRaw, Seq("id"), "left").join(hub, Seq("id"))
        .select(col("id"), coalesce(col("x"), lit(0.0)).as("x"), col("h").as("old"))
        .transform(Lineage.cut)
      val hn = math.sqrt(hAll.agg(sum(col("x") * col("x"))).head.getDouble(0))
      val hd = if (hn == 0) 1.0 else hn
      if (fixedIters.isEmpty)
        delta = hAll.agg(max(abs(col("x") / hd - col("old")))).head.getDouble(0)
      hub = hAll.select(col("id"), (col("x") / hd).as("h")).transform(Lineage.cut)
      auth = aNorm.withColumnRenamed("v", "a")
      iter += 1
    }
    e.unpersist()
    val hMax = hub.agg(max(col("h"))).head.getDouble(0)
    val aMax = auth.agg(max(col("a"))).head.getDouble(0)
    hub.join(auth, Seq("id"))
      .select(col("id"),
        (col("h") / (if (hMax == 0) 1.0 else hMax)).as("hub"),
        (col("a") / (if (aMax == 0) 1.0 else aMax)).as("authority"))
  }

  private def normalize(vertices: DataFrame, raw: DataFrame): DataFrame = {
    val all = vertices.join(raw, Seq("id"), "left")
      .select(col("id"), coalesce(col("x"), lit(0.0)).as("x"))
      .transform(Lineage.cut)
    val norm = math.sqrt(all.agg(sum(col("x") * col("x"))).head.getDouble(0))
    all.select(col("id"), (col("x") / (if (norm == 0) 1.0 else norm)).as("v"))
      .transform(Lineage.cut)
  }
}
