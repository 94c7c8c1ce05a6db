package graft.algos

import graft.core.{CheckpointStore, Iterate, LinkGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration over the edge table.
  *
  * Semantics pinned to the reference (`__init__.py:974-1029`,
  * `graphobject.c:5326-5439`, docstring `graphobject.c:13775-13824`):
  *   - scores sum to 1; `1 - damping` is the reset probability;
  *   - undirected graphs treat every edge as bidirectional;
  *   - edge weights scale the share a vertex passes to each neighbor
  *     (row-normalized by out-strength);
  *   - dangling vertices (out-strength 0) redistribute their mass via the
  *     reset distribution every iteration — the variant that reproduces the
  *     reference goldens: Star(11) hub 0.4668 (`test_structural.py:389-393`)
  *     and personalized 0.3333/0.5166/0.0166 at damping 0.5
  *     (`test_structural.py:395-404`).
  *
  * Scale design (north_star): the row-normalized link table is computed once
  * and hash-partitioned by `src`, so the per-iteration `ranks ⋈ links` join
  * co-locates without reshuffling the (huge) link table; only the (small)
  * rank vector shuffles. The message aggregation `groupBy(dst).sum` gets
  * map-side partial aggregation for free (hub skew is absorbed by partials +
  * AQE skew handling). The dangling term costs no extra join: a non-dangling
  * row-normalized vertex emits exactly its rank, so
  * danglingMass = 1 - sum(messages). Every iteration cuts lineage
  * (localCheckpoint, or a durable parquet snapshot via
  * [[graft.core.CheckpointStore]]) so the plan stays O(1) per iteration and
  * runs resume mid-computation.
  */
object PageRank {

  final case class Result(ranks: DataFrame, iterations: Int, delta: Double)

  /** @param reset optional personalization DataFrame (id, reset); normalized
    *              internally. All-zero reset is an error like the reference
    *              (`test_structural.py:396`).
    * @param fixedIters when set, run exactly this many iterations with no
    *              per-iteration convergence action (SQL-oracle parity mode).
    */
  def run(
      g: LinkGraph,
      damping: Double = 0.85,
      tol: Double = 1e-6,
      maxIter: Int = 100,
      reset: Option[DataFrame] = None,
      fixedIters: Option[Int] = None,
      store: Option[CheckpointStore] = None
  ): Result =
    runFrom(g, initial = None, startIter = 0, damping, tol, maxIter, reset, fixedIters, store)

  /** Resume a durable run from its latest snapshot: identical loop, starting
    * state read back from the store (north_rule resumability).
    */
  def resume(
      g: LinkGraph,
      store: CheckpointStore,
      damping: Double = 0.85,
      tol: Double = 1e-6,
      maxIter: Int = 100,
      reset: Option[DataFrame] = None
  ): Result =
    store.latestIter(g.spark) match {
      case None    => run(g, damping, tol, maxIter, reset, None, Some(store))
      case Some(k) => runFrom(g, Some(store.load(g.spark, k)), k, damping, tol, maxIter, reset, None, Some(store))
    }

  private def runFrom(
      g: LinkGraph,
      initial: Option[DataFrame],
      startIter: Int,
      damping: Double,
      tol: Double,
      maxIter: Int,
      reset: Option[DataFrame],
      fixedIters: Option[Int],
      store: Option[CheckpointStore]
  ): Result = {
    val vertices = g.vertices.transform(graft.core.Lineage.cut)
    val n = vertices.count()
    require(n > 0, "empty graph")

    // Static side of the loop: row-normalized links, partitioned by src.
    val e = g.outView
    val outw = e.groupBy("src").agg(sum("weight").as("outw"))
    val links = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("weight") / col("outw")).as("p"))
      .repartition(col("src"))
      .persist()
    links.count()

    // Normalized reset distribution (id, reset); uniform when absent.
    val resetDf = (reset match {
      case Some(r) =>
        val tot = r.agg(sum("reset")).head.getDouble(0)
        require(tot > 0.0, "reset vector must not be all zeros")
        vertices.join(r, Seq("id"), "left")
          .select(col("id"), (coalesce(col("reset"), lit(0.0)) / tot).as("reset"))
      case None =>
        vertices.select(col("id"), lit(1.0 / n).as("reset"))
    }).transform(graft.core.Lineage.cut)

    var ranks = initial
      .getOrElse(resetDf.select(col("id"), lit(1.0 / n).as("rank")))
      .transform(graft.core.Lineage.cut)
    var iter = startIter
    var delta = Double.MaxValue
    val maxI = fixedIters.map(_ + startIter).getOrElse(maxIter)
    val checkConvergence = fixedIters.isEmpty

    while (iter < maxI && delta > tol) {
      val t0 = System.currentTimeMillis()
      val msgs = links.join(ranks, links("src") === ranks("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("p") * col("rank")).as("msg"))
      // one scalar action; see scaladoc for why this equals dangling mass
      val msgTotal = msgs.agg(sum("msg")).head.get(0) match {
        case null      => 0.0
        case d: Double => d
      }
      val danglingMass = math.max(0.0, 1.0 - msgTotal)

      val newRanks = resetDf.join(msgs, Seq("id"), "left")
        .select(col("id"),
          ((lit(1.0 - damping) + lit(damping * danglingMass)) * col("reset")
            + lit(damping) * coalesce(col("msg"), lit(0.0))).as("rank"))

      val cut = Iterate.cut(newRanks, iter + 1, store, t0)
      if (checkConvergence) {
        delta = cut.join(ranks.withColumnRenamed("rank", "old"), Seq("id"))
          .agg(max(abs(col("rank") - col("old")))).head.getDouble(0)
      }
      ranks = cut
      iter += 1
    }
    links.unpersist()
    Result(ranks, iter, delta)
  }
}
