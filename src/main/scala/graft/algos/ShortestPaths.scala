package graft.algos

import graft.core.{Lineage, LinkGraph, Mode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted single/multi-source shortest paths (non-negative weights,
  * 0-weight edges allowed).
  *
  * Reference: `shortest_paths(weights=...)` (`graphobject.c:13921`; golden
  * 10x10 matrix incl. 0-weight edges `test_structural.py:585-631`),
  * `get_shortest_paths(output=vpath)` parent tracking
  * (`graphobject.c:13522`; goldens `test_structural.py:633-644`).
  *
  * Distributed Bellman-Ford by rounds: relax every edge against the current
  * tentative-distance frontier, keep improvements, iterate to fixpoint.
  * Each round is one co-partitioned join + min-aggregate; rounds <= longest
  * shortest path's hop count. Negative weights are rejected (the reference
  * raises on them too for Dijkstra).
  */
object ShortestPaths {

  /** Tentative distances from every vertex in `sources`.
    * @return (origin, id, dist, parent) for reachable pairs; dist is Double.
    */
  def fromSources(g: LinkGraph, sources: Seq[Long], mode: Mode = Mode.Out): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val adj = (mode match {
      case Mode.Out => g.weighted
      case Mode.In  => g.weighted.select(col("dst").as("src"), col("src").as("dst"), col("weight"))
      case Mode.All => g.bidirected
    }).select(col("src"), col("dst"), col("weight"))
      .repartition(col("src")).persist()
    adj.count()
    // documented contract (and the reference's): negative weights rejected —
    // a negative cycle would spin the relax loop to the round cap and return
    // meaningless distances
    if (!adj.isEmpty) {
      val minW = adj.agg(min("weight")).head.getDouble(0)
      require(minW >= 0.0, s"negative edge weights not supported (min = $minW)")
    }

    var dist = sources.toDF("origin")
      .select(col("origin"), col("origin").as("id"), lit(0.0).as("dist"), lit(-1L).as("parent"))
      .transform(Lineage.cut)
    var frontier = dist
    var rounds = 0
    var active = true
    while (active && rounds < 10000) {
      rounds += 1
      // relax edges leaving the frontier
      val cand = frontier.join(adj, frontier("id") === adj("src"))
        .select(col("origin"), col("dst").as("id"),
          (col("dist") + col("weight")).as("nd"), frontier("id").as("np"))
        .groupBy("origin", "id")
        .agg(min(struct(col("nd"), col("np"))).as("best"))
        .select(col("origin"), col("id"), col("best.nd").as("nd"), col("best.np").as("np"))
      // improvements vs current best
      val improved = cand.join(dist.select(col("origin"), col("id"), col("dist").as("cur")),
        Seq("origin", "id"), "left")
        .where(col("cur").isNull || col("nd") < col("cur"))
        .select(col("origin"), col("id"), col("nd").as("dist"), col("np").as("parent"))
        .transform(Lineage.cut)
      if (improved.isEmpty) active = false
      else {
        dist = dist.join(improved.select(col("origin"), col("id")).withColumn("x", lit(1)),
          Seq("origin", "id"), "left_anti")
          .union(improved)
          .transform(Lineage.cut)
        frontier = improved
      }
    }
    adj.unpersist()
    dist
  }

  /** Distance matrix rows for the given sources; unreachable = +Infinity
    * (matches the reference's `inf`). Output (origin, id, dist).
    */
  def matrix(g: LinkGraph, sources: Seq[Long]): DataFrame = {
    val d = fromSources(g, sources)
    val all = g.spark.createDataFrame(
      for (o <- sources) yield Tuple1(o)).toDF("origin")
      .crossJoin(g.vertices)
    all.join(d.select("origin", "id", "dist"), Seq("origin", "id"), "left")
      .select(col("origin"), col("id"),
        coalesce(col("dist"), lit(Double.PositiveInfinity)).as("dist"))
  }

  /** Reconstruct the vertex path origin -> target by walking parents
    * (driver-side; paths are short). Returns empty if unreachable.
    */
  def path(g: LinkGraph, source: Long, target: Long, mode: Mode = Mode.Out): Seq[Long] = {
    val rows = fromSources(g, Seq(source), mode)
      .select("id", "parent").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (!rows.contains(target)) return Seq.empty
    val buf = scala.collection.mutable.ArrayBuffer(target)
    var cur = target
    while (cur != source && rows.getOrElse(cur, -1L) != -1L) {
      cur = rows(cur)
      buf += cur
    }
    buf.reverse.toSeq
  }
}
