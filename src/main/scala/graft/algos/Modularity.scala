package graft.algos

import graft.core.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a membership and clustering-comparison metrics.
  *
  * Reference: `modularity(membership, weights)` (`graphobject.c:15833-15870`,
  * wrapper `__init__.py:921-960`); goldens 0.4523 / 0.4157
  * (`test_structural.py:100-111`). `compare_communities`
  * (`clustering.py:1575-1673`; goldens `test_decomposition.py:557-604`).
  */
object Modularity {

  /** Q = sum_c [ w_in(c)/m  -  (deg(c) / 2m)^2 ] on the undirected weighted
    * view, where m = total edge weight, w_in(c) = weight inside c (each edge
    * once), deg(c) = sum of member strengths (loops counted twice).
    * Two groupBy passes — no iteration.
    */
  def modularity(g: LinkGraph, membership: DataFrame): Double = {
    val m = membership.select(col("id"), col("label"))
    val e = g.weighted
      .join(m.select(col("id").as("src"), col("label").as("csrc")), Seq("src"))
      .join(m.select(col("id").as("dst"), col("label").as("cdst")), Seq("dst"))
    val total = e.agg(sum("weight")).head.getDouble(0)
    if (total == 0.0) return Double.NaN
    val inside = e.where(col("csrc") === col("cdst"))
      .groupBy(col("csrc").as("label")).agg(sum("weight").as("w_in"))
    // strength per community: each edge endpoint contributes its weight
    val degs = e.select(col("csrc").as("label"), col("weight"))
      .union(e.select(col("cdst").as("label"), col("weight")))
      .groupBy("label").agg(sum("weight").as("deg"))
    val parts = degs.join(inside, Seq("label"), "left")
      .select((coalesce(col("w_in"), lit(0.0)) / total
        - pow(col("deg") / (2.0 * total), 2)).as("q"))
    parts.agg(sum("q")).head.getDouble(0)
  }

  /** Confusion matrix of two memberships (label1, label2, n). */
  def confusion(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("id"), col("label").as("label1"))
      .join(b.select(col("id"), col("label").as("label2")), Seq("id"))
      .groupBy("label1", "label2").agg(count(lit(1)).as("n"))

  /** Clustering-comparison metrics over the (small) confusion matrix,
    * computed driver-side after one distributed groupBy — the reference's
    * `compare_communities(method=vi|nmi|rand|adjusted_rand|split-join)`
    * (`clustering.py:1575-1673`).
    */
  final case class Comparison(vi: Double, nmi: Double, rand: Double, adjustedRand: Double, splitJoin: Long)

  def compareCommunities(a: DataFrame, b: DataFrame): Comparison = {
    val conf = confusion(a, b).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = conf.map(_._3).sum.toDouble
    val rowSum = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colSum = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    def h(ps: Iterable[Long]): Double =
      -ps.filter(_ > 0).map { c => val p = c / n; p * math.log(p) }.sum
    val ha = h(rowSum.values)
    val hb = h(colSum.values)
    val hab = h(conf.map(_._3))
    val mi = ha + hb - hab
    val vi = hab * 2 - ha - hb // = H(A|B) + H(B|A)
    val nmi = if (ha + hb == 0) 1.0 else 2 * mi / (ha + hb)
    // rand indices from pair counts
    def c2(x: Long): Double = x.toDouble * (x - 1) / 2.0
    val sumC2 = conf.map(t => c2(t._3)).sum
    val sumA2 = rowSum.values.map(c2).sum
    val sumB2 = colSum.values.map(c2).sum
    val nPairs = c2(n.toLong)
    val rand = (nPairs + 2 * sumC2 - sumA2 - sumB2) / nPairs
    val expected = sumA2 * sumB2 / nPairs
    val adjRand = (sumC2 - expected) / ((sumA2 + sumB2) / 2.0 - expected)
    // split-join distance (van Dongen): 2n - sum_a max_b |a∩b| - sum_b max_a
    val sjA = rowSum.keys.toSeq.map(r => conf.filter(_._1 == r).map(_._3).max).sum
    val sjB = colSum.keys.toSeq.map(c => conf.filter(_._2 == c).map(_._3).max).sum
    val splitJoin = (2 * n - sjA - sjB).toLong
    Comparison(vi, nmi, rand, adjRand, splitJoin)
  }
}
