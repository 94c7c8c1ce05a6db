package graft.algos

import graft.core.LinkGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `maximum_bipartite_matching(types)` (`graphobject.c` matching block;
  * goldens `tests/test_matching.py`). Require-gated driver kernel
  * (SURVEY §2.9 excludes matching from the distributed scope): Hopcroft–
  * Karp, O(E·√V). Returns (id, mate) with mate = -1 for unmatched vertices
  * — the reference's `Matching.matching` vector.
  */
object Matching {

  val maxKernelVertices = 2000000L

  /** @param types (id, type) with exactly two distinct type values; edges
    *              must cross sides (reference raises otherwise — so do we).
    */
  def maximumBipartiteMatching(g: LinkGraph, types: DataFrame): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val n = g.vcount()
    require(n <= maxKernelVertices,
      s"matching kernel capped at $maxKernelVertices vertices ($n given)")
    val tpairs = types.select("id", "type").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    val sides = tpairs.values.toSet
    require(sides.size <= 2, s"bipartite matching needs <= 2 types, got ${sides.size}")
    val left = tpairs.filter(_._2 == sides.min).keys.toArray.sorted
    val lIdx = left.zipWithIndex.toMap
    val right = tpairs.filter(_._2 != sides.min).keys.toArray.sorted
    val rIdx = right.zipWithIndex.toMap
    val adj = Array.fill(left.length)(scala.collection.mutable.ArrayBuffer.empty[Int])
    g.weighted.select("src", "dst").collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      require(tpairs(a) != tpairs(b),
        s"edge ($a, $b) connects two vertices of the same type — graph is not bipartite wrt `types`")
      if (tpairs(a) == sides.min) adj(lIdx(a)) += rIdx(b) else adj(lIdx(b)) += rIdx(a)
    }
    // Hopcroft–Karp
    val nl = left.length; val nr = right.length
    val matchL = Array.fill(nl)(-1)
    val matchR = Array.fill(nr)(-1)
    val dist = new Array[Int](nl)
    val INF = Int.MaxValue
    def bfs(): Boolean = {
      val q = scala.collection.mutable.Queue.empty[Int]
      var found = false
      var u = 0
      while (u < nl) {
        if (matchL(u) < 0) { dist(u) = 0; q += u } else dist(u) = INF
        u += 1
      }
      while (q.nonEmpty) {
        val x = q.dequeue()
        adj(x).foreach { v =>
          val w = matchR(v)
          if (w < 0) found = true
          else if (dist(w) == INF) { dist(w) = dist(x) + 1; q += w }
        }
      }
      found
    }
    def dfs(u: Int): Boolean = {
      var i = 0
      while (i < adj(u).length) {
        val v = adj(u)(i)
        val w = matchR(v)
        if (w < 0 || (dist(w) == dist(u) + 1 && dfs(w))) {
          matchL(u) = v; matchR(v) = u
          return true
        }
        i += 1
      }
      dist(u) = INF
      false
    }
    while (bfs()) {
      var u = 0
      while (u < nl) { if (matchL(u) < 0) dfs(u); u += 1 }
    }
    val rows =
      left.zipWithIndex.map { case (id, i) =>
        (id, if (matchL(i) < 0) -1L else right(matchL(i)))
      } ++ right.zipWithIndex.map { case (id, i) =>
        (id, if (matchR(i) < 0) -1L else left(matchR(i)))
      }
    rows.toSeq.toDF("id", "mate")
  }

  /** Matching size (matched pairs). */
  def matchingSize(matching: DataFrame): Long =
    matching.where(col("mate") >= 0).count() / 2

  /** `Matching.is_matching` — reference `_is_matching`
    * (`graphobject.c` matching block; Python `Matching` wrapper in
    * `__init__.py`): a (id, mate) vector is a valid matching iff it is
    * symmetric (`mate(mate(v)) == v` for every matched v) and every matched
    * pair is an actual edge. Distributed: one self-join on the matched rows
    * (symmetry) + one anti-join against the edge table (existence) — both
    * matching-vector-sized, broadcast-eligible against a big edge table.
    */
  def isMatching(g: LinkGraph, matching: DataFrame): Boolean = {
    val m = matching.select(col("id"), col("mate")).where(col("mate") >= 0)
    // a self-matched vertex (mate == id) passes the symmetry self-join
    // trivially and the id < mate filter below would skip it; the reference's
    // igraph_is_matching rejects it, so count it with the asymmetry check
    val selfm = m.where(col("mate") === col("id")).count()
    if (selfm > 0) return false
    val asym = m.alias("a")
      .join(m.select(col("id").as("bid"), col("mate").as("bmate")),
        col("a.mate") === col("bid"), "left")
      .where(col("bid").isNull || col("bmate") =!= col("a.id"))
      .count()
    if (asym > 0) return false
    val e = g.weighted.select("src", "dst")
    val missing = m.where(col("id") < col("mate"))
      .join(e, (col("id") === col("src") && col("mate") === col("dst")) ||
        (col("id") === col("dst") && col("mate") === col("src")), "left_anti")
      .count()
    missing == 0
  }

  /** `Matching.is_maximal` — reference `_is_maximal_matching`: a valid
    * matching with no augmenting EDGE, i.e. every non-loop edge has at
    * least one matched endpoint (goldens `tests/test_matching.py:47-50`).
    * Distributed: two semi-joins of the edge table against the unmatched
    * vertex set (loops skipped — a loop can never be in a matching).
    */
  def isMaximalMatching(g: LinkGraph, matching: DataFrame): Boolean = {
    if (!isMatching(g, matching)) return false
    val unmatched = g.vertices
      .join(matching.where(col("mate") >= 0).select(col("id")), Seq("id"), "left_anti")
    val augmentable = g.weighted.where(col("src") =!= col("dst"))
      .join(unmatched.select(col("id").as("src")), Seq("src"), "semi")
      .join(unmatched.select(col("id").as("dst")), Seq("dst"), "semi")
      .count()
    augmentable == 0
  }
}
