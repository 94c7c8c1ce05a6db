package graft.core

import org.apache.spark.sql.SparkSession

/** `Graph.Atlas` / `Graph.Isoclass` / `g.isoclass()`
  * (`graphobject.c:1976-1990, 2659-2690`; property suite
  * `tests/test_atlas.py:157-165`).
  *
  * Both catalogs are RE-DERIVED here by orderly enumeration, not copied:
  * the reference's lookup tables live in its C core (an absent git
  * submodule), and the underlying combinatorics are public knowledge —
  * the number of graphs on 0..7 vertices is 1,1,2,4,11,34,156,1044
  * (OEIS A000088, total 1253 = the Atlas of Graphs catalog size) and the
  * number of digraphs on 3 and 4 vertices is 16 and 218 (OEIS A000273),
  * which are exactly the index ranges `test_atlas.py` exercises.
  *
  * Enumeration: breadth-first over edge count — every class representative
  * with m edges is extended by each absent edge, the result canonicalized
  * (minimum adjacency bitmask over all vertex permutations), and duplicates
  * dropped. This touches only Σ_m |classes_m| × maxEdges candidates
  * (≈22k for n=7) instead of all 2^21 labeled graphs.
  *
  * Orderings:
  *  - Atlas: the book's documented sort (public, also in the networkx
  *    atlas docs) — vertex count, then edge count, then the ascending
  *    degree sequence compared lexicographically (111223 < 112222), then
  *    INCREASING automorphism-group size. Ties beyond |Aut| are broken by
  *    the canonical bitmask (engine-canonical: the book's residual order
  *    is not reconstructible without its data, and the reference's own
  *    tests pin no per-index structure — only analytic invariants).
  *  - Isoclass: edge count then canonical bitmask — this preserves the
  *    two properties igraph documents for its numbering (empty graph is
  *    class 0, full graph is the highest class); the interior numbering is
  *    engine-canonical for the same reason, and is what `isoclassOf`
  *    inverts, so create → classify round-trips exactly.
  */
object Catalog {

  /** Undirected pair (i, j), i < j -> bit index. */
  private def upairIdx(i: Int, j: Int): Int = j * (j - 1) / 2 + i

  /** Directed ordered pair (i, j), i != j -> bit index. */
  private def dpairIdx(n: Int, i: Int, j: Int): Int =
    i * (n - 1) + (if (j > i) j - 1 else j)

  /** For each permutation of 0..n-1: oldBit -> newBit. */
  private def bitMaps(n: Int, directed: Boolean): Array[Array[Int]] =
    (0 until n).permutations.map { p0 =>
      val p = p0.toArray
      val nb = if (directed) n * (n - 1) else n * (n - 1) / 2
      val m = new Array[Int](nb)
      for (i <- 0 until n; j <- 0 until n if i != j) {
        if (directed) m(dpairIdx(n, i, j)) = dpairIdx(n, p(i), p(j))
        else if (i < j) {
          val (a, b) = (math.min(p(i), p(j)), math.max(p(i), p(j)))
          m(upairIdx(i, j)) = upairIdx(a, b)
        }
      }
      m
    }.toArray

  private def applyPerm(mask: Long, map: Array[Int]): Long = {
    var rem = mask
    var out = 0L
    while (rem != 0L) {
      val b = java.lang.Long.numberOfTrailingZeros(rem)
      out |= 1L << map(b)
      rem &= rem - 1
    }
    out
  }

  private def canon(mask: Long, maps: Array[Array[Int]]): Long = {
    var best = mask
    var k = 0
    while (k < maps.length) {
      val c = applyPerm(mask, maps(k))
      if (c < best) best = c
      k += 1
    }
    best
  }

  private def autCount(mask: Long, maps: Array[Array[Int]]): Int = {
    var c = 0
    var k = 0
    while (k < maps.length) {
      if (applyPerm(mask, maps(k)) == mask) c += 1
      k += 1
    }
    c
  }

  /** All isomorphism classes on n vertices as canonical bitmasks, ordered
    * by (edge count, canonical mask). Class 0 is the empty graph; the last
    * class is the complete graph.
    */
  private def enumerate(n: Int, directed: Boolean): IndexedSeq[Long] = {
    if (n == 0) return IndexedSeq(0L)
    val maps = bitMaps(n, directed)
    val nb = if (directed) n * (n - 1) else n * (n - 1) / 2
    val out = IndexedSeq.newBuilder[Long]
    var frontier: Array[Long] = Array(0L)
    out += 0L
    var m = 0
    while (m < nb) {
      val next = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < frontier.length) {
        val g = frontier(i)
        var b = 0
        while (b < nb) {
          if ((g & (1L << b)) == 0L) next.add(canon(g | (1L << b), maps))
          b += 1
        }
        i += 1
      }
      frontier = next.toArray(new Array[java.lang.Long](0)).map(_.longValue())
      frontier.foreach(out += _)
      m += 1
    }
    out.result()
  }

  private val cache = scala.collection.concurrent.TrieMap.empty[(Int, Boolean), IndexedSeq[Long]]
  private def classesOf(n: Int, directed: Boolean): IndexedSeq[Long] =
    cache.getOrElseUpdate((n, directed), enumerate(n, directed))

  private def edgesOf(n: Int, mask: Long, directed: Boolean): Seq[(Long, Long)] = {
    val es = Seq.newBuilder[(Long, Long)]
    for (i <- 0 until n; j <- 0 until n if i != j) {
      if (directed) { if ((mask & (1L << dpairIdx(n, i, j))) != 0L) es += ((i.toLong, j.toLong)) }
      else if (i < j && (mask & (1L << upairIdx(i, j))) != 0L) es += ((i.toLong, j.toLong))
    }
    es.result()
  }

  private def degreeSeq(n: Int, mask: Long, directed: Boolean): Seq[Int] = {
    val d = new Array[Int](n)
    edgesOf(n, mask, directed).foreach { case (a, b) => d(a.toInt) += 1; d(b.toInt) += 1 }
    d.toSeq.sorted
  }

  /** The 1253 Atlas entries as (n, canonical mask), book order (see above). */
  lazy val atlasEntries: IndexedSeq[(Int, Long)] = {
    val entries = for {
      n <- 0 to 7
      maps = if (n > 0) bitMaps(n, directed = false) else Array.empty[Array[Int]]
      mask <- classesOf(n, directed = false)
    } yield {
      val key = (n, java.lang.Long.bitCount(mask), degreeSeq(n, mask, directed = false),
        if (n > 0) autCount(mask, maps) else 1, mask)
      (key, (n, mask))
    }
    implicit val seqOrd: Ordering[Seq[Int]] = Ordering.Implicits.seqOrdering
    entries.sortBy(_._1).map(_._2)
  }

  /** `Graph.Atlas(idx)` — graph #idx (0-based) of the 1253-graph catalog. */
  def atlas(spark: SparkSession, idx: Int): LinkGraph = {
    require(idx >= 0 && idx < atlasEntries.size,
      s"Atlas index must be in [0, ${atlasEntries.size}), got $idx")
    val (n, mask) = atlasEntries(idx)
    LinkGraph(spark, n.toLong, edgesOf(n, mask, directed = false), directed = false)
  }

  def isoclassCount(n: Int, directed: Boolean): Int = {
    requireSupported(n, directed)
    classesOf(n, directed).size
  }

  private def requireSupported(n: Int, directed: Boolean): Unit = {
    if (directed) require(n == 3 || n == 4, s"directed isoclass supports 3-4 vertices, got $n")
    else require(n >= 3 && n <= 6, s"undirected isoclass supports 3-6 vertices, got $n")
  }

  /** `Graph.Isoclass(n, cls, directed)` (`graphobject.c:2661`). */
  def isoclass(spark: SparkSession, n: Int, cls: Int, directed: Boolean): LinkGraph = {
    requireSupported(n, directed)
    val cs = classesOf(n, directed)
    require(cls >= 0 && cls < cs.size,
      s"isoclass for n=$n directed=$directed must be in [0, ${cs.size}), got $cls")
    LinkGraph(spark, n.toLong, edgesOf(n, cs(cls), directed), directed)
  }

  /** Directed-pair -> bit index of the adjacency-mask layout (the public
    * face of `dpairIdx`, for kernels that build masks directly).
    */
  def dirPairIdx(n: Int, i: Int, j: Int): Int = dpairIdx(n, i, j)

  /** Undirected-pair -> bit index of the adjacency-mask layout (the public
    * face of `upairIdx`; order-insensitive).
    */
  def undirPairIdx(i: Int, j: Int): Int = upairIdx(math.min(i, j), math.max(i, j))

  private val tableCache = scala.collection.concurrent.TrieMap.empty[(Int, Boolean), Array[Int]]

  /** Full mask -> isoclass lookup table over all 2^bits adjacency masks —
    * O(1) per-subgraph classification for the motif kernels (4096 entries
    * for directed n=4). Built once per (n, directed) and cached.
    */
  def maskClassTable(n: Int, directed: Boolean): Array[Int] =
    tableCache.getOrElseUpdate((n, directed), {
      requireSupported(n, directed)
      val nb = if (directed) n * (n - 1) else n * (n - 1) / 2
      require(nb <= 16, s"mask table too large for n=$n directed=$directed")
      val maps = bitMaps(n, directed)
      val index = classesOf(n, directed).zipWithIndex.toMap
      Array.tabulate(1 << nb)(m => index(canon(m.toLong, maps)))
    })

  /** Per-isoclass weak-connectivity flags (motif vectors report None/NaN on
    * the disconnected classes).
    */
  def connectedClasses(n: Int, directed: Boolean): Array[Boolean] = {
    requireSupported(n, directed)
    classesOf(n, directed).map { mask =>
      val p = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (p(x) == x) x else { p(x) = find(p(x)); p(x) }
      edgesOf(n, mask, directed).foreach { case (a, b) =>
        p(find(a.toInt)) = find(b.toInt)
      }
      (0 until n).map(find).distinct.size == 1
    }.toArray
  }

  /** `g.isoclass()` (`graphobject.h:173`): the isomorphism class of a small
    * graph; inverse of [[isoclass]] (create -> classify round-trips).
    */
  def isoclassOf(g: LinkGraph): Int = {
    val n0 = g.vcount()
    require(n0 <= 6, s"isoclass classifies graphs of up to 6 vertices, got $n0")
    val n = n0.toInt
    requireSupported(n, g.directed)
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val pos = ids.zipWithIndex.toMap
    var mask = 0L
    g.weighted.select("src", "dst").collect().foreach { r =>
      val (i, j) = (pos(r.getLong(0)), pos(r.getLong(1)))
      if (i != j) {
        if (g.directed) mask |= 1L << dpairIdx(n, i, j)
        else mask |= 1L << upairIdx(math.min(i, j), math.max(i, j))
      }
    }
    val c = canon(mask, bitMaps(n, g.directed))
    val idx = classesOf(n, g.directed).indexOf(c)
    require(idx >= 0, "canonical form not found (corrupt catalog?)")
    idx
  }
}
