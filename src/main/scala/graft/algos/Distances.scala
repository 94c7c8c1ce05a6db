package graft.algos

import graft.core.{Lineage, LinkGraph, Mode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-based whole-graph statistics via simultaneous multi-source BFS.
  *
  * Reference: `eccentricity` (`graphobject.c:13396`), `radius` (13853),
  * `diameter`/`farthest_points` (13328-13356), `average_path_length`
  * (13092); goldens `test_structural.py:27-65, 741-756`.
  *
  * All sources propagate together: state is (origin, v, dist) pairs — one
  * frontier-join per BFS level, every level lineage-cut. Exact all-pairs is
  * O(n·reach) state: right for the golden graphs and for bounded vertex
  * subsets; at web scale the documented substitute is HyperBall-style
  * `approx_count_distinct` neighborhood functions ([[neighborhoodFunction]]).
  */
object Distances {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.algos.Distances")

  /** Exact all-origins sweeps are O(n·m) work and O(n·reach) state. Like
    * the sequential community kernels' `maxKernelVertices`, this cap stops
    * a default `eccentricity()`/`diameter()`/`girth()` call from
    * accidentally launching an n·m job on a web-scale corpus (round-3
    * verdict #5). Escapes: pass a bounded `sources` set to the multi-BFS
    * entry points, `maxOrigins` to [[girth]], or use the HyperBall
    * approximations ([[neighborhoodFunction]] / [[eccentricityApprox]] /
    * [[pathLengthHistApprox]]) — the documented 10^12-scale substitutes.
    */
  val maxExactOrigins = 200000L

  private def guardAllOrigins(g: LinkGraph, what: String): Unit = {
    val n = g.vcount()
    require(n <= maxExactOrigins,
      s"$what from ALL origins is O(n·m) — capped at $maxExactOrigins origins ($n vertices). " +
        "Pass a bounded source set (multiBfs/multiDistancesWeighted `sources`, girth `maxOrigins`) " +
        "or use the HyperBall approximations (neighborhoodFunction/eccentricityApprox/pathLengthHistApprox) at scale")
  }

  /** All-pairs (origin, v, dist) reachability table from every vertex in
    * `sources` (defaults to all vertices — guarded by [[maxExactOrigins]]).
    * Undirected uses mode=All.
    */
  def multiBfs(g: LinkGraph, mode: Mode = Mode.All, sources: Option[DataFrame] = None,
               smallThreshold: Long = 8000000L): DataFrame = {
    if (sources.isEmpty) guardAllOrigins(g, "exact BFS")
    val adj = (mode match {
      case Mode.Out => g.weighted
      case Mode.In  => g.weighted.select(col("dst").as("src"), col("src").as("dst"))
      case Mode.All => g.bidirected
    }).select(col("src").as("v"), col("dst").as("nbr")).distinct()
      .repartition(col("v")).persist()
    val nAdj = adj.count()
    val src = sources.getOrElse(g.vertices).select(col("id").as("origin"))

    // adaptive small-input fast path (the WCC/coreness posture: decided by
    // runtime COUNTs). The exact sweep is only legal on bounded inputs
    // anyway (guardAllOrigins / bounded `sources`); when the adjacency fits
    // one task AND the output distance table is driver-sized, a collected
    // CSR + per-origin array BFS replaces rounds × ~6 scheduled jobs with
    // 3. Above either bound the layered distributed loop below runs
    // unchanged (and is pinned by the smallThreshold=0 spec).
    if (nAdj <= smallThreshold) {
      val spark = g.spark
      import spark.implicits._
      val srcIds = src.collect().map(_.getLong(0))
      val rows = adj.collect()
      val idx = new java.util.HashMap[Long, Int]()
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      def intern(x: Long): Int =
        if (idx.containsKey(x)) idx.get(x)
        else { idx.put(x, ids.length); ids += x; ids.length - 1 }
      rows.foreach { r => intern(r.getLong(0)); intern(r.getLong(1)) }
      val n = ids.length
      // output bound: every origin can reach at most n vertices
      if (srcIds.length.toLong * math.max(n, 1).toLong <= 4000000L) {
        val off = new Array[Int](n + 1)
        rows.foreach(r => off(idx.get(r.getLong(0)) + 1) += 1)
        for (i <- 1 to n) off(i) += off(i - 1)
        val fill = off.clone(); val nbrs = new Array[Int](rows.length)
        rows.foreach { r =>
          val i = idx.get(r.getLong(0)); nbrs(fill(i)) = idx.get(r.getLong(1)); fill(i) += 1
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        val dist = new Array[Int](n)
        val queue = new Array[Int](n)
        srcIds.foreach { o =>
          out += ((o, o, 0L))
          if (idx.containsKey(o)) {
            java.util.Arrays.fill(dist, -1)
            val s = idx.get(o); dist(s) = 0
            var head = 0; var tail = 0
            queue(tail) = s; tail += 1
            while (head < tail) {
              val u = queue(head); head += 1
              var j = off(u)
              while (j < off(u + 1)) {
                val w = nbrs(j)
                if (dist(w) < 0) {
                  dist(w) = dist(u) + 1
                  out += ((o, ids(w), dist(w).toLong))
                  queue(tail) = w; tail += 1
                }
                j += 1
              }
            }
          }
        }
        adj.unpersist()
        // parallelize, don't toDF: a multi-million-row LocalRelation gets
        // embedded in (and re-broadcast through) every downstream plan —
        // girth's self-joins over it measured 4x slower than the
        // distributed loop it replaced
        return spark.createDataset(spark.sparkContext.parallelize(
          out.toSeq, spark.sparkContext.defaultParallelism))
          .toDF("origin", "v", "dist")
      }
    }
    // Layered accumulation: each BFS level is checkpointed ONCE and the
    // result is the lazy union of the level frames — the old loop re-cut
    // (re-materialized) the ENTIRE cumulative O(n·reach) table every round.
    // Visited check: with a SYMMETRIC adjacency (Mode.All builds one by
    // construction), a neighbor of a level-(d−1) vertex has distance in
    // {d−2, d−1, d}, so the anti-join only needs the previous TWO levels —
    // layer-sized frames — instead of the full cumulative table; asymmetric
    // modes keep the full check (a vertex can be rediscovered from any
    // earlier level there), but still as a union of already-checkpointed
    // layers rather than a re-materialized frame.
    val symmetric = mode == Mode.All
    val layers = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    var frontier = src.select(col("origin"), col("origin").as("v"), lit(0L).as("dist"))
      .transform(Lineage.cut)
    layers += frontier
    var prevFrontier: Option[org.apache.spark.sql.DataFrame] = None
    var d = 0L
    var growing = true
    while (growing) {
      d += 1
      val seen =
        if (symmetric)
          prevFrontier.map(p => frontier.select("origin", "v").union(p.select("origin", "v")))
            .getOrElse(frontier.select("origin", "v"))
        else layers.map(_.select("origin", "v")).reduce(_ union _)
      val next = frontier.join(adj, Seq("v"))
        .select(col("origin"), col("nbr").as("v")).distinct()
        .join(seen, Seq("origin", "v"), "left_anti")
        .select(col("origin"), col("v"), lit(d).as("dist"))
        .transform(Lineage.cut)
      if (next.isEmpty) growing = false
      else { prevFrontier = Some(frontier); frontier = next; layers += next }
    }
    adj.unpersist()
    layers.reduce(_ union _)
  }

  /** Weighted all-sources distance table (origin, v, dist: double) — the
    * same frontier relax loop as [[Betweenness.brandesTables]] step 1
    * (`diameter(weights=...)`, `graphobject.c:13328`; golden
    * `test_structural.py:43-47`: weighted Tree(14,3) diameter 15). Requires
    * strictly positive weights. One join + min-aggregate per relax round;
    * rounds ≤ the max hop count of any weighted shortest path.
    */
  def multiDistancesWeighted(g: LinkGraph, mode: Mode = Mode.All,
                             sources: Option[DataFrame] = None,
                             smallBfsThreshold: Long = 8000000L): DataFrame = {
    if (sources.isEmpty) guardAllOrigins(g, "exact weighted distance sweep")
    val adjRaw = (mode match {
      case Mode.Out => g.weighted
      case Mode.In  => g.weighted.select(col("dst").as("src"), col("src").as("dst"), col("weight"))
      case Mode.All => g.bidirected
    }).where(col("src") =!= col("dst"))
    val adj = adjRaw.groupBy(col("src").as("v"), col("dst").as("nbr"))
      .agg(min("weight").as("w"))
      .repartition(col("v")).persist()
    val nAdj = adj.count()
    val minW = adj.agg(min("w")).head
    require(minW.isNullAt(0) || minW.getDouble(0) > 0.0,
      "weighted distances need strictly positive weights")
    val src = sources.getOrElse(g.vertices).select(col("id").as("origin"))

    // gated driver Dijkstra — same posture and bounds as [[multiBfs]]'s
    // kernel (adjacency fits one task, output table driver-sized); per-path
    // distance accumulation order matches the relax loop's (hop by hop), so
    // the values are bit-identical. Above either bound the distributed
    // relax loop below runs unchanged.
    if (nAdj <= smallBfsThreshold) {
      val spark = g.spark
      import spark.implicits._
      val srcIds = src.collect().map(_.getLong(0))
      val rows = adj.collect()
      val idx = new java.util.HashMap[Long, Int]()
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      def intern(x: Long): Int =
        if (idx.containsKey(x)) idx.get(x)
        else { idx.put(x, ids.length); ids += x; ids.length - 1 }
      rows.foreach { r => intern(r.getLong(0)); intern(r.getLong(1)) }
      val n = ids.length
      if (srcIds.length.toLong * math.max(n, 1).toLong <= 4000000L) {
        val off = new Array[Int](n + 1)
        rows.foreach(r => off(idx.get(r.getLong(0)) + 1) += 1)
        for (i <- 1 to n) off(i) += off(i - 1)
        val fill = off.clone()
        val nbrs = new Array[Int](rows.length); val ws = new Array[Double](rows.length)
        rows.foreach { r =>
          val i = idx.get(r.getLong(0))
          nbrs(fill(i)) = idx.get(r.getLong(1)); ws(fill(i)) = r.getDouble(2); fill(i) += 1
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        val dist = new Array[Double](n)
        srcIds.foreach { o =>
          out += ((o, o, 0.0))
          if (idx.containsKey(o)) {
            java.util.Arrays.fill(dist, Double.PositiveInfinity)
            val s = idx.get(o); dist(s) = 0.0
            val pq = new java.util.PriorityQueue[(Double, Int)](
              (a: (Double, Int), b: (Double, Int)) => java.lang.Double.compare(a._1, b._1))
            pq.add((0.0, s))
            while (!pq.isEmpty) {
              val (du, u) = pq.poll()
              if (du <= dist(u)) {
                var j = off(u)
                while (j < off(u + 1)) {
                  val v = nbrs(j); val nd = du + ws(j)
                  if (nd < dist(v)) { dist(v) = nd; pq.add((nd, v)) }
                  j += 1
                }
              }
            }
            var i = 0
            while (i < n) {
              if (i != s && dist(i) < Double.PositiveInfinity) out += ((o, ids(i), dist(i)))
              i += 1
            }
          }
        }
        adj.unpersist()
        return spark.createDataset(spark.sparkContext.parallelize(
          out.toSeq, spark.sparkContext.defaultParallelism))
          .toDF("origin", "v", "dist")
      }
    }
    var dist = src.select(col("origin"), col("origin").as("v"), lit(0.0).as("dist"))
      .transform(Lineage.cut)
    var frontier = dist
    var active = true
    while (active) {
      val cand = frontier.join(adj, Seq("v"))
        .select(col("origin"), col("nbr").as("v"), (col("dist") + col("w")).as("nd"))
        .groupBy("origin", "v").agg(min("nd").as("nd"))
      val improved = cand.join(dist.select(col("origin"), col("v"), col("dist").as("cur")),
        Seq("origin", "v"), "left")
        .where(col("cur").isNull || col("nd") < col("cur"))
        .select(col("origin"), col("v"), col("nd").as("dist"))
        .transform(Lineage.cut)
      if (improved.isEmpty) active = false
      else {
        dist = dist.join(improved.select("origin", "v"), Seq("origin", "v"), "left_anti")
          .union(improved).transform(Lineage.cut)
        frontier = improved
      }
    }
    adj.unpersist()
    dist
  }

  /** Per-vertex eccentricity: max distance to any reachable vertex (within
    * the component). Directed graphs follow edge direction by default —
    * pinned by the reference golden gdir -> [1,2,3,2]
    * (`test_structural.py:49-57`). `weighted = true` routes through the
    * weighted relax loop and returns double distances.
    */
  def eccentricity(g: LinkGraph, modeOpt: Option[Mode] = None,
                   weighted: Boolean = false): DataFrame = {
    val mode = modeOpt.getOrElse(if (g.directed) Mode.Out else Mode.All)
    if (weighted)
      multiDistancesWeighted(g, mode)
        .groupBy(col("origin").as("id")).agg(max("dist").as("eccentricity"))
    else
      multiBfs(g, mode).groupBy(col("origin").as("id")).agg(max("dist").as("eccentricity"))
  }

  /** Weighted diameter (`diameter(weights=...)`, `graphobject.c:13328`). */
  def diameterWeighted(g: LinkGraph): Double = {
    val mode = if (g.directed) Mode.Out else Mode.All
    val r = multiDistancesWeighted(g, mode).agg(max("dist")).head
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Weighted `farthest_points` — deterministic min-(src,dst) pick among
    * pairs realizing the weighted diameter (`test_structural.py:46-47`).
    */
  def farthestPointsWeighted(g: LinkGraph): (Long, Long, Double) = {
    val mode = if (g.directed) Mode.Out else Mode.All
    val d = multiDistancesWeighted(g, mode)
    val r = d.orderBy(col("dist").desc, col("origin"), col("v")).limit(1).collect()
    if (r.isEmpty) (-1L, -1L, 0.0)
    else (r.head.getLong(r.head.fieldIndex("origin")), r.head.getLong(r.head.fieldIndex("v")),
      r.head.getDouble(r.head.fieldIndex("dist")))
  }

  /** Weighted mean finite pairwise distance (`average_path_length` with
    * weights).
    */
  def averagePathLengthWeighted(g: LinkGraph): Double = {
    val mode = if (g.directed) Mode.Out else Mode.All
    val r = multiDistancesWeighted(g, mode).where(col("dist") > 0)
    if (r.isEmpty) Double.NaN else r.agg(avg("dist")).head.getDouble(0)
  }

  /** Unweighted diameter: max finite distance (mode Out on directed graphs,
    * like the reference's `diameter(directed=True)`).
    */
  def diameter(g: LinkGraph): Long = {
    val mode = if (g.directed) Mode.Out else Mode.All
    val r = multiBfs(g, mode).agg(max("dist")).head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  def radius(g: LinkGraph, modeOpt: Option[Mode] = None): Long = {
    val ecc = eccentricity(g, modeOpt)
    val r = ecc.agg(min("eccentricity")).head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** `farthest_points` (`graphobject.c:13356`): one extremal pair realizing
    * the diameter plus the distance — deterministic min-(src,dst) pick.
    */
  /** `girth()` (`graphobject.c:1725`, `igraph_girth`): length of the
    * shortest cycle on the undirected simple view (directed graphs are
    * treated as undirected; self-loops and multiple edges are ignored —
    * the reference's published semantics). None for forests.
    *
    * Distributed shape: the all-origins BFS table (one frontier join per
    * level, [[multiBfs]]) plus two joins. For origin o and undirected
    * simple edge (u,v): equal-level endpoints close an odd cycle
    * 2·d(o,u)+1; adjacent-level endpoints close an even candidate
    * d(o,u)+d(o,v)+1, valid only when the deeper endpoint has ≥2 BFS
    * parents (with a unique parent the edge lies on every shortest path
    * and the closed walk degenerates — counting it would undercount).
    * The min over origins × edges is exact: from any origin ON a shortest
    * cycle the closing edge realizes its length (cycle distances equal
    * graph distances, else a shorter cycle exists), and every valid
    * candidate's closed walk traverses its edge exactly once, so it
    * contains a genuine cycle no longer than the candidate.
    *
    * `maxOrigins` caps the BFS source set (seeded-hash sample) for large
    * graphs — the result is then an upper bound (exact whenever a sampled
    * origin lies on a shortest cycle), the documented estimator trade-off.
    * Above [[maxExactOrigins]] vertices a default call auto-samples
    * [[girthDefaultSampleOrigins]] origins (logged) instead of launching
    * the O(n·m) exact sweep; pass `maxOrigins = Some(n)` to force exact.
    */
  val girthDefaultSampleOrigins = 4096

  def girth(g: LinkGraph, maxOrigins: Option[Int] = None,
            smallThreshold: Long = 8000000L): Option[Long] = {
    val ue = g.weighted.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct().persist()
    if (ue.isEmpty) { ue.unpersist(); return None }
    val und = LinkGraph(ue.select(col("a").as("src"), col("b").as("dst")), directed = false)
    val effOrigins = maxOrigins.orElse {
      val n = und.vcount()
      if (n > maxExactOrigins) {
        log.warn(s"girth: $n vertices > $maxExactOrigins — sampling " +
          s"$girthDefaultSampleOrigins BFS origins; the result is an UPPER BOUND " +
          "(exact when a sampled origin lies on a shortest cycle). " +
          "Pass maxOrigins = Some(vcount) to force the exact O(n·m) sweep.")
        Some(girthDefaultSampleOrigins)
      } else None
    }
    val sources = effOrigins.map { k =>
      und.vertices.select(col("id"), xxhash64(lit(42L), col("id")).as("h"))
        .orderBy("h").limit(k).select("id")
    }

    // gated driver kernel (the WCC/multiBfs posture): the distributed path
    // shuffles the |E| × origins candidate frame (272 MB / 44 jobs at
    // sf0.1, StageProbe q_girth) while the whole canonical edge set fits in
    // one task. The kernel replicates the EXACT same candidate math per
    // origin — odd cycle da == db → 2da+1; adjacent-level edge whose deeper
    // endpoint has ≥ 2 BFS parents → da+db+1 — including the identical
    // sampled-origin set (selected by the same Spark expression), so exact
    // and estimator modes both agree with the distributed loop.
    if (ue.count() <= smallThreshold) {
      val es = ue.collect().map(r => (r.getLong(0), r.getLong(1)))
      ue.unpersist()
      val idx = new java.util.HashMap[Long, Int]()
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      def intern(x: Long): Int =
        if (idx.containsKey(x)) idx.get(x)
        else { idx.put(x, ids.length); ids += x; ids.length - 1 }
      es.foreach { e => intern(e._1); intern(e._2) }
      val n = ids.length
      val off = new Array[Int](n + 1)
      es.foreach { case (a, b) => off(idx.get(a) + 1) += 1; off(idx.get(b) + 1) += 1 }
      for (i <- 1 to n) off(i) += off(i - 1)
      val fill = off.clone(); val nbrs = new Array[Int](es.length * 2)
      es.foreach { case (a, b) =>
        val i = idx.get(a); val j = idx.get(b)
        nbrs(fill(i)) = j; fill(i) += 1; nbrs(fill(j)) = i; fill(j) += 1
      }
      val srcIdx: Array[Int] = sources match {
        case Some(df) => df.collect().map(r => idx.get(r.getLong(0)))
        case None     => (0 until n).toArray
      }
      val dist = new Array[Int](n); val queue = new Array[Int](n)
      var best = Long.MaxValue
      srcIdx.foreach { s =>
        java.util.Arrays.fill(dist, -1)
        dist(s) = 0; var head = 0; var tail = 0
        queue(tail) = s; tail += 1
        while (head < tail) {
          val u = queue(head); head += 1
          var j = off(u)
          while (j < off(u + 1)) {
            val w = nbrs(j)
            if (dist(w) < 0) { dist(w) = dist(u) + 1; queue(tail) = w; tail += 1 }
            j += 1
          }
        }
        es.foreach { case (al, bl) =>
          val a = idx.get(al); val b = idx.get(bl)
          val da = dist(a); val db = dist(b)
          if (da >= 0 && db >= 0) {
            if (da == db) best = math.min(best, 2L * da + 1)
            else if (math.abs(da - db) == 1) {
              val deeper = if (da > db) a else b
              var np = 0; var j = off(deeper)
              while (j < off(deeper + 1)) {
                if (dist(nbrs(j)) == dist(deeper) - 1) np += 1
                j += 1
              }
              if (np >= 2) best = math.min(best, da.toLong + db + 1)
            }
          }
        }
      }
      return if (best == Long.MaxValue) None else Some(best)
    }

    val dist = multiBfs(und, Mode.All, sources).persist()
    dist.count()
    val da = dist.select(col("origin"), col("v").as("a"), col("dist").as("da"))
    val db = dist.select(col("origin"), col("v").as("b"), col("dist").as("db"))
    val cand = ue.join(da, Seq("a")).join(db, Seq("origin", "b"))
    val odd = cand.where(col("da") === col("db"))
      .select((col("da") * 2 + 1).as("len"))
    val evenCand = cand.where(abs(col("da") - col("db")) === 1)
      .select(col("origin"),
        when(col("da") > col("db"), col("a")).otherwise(col("b")).as("v"),
        (col("da") + col("db") + 1).as("len"))
    // BFS parent multiplicity — but ONLY for the deeper endpoints of
    // adjacent-level candidate edges (round-3 ADVICE: the previous
    // all-(origin, v) computation spent the job's dominant shuffle on rows
    // that were immediately discarded; the semi-join shrinks the parent
    // join's left side to candidate endpoints, which matters most on the
    // sampled-origin estimator path this targets)
    val need = evenCand.select("origin", "v").distinct()
    val adj = und.bidirected.select(col("src").as("v"), col("dst").as("nbr")).distinct()
    val dn = dist.select(col("origin"), col("v").as("nbr"), col("dist").as("dn"))
    val parents = dist.join(need, Seq("origin", "v"), "left_semi")
      .join(adj, Seq("v"))
      .join(dn, Seq("origin", "nbr"))
      .where(col("dn") === col("dist") - 1)
      .groupBy("origin", "v").agg(count(lit(1)).as("np"))
    val even = evenCand
      .join(parents, Seq("origin", "v"))
      .where(col("np") >= 2)
      .select("len")
    val r = odd.union(even).agg(min("len")).head
    dist.unpersist(); ue.unpersist()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  def farthestPoints(g: LinkGraph): (Long, Long, Long) = {
    val mode = if (g.directed) Mode.Out else Mode.All
    val d = multiBfs(g, mode)
    val r = d.orderBy(col("dist").desc, col("origin"), col("v")).limit(1).collect()
    if (r.isEmpty) (-1L, -1L, 0L)
    else (r.head.getLong(r.head.fieldIndex("origin")), r.head.getLong(r.head.fieldIndex("v")),
      r.head.getLong(r.head.fieldIndex("dist")))
  }

  /** `get_diameter`: the actual vertex path realizing the diameter
    * ([[ShortestPaths.path]] parent chain from the farthest pair).
    */
  def getDiameter(g: LinkGraph): Seq[Long] = {
    val (s, t, d) = farthestPoints(g)
    val mode = if (g.directed) Mode.Out else Mode.All
    if (d <= 0) Seq.empty else ShortestPaths.path(g, s, t, mode)
  }

  /** Mean finite pairwise distance (`average_path_length`). */
  def averagePathLength(g: LinkGraph): Double = {
    val mode = if (g.directed) Mode.Out else Mode.All
    val r = multiBfs(g, mode).where(col("dist") > 0)
    if (r.isEmpty) Double.NaN else r.agg(avg("dist")).head.getDouble(0)
  }

  /** Histogram of finite pairwise distances (`path_length_hist`). */
  def pathLengthHist(g: LinkGraph): DataFrame = {
    val mode = if (g.directed) Mode.Out else Mode.All
    multiBfs(g, mode).where(col("dist") > 0)
      .groupBy("dist").agg(count(lit(1)).as("n_pairs"))
  }

  /** HyperBall-style approximate neighborhood function: |B(v, t)| per vertex
    * per radius t, using `approx_count_distinct` over the t-hop frontier —
    * the 10^12-scale substitute for exact BFS (Boldi-Vigna HyperBall;
    * Palmer et al. ANF). Approximation error is the HLL standard error
    * (~1.6% at rsd=0.01s default).
    */
  def neighborhoodFunction(g: LinkGraph, maxT: Int): DataFrame = {
    val adj = g.bidirected.select(col("src").as("v"), col("dst").as("nbr")).distinct()
      .repartition(col("v")).persist()
    var ball = g.vertices.select(col("id").as("origin"), col("id").as("v"))
      .transform(Lineage.cut)
    val spark = g.spark
    var out = ball.groupBy("origin").agg(approx_count_distinct("v").as("size"))
      .select(col("origin").as("id"), lit(0).as("t"), col("size"))
      .transform(Lineage.cut)
    for (t <- 1 to maxT) {
      val grown = ball.join(adj, Seq("v")).select(col("origin"), col("nbr").as("v"))
        .union(ball).distinct().transform(Lineage.cut)
      ball = grown
      out = out.union(
        ball.groupBy("origin").agg(approx_count_distinct("v").as("size"))
          .select(col("origin").as("id"), lit(t).as("t"), col("size")))
        .transform(Lineage.cut)
    }
    adj.unpersist()
    out
  }

  /** Web-scale eccentricity estimate from the HyperBall neighborhood
    * function: ecc(v) = the smallest radius t at which |B(v,t)| stops
    * growing (equals the final ball size). This is the documented scale
    * substitute for [[eccentricity]]'s exact all-pairs BFS — O(n·maxT) HLL
    * sketch state instead of O(n·reach) rows. Exact on graphs small enough
    * for the HLL sparse (exact) mode; ±HLL standard error beyond.
    */
  def eccentricityApprox(g: LinkGraph, maxT: Int): DataFrame = {
    val nf = neighborhoodFunction(g, maxT).transform(Lineage.cut)
    val fin = nf.where(col("t") === maxT).select(col("id"), col("size").as("final_size"))
    nf.join(fin, Seq("id"))
      .where(col("size") === col("final_size"))
      .groupBy("id").agg(min("t").cast("long").as("eccentricity"))
  }

  /** Approximate path-length histogram from the neighborhood function:
    * n_pairs(t) = Σ_v (|B(v,t)| − |B(v,t−1)|) — the HyperBall/ANF estimate
    * of the exact [[pathLengthHist]] (undirected view).
    */
  def pathLengthHistApprox(g: LinkGraph, maxT: Int): DataFrame = {
    val nf = neighborhoodFunction(g, maxT)
    val prev = nf.select(col("id"), (col("t") + 1).as("t"), col("size").as("prev_size"))
    nf.join(prev, Seq("id", "t"))
      .select(col("t").cast("long").as("dist"), (col("size") - col("prev_size")).as("delta"))
      .where(col("delta") > 0)
      .groupBy("dist").agg(sum("delta").as("n_pairs"))
  }

  /** Topological order (Kahn peel by rounds): (id, ord) where `ord` sorts a
    * valid topological order; within a round, ties by id. Errors on cycles
    * like the reference (`graphobject.c:14030`; golden
    * `test_structural.py:511-516` accepts any valid order).
    */
  def topologicalLayers(g: LinkGraph, smallThreshold: Long = 8000000L): DataFrame = {
    require(g.directed, "topological sort needs a directed graph")
    val spark = g.spark
    var edges = g.weighted.select("src", "dst").distinct().transform(Lineage.cut)
    var remaining = g.vertices.transform(Lineage.cut)
    var out = spark.range(0).select(col("id"), lit(0).as("layer")).limit(0)
    var layer = 0
    var n = remaining.count()

    // gated driver Kahn peel (the WCC/coreness/multiBfs posture): the
    // distributed peel costs ~6 scheduled jobs PER LAYER and a deep DAG has
    // hundreds of layers (682 jobs for 0.6 MB of shuffle, StageProbe
    // q_topo_layers) — under the gate one collect + array Kahn emits the
    // identical (id, layer) table in 3 jobs. Same layer semantics: layer =
    // peel round, cycles rejected with the same message.
    if (edges.count() <= smallThreshold && n <= smallThreshold) {
      import spark.implicits._
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val vs = remaining.select("id").collect().map(_.getLong(0))
      val idx = new java.util.HashMap[Long, Int](vs.length * 2)
      vs.zipWithIndex.foreach { case (id, i) => idx.put(id, i) }
      val nv = vs.length
      val indeg = new Array[Int](nv)
      val off = new Array[Int](nv + 1)
      es.foreach { case (s, d) => off(idx.get(s) + 1) += 1; indeg(idx.get(d)) += 1 }
      for (i <- 1 to nv) off(i) += off(i - 1)
      val fill = off.clone(); val outNbr = new Array[Int](es.length)
      es.foreach { case (s, d) =>
        val i = idx.get(s); outNbr(fill(i)) = idx.get(d); fill(i) += 1 }
      val layerOf = new Array[Int](nv)
      var frontier = (0 until nv).filter(indeg(_) == 0).toArray
      var done = 0; var lay = 0
      while (frontier.nonEmpty) {
        val nextBuf = scala.collection.mutable.ArrayBuffer.empty[Int]
        frontier.foreach { u =>
          layerOf(u) = lay; done += 1
          var j = off(u)
          while (j < off(u + 1)) {
            val v = outNbr(j); indeg(v) -= 1
            if (indeg(v) == 0) nextBuf += v
            j += 1
          }
        }
        frontier = nextBuf.toArray; lay += 1
      }
      require(done == nv, "graph has a cycle — not a DAG")
      return spark.createDataset(spark.sparkContext.parallelize(
        vs.indices.map(i => (vs(i), layerOf(i))).toSeq,
        spark.sparkContext.defaultParallelism)).toDF("id", "layer")
    }

    while (n > 0) {
      val hasIn = edges.select(col("dst").as("id")).distinct()
      val zeroIn = remaining.join(hasIn, Seq("id"), "left_anti").transform(Lineage.cut)
      val k = zeroIn.count()
      require(k > 0, "graph has a cycle — not a DAG")
      out = out.union(zeroIn.select(col("id"), lit(layer).as("layer"))).transform(Lineage.cut)
      remaining = remaining.join(zeroIn, Seq("id"), "left_anti").transform(Lineage.cut)
      edges = edges.join(zeroIn.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .transform(Lineage.cut)
      n -= k
      layer += 1
    }
    out
  }

  /** is_dag (`graphobject.c:12162`): true iff the zero-in-degree peel
    * consumes every vertex.
    */
  def isDag(g: LinkGraph): Boolean =
    try { topologicalLayers(g); true } catch { case _: IllegalArgumentException => false }
}
