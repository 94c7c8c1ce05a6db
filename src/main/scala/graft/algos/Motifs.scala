package graft.algos

import graft.core.{Catalog, LinkGraph}
import org.apache.spark.sql.functions._

/** `motifs_randesu(size=3, cut_prob=None)` (`graphobject.c:6375`,
  * `doc/source/analysis.rst:228`): counts of induced 3-vertex subgraphs per
  * isomorphism class, with `None` for the disconnected classes (the
  * reference returns NaN there). Indexing follows this engine's
  * `Graph.Isoclass(3, i, directed)` canonical enumeration
  * ([[graft.core.Catalog]]) — self-consistent the same way the reference's
  * motif vector is indexed by its own isoclass tables.
  *
  * No sampling machinery is needed at full census (cut_prob = None, the
  * default): the directed counts are a re-indexing of the distributed triad
  * census ([[Triads.triadCensus]] — closed-form dyadic classes, one wedge
  * join, no O(n³)), and the undirected counts come from two existing
  * distributed aggregations (induced paths = Σ C(deg,2) − 3·triangles, and
  * the degree-ordered triangle count) — both the 100 TB shape already.
  */
object Motifs {

  /** Size-3 motif census. Vector length = #isoclasses on 3 vertices
    * (16 directed / 4 undirected); entry i counts induced subgraphs in
    * class `Graph.Isoclass(3, i, directed)`, None where that class is
    * disconnected.
    */
  def motifs3(g: LinkGraph): Seq[Option[Long]] = {
    val spark = g.spark
    if (g.directed) {
      val census = Triads.triadCensus(g)
      val out = Array.fill[Option[Long]](Catalog.isoclassCount(3, directed = true))(None)
      Triads.reps.zipWithIndex.foreach { case (edges, man) =>
        if (connected3(edges)) {
          val rep = LinkGraph(spark, 3L,
            edges.map { case (a, b) => (a.toLong, b.toLong) }, directed = true)
          out(Catalog.isoclassOf(rep)) = Some(census(man))
        }
      }
      out.toSeq
    } else {
      val de = g.weighted.where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val deg = de.select(col("a").as("v")).union(de.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val wedgeRow = deg.agg(sum(col("d") * (col("d") - 1) / 2).as("w")).head
      val wedges = if (wedgeRow.isNullAt(0)) 0L else wedgeRow.getAs[Number](0).longValue
      val tri = Triangles.count(g)
      val out = Array.fill[Option[Long]](Catalog.isoclassCount(3, directed = false))(None)
      val pathIso = Catalog.isoclassOf(LinkGraph(spark, 3L, Seq((0L, 1L), (1L, 2L)), directed = false))
      val triIso = Catalog.isoclassOf(LinkGraph(spark, 3L, Seq((0L, 1L), (1L, 2L), (0L, 2L)), directed = false))
      out(pathIso) = Some(wedges - 3 * tri)
      out(triIso) = Some(tri)
      out.toSeq
    }
  }

  /** `motifs_randesu_no(size=3)` (`graphobject.c:6441`): total number of
    * connected 3-vertex induced subgraphs = the sum over the defined
    * entries of [[motifs3]].
    */
  def motifs3Count(g: LinkGraph): Long = motifs3(g).flatten.sum

  /** `motifs_randesu(size=4)` for UNDIRECTED graphs
    * (`graphobject.c:14275-14341`): induced 4-vertex subgraph counts per
    * isoclass (11 classes, the 5 disconnected ones None). The directed
    * 4-census (218 classes) stays excluded per SURVEY §2.9.
    *
    * Scale design — no 4-subset is ever enumerated except the K4s (which the
    * degree-ordered [[Cliques.cliques]] listing bounds by arboricity). The
    * other five connected classes come from closed-form NON-induced counts
    * over degree / per-edge-triangle / co-degree statistics, then the
    * standard graphlet Möbius inversion down to induced counts:
    *
    *   N_claw    = Σ_v C(d_v, 3)
    *   N_P4      = Σ_(u,v)∈E [(d_u−1)(d_v−1) − t_uv]   (middle-edge walks)
    *   N_paw     = Σ_v t_v (d_v − 2)
    *   N_diamond = Σ_e C(t_e, 2)
    *   N_C4      = ½ Σ_{u<v} C(codeg(u,v), 2)          (two diagonals each)
    *
    *   n_K4      = N_K4
    *   n_diamond = N_diamond − 6 n_K4
    *   n_C4      = N_C4 − n_diamond − 3 n_K4
    *   n_paw     = N_paw − 4 n_diamond − 12 n_K4
    *   n_claw    = N_claw − n_paw − 2 n_diamond − 4 n_K4
    *   n_P4      = N_P4 − 4 n_C4 − 2 n_paw − 6 n_diamond − 12 n_K4
    *
    * (containment coefficients hand-derived per class and pinned by the
    * brute-force parity test). Every statistic is one distributed aggregate:
    * degrees, triangle triples (degree-ordered orientation), and the wedge
    * endpoint-pair co-degree groupBy — the same cost class as triangle
    * counting.
    */
  def motifs4(g: LinkGraph): Seq[Option[Long]] = {
    val spark = g.spark
    val named = motifs4Named(g).toMap
    val out = Array.fill[Option[Long]](Catalog.isoclassCount(4, directed = false))(None)
    def rep(edges: (Long, Long)*): Int =
      Catalog.isoclassOf(LinkGraph(spark, 4L, edges, directed = false))
    out(rep((0L, 1L), (1L, 2L), (2L, 3L))) = Some(named("p4"))
    out(rep((0L, 1L), (0L, 2L), (0L, 3L))) = Some(named("claw"))
    out(rep((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) = Some(named("c4"))
    out(rep((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))) = Some(named("paw"))
    out(rep((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (1L, 3L))) = Some(named("diamond"))
    out(rep((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))) = Some(named("k4"))
    out.toSeq
  }

  /** The six connected 4-vertex induced counts by shape name (the
    * SQL-friendly face of [[motifs4]]).
    */
  def motifs4Named(g: LinkGraph): Seq[(String, Long)] = {
    require(!g.directed,
      "motifs_randesu(size=4) closed-form path is undirected-only; for " +
        "directed graphs use the gated motifs4Directed kernel")
    val de = g.weighted.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct().transform(graft.core.Lineage.cut).persist()
    de.count()
    val deg = de.select(col("a").as("v")).union(de.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d")).persist()
    def lsum(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.head
      if (r.isNullAt(0)) 0L else r.getAs[Number](0).longValue
    }
    // claw: sum_v C(d,3)
    val nClaw = lsum(deg.agg(sum(col("d") * (col("d") - 1) * (col("d") - 2) / 6)))
    // triangles per edge / per vertex
    val tri = Triangles.triangleTriples(g).persist()
    val triEdges = tri.select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .union(tri.select(least(col("a"), col("c")).as("a"), greatest(col("a"), col("c")).as("b")))
      .union(tri.select(least(col("b"), col("c")).as("a"), greatest(col("b"), col("c")).as("b")))
    val te = triEdges.groupBy("a", "b").agg(count(lit(1)).as("t")).persist()
    val tv = tri.select(col("a").as("v")).union(tri.select(col("b").as("v")))
      .union(tri.select(col("c").as("v")))
      .groupBy("v").agg(count(lit(1)).as("t"))
    val nDiamond = lsum(te.agg(sum(col("t") * (col("t") - 1) / 2)))
    val nPaw = lsum(tv.join(deg, Seq("v")).agg(sum(col("t") * (col("d") - 2))))
    // P4: middle-edge walks minus triangle closures
    val eWithDeg = de
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .join(te, Seq("a", "b"), "left")
      .select(((col("da") - 1) * (col("db") - 1) - coalesce(col("t"), lit(0L))).as("p"))
    val nP4 = lsum(eWithDeg.agg(sum(col("p"))))
    // C4: co-degree over wedge endpoint pairs
    val bi = de.select(col("a").as("x"), col("b").as("n"))
      .union(de.select(col("b").as("x"), col("a").as("n")))
    val w1 = bi.select(col("x"), col("n").as("u"))
    val w2 = bi.select(col("x"), col("n").as("v"))
    val codeg = w1.join(w2, Seq("x")).where(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("c"))
    val nC4 = lsum(codeg.agg(sum(col("c") * (col("c") - 1) / 2))) / 2
    val nK4 = Cliques.cliques(g, 4, 4).count()
    tri.unpersist(); te.unpersist(); deg.unpersist(); de.unpersist()
    // Möbius inversion to induced counts
    val k4 = nK4
    val diamond = nDiamond - 6 * k4
    val c4 = nC4 - diamond - 3 * k4
    val paw = nPaw - 4 * diamond - 12 * k4
    val claw = nClaw - paw - 2 * diamond - 4 * k4
    val p4 = nP4 - 4 * c4 - 2 * paw - 6 * diamond - 12 * k4
    Seq("p4" -> p4, "claw" -> claw, "c4" -> c4, "paw" -> paw,
      "diamond" -> diamond, "k4" -> k4)
  }

  /** `motifs_randesu_no(size=4)`: connected induced 4-subgraph count. */
  def motifs4Count(g: LinkGraph): Long = motifs4(g).flatten.sum

  /** `motifs_randesu(size=4)` for DIRECTED graphs (`graphobject.c:14275`):
    * the 218-class census, indexed by this engine's
    * `Graph.Isoclass(4, i, directed=True)` enumeration (same convention as
    * [[motifs3]]); None on the weakly-disconnected classes.
    *
    * Gated driver kernel (the SURVEY §2.9 bar for the combinatorial
    * families): ESU enumeration (Wernicke 2006) of connected induced
    * 4-subsets over the undirected skeleton — each subgraph visited exactly
    * once — classified in O(1) via [[Catalog.maskClassTable]]. Work is
    * proportional to the number of connected 4-subgraphs, which is
    * exponential-ish in density; hence the vertex cap with the standard
    * escape. At scale, use [[motifs4]] on the skeleton (closed-form,
    * distributed) or sampled estimates.
    */
  def motifs4Directed(g: LinkGraph, maxKernelVertices: Int = 4096): Seq[Option[Long]] =
    motifs4DirectedCensus(g, maxKernelVertices, Seq.fill(4)(0.0), seed = 0L)
      .map(_.map(_.toLong))

  /** RAND-ESU sampling (the reference's `cut_prob` argument): each ESU
    * subtree at depth d is explored with probability 1 − cutProb(d), and
    * every census hit is weighted by 1/∏(1 − cutProb(d)) — the unbiased
    * Wernicke estimator. cutProb = zeros reproduces the exact census.
    */
  def motifs4DirectedSampled(g: LinkGraph, cutProb: Seq[Double], seed: Long = 42L,
                             maxKernelVertices: Int = 4096): Seq[Option[Double]] =
    motifs4DirectedCensus(g, maxKernelVertices, cutProb, seed)

  /** `motifs_randesu_estimate(size=4, sample)` (`graphobject.c:14341`):
    * estimate the TOTAL connected-4-subgraph count by sampling ESU roots —
    * exactly cut_prob at depth 0 with the Wernicke 1/(1−p) reweighting, so
    * this is a thin wrapper over [[motifs4DirectedSampled]]. `sampleFrac`
    * is the fraction of roots explored; 1.0 reproduces the exact count.
    * (Sizes 3 / undirected 4 are closed-form distributed statistics here —
    * exact is CHEAPER than sampling, so their "estimate" is the exact
    * [[motifs3Count]] / [[motifs4Count]].)
    */
  def motifs4DirectedEstimate(g: LinkGraph, sampleFrac: Double, seed: Long = 42L,
                              maxKernelVertices: Int = 4096): Double = {
    require(sampleFrac > 0.0 && sampleFrac <= 1.0, s"sampleFrac in (0,1], got $sampleFrac")
    motifs4DirectedSampled(g, Seq(1.0 - sampleFrac, 0.0, 0.0, 0.0), seed, maxKernelVertices)
      .flatten.sum
  }

  private def motifs4DirectedCensus(g: LinkGraph, maxKernelVertices: Int,
                                    cutProb: Seq[Double], seed: Long): Seq[Option[Double]] = {
    require(g.directed, "motifs4Directed expects a directed graph; use motifs4")
    esuCensus(g, 4, maxKernelVertices, cutProb, seed)
  }

  /** RAND-ESU kernel, size 3 or 4, directed or undirected — the reference's
    * `igraph_motifs_randesu` core (Wernicke 2006). Exact census at
    * cutProb = zeros; otherwise each ESU tree level d survives with
    * probability 1 − cutProb(d) and every hit is reweighted by
    * 1/Π(1 − cutProb(d)) (unbiased). Driver kernel by design: the exact
    * DISTRIBUTED paths ([[motifs3]], [[motifs4]], [[Triads.triadCensus]])
    * are the at-scale answer; this exists for the sampling API surface.
    */
  private def esuCensus(g: LinkGraph, size: Int, maxKernelVertices: Int,
                        cutProb: Seq[Double], seed: Long): Seq[Option[Double]] = {
    require(size == 3 || size == 4, s"ESU census supports size 3 or 4, got $size")
    require(cutProb.length == size && cutProb.forall(p => p >= 0.0 && p < 1.0),
      s"cut_prob must be $size probabilities in [0,1), got $cutProb")
    val n0 = g.vcount()
    require(n0 <= maxKernelVertices,
      s"ESU $size-motif census is a driver kernel capped at $maxKernelVertices " +
        s"vertices ($n0 given); raise maxKernelVertices explicitly to override")
    val n = n0.toInt
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val pos = ids.zipWithIndex.toMap
    val adjOut = Array.fill(n)(new java.util.BitSet(n))
    val und = Array.fill(n)(new java.util.BitSet(n))
    g.weighted.select("src", "dst").where(col("src") =!= col("dst")).distinct()
      .collect().foreach { r =>
        val i = pos(r.getLong(0)); val j = pos(r.getLong(1))
        adjOut(i).set(j); und(i).set(j); und(j).set(i)
      }
    val table = Catalog.maskClassTable(size, g.directed)
    val counts = new Array[Double](Catalog.isoclassCount(size, g.directed))
    val keep = cutProb.map(p => 1.0 - p).toArray
    val exact = keep.forall(_ == 1.0)
    val weight = 1.0 / keep.product
    val rnd = new scala.util.Random(seed)
    def sampled(depth: Int): Boolean = exact || keep(depth) >= 1.0 ||
      rnd.nextDouble() < keep(depth)
    val sub = new Array[Int](size)
    def classify(): Unit = {
      var mask = 0
      var i = 0
      while (i < size) {
        var j = 0
        while (j < size) {
          if (i != j) {
            if (g.directed) {
              if (adjOut(sub(i)).get(sub(j))) mask |= 1 << Catalog.dirPairIdx(size, i, j)
            } else if (i < j && und(sub(i)).get(sub(j)))
              mask |= 1 << Catalog.undirPairIdx(i, j)
          }
          j += 1
        }
        i += 1
      }
      counts(table(mask)) += weight
    }
    // ESU: extend(subLen, ext, closed) where closed = VSub ∪ N(VSub); the
    // exclusive neighborhood of the next pick is computed against `closed`
    // BEFORE merging, so each connected size-set is emitted exactly once.
    // RAND-ESU: each pick at tree level `subLen` survives with keep(subLen).
    def extend(root: Int, subLen: Int, ext: List[Int], closed: java.util.BitSet): Unit = {
      if (subLen == size) { classify(); return }
      var rest = ext
      while (rest.nonEmpty) {
        val w = rest.head
        rest = rest.tail
        sub(subLen) = w
        if (!sampled(subLen)) ()
        else if (subLen == size - 1) classify()
        else {
          val excl = und(w).clone().asInstanceOf[java.util.BitSet]
          excl.andNot(closed)
          var ext2 = rest
          var u = excl.nextSetBit(root + 1)
          while (u >= 0) {
            ext2 = u :: ext2
            u = excl.nextSetBit(u + 1)
          }
          val closed2 = closed.clone().asInstanceOf[java.util.BitSet]
          closed2.or(und(w))
          closed2.set(w)
          extend(root, subLen + 1, ext2, closed2)
        }
      }
    }
    var v = 0
    while (v < n) {
      if (sampled(0)) {
        sub(0) = v
        val closed = und(v).clone().asInstanceOf[java.util.BitSet]
        closed.set(v)
        var ext = List.empty[Int]
        var u = und(v).nextSetBit(v + 1)
        while (u >= 0) {
          ext = u :: ext
          u = und(v).nextSetBit(u + 1)
        }
        extend(v, 1, ext, closed)
      }
      v += 1
    }
    val conn = Catalog.connectedClasses(size, g.directed)
    counts.indices.map(c => if (conn(c)) Some(counts(c)) else None)
  }

  /** `motifs_randesu(size=3, cut_prob=[...])` — RAND-ESU sampling on the
    * size-3 census (directed or undirected), closing the last recorded
    * SURVEY deviation: exact size-3 is a closed-form DISTRIBUTED statistic
    * here ([[motifs3]] — cheaper than sampling, use it at scale), but the
    * reference accepts cut_prob at every size, so the sampled face exists
    * for API parity. cutProb = zeros reproduces [[motifs3]] exactly.
    */
  def motifs3Sampled(g: LinkGraph, cutProb: Seq[Double], seed: Long = 42L,
                     maxKernelVertices: Int = 4096): Seq[Option[Double]] =
    esuCensus(g, 3, maxKernelVertices, cutProb, seed)

  /** `motifs_randesu_estimate(size=3, sample)` (`graphobject.c:14341`) via
    * root sampling, like [[motifs4DirectedEstimate]]. sampleFrac = 1.0
    * reproduces the exact [[motifs3Count]].
    */
  def motifs3Estimate(g: LinkGraph, sampleFrac: Double, seed: Long = 42L,
                      maxKernelVertices: Int = 4096): Double = {
    require(sampleFrac > 0.0 && sampleFrac <= 1.0, s"sampleFrac in (0,1], got $sampleFrac")
    motifs3Sampled(g, Seq(1.0 - sampleFrac, 0.0, 0.0), seed, maxKernelVertices)
      .flatten.sum
  }

  /** `motifs_randesu_no(size=4)` on a directed graph. */
  def motifs4DirectedCount(g: LinkGraph, maxKernelVertices: Int = 4096): Long =
    motifs4Directed(g, maxKernelVertices).flatten.sum

  /** A 3-vertex edge list is (weakly) connected iff all of 0,1,2 merge
    * under union of its endpoints.
    */
  private def connected3(edges: Seq[(Int, Int)]): Boolean = {
    val p = Array(0, 1, 2)
    def find(x: Int): Int = if (p(x) == x) x else { p(x) = find(p(x)); p(x) }
    edges.foreach { case (a, b) => p(find(a)) = find(b) }
    Seq(0, 1, 2).map(find).distinct.size == 1
  }
}
