package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph generators beyond the golden-test basics in [[LinkGraph]] —
  * random families are pure functions of (seed, indices), so the same
  * graph materializes at any parallelism (the reference routes RNG through
  * a seedable generator for the same reason, `random.c:33-60`).
  *
  * Reference registrations: `Erdos_Renyi` (`graphobject.c:12558`),
  * `Barabasi` (12475), `Watts_Strogatz` (12962), `Degree_Sequence` (12901),
  * `K_Regular` (12670), `De_Bruijn` (12525), `LCF` (12774),
  * `Full_Citation` (12602), `Full_Bipartite` (12622), `Famous` (12569).
  */
object Generators {

  /** splitmix64 (shared with the Pages corpus generator). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def u01(h: Long): Double = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble

  // --------------------------------------------------------- Erdos-Renyi

  /** G(n, p): every candidate pair keeps with probability p via a seeded
    * hash — Θ(n²) candidate space by definition; use [[erdosRenyiGnm]] for
    * sparse graphs at scale.
    */
  def erdosRenyiGnp(spark: SparkSession, n: Long, p: Double,
                    directed: Boolean = false, seed: Long = 42L): LinkGraph = {
    val v = spark.range(n)
    val pairs = v.toDF("src").crossJoin(v.select(col("id").as("dst")))
      .where(if (directed) col("src") =!= col("dst") else col("src") < col("dst"))
    val h = xxhash64(lit(seed), col("src"), col("dst"))
    val keep = (shiftrightunsigned(h, 11) + 1).cast("double") / lit((1L << 53).toDouble)
    LinkGraph(pairs.where(keep < p), directed, Some(n))
  }

  /** G(n, m): exactly m distinct non-loop edges — seeded candidate stream,
    * dedupe, take the first m by candidate index (a distributed top-k).
    */
  def erdosRenyiGnm(spark: SparkSession, n: Long, m: Long,
                    directed: Boolean = false, seed: Long = 42L): LinkGraph = {
    import spark.implicits._
    var oversample = math.max(16L, (m * 1.5).toLong)
    var result: DataFrame = null
    while (result == null) {
      val cand = spark.range(oversample).map { k =>
        val a = java.lang.Long.remainderUnsigned(mix64(seed ^ (2 * k)), n)
        val b = java.lang.Long.remainderUnsigned(mix64(seed ^ (2 * k + 1)), n)
        (k, a, b)
      }.toDF("k", "a", "b")
        .where(col("a") =!= col("b"))
        .select(col("k"),
          (if (directed) col("a") else least(col("a"), col("b"))).as("src"),
          (if (directed) col("b") else greatest(col("a"), col("b"))).as("dst"))
        .groupBy("src", "dst").agg(min("k").as("k"))
      if (cand.count() >= m) result = cand.orderBy("k").limit(m.toInt).select("src", "dst")
      else oversample *= 2
    }
    LinkGraph(result, directed, Some(n))
  }

  // ------------------------------------------------------ Watts-Strogatz

  /** Ring lattice (each vertex linked to `nei` neighbors per side) with
    * seeded rewiring of each edge's far endpoint with probability p.
    * Rewired targets avoid self-loops; parallel edges can occur with the
    * same (small) probability as in naive WS rewiring.
    */
  def wattsStrogatz(spark: SparkSession, n: Long, nei: Int, p: Double,
                    seed: Long = 42L): LinkGraph = {
    import spark.implicits._
    val e = spark.range(n).flatMap { i =>
      (1 to nei).map { d =>
        val orig = (i + d) % n
        val dst =
          if (u01(mix64(seed ^ (i * 131 + d))) < p)
            (i + 1 + java.lang.Long.remainderUnsigned(mix64(seed ^ ~(i * 131 + d)), n - 1)) % n
          else orig
        (i, dst)
      }
    }.toDF("src", "dst")
    LinkGraph(e, directed = false, Some(n))
  }

  // ----------------------------------------------------------- Barabasi

  /** Barabasi-Albert preferential attachment via the Batagelj-Brandes
    * half-edge construction, parallelized: edge e's target is resolved by
    * an independent seeded hash chain (pick a uniform prior half-edge; an
    * odd pick recurses into that edge's own target — O(log e) expected
    * depth), so every edge is a pure function of (seed, e) and the whole
    * graph generates embarrassingly parallel. Vertex i (i >= 1) attaches
    * min(i, m) edges.
    */
  /** Pure per-edge Barabasi resolver (serializable, executor-side). */
  private final case class BaGen(seed: Long, m: Long) extends Serializable {
    def edgesBefore(i: Long): Long =
      if (i <= m) i * (i - 1) / 2 else m * (m - 1) / 2 + (i - m) * m
    def vertexOf(f: Long): Long =
      if (f < m * (m - 1) / 2) ((1 + math.sqrt(1.0 + 8.0 * f)) / 2).toLong
      else m + (f - m * (m - 1) / 2) / m
    def target(e: Long): Long = {
      var cur = e
      var out = -1L
      while (out < 0) {
        if (cur == 0) out = 0L // first edge attaches to vertex 0
        else {
          val h = java.lang.Long.remainderUnsigned(
            mix64(seed ^ (cur * 0x9e3779b97f4a7c15L + 1)), 2 * cur)
          if (h % 2 == 0) out = vertexOf(h / 2)
          else cur = h / 2
        }
      }
      out
    }
  }

  def barabasi(spark: SparkSession, n: Long, m: Int, seed: Long = 42L): LinkGraph = {
    import spark.implicits._
    val gen = BaGen(seed, m.toLong)
    val e = spark.range(gen.edgesBefore(n)).map(f => (gen.vertexOf(f), gen.target(f))).toDF("src", "dst")
    LinkGraph(e, directed = false, Some(n))
  }

  // ---------------------------------------------- configuration model

  /** Degree_Sequence (configuration model): explode each vertex into
    * `deg` stubs, shuffle stubs by seeded hash (dense-ranked with the
    * distributed assigner — no global Window), pair consecutive ranks.
    * Multi-edges and self-loops can occur, exactly like the reference's
    * default method. Total degree must be even.
    */
  def degreeSequence(degrees: DataFrame, seed: Long = 42L): LinkGraph = {
    val stubs = degrees.select(col("id"), explode(sequence(lit(1L), col("deg").cast("long"))).as("k"))
    val keyed = stubs.select(struct(xxhash64(lit(seed), col("id"), col("k")).as("h"),
      col("id"), col("k")).as("key"))
    val ranked = Ids.assignDense(keyed, "key")
      .select(col("id").as("rank"), col("key.id").as("v"))
    val nStubs = ranked.count()
    require(nStubs % 2 == 0, s"degree sequence sums to odd total $nStubs")
    val paired = ranked.groupBy((col("rank") / 2).cast("long").as("pair"))
      .agg(min(struct(col("rank"), col("v"))).as("a"), max(struct(col("rank"), col("v"))).as("b"))
      .select(col("a.v").as("src"), col("b.v").as("dst"))
    LinkGraph(paired, directed = false, None)
  }

  /** K_Regular(n, k): configuration model with constant degree. */
  def kRegular(spark: SparkSession, n: Long, k: Int, seed: Long = 42L): LinkGraph = {
    val deg = spark.range(n).select(col("id"), lit(k).as("deg"))
    LinkGraph(degreeSequence(deg, seed).edges, directed = false, Some(n))
  }

  // ------------------------------------------------- deterministic extras

  /** Full_Citation(n): i -> j for every j < i (a complete DAG). */
  def fullCitation(spark: SparkSession, n: Int): LinkGraph = {
    val v = spark.range(n)
    val e = v.toDF("src").crossJoin(v.select(col("id").as("dst")))
      .where(col("dst") < col("src"))
    LinkGraph(e, directed = true, Some(n.toLong))
  }

  /** Full_Bipartite(n1, n2): all cross pairs; ids 0..n1-1 are side 0. */
  def fullBipartite(spark: SparkSession, n1: Int, n2: Int): LinkGraph = {
    val a = spark.range(n1).toDF("src")
    val b = spark.range(n1, n1 + n2).select(col("id").as("dst"))
    LinkGraph(a.crossJoin(b), directed = false, Some((n1 + n2).toLong))
  }

  /** De_Bruijn(m, n): m^n vertices, arc i -> (i*m + j) mod m^n for each
    * symbol j (loops/multi-edges included, like the reference).
    */
  def deBruijn(spark: SparkSession, m: Int, n: Int): LinkGraph = {
    val size = math.pow(m, n).toLong
    val v = spark.range(size)
    val e = v.toDF("src").crossJoin(spark.range(m).select(col("id").as("j")))
      .select(col("src"), ((col("src") * m + col("j")) % size).as("dst"))
    LinkGraph(e, directed = true, Some(size))
  }

  /** LCF notation: ring 0..n-1 plus chord i -> (i + shifts(i mod |shifts|))
    * mod n, n = |shifts| * repeats; duplicate chords collapse.
    */
  def lcf(spark: SparkSession, shifts: Seq[Int], repeats: Int): LinkGraph = {
    val n = shifts.size * repeats
    val ring = LinkGraph.ring(spark, n).weighted.select("src", "dst")
    val shiftDf = {
      import spark.implicits._
      shifts.zipWithIndex.map { case (s, i) => (i.toLong, s.toLong) }.toDF("idx", "shift")
    }
    val chords = spark.range(n).select(col("id").as("src"), (col("id") % shifts.size).as("idx"))
      .join(broadcast(shiftDf), Seq("idx"))
      .select(col("src"), pmod(col("src") + col("shift"), lit(n.toLong)).as("dst"))
      .select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    val ringCanon = ring.select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
    LinkGraph(ringCanon.union(chords).distinct(), directed = false, Some(n.toLong))
  }

  /** Famous named graphs (`graphobject.c:12569`) — the ones the reference
    * test-suite leans on. Edge lists are public-domain graph data.
    */
  def famous(spark: SparkSession, name: String): LinkGraph = {
    val (n, edges) = name.toLowerCase match {
      case "bull" => (5, Seq((0, 1), (0, 2), (1, 2), (1, 3), (2, 4)))
      case "house" => (5, Seq((0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4)))
      case "petersen" => (10, Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
        (0, 5), (1, 6), (2, 7), (3, 8), (4, 9),
        (5, 7), (7, 9), (9, 6), (6, 8), (8, 5)))
      case "zachary" => (34, Seq(
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10), (0, 11),
        (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2), (1, 3), (1, 7),
        (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3), (2, 7), (2, 8), (2, 9),
        (2, 13), (2, 27), (2, 28), (2, 32), (3, 7), (3, 12), (3, 13), (4, 6), (4, 10),
        (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32), (8, 33), (9, 33), (13, 33),
        (14, 32), (14, 33), (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32),
        (20, 33), (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
        (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33), (28, 31),
        (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32), (31, 33), (32, 33)))
      case other => throw new IllegalArgumentException(s"unknown famous graph: $other")
    }
    LinkGraph(spark, n.toLong, edges.map { case (a, b) => (a.toLong, b.toLong) }, directed = false)
  }
}
