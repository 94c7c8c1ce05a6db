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
    // same guard as staticFitness (ADVICE r2): without it the retry loop
    // never terminates when m exceeds the simple-graph capacity
    val capacity = if (directed) n * (n - 1) else n * (n - 1) / 2
    require(m <= capacity,
      s"erdosRenyiGnm: m=$m exceeds the simple-graph capacity $capacity for n=$n")
    require(m <= Int.MaxValue, s"erdosRenyiGnm caps m at Int.MaxValue (got $m)")
    var oversample = math.max(16L, (m * 1.5).toLong)
    var retries = 0
    var result: DataFrame = null
    while (result == null) {
      require(retries <= 40,
        s"erdosRenyiGnm: candidate pool plateaued below m=$m after $retries doublings")
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
      else { oversample *= 2; retries += 1 }
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

  // ----------------------------------------------- geometric / block models

  /** GRG (geometric random graph, `graphobject.c:12629`; Py wrapper
    * `__init__.py:3321`): n seeded uniform points in the unit square,
    * edge iff distance ≤ radius. Distributed shape: grid-cell bucketing
    * with cell width ≥ radius — candidates come from the 3×3 neighbor
    * cells only (a classic spatial self-join), never all pairs.
    * Returns the graph; point coordinates are on `points` for callers
    * that need the layout (the reference returns them as vertex attrs).
    */
  def grg(spark: SparkSession, n: Long, radius: Double, torus: Boolean = false,
          seed: Long = 42L): (LinkGraph, DataFrame) = {
    import spark.implicits._
    val cells = math.max(1L, math.floor(1.0 / radius).toLong)
    val pts = spark.range(n).map { i =>
      (i, u01(mix64(seed ^ (2 * i))), u01(mix64(seed ^ (2 * i + 1))))
    }.toDF("id", "x", "y")
      .withColumn("cx", least(floor(col("x") * cells), lit(cells - 1)).cast("long"))
      .withColumn("cy", least(floor(col("y") * cells), lit(cells - 1)).cast("long"))
      .persist()
    pts.count()
    val offsets = Seq(-1L, 0L, 1L)
    val probes = offsets.flatMap(dx => offsets.map(dy => (dx, dy))).toDF("dx", "dy")
    val wrap: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      if (torus) (c, d) => pmod(c + d, lit(cells)) else (c, d) => c + d
    val left = pts.crossJoin(broadcast(probes))
      .select(col("id").as("a"), col("x").as("xa"), col("y").as("ya"),
        wrap(col("cx"), col("dx")).as("kx"), wrap(col("cy"), col("dy")).as("ky"))
    val right = pts.select(col("id").as("b"), col("x").as("xb"), col("y").as("yb"),
      col("cx").as("kx"), col("cy").as("ky"))
    def axisDist(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) = {
      val d = abs(p - q)
      if (torus) least(d, lit(1.0) - d) else d
    }
    val dx = axisDist(col("xa"), col("xb"))
    val dy = axisDist(col("ya"), col("yb"))
    val e = left.join(right, Seq("kx", "ky"))
      .where(col("a") < col("b") && dx * dx + dy * dy <= lit(radius * radius))
      .select(col("a").as("src"), col("b").as("dst")).distinct()
    (LinkGraph(e, directed = false, Some(n)), pts.select("id", "x", "y"))
  }

  /** SBM (stochastic block model, `graphobject.c:12732`; structural test
    * `test_generators.py:207-235`): vertex blocks by size, pair (u,v) kept
    * with the block-pair probability. Only block pairs with p > 0 generate
    * candidates, so sparse preference matrices skip the dead cross space.
    */
  def sbm(spark: SparkSession, pref: Seq[Seq[Double]], blockSizes: Seq[Long],
          directed: Boolean = false, loops: Boolean = false,
          seed: Long = 42L): LinkGraph = {
    val n = blockSizes.sum
    require(pref.size == blockSizes.size && pref.forall(_.size == blockSizes.size),
      "pref matrix must be k x k for k blocks")
    require(pref.flatten.forall(p => p >= 0.0 && p <= 1.0), "probabilities must be in [0,1]")
    if (!directed)
      for (i <- pref.indices; j <- pref.indices)
        require(math.abs(pref(i)(j) - pref(j)(i)) < 1e-12, "pref matrix must be symmetric (undirected)")
    val starts = blockSizes.scanLeft(0L)(_ + _)
    val parts = for {
      bi <- pref.indices
      bj <- pref.indices
      if pref(bi)(bj) > 0.0 && (directed || bi <= bj)
    } yield {
      val a = spark.range(starts(bi), starts(bi + 1)).toDF("src")
      val b = spark.range(starts(bj), starts(bj + 1)).select(col("id").as("dst"))
      val pairCond =
        if (directed) { if (loops) lit(true) else col("src") =!= col("dst") }
        else if (bi == bj) { if (loops) col("src") <= col("dst") else col("src") < col("dst") }
        else lit(true)
      val h = xxhash64(lit(seed), col("src"), col("dst"))
      val keep = (shiftrightunsigned(h, 11) + 1).cast("double") / lit((1L << 53).toDouble)
      a.crossJoin(b).where(pairCond && keep < pref(bi)(bj))
    }
    val e = parts.reduceOption(_ union _)
      .getOrElse(spark.range(0).select(col("id").as("src"), col("id").as("dst")))
    LinkGraph(e, directed, Some(n))
  }

  /** Preference(n, type_dist, pref_matrix) (`graphobject.c:12685`): types
    * sampled from `typeDist` by seeded hash, then SBM-style pair keep.
    * Candidate space is Θ(n²) like GNP (types are not contiguous); returns
    * (graph, types) since the reference stores types as a vertex attribute.
    */
  def preference(spark: SparkSession, n: Long, typeDist: Seq[Double],
                 pref: Seq[Seq[Double]], directed: Boolean = false,
                 seed: Long = 42L): (LinkGraph, DataFrame) = {
    val k = typeDist.size
    val total = typeDist.sum
    val cum = typeDist.scanLeft(0.0)(_ + _).map(_ / total)
    val u = (shiftrightunsigned(xxhash64(lit(seed ^ 0x7f), col("id")), 11) + 1)
      .cast("double") / lit((1L << 53).toDouble)
    // type = index of the first cumulative boundary above u
    val tcol = (1 to k).foldRight(lit(k - 1)) { case (i, acc) =>
      when(u < cum(i), lit(i - 1)).otherwise(acc)
    }
    val types = spark.range(n).select(col("id"), tcol.as("vtype")).persist()
    types.count()
    val pm = { import spark.implicits._
      (for (i <- 0 until k; j <- 0 until k) yield (i, j, pref(i)(j))).toDF("ta", "tb", "p") }
    val a = types.select(col("id").as("src"), col("vtype").as("ta"))
    val b = types.select(col("id").as("dst"), col("vtype").as("tb"))
    val pairCond = if (directed) col("src") =!= col("dst") else col("src") < col("dst")
    val h = xxhash64(lit(seed), col("src"), col("dst"))
    val keep = (shiftrightunsigned(h, 11) + 1).cast("double") / lit((1L << 53).toDouble)
    val e = a.crossJoin(b).where(pairCond)
      .join(broadcast(pm), Seq("ta", "tb"))
      .where(keep < col("p"))
      .select("src", "dst")
    (LinkGraph(e, directed, Some(n)), types)
  }

  /** Establishment(n, k, type_dist, pref_matrix, directed)
    * (`graphobject.c:2262,12542`; igraph_establishment_game): the GROWING
    * typed-preference model — one vertex per time step, the new vertex makes
    * `k` connection trials to uniformly random already-present vertices,
    * each trial realized with the type-pair probability (the reference docs
    * call Preference "practically the nongrowing variant" of this,
    * `graphobject.c:12689`). The first `k` vertices seed the graph with no
    * trials of their own, matching the reference's loop start.
    *
    * Spark-first shape: a trial's outcome depends only on (new vertex,
    * trial index) — never on previously realized edges — so all n·k trials
    * evaluate in one map + two hash joins against the type table (partner
    * type lookup) + one broadcast join (pref matrix). No sequential growth
    * loop survives into the plan; scales like a degree computation.
    * Multi-edges possible (two trials may draw the same partner), loops
    * impossible — both exactly as in the reference.
    */
  def establishment(spark: SparkSession, n: Long, k: Int, typeDist: Seq[Double],
                    pref: Seq[Seq[Double]], directed: Boolean = false,
                    seed: Long = 42L): (LinkGraph, DataFrame) = {
    val kt = typeDist.size
    require(k >= 1 && n > k, "Establishment needs n > k >= 1")
    require(pref.size == kt && pref.forall(_.size == kt),
      "pref matrix must be kt x kt for kt types")
    require(pref.flatten.forall(p => p >= 0.0 && p <= 1.0), "probabilities must be in [0,1]")
    val total = typeDist.sum
    val cum = typeDist.scanLeft(0.0)(_ + _).map(_ / total)
    val u = (shiftrightunsigned(xxhash64(lit(seed ^ 0x7f), col("id")), 11) + 1)
      .cast("double") / lit((1L << 53).toDouble)
    val tcol = (1 to kt).foldRight(lit(kt - 1)) { case (i, acc) =>
      when(u < cum(i), lit(i - 1)).otherwise(acc)
    }
    val types = spark.range(n).select(col("id"), tcol.as("vtype")).persist()
    types.count()
    val pm = { import spark.implicits._
      (for (i <- 0 until kt; j <- 0 until kt) yield (i, j, pref(i)(j))).toDF("ta", "tb", "p") }
    // (n - k) * k trial rows, generated flat: src = k + trialId / k steps
    // through the growth order, partner uniform over the vertices already
    // present [0, src) via a seeded hash mod
    val trials = spark.range((n - k) * k.toLong).select(
      (lit(k.toLong) + floor(col("id") / lit(k)).cast("long")).as("src"),
      (col("id") % k).as("trial"))
    val cand = trials.select(col("src"), col("trial"),
      pmod(xxhash64(lit(seed), col("src"), col("trial")), col("src")).as("dst"))
    val keep = (shiftrightunsigned(
      xxhash64(lit(seed ^ 0x5ba3L), col("src"), col("trial")), 11) + 1)
      .cast("double") / lit((1L << 53).toDouble)
    val e = cand
      .join(types.select(col("id").as("src"), col("vtype").as("ta")), Seq("src"))
      .join(types.select(col("id").as("dst"), col("vtype").as("tb")), Seq("dst"))
      .join(broadcast(pm), Seq("ta", "tb"))
      .where(keep < col("p"))
      .select("src", "dst")
    (LinkGraph(e, directed, Some(n)), types)
  }

  /** Asymmetric_Preference(n, type_dist_matrix, pref_matrix, loops)
    * (`graphobject.c:2986,12436`; igraph_asymmetric_preference_game): every
    * vertex draws a JOINT (out-type, in-type) pair from `typeDistMatrix`
    * (cell (i,j) = P(out=i, in=j)), then every ordered pair (u,v) gets a
    * directed edge with probability `pref(outType(u))(inType(v))`. Always
    * directed (that is the point of the asymmetry).
    *
    * Same SBM-style declarative shape as [[preference]]: Θ(n²) candidate
    * space, one broadcast pref-matrix join, seeded-hash coins — Catalyst
    * sees one cross join + filter, no growth loop.
    */
  def asymmetricPreference(spark: SparkSession, n: Long,
                           typeDistMatrix: Seq[Seq[Double]], pref: Seq[Seq[Double]],
                           loops: Boolean = false,
                           seed: Long = 42L): (LinkGraph, DataFrame) = {
    val kt = typeDistMatrix.size
    require(typeDistMatrix.forall(_.size == kt) && pref.size == kt && pref.forall(_.size == kt),
      "typeDistMatrix and pref must both be kt x kt")
    require(pref.flatten.forall(p => p >= 0.0 && p <= 1.0), "probabilities must be in [0,1]")
    val cells = for (i <- 0 until kt; j <- 0 until kt) yield typeDistMatrix(i)(j)
    val total = cells.sum
    val cum = cells.scanLeft(0.0)(_ + _).map(_ / total)
    val u = (shiftrightunsigned(xxhash64(lit(seed ^ 0x7f), col("id")), 11) + 1)
      .cast("double") / lit((1L << 53).toDouble)
    val cellCol = (1 to kt * kt).foldRight(lit(kt * kt - 1)) { case (i, acc) =>
      when(u < cum(i), lit(i - 1)).otherwise(acc)
    }
    val types = spark.range(n).select(col("id"),
      (cellCol / kt).cast("int").as("outType"), (cellCol % kt).as("inType")).persist()
    types.count()
    val pm = { import spark.implicits._
      (for (i <- 0 until kt; j <- 0 until kt) yield (i, j, pref(i)(j))).toDF("ta", "tb", "p") }
    val a = types.select(col("id").as("src"), col("outType").as("ta"))
    val b = types.select(col("id").as("dst"), col("inType").as("tb"))
    val pairCond = if (loops) lit(true) else col("src") =!= col("dst")
    val keep = (shiftrightunsigned(xxhash64(lit(seed), col("src"), col("dst")), 11) + 1)
      .cast("double") / lit((1L << 53).toDouble)
    val e = a.crossJoin(b).where(pairCond)
      .join(broadcast(pm), Seq("ta", "tb"))
      .where(keep < col("p"))
      .select("src", "dst")
    (LinkGraph(e, directed = true, Some(n)), types)
  }

  // ------------------------------------------- fitness-weighted edge models

  /** Distributed prefix sums over (id, w) in id order: per-partition sums
    * + broadcast offsets (same pattern as [[Ids.assignDense]] — no global
    * Window). Returns (id, w, lo, hi) with [lo, hi) the half-open
    * cumulative interval of each id.
    */
  def prefixWeights(weights: DataFrame): DataFrame = {
    val spark = weights.sparkSession
    val sorted = weights.select(col("id").cast("long"), col("w").cast("double"))
      .repartitionByRange(32, col("id"))
      .sortWithinPartitions("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      Iterator((pi, it.map(_.getDouble(1)).sum))
    }.collect().sortBy(_._1)
    val offset: Map[Int, Double] = {
      var acc = 0.0
      sums.map { case (pi, s) => val o = (pi, acc); acc += s; o }.toMap
    }
    val bc = spark.sparkContext.broadcast(offset)
    val rows = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      var acc = bc.value.getOrElse(pi, 0.0)
      it.map { r =>
        val w = r.getDouble(1)
        val out = org.apache.spark.sql.Row(r.getLong(0), w, acc, acc + w)
        acc += w
        out
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.DoubleType, false),
      org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.DoubleType, false),
      org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.DoubleType, false)))
    val out = Lineage.cut(spark.createDataFrame(rows, schema))
    sorted.unpersist()
    out
  }

  /** Weighted sampling by inverse CDF: for each sample row (k, u) with
    * u ∈ [0, 1), find the id whose cumulative interval contains u·total.
    * The interval join is bucketed (intervals exploded over the coarse
    * buckets they span, samples hit one bucket) — an equi-join, not a
    * range join, so it scales.
    */
  def sampleByWeight(weights: DataFrame, samples: DataFrame): DataFrame = {
    val iv = prefixWeights(weights).persist()
    val total = iv.agg(max("hi")).head.getDouble(0)
    val nIds = iv.count()
    val nB = math.max(1L, nIds)
    val ivB = iv.withColumn("bucket",
      explode(sequence(least(floor(col("lo") / total * nB), lit(nB - 1)).cast("long"),
        least(floor(col("hi") / total * nB), lit(nB - 1)).cast("long"))))
    val sB = samples.select(col("k"), (col("u") * total).as("x"))
      .withColumn("bucket", least(floor(col("x") / total * nB), lit(nB - 1)).cast("long"))
    val out = sB.join(ivB, Seq("bucket"))
      .where(col("x") >= col("lo") && col("x") < col("hi"))
      .select(col("k"), col("id"))
    iv.unpersist(blocking = false)
    out
  }

  /** Static_Fitness(m, fitness) (`graphobject.c:12834`): m edges with
    * endpoint probability ∝ fitness; loops and multi-edges rejected by
    * oversample-dedupe-take-first-m (the same pattern as
    * [[erdosRenyiGnm]]). `fitnessIn` switches to the directed variant.
    */
  def staticFitness(spark: SparkSession, m: Long, fitness: DataFrame,
                    fitnessIn: Option[DataFrame] = None,
                    seed: Long = 42L): LinkGraph = {
    import spark.implicits._
    val directed = fitnessIn.isDefined
    require(m <= Int.MaxValue, s"staticFitness caps m at Int.MaxValue (got $m)")
    // up-front capacity check (ADVICE r2: the oversample-retry loop never
    // terminates when m exceeds the realizable simple-edge count): only
    // positive-fitness vertices can be sampled; lower-bound the capacity
    // (directed: |out⁺|·|in⁺| − |out⁺ ∩ in⁺| ≥ |out⁺|·|in⁺| − min(...))
    val nPos = fitness.where(col("w") > 0).count()
    val capacity: Double = fitnessIn match {
      case None => nPos.toDouble * (nPos - 1).toDouble / 2.0
      case Some(fi) =>
        val nIn = fi.where(col("w") > 0).count()
        nPos.toDouble * nIn.toDouble - math.min(nPos, nIn).toDouble
    }
    require(m.toDouble <= capacity,
      s"staticFitness: m=$m exceeds the realizable simple-edge capacity (~${capacity.toLong}) " +
        "of the positive-fitness vertex set")
    var oversample = math.max(32L, (m * 1.6).toLong)
    var retries = 0
    var result: DataFrame = null
    while (result == null) {
      require(retries <= 24,
        s"staticFitness: candidate pool plateaued below m=$m after $retries oversample " +
          "doublings — fitness mass too concentrated to realize m simple edges in practice")
      val us = spark.range(oversample)
        .map(k => (k, u01(mix64(seed ^ (2 * k))))).toDF("k", "u")
      val vs = spark.range(oversample)
        .map(k => (k, u01(mix64(seed ^ (2 * k + 1))))).toDF("k", "u")
      val srcs = sampleByWeight(fitness, us).select(col("k"), col("id").as("a"))
      val dsts = sampleByWeight(fitnessIn.getOrElse(fitness), vs)
        .select(col("k"), col("id").as("b"))
      val cand = srcs.join(dsts, Seq("k"))
        .where(col("a") =!= col("b"))
        .select(col("k"),
          (if (directed) col("a") else least(col("a"), col("b"))).as("src"),
          (if (directed) col("b") else greatest(col("a"), col("b"))).as("dst"))
        .groupBy("src", "dst").agg(min("k").as("k"))
      if (cand.count() >= m) result = cand.orderBy("k").limit(m.toInt).select("src", "dst")
      else { oversample *= 2; retries += 1 }
    }
    LinkGraph(result, directed, None)
  }

  /** Static_Power_Law(n, m, exponent) (`graphobject.c:12858`): fitness
    * f_i = (i + 1)^(−1/(γ−1)) then [[staticFitness]] — the igraph
    * construction for expected power-law degree exponent γ.
    */
  def staticPowerLaw(spark: SparkSession, n: Long, m: Long, exponent: Double,
                     seed: Long = 42L): LinkGraph = {
    require(exponent > 2.0, "exponent must be > 2")
    val alpha = 1.0 / (exponent - 1.0)
    val fit = spark.range(n).select(col("id"), pow(col("id") + 1, -alpha).as("w"))
    val g = staticFitness(spark, m, fit, None, seed)
    LinkGraph(g.edges, directed = false, Some(n))
  }

  // ------------------------------------------------------ incremental models

  /** Growing_Random(n, m) (`graphobject.c:12636`): vertex i > 0 attaches
    * m edges to uniform earlier vertices — each edge a pure function of
    * (seed, i, j), embarrassingly parallel.
    */
  def growingRandom(spark: SparkSession, n: Long, m: Int, seed: Long = 42L): LinkGraph = {
    import spark.implicits._
    val e = spark.range(1, n).flatMap { i =>
      (0 until m).map { j =>
        (i, java.lang.Long.remainderUnsigned(mix64(seed ^ (i * 131 + j)), i))
      }
    }.toDF("src", "dst")
    LinkGraph(e, directed = false, Some(n))
  }

  /** Random_Bipartite(n1, n2, p) (`graphobject.c:12704`): GNP restricted
    * to cross pairs; ids 0..n1-1 are side 0 (matching [[fullBipartite]]).
    */
  def randomBipartite(spark: SparkSession, n1: Long, n2: Long, p: Double,
                      directed: Boolean = false, seed: Long = 42L): LinkGraph = {
    val a = spark.range(n1).toDF("src")
    val b = spark.range(n1, n1 + n2).select(col("id").as("dst"))
    val h = xxhash64(lit(seed), col("src"), col("dst"))
    val keep = (shiftrightunsigned(h, 11) + 1).cast("double") / lit((1L << 53).toDouble)
    LinkGraph(a.crossJoin(b).where(keep < p), directed, Some(n1 + n2))
  }

  /** Tree_Game(n) (`graphobject.c:12944`): uniform random labeled tree via
    * a seeded Prüfer sequence (Cayley bijection — exactly uniform). The
    * decode is inherently sequential, so it is a driver kernel capped at
    * [[treeGameCap]]; above that use [[barabasi]]/[[LinkGraph.tree]].
    */
  val treeGameCap = 2000000L
  def treeGame(spark: SparkSession, n: Long, seed: Long = 42L): LinkGraph = {
    require(n <= treeGameCap, s"treeGame driver kernel capped at $treeGameCap vertices")
    if (n <= 1) return LinkGraph(spark, n, Seq.empty, directed = false)
    if (n == 2) return LinkGraph(spark, 2, Seq((0L, 1L)), directed = false)
    val ni = n.toInt
    fromPrufer(spark, Seq.tabulate(ni - 2)(i =>
      java.lang.Long.remainderUnsigned(mix64(seed ^ i.toLong), n).toInt))
  }

  /** Prüfer-sequence decode — the labeled tree on n = len + 2 vertices whose
    * Prüfer code is `prufer` (the `Graph.Prufer` constructor analog; also
    * the inner step of [[treeGame]], since uniform Prüfer codes == uniform
    * labeled trees). Inverse of `Extras.toPrufer` (round-trip tested).
    */
  def fromPrufer(spark: SparkSession, prufer: Seq[Int]): LinkGraph = {
    import spark.implicits._
    val ni = prufer.length + 2
    require(prufer.forall(p => p >= 0 && p < ni),
      s"Prüfer entries must be vertex ids in [0, $ni)")
    val deg = Array.fill(ni)(1)
    prufer.foreach(deg(_) += 1)
    val leaves = scala.collection.mutable.PriorityQueue.empty[Int](Ordering[Int].reverse)
    (0 until ni).foreach(v => if (deg(v) == 1) leaves.enqueue(v))
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    prufer.foreach { p =>
      val leaf = leaves.dequeue()
      edges += ((math.min(leaf, p).toLong, math.max(leaf, p).toLong))
      deg(p) -= 1
      if (deg(p) == 1) leaves.enqueue(p)
    }
    val last = (leaves.dequeue(), leaves.dequeue())
    edges += ((math.min(last._1, last._2).toLong, math.max(last._1, last._2).toLong))
    LinkGraph(edges.toSeq.toDF("src", "dst"), directed = false, Some(ni.toLong))
  }

  /** Kautz(m, n) (`graphobject.c:12663`; test `test_generators.py:193-198`):
    * vertices = length-(n+1) strings over an (m+1)-symbol alphabet with no
    * repeated adjacent symbols; arcs shift left and append. Closed-form id
    * codec (first symbol + base-m offsets), mapped in parallel.
    */
  def kautz(spark: SparkSession, m: Int, n: Int): LinkGraph = {
    import spark.implicits._
    val pow = Array.iterate(1L, n + 1)(_ * m)
    val size = (m + 1).toLong * pow(n)
    val e = spark.range(size).flatMap { id =>
      // decode symbols s0..sn
      val s = new Array[Int](n + 1)
      s(0) = (id / pow(n)).toInt
      var rest = id % pow(n)
      for (i <- 1 to n) {
        val o = (rest / pow(n - i)).toInt % m
        s(i) = (s(i - 1) + 1 + o) % (m + 1)
        rest = rest % pow(n - i)
      }
      // successors: strings s1..sn,t for every t != sn
      (0 to m).filter(_ != s(n)).map { t =>
        val ns = s.drop(1) :+ t
        var tid = ns(0).toLong * pow(n)
        for (i <- 1 to n) {
          val o = ((ns(i) - ns(i - 1) - 1) % (m + 1) + (m + 1)) % (m + 1)
          tid += o.toLong * pow(n - i)
        }
        (id, tid)
      }
    }.toDF("src", "dst")
    LinkGraph(e, directed = true, Some(size))
  }

  /** Realize_Degree_Sequence (`graphobject.c:12789`; test
    * `test_generators.py:138-190`): deterministic Havel-Hakimi realization.
    * `method`: "smallest" / "largest" / "index" pick which vertex's stubs
    * are wired next; always connects to the largest remaining degrees
    * (which is what guarantees a simple realization exists whenever the
    * sequence is graphical). Driver kernel — realization is sequential.
    */
  def realizeDegreeSequence(spark: SparkSession, degrees: Seq[Int],
                            inDegrees: Option[Seq[Int]] = None,
                            method: String = "smallest"): LinkGraph = {
    import spark.implicits._
    val meth = method.toLowerCase
    require(Seq("smallest", "largest", "index").contains(meth), s"unknown method $method")
    inDegrees match {
      case None =>
        val n = degrees.size
        require(degrees.sum % 2 == 0, "degree sum must be even")
        val rem = degrees.toArray
        val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val order = 0 until n
        var progressing = true
        while (progressing) {
          val pending = order.filter(rem(_) > 0)
          if (pending.isEmpty) progressing = false
          else {
            val v = meth match {
              case "smallest" => pending.minBy(x => (rem(x), x))
              case "largest"  => pending.maxBy(x => (rem(x), -x))
              case "index"    => pending.head
            }
            val targets = pending.filter(_ != v).sortBy(x => (-rem(x), x)).take(rem(v))
            require(targets.size == rem(v), s"degree sequence not graphical (stuck at vertex $v)")
            targets.foreach { u =>
              edges += ((math.min(v, u).toLong, math.max(v, u).toLong))
              rem(u) -= 1
            }
            rem(v) = 0
          }
        }
        LinkGraph(edges.toSeq.toDF("src", "dst"), directed = false, Some(n.toLong))
      case Some(ins) =>
        val n = degrees.size
        require(ins.size == n && degrees.sum == ins.sum, "out/in degree sums must match")
        val remOut = degrees.toArray
        val remIn = ins.toArray
        val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val order = 0 until n
        var progressing = true
        while (progressing) {
          val pending = order.filter(remOut(_) > 0)
          if (pending.isEmpty) progressing = false
          else {
            val v = meth match {
              case "smallest" => pending.minBy(x => (remOut(x), x))
              case "largest"  => pending.maxBy(x => (remOut(x), -x))
              case "index"    => pending.head
            }
            val targets = order.filter(u => u != v && remIn(u) > 0)
              .sortBy(x => (-remIn(x), x)).take(remOut(v))
            require(targets.size == remOut(v), "degree sequence not realizable (simple digraph)")
            targets.foreach { u => edges += ((v.toLong, u.toLong)); remIn(u) -= 1 }
            remOut(v) = 0
          }
        }
        LinkGraph(edges.toSeq.toDF("src", "dst"), directed = true, Some(n.toLong))
    }
  }

  /** Famous named graphs (`graphobject.c:12569`) — the ones the reference
    * test-suite leans on, plus the standard catalog entries constructible
    * from public-domain graph data (LCF notation for the cubic ones,
    * classical constructions otherwise). Remaining catalog names
    * (Folkman, Herschel, Meredith, Nonline, Noperfectmatching, Robertson,
    * Smallestcyclicgroup, Thomassen, Tutte, Uniquely3colorable, Walther)
    * are documented exclusions: their published edge tables are not
    * available in this sandbox and guessing them would be worse than
    * erroring.
    */
  def famous(spark: SparkSession, name: String): LinkGraph = {
    name.toLowerCase match {
      // cubic graphs with standard LCF notation
      case "dodecahedral" | "dodecahedron" =>
        return lcf(spark, Seq(10, 7, 4, -4, -7, 10, -4, 7, -7, 4), 2)
      case "franklin" => return lcf(spark, Seq(5, -5), 6)
      case "frucht" =>
        return lcf(spark, Seq(-5, -2, -4, 2, 5, -2, 2, 5, -2, -5, 4, 2), 1)
      case "heawood" => return lcf(spark, Seq(5, -5), 7)
      case "levi" => return lcf(spark, Seq(-13, -9, 7, -7, 9, 13), 5)
      case "mcgee" => return lcf(spark, Seq(12, 7, -7), 8)
      case "pappus" => return lcf(spark, Seq(5, 7, -7, 7, -7, -5), 3)
      case _ =>
    }
    val (n, edges) = name.toLowerCase match {
      case "bull" => (5, Seq((0, 1), (0, 2), (1, 2), (1, 3), (2, 4)))
      case "house" => (5, Seq((0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4)))
      case "housex" => (5, Seq((0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4),
        (0, 3), (1, 2)))
      case "diamond" => (4, Seq((0, 1), (0, 2), (1, 2), (1, 3), (2, 3)))
      case "tetrahedral" | "tetrahedron" =>
        (4, Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)))
      case "cubical" => (8, Seq((0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)))
      case "octahedral" | "octahedron" =>
        // K_{2,2,2}: all pairs except the three antipodal ones
        (6, (for { i <- 0 until 6; j <- i + 1 until 6
                   if !(j == i + 1 && i % 2 == 0) } yield (i, j)).toSeq)
      case "icosahedral" | "icosahedron" =>
        // apex 0, upper ring 1-5, lower ring 6-10, antapex 11
        (12, (1 to 5).map(i => (0, i)) ++
          (1 to 5).map(i => (i, 1 + i % 5)) ++
          (6 to 10).map(i => (i, 6 + (i - 5) % 5)) ++
          (6 to 10).map(i => (i, 11)) ++
          (1 to 5).flatMap(i => Seq((i, i + 5), (i, 6 + i % 5))))
      case "chvatal" => (12, Seq((0, 1), (0, 4), (0, 6), (0, 9), (1, 2), (1, 5),
        (1, 7), (2, 3), (2, 6), (2, 8), (3, 4), (3, 7), (3, 9), (4, 5), (4, 8),
        (5, 10), (5, 11), (6, 10), (6, 11), (7, 8), (7, 11), (8, 10), (9, 10),
        (9, 11)))
      case "coxeter" =>
        // three heptagrams {7/1},{7/2},{7/3} (a=0-6, b=7-13, c=14-20) plus a
        // 7-vertex hub (21-27) spoked to matching positions — the classical
        // construction; 28 vertices, 42 edges, 3-regular, girth 7
        val a = (0 until 7).map(i => (i, (i + 1) % 7))
        val b = (0 until 7).map(i => (7 + i, 7 + (i + 2) % 7))
        val c = (0 until 7).map(i => (14 + i, 14 + (i + 3) % 7))
        val spokes = (0 until 7).flatMap(i => Seq((21 + i, i), (21 + i, 7 + i), (21 + i, 14 + i)))
        (28, a ++ b ++ c ++ spokes)
      case "grotzsch" =>
        // Mycielskian of C5: cycle 0-4, shadows 5-9, apex 10
        val cyc = (0 until 5).map(i => (i, (i + 1) % 5))
        val shadow = (0 until 5).flatMap(i => Seq((5 + i, (i + 1) % 5), (5 + i, (i + 4) % 5)))
        val apex = (0 until 5).map(i => (10, 5 + i))
        (11, cyc ++ shadow ++ apex)
      case "krackhardt_kite" => (10, Seq((0, 1), (0, 2), (0, 3), (0, 5), (1, 3),
        (1, 4), (1, 6), (2, 3), (2, 5), (3, 4), (3, 5), (3, 6), (4, 6), (5, 6),
        (5, 7), (6, 7), (7, 8), (8, 9)))
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

  // ------------------------------------- sequential growth-model kernels
  // Forest_Fire and Recent_Degree are inherently sequential global-state
  // samplers (each step's distribution depends on the whole graph so far),
  // so like Infomap/CommunityKernels they run as require-gated driver
  // kernels; the reference's own tests are structural smoke checks
  // (`tests/test_games.py:15-23`).

  val maxKernelVertices = 200000L

  /** Forest_Fire(n, fw_prob, bw_factor, ambs, directed)
    * (`graphobject.c:12582-12600`; Leskovec, Kleinberg & Faloutsos 2005,
    * "Graphs over time" — public): each new vertex picks `ambs` uniform
    * ambassadors and burns through the existing graph (forward spread
    * geometric with parameter fw_prob, backward scaled by bw_factor), then
    * links to every burned vertex. Seeded, deterministic.
    */
  def forestFire(spark: SparkSession, n: Long, fwProb: Double, bwFactor: Double = 0.0,
                 ambs: Int = 1, directed: Boolean = false, seed: Long = 42L): LinkGraph = {
    require(n <= maxKernelVertices,
      s"forestFire is a sequential driver kernel, capped at $maxKernelVertices vertices")
    require(fwProb >= 0.0 && fwProb < 1.0, "fw_prob must be in [0, 1)")
    val rng = new scala.util.Random(seed)
    val out = Array.fill(n.toInt)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val in = Array.fill(n.toInt)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // geometric: number of failures before first success with p = 1 - fwProb
    // (igraph burns geom(1 - fw_prob) neighbors per burning vertex)
    def geom(p: Double): Int =
      if (p >= 1.0) 0
      else math.min(1000, (math.log(rng.nextDouble()) / math.log(p)).toInt)
    for (v <- 1 until n.toInt) {
      val visited = scala.collection.mutable.Set.empty[Int]
      val queue = scala.collection.mutable.Queue.empty[Int]
      val nAmb = math.min(ambs, v)
      while (visited.size < nAmb) {
        val a = rng.nextInt(v)
        if (!visited(a)) { visited += a; queue.enqueue(a) }
      }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        val fw = geom(fwProb)
        val bw = if (bwFactor > 0) geom(fwProb * bwFactor) else 0
        val fwCand = rng.shuffle(out(u).filterNot(visited).distinct.toList).take(fw)
        val bwCand = rng.shuffle(in(u).filterNot(visited).distinct.toList).take(bw)
        (fwCand ++ bwCand).foreach { w => visited += w; queue.enqueue(w) }
      }
      visited.foreach { w =>
        edges += ((v.toLong, w.toLong))
        out(v) += w; in(w) += v
      }
    }
    import spark.implicits._
    LinkGraph(edges.toSeq.toDF("src", "dst"), directed, Some(n))
  }

  /** Recent_Degree(n, m, window, outpref, directed, power)
    * (`graphobject.c:12711-12733`): preferential attachment where the
    * citation probability is ∝ (degree gained in the last `window` steps)^
    * power + zero_appeal(1). Seeded, deterministic driver kernel.
    */
  def recentDegree(spark: SparkSession, n: Long, m: Int, window: Int,
                   outpref: Boolean = false, directed: Boolean = false,
                   power: Double = 1.0, zeroAppeal: Double = 1.0,
                   seed: Long = 42L): LinkGraph = {
    require(n <= maxKernelVertices,
      s"recentDegree is a sequential driver kernel, capped at $maxKernelVertices vertices")
    val rng = new scala.util.Random(seed)
    val nn = n.toInt
    val recent = new Array[Double](nn) // degree gained in the window
    // edges stamped by step so window expiry decrements recent degree
    val byStep = Array.fill(nn)(scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (v <- 1 until nn) {
      // expire the step that just left the window
      val oldStep = v - window
      if (oldStep >= 1) byStep(oldStep).foreach { case (_, t) =>
        recent(t) -= 1.0
        if (outpref) recent(oldStep) -= 1.0
      }
      val weights = Array.tabulate(v)(j => math.pow(math.max(0.0, recent(j)), power) + zeroAppeal)
      val total = weights.sum
      for (_ <- 0 until math.min(m, v)) {
        var x = rng.nextDouble() * total
        var t = 0
        while (t < v - 1 && x > weights(t)) { x -= weights(t); t += 1 }
        edges += ((v.toLong, t.toLong))
        byStep(v) += ((v, t))
        recent(t) += 1.0
        if (outpref) recent(v) += 1.0
      }
    }
    import spark.implicits._
    LinkGraph(edges.toSeq.toDF("src", "dst"), directed, Some(n))
  }
}
