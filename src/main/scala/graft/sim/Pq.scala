package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011, "Product Quantization
  * for Nearest Neighbor Search") — THE compressed-domain ANN scale path:
  * split each d-dim embedding into `m` contiguous subspaces, train an
  * independent k-codeword Lloyd's codebook per subspace
  * ([[KMeans.lloyd]]'s deterministic conventions, so the DuckDB oracle can
  * unroll the training math per subspace), encode every vector as m small
  * codes, and answer queries with the asymmetric distance computation
  * (ADC): per query build the m×k lookup table of exact
  * ||q_sub − codeword||² distances once, then score each corpus vector by
  * m table lookups instead of d multiplications.
  *
  * Scale shape at 100 TB: the codebook is m·k·(d/m) = k·d rows (broadcast
  * at any corpus size); encoding is the k-means assignment plan (linear,
  * map-side-combined aggregates); the query scan is ONE pass over the
  * m-codes-per-vector table against a broadcast LUT — a whole-stage-codegen
  * project + aggregate with zero shuffle on the corpus side, and the
  * compressed codes are m·log2(k) bits per vector instead of 4d bytes.
  */
object Pq {

  /** Per-subspace codes + codebook.
    * codes: (vec_id, codes array<long> of length m, sub s at position s+1);
    * codebook: (sub, cid, i, cx) with i the 1-based dim within the subspace.
    */
  def encode(vectors: DataFrame, m: Int, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val dims = vectors.select(size(col("embedding"))).head.getInt(0)
    require(m >= 1 && dims % m == 0, s"pq: m=$m must divide dims=$dims")
    val dsub = dims / m
    val parts = (0 until m).map { s =>
      val sub = vectors.select(col("vec_id"),
        slice(col("embedding"), s * dsub + 1, dsub).as("embedding"))
      val (asg, cent) = KMeans.lloyd(sub, k, iters)
      (asg.select(col("vec_id"), lit(s).as("sub"), col("cluster").as("code")),
        cent.select(lit(s).as("sub"), col("cid"), col("i"), col("cx")))
    }
    // wide form: one row per vector with its m codes in subspace order —
    // the PQ scan reads 3 longs per row, never the embedding again
    val codes = parts.map(_._1).reduce(_ unionAll _)
      .groupBy("vec_id")
      .agg(transform(sort_array(collect_list(struct(col("sub"), col("code")))),
        sc => sc.getField("code")).as("codes"))
    (codes, parts.map(_._2).reduce(_ unionAll _))
  }

  /** ADC top-k: approximate nearest neighbors of each query vector by
    * summed per-subspace squared distance to the neighbors' codewords.
    * Output (query_id, neighbor_id, adc, rank), self-pairs excluded.
    * Queries are exact (uncompressed) — that's the "asymmetric" in ADC.
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, m: Int, k: Int,
              iters: Int, topK: Int): DataFrame = {
    val (codes, codebook) = encode(corpus, m, k, iters)
    val dims = corpus.select(size(col("embedding"))).head.getInt(0)
    val dsub = dims / m
    // exploded query dims, re-based into (sub, i-within-sub)
    val qex = queries.select(col("vec_id").as("query_id"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("query_id"),
        (col("pos") / dsub).cast("int").as("sub"),
        (col("pos") % dsub + 1).as("i"), col("col").as("x"))
    // per-query LUT: ||q_sub - codeword||^2 for every (sub, cid) the
    // codebook holds, as a map keyed by sub*k + cid — m*k doubles per
    // query (a map, not a positional array: an update round can empty a
    // codeword, and codes never reference such holes)
    val lut = qex.join(broadcast(codebook), Seq("sub", "i"))
      .groupBy(col("query_id"), col("sub"), col("cid"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("d2"))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(
        struct((col("sub") * k + col("cid")).cast("long"), col("d2")))).as("lut"))
    // the scan: corpus codes x broadcast LUTs, adc = m lookups per pair
    val scored = codes.crossJoin(broadcast(lut))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        aggregate(
          zip_with(col("codes"), sequence(lit(0L), lit(m - 1L)),
            (code, s) => element_at(col("lut"), s * k + code)),
          lit(0.0d), (acc, v) => acc + v).as("adc"))
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), round(col("adc"), 6).as("adc"), col("rank"))
  }

  /** IVF-PQ with residual encoding (Jégou et al. 2011 §IV, the FAISS
    * `IVFPQ` recipe): a coarse `kc`-centroid quantizer partitions the
    * corpus into inverted lists; vectors are PQ-encoded on their RESIDUAL
    * against their coarse centroid (one shared codebook across lists);
    * a query probes only its `nprobe` closest coarse lists and runs the
    * ADC scan against those lists' candidates, with a per-probed-list LUT
    * built from the query's residual against THAT list's centroid.
    *
    * Scale shape: candidates shrink from N to the probed lists' share
    * (~nprobe/kc of the corpus); everything broadcast is bounded by
    * kc·d (coarse centroids), k·d (codebook) or |Q|·nprobe·m·k (LUTs) —
    * all corpus-size-independent. The corpus-side scan stays the wide
    * codes table: 3 longs + m codes per row, never the embeddings.
    * Determinism conventions are [[KMeans.lloyd]]'s throughout; probe
    * ties break to the smaller coarse cid.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, kc: Int, citers: Int,
                 m: Int, k: Int, iters: Int, nprobe: Int, topK: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= kc, s"ivfpq: need 1 <= nprobe=$nprobe <= kc=$kc")
    val (casg, ccent) = KMeans.lloyd(corpus, kc, citers)
    val ex = corpus.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("col").as("x"))
    // residual vectors, rebuilt in dim order — the PQ training input
    val res = ex.join(casg.select(col("vec_id"), col("cluster").as("cid")), Seq("vec_id"))
      .join(broadcast(ccent), Seq("cid", "i"))
      .groupBy("vec_id")
      .agg(transform(sort_array(collect_list(struct(col("i"), (col("x") - col("cx")).as("r")))),
        e => e.getField("r")).as("embedding"))
    val (codes, codebook) = encode(res, m, k, iters)
    val dims = corpus.select(size(col("embedding"))).head.getInt(0)
    val dsub = dims / m

    val qex = queries.select(col("vec_id").as("query_id"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("query_id"), (col("pos") + 1).as("i"), col("col").as("x"))
    // nprobe closest coarse lists per query (ties -> smaller cid)
    val dc = qex.join(broadcast(ccent), Seq("i"))
      .groupBy(col("query_id"), col("cid"))
      .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("dc"))
    val wp = Window.partitionBy("query_id").orderBy(col("dc"), col("cid"))
    val probes = dc.withColumn("pr", row_number().over(wp)).where(col("pr") <= nprobe)
      .select(col("query_id"), col("cid"))
    // per (query, probed list): residual query dims, then the m*k LUT
    val qres = qex.join(broadcast(probes), Seq("query_id"))
      .join(broadcast(ccent), Seq("cid", "i"))
      .select(col("query_id"), col("cid").as("list_cid"),
        ((col("i") - 1) / dsub).cast("int").as("sub"),
        ((col("i") - 1) % dsub + 1).as("i2"), (col("x") - col("cx")).as("xr"))
    val lut = qres.join(broadcast(codebook.withColumnRenamed("i", "i2")
        .withColumnRenamed("cid", "pcid")), Seq("sub", "i2"))
      .groupBy(col("query_id"), col("list_cid"), col("sub"), col("pcid"))
      .agg(sum((col("xr") - col("cx")) * (col("xr") - col("cx"))).as("d2"))
      .groupBy("query_id", "list_cid")
      .agg(map_from_entries(collect_list(
        struct((col("sub") * k + col("pcid")).cast("long"), col("d2")))).as("lut"))
    // scan: candidates are exactly the probed lists' members
    val cand = codes
      .join(casg.select(col("vec_id"), col("cluster").as("list_cid")), Seq("vec_id"))
      .join(broadcast(lut), Seq("list_cid"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        aggregate(
          zip_with(col("codes"), sequence(lit(0L), lit(m - 1L)),
            (code, s) => element_at(col("lut"), s * k + code)),
          lit(0.0d), (acc, v) => acc + v).as("adc"))
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), round(col("adc"), 6).as("adc"), col("rank"))
  }
}
