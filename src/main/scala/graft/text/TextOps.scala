package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * All hot paths are `org.apache.spark.sql.functions` compositions (whole-
  * stage-codegen'd); no Scala UDF in any per-row loop. Tokenization is the
  * simplest deterministic rule (split on single spaces) so the DuckDB oracle
  * can reproduce it bit-for-bit.
  */
object TextOps {

  /** Tokens of a text column (documents are space-separated words). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Per-document statistics: token count, distinct-token ratio, mean token
    * length — the length/stopword/punctuation quality features of a
    * web-corpus quality scorer.
    */
  def docStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 6).as("distinct_ratio"),
      round((length(col("text")) - (size(toks) - 1)).cast("double") / size(toks), 6).as("mean_token_len"))
  }

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Quality score in [0,1]: blend of stopword ratio, token-length sanity and
    * repetition (1 - distinct ratio) — the standard cheap heuristics
    * (C4/Gopher-style rules) expressed as pure Column arithmetic.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopHits = size(array_intersect(array_distinct(toks), array(stopwords.map(lit): _*))).cast("double")
    val meanLen = (length(col("text")) - (nTok - 1)) / nTok
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    docs.select(col("doc_id"),
      round(
        greatest(lit(0.0), least(lit(1.0),
          lit(0.4) * least(stopHits / lit(stopwords.size.toDouble), lit(1.0))
            + lit(0.3) * when(meanLen.between(3.0, 10.0), 1.0).otherwise(0.0)
            + lit(0.3) * distinctRatio)), 6).as("quality"))
  }

  /** Exact deduplication: md5 content hash; keeps the smallest doc_id per
    * hash group (one shuffle on the hash — the canonical exact-dedup plan).
    * Output: (hash, n_dupes, keep_id).
    */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("hash"))
      .agg(count(lit(1)).as("n_dupes"), min(col("doc_id")).as("keep_id"))

  /** Overlapping word n-gram array, occurrence order preserved, built with
    * ARRAY-LEVEL ops only (a `zip_with` ladder): each argument array is
    * evaluated once per row. The tempting per-position formulations —
    * `transform(indices, i => slice(toks, i, n))` or `element_at(toks,
    * i + o)` — re-evaluate the token split inside the lambda for every
    * position (the lambda body's free reference to `toks` is not hoisted),
    * which measured 1.5-2x slower on the MinHash shingle stream. Shorter
    * inputs than n yield an empty array (the slice lengths clamp to 0).
    */
  private def ngramArray(toks: Column, n: Int): Column =
    if (n == 1) toks
    else (2 to n).foldLeft(toks) { (acc, step) =>
      val len = greatest(size(toks) - step + 1, lit(0))
      zip_with(slice(acc, lit(1), len), slice(toks, lit(step), len),
        (a, b) => concat_ws(" ", a, b))
    }

  /** Word-level n-gram shingles of a document (distinct). */
  def shingles(text: Column, n: Int): Column =
    array_distinct(ngramArray(tokens(text), n))

  /** Exact n-gram Jaccard near-duplicate pairs: explode shingles, self-join
    * on shingle, count common, compute |A∪B| from per-doc counts.
    * Output (a, b, jaccard) for pairs with jaccard >= threshold.
    * This is the ground-truth for the MinHash variant; at 100 TB the
    * MinHash/LSH path below replaces the quadratic-prone exact join.
    */
  def jaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // fixed-width repartition on the shingle key: the self-join expands
    // each shingle to its doc-pair square AFTER the exchange, so AQE's
    // byte-based coalescing would serialize the expansion onto 1-2 tasks
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = sh.alias("x").join(sh.alias("y"), Seq("sh"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("common") / (col("sza") + col("szb") - col("common")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signatures: k independent permutations simulated by seeded
    * hashes over shingles; signature[i] = min hash under seed i.
    * Pure Column expressions (aggregate over exploded shingles).
    * `md5Mode` derives the permutations from md5 (any engine — the DuckDB
    * oracle reproduces them bit-for-bit); default xxhash64 is the faster
    * production path (identical algorithm, different hash family).
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, k: Int = 16, md5Mode: Boolean = false): DataFrame = {
    // spread the docs BEFORE the explode: the k seeded hashes per shingle
    // run in the pre-shuffle partial-aggregate stage, whose parallelism is
    // the input's partition count — a small parquet read is ONE partition,
    // serializing the whole signature computation onto one task
    val sh = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
    val mins = (0 until k).map { i =>
      val h = if (md5Mode) md5(concat_ws("|", lit(i.toString), col("sh")))
              else xxhash64(lit(i), col("sh")).cast("string")
      min(h).as(s"h$i")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash-LSH candidate near-duplicate pairs: band the k signature slots
    * into `bands` groups, hash each band, bucket-join on (band, bandhash).
    * Classic banding: collision prob ≈ 1-(1-J^r)^b. Candidates are then
    * (optionally) verified by exact Jaccard — the scale path for dedup.
    */
  def minhashCandidates(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 8,
                        md5Mode: Boolean = false): DataFrame = {
    val sig = minhashSignatures(docs, n, k, md5Mode)
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      val slots = (b * rows until (b + 1) * rows).map(i => col(s"h$i"))
      val bh = if (md5Mode) md5(concat_ws("|", slots: _*)) else xxhash64(slots: _*).cast("string")
      struct(lit(b).as("band"), bh.as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    buckets.alias("x").join(buckets.alias("y"), Seq("band", "bh"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** End-to-end MinHash near-duplicate dedup — the full training-corpus
    * document-dedup pipeline: LSH band candidates ([[minhashCandidates]]) →
    * exact n-gram Jaccard confirm on the CANDIDATE pairs only (shingle
    * arrays are joined in exactly once, after the candidate `distinct` —
    * never the quadratic all-pairs shingle self-join of [[jaccardPairs]]) →
    * connected components over the confirmed dupe graph → one row per
    * document with its dedup cluster (min reachable doc_id) and a keep
    * flag. This is the 100 TB shape: every shuffle is bounded by
    * bands × docs (bucketing) or by the confirmed-pair graph (WCC); a
    * missed LSH collision costs recall, never a false dupe.
    */
  def dedupNearMinhash(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 8,
                       threshold: Double = 0.5, md5Mode: Boolean = false): DataFrame = {
    val cand = minhashCandidates(docs, n, k, bands, md5Mode)
    val sh = docs.select(col("doc_id"), shingles(col("text"), n).as("sh"))
    val confirmed = cand
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .where(size(array_intersect(col("sha"), col("shb"))).cast("double")
        / size(array_union(col("sha"), col("shb"))) >= threshold)
      .select(col("a"), col("b"))
    val g = graft.core.LinkGraph(
      confirmed.select(col("a").as("src"), col("b").as("dst")), directed = false)
    val comp = graft.algos.Components.wcc(g)
    docs.select(col("doc_id").as("id")).join(comp, Seq("id"), "left")
      .select(col("id").as("doc_id"), coalesce(col("comp"), col("id")).as("cluster"))
      .withColumn("keep", col("doc_id") === col("cluster"))
  }

  /** Benchmark decontamination: flag training documents sharing ANY
    * word-level n-gram with an evaluation set — the standard pre-training
    * hygiene step (GPT-3 appendix C / PaLM style n-gram overlap filtering,
    * n parameterized). Plan shape for 100 TB: the eval set's distinct
    * n-grams are orders of magnitude smaller than the corpus, so they are
    * broadcast and the train side is one projection + explode joined
    * map-side — no shuffle of training rows; only the (small) per-doc hit
    * counts aggregate. Output: (doc_id, n_hits, contaminated 0/1) — one
    * row per training doc; n_hits counts the doc's DISTINCT overlapping
    * grams ([[shingles]] is distinct per doc and the eval side is
    * distinct).
    */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int = 3): DataFrame = {
    val evalGrams = eval.select(explode(shingles(col("text"), n)).as("g")).distinct()
    val trainGrams = train.select(col("doc_id"), explode(shingles(col("text"), n)).as("g"))
    val hits = trainGrams.join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    train.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, lit(1L)).otherwise(lit(0L))
          .as("contaminated"))
  }

  /** SimHash fingerprint as four 16-bit chunks (c0..c3; c0 = bits 0-15).
    * Per token the 64-bit hash is the first 16 hex chars of md5(token)
    * (engine-portable — the DuckDB oracle recomputes it digit-wise); per
    * bit, +1/-1 votes are summed over token OCCURRENCES; sign -> bit.
    * The chunked representation doubles as the Hamming blocking key and
    * avoids 64-bit sign pitfalls across engines.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .withColumn("hx", md5(col("t")))
      // hex chars 1-8 = bits 32..63, chars 9-16 = bits 0..31 (big-endian)
      .withColumn("hi", conv(substring(col("hx"), 1, 8), 16, 10).cast("long"))
      .withColumn("lo", conv(substring(col("hx"), 9, 8), 16, 10).cast("long"))
    val bitVotes: Seq[Column] = (0 until 64).map { b =>
      val (src, sh) = if (b < 32) (col("lo"), b) else (col("hi"), b - 32)
      sum(when(shiftright(src, sh).bitwiseAND(lit(1L)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
    }
    val votes = tok.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val chunks = (0 until 4).map { c =>
      (0 until 16).map(l => when(col(s"b${c * 16 + l}") > 0, lit(1L << l)).otherwise(lit(0L)))
        .reduce((a, x) => a.bitwiseOR(x)).as(s"c$c")
    }
    votes.select(col("doc_id") +: chunks: _*)
  }

  /** Hamming-distance near-dup pairs from simhash, blocked by 16-bit chunks
    * (pigeonhole: distance <= 3 implies at least one of 4 chunks equal; for
    * larger maxDist the chunk-join is an approximate candidate generator).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val fp = simhash(docs).transform(graft.core.Lineage.cut)
    val chunkCols = (0 until 4).map(c => struct(lit(c).as("chunk"), col(s"c$c").as("ck")))
    val blocked = fp.select(
      (col("doc_id") +: (0 until 4).map(c => col(s"c$c"))) :+ explode(array(chunkCols: _*)).as("b"): _*)
      .select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"), col("b.chunk"), col("b.ck"))
    val hamming = (0 until 4)
      .map(c => bit_count(col(s"x.c$c").bitwiseXOR(col(s"y.c$c"))))
      .reduce(_ + _).cast("long")
    blocked.alias("x").join(blocked.alias("y"), Seq("chunk", "ck"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), hamming.as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** Language-ID by stopword-profile voting: score each candidate language
    * by hits of its tiny stopword list in the token set; emit argmax.
    * (n-gram-profile heuristic in the spirit of Cavnar-Trenkle, reduced to
    * codegen-friendly set intersections.)
    */
  private[graft] val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "la", "y", "es", "los"),
    "pt" -> Seq("o", "a", "e", "de", "os"),
    "ru" -> Seq("и", "в", "не", "на", "что"),
    "zh" -> Seq("的", "是", "了", "在", "我"),
    "ja" -> Seq("の", "に", "は", "を", "た"))

  def langId(docs: DataFrame): DataFrame = {
    val toks = array_distinct(tokens(col("text")))
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("hits"), lit(lang).as("lang"))
    }
    docs.select(col("doc_id"), array_max(array(scores: _*)).getField("lang").as("pred_lang"))
  }

  /** Top-k token vocabulary by corpus frequency — the vocabulary-building
    * scan of a tokenizer-training pipeline. One explode + hash aggregate
    * (map-side combined) then a top-k; ties broken by token so the result
    * is deterministic. The aggregate output is |vocab|-sized, not
    * corpus-sized, so the final ordering sorts a small table.
    */
  private val gopherStopwords =
    Seq("the", "be", "to", "of", "and", "a", "in", "that", "have", "with")

  /** Gopher-style repetition and quality statistics (Rae et al. 2021, table
    * A1 — the standard web-corpus repetition filters), adapted to this
    * corpus's single-line space-separated documents:
    *
    *  - `word_count`, `mean_word_len`;
    *  - `alpha_word_frac`: words containing at least one `[a-z]`;
    *  - `stopword_hits`: distinct hits in a fixed 10-word English list;
    *  - `dup_word_frac` / `dup_2gram_frac` / `dup_3gram_frac`:
    *    1 − distinct/total n-grams (the duplicated-n-gram-fraction proxy);
    *  - `top_2gram_char_frac`: max over 2-grams of occurrences × gram chars,
    *    over total chars (the "fraction of characters in the most frequent
    *    2-gram" rule; the max-of-products form makes ties deterministic);
    *  - `gopher_pass` (0/1): word_count in [10, 100000], mean_word_len in
    *    [2, 12], alpha_word_frac ≥ 0.8, stopword_hits ≥ 2,
    *    dup_word_frac ≤ 0.9, dup_2gram_frac ≤ 0.95,
    *    top_2gram_char_frac ≤ 0.2.
    *
    * Per-doc metrics are pure array expressions (map-only, codegen); the
    * top-2-gram branch is an explode + two aggregates. Every exchange is at
    * DOC granularity: both branches hang off a `repartition(doc_id)` of the
    * (doc_id, text) projection — docs are unique by id, so the raw-doc
    * shuffle is strictly smaller than the (doc_id, gram)-count shuffle the
    * naive plan would do — and both groupBys plus the final join are then
    * co-partitioned (Catalyst may still broadcast the small aggregated join
    * side on tiny inputs). No per-doc quadratic scan, no driver loop — the
    * 100 TB shape.
    */
  def gopherStats(docs: DataFrame): DataFrame = {
    // Tokenize ONCE into a bound column right after the doc-granularity
    // repartition (the shuffle still carries raw text, not the array).
    // Every downstream reference — including inside the n-gram ladder and
    // the filter/intersect lambdas — is then an attribute read; the naive
    // form re-ran the split per top-level reference and per lambda element
    // (see ngramArray's scaladoc for the measured cost).
    val toks = col("toks")
    val n = size(toks)
    def grams(k: Int): Column = ngramArray(toks, k)
    val dupFrac = (c: Column) =>
      when(size(c) === 0, 0.0).otherwise(
        round(lit(1.0) - size(array_distinct(c)).cast("double") / size(c), 6))
    val parted = docs.select(col("doc_id"), col("text")).repartition(col("doc_id"))
      .select(col("doc_id"), length(col("text")).as("n_chars_d"),
        tokens(col("text")).as("toks"))
    val perDoc = parted.select(
      col("doc_id"),
      col("n_chars_d"),
      n.as("word_count"),
      round((col("n_chars_d") - (n - 1)).cast("double") / n, 6).as("mean_word_len"),
      round(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n, 6)
        .as("alpha_word_frac"),
      size(array_intersect(array_distinct(toks),
        array(gopherStopwords.map(lit): _*))).as("stopword_hits"),
      dupFrac(toks).as("dup_word_frac"),
      dupFrac(grams(2)).as("dup_2gram_frac"),
      dupFrac(grams(3)).as("dup_3gram_frac"))
    val topg = parted.select(col("doc_id"), explode(grams(2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c") * length(col("g"))).as("cover"))
    perDoc.join(topg, Seq("doc_id"), "left")
      .withColumn("top_2gram_char_frac",
        round(coalesce(col("cover"), lit(0L)).cast("double") / col("n_chars_d"), 6))
      .withColumn("gopher_pass",
        (col("word_count").between(10, 100000) &&
          col("mean_word_len").between(2.0, 12.0) &&
          col("alpha_word_frac") >= 0.8 &&
          col("stopword_hits") >= 2 &&
          col("dup_word_frac") <= 0.9 &&
          col("dup_2gram_frac") <= 0.95 &&
          col("top_2gram_char_frac") <= 0.2).cast("int"))
      .drop("n_chars_d", "cover")
  }

  def vocabTop(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(k)

  /** Per-(doc, term) TF-IDF weights: tf = term count / doc length,
    * idf = ln((N + 1) / (df + 1)) + 1 (the smooth variant — never zero or
    * divide-by-zero). One explode + two hash aggregates + one broadcast-
    * sized join on the term dictionary: the 100 TB shape (the df table is
    * |vocab|-sized, the doc side streams).
    */
  def tfidf(docs: DataFrame): DataFrame = {
    val n = docs.count()
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))
    val dlen = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dlen, Seq("doc_id")).join(df, Seq("term"))
      .select(col("doc_id"), col("term"),
        (col("tc").cast("double") / col("dl") *
          (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)).as("tfidf"))
  }

  /** BM25 scores of every document against a bag of query terms
    * (k1 = 1.2, b = 0.75 defaults). Query terms ride a broadcast; the doc
    * side is one explode + one aggregate — no per-query rescan of the
    * corpus at scale.
    */
  def bm25(docs: DataFrame, query: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.count()
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val dlen = toks.groupBy("doc_id").agg(count(lit(1)).as("dl")).persist()
    val avgdl = dlen.agg(avg(col("dl"))).head.getDouble(0)
    val q = query.distinct.toDF("term")
    val tf = toks.join(broadcast(q), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dlen, Seq("doc_id")).join(broadcast(df), Seq("term"))
      .select(col("doc_id"),
        (log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tc") * (k1 + 1.0)) /
          (col("tc") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))).as("s"))
      .groupBy("doc_id").agg(sum(col("s")).as("bm25"))
    dlen.unpersist()
    scored
  }

  /** Deterministic stratified sampling — the corpus-subsampling step of a
    * training-data pipeline (per-language / per-source quotas). Keeps a
    * document iff a seeded uniform in [0,1) derived from md5(seed|doc_id)
    * falls under its stratum's fraction; strata absent from `fractions`
    * are dropped. Pure per-row Column arithmetic: a scan with zero
    * shuffles, trivially correct at any scale, reproducible in any engine
    * (the DuckDB oracle recomputes the identical md5-derived uniform).
    */
  def stratifiedSample(docs: DataFrame, fractions: Map[String, Double],
                       seed: Long = 42L, strataCol: String = "lang"): DataFrame = {
    // 16-bit uniform from the first 4 hex chars of the seeded md5 —
    // granularity 1/65536 is ample for corpus sampling fractions
    val u = conv(substring(md5(concat_ws("|", lit(seed.toString), col("doc_id"))), 1, 4), 16, 10)
      .cast("double") / 65536.0
    val fcol = fractions.toSeq.sortBy(_._1).foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    docs.where(u < fcol).select(col("doc_id"), col(strataCol).as("stratum"))
  }

  /** Token-budget shard packing — assign documents to training shards so
    * each shard holds ~`budget` tokens, preserving doc_id order (the
    * sequence-packing shard layout of an LLM data pipeline). The exclusive
    * prefix sum of token counts comes from the distributed
    * partition-offset pattern ([[graft.core.Generators.prefixWeights]] —
    * range partition + per-partition offsets, NO single-partition global
    * Window), so the assignment is a distributed sort plus one tiny
    * driver-side offset table at any scale.
    */
  def packShards(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "shard token budget must be positive")
    val toks = docs.select(col("doc_id").as("id"),
      size(tokens(col("text"))).cast("double").as("w"))
    graft.core.Generators.prefixWeights(toks)
      .select(col("id").as("doc_id"), col("w").cast("long").as("n_tokens"),
        floor(col("lo") / budget.toDouble).cast("long").as("shard"))
  }

  /** Data-mixture sampling — the recipe step that turns per-source target
    * weights + a total token budget into per-source sampling rates and a
    * deterministic document selection. desired_s = weight_s/Σw × budget;
    * rate_s = min(1, desired_s / available_s) (sources short of their quota
    * are taken whole — rates never exceed 1, i.e. no repetition epochs);
    * selection = the same seeded md5 uniform as [[stratifiedSample]].
    * Sources absent from `weights` get rate 0.
    *
    * Scale shape: one per-source token aggregate (map-side combine, at most
    * |sources| rows on the driver), then a pure scan — zero shuffle on the
    * selection pass. Output: (doc_id, source, n_tokens, rate, keep).
    */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double], budget: Long,
                    seed: Long = 42L): DataFrame = {
    require(budget > 0, "mixture token budget must be positive")
    require(weights.values.forall(_ >= 0) && weights.values.sum > 0,
      "mixture weights must be non-negative and not all zero")
    val wSum = weights.values.sum
    val avail = docs.groupBy("source")
      .agg(sum(size(tokens(col("text")))).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = avail.map { case (s, a) =>
      val desired = weights.getOrElse(s, 0.0) / wSum * budget
      s -> math.min(1.0, if (a == 0) 0.0 else desired / a)
    }
    val rcol = rates.toSeq.sortBy(_._1).foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col("source") === s, lit(r)).otherwise(acc)
    }
    val u = conv(substring(md5(concat_ws("|", lit(seed.toString), col("doc_id"))), 1, 4), 16, 10)
      .cast("double") / 65536.0
    docs.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      round(rcol, 6).as("rate"), (u < rcol).as("keep"))
  }

  // ---- PII masking (the CCNet/Dolma anonymization stage) -------------------

  /** PII regexes, deliberately restricted to the java.util.regex ∩ RE2
    * common subset (classes, counted repeats, `\b`, alternation — no
    * lookaround, no backrefs) so the DuckDB oracle can apply the IDENTICAL
    * pattern strings and the redaction is engine-independent.
    */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** International-prefixed phone shape +C[C] NXX-NXX-XXXX with space/dot/
    * dash separators — the conservative high-precision form (bare 10-digit
    * runs are left alone: in web text they are usually ids, not numbers
    * worth masking). */
  val phoneRe: String = "\\+\\d{1,2}[ .-]\\d{3}[ .-]\\d{3}[ .-]\\d{4}"
  val ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Masks emails, then phone-shaped numbers, then IPv4 literals with typed
    * tokens (`<EMAIL>`/`<PHONE>`/`<IP>`), and counts each category on the
    * ORIGINAL text. Pure `regexp_replace`/`regexp_count` Column chains —
    * whole-stage-codegen'd, zero shuffle, linear scan: the shape that holds
    * at 100 TB. Output: (doc_id, n_emails, n_phones, n_ips, clean_text).
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(ipv4Re)).cast("long").as("n_ips"),
      clean.as("clean_text"))
  }

  // ---- BPE-style pre-tokenization -------------------------------------------

  /** GPT-2-ish pre-tokenizer split classes — letter runs, digit runs, single
    * other non-whitespace characters — as one `regexp_extract_all` expression
    * (codegen'd, no UDF). The explicit whitespace class (space/tab/CR/LF,
    * not `\s`) keeps the Java and RE2 dialects byte-identical; tabs and
    * newlines must NOT count as punctuation tokens or n_bpe inflates on any
    * multi-line document. Shared verbatim with the DuckDB oracle.
    */
  val bpeRe: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

  def tokensBpe(text: Column): Column =
    regexp_extract_all(text, lit(bpeRe), lit(0))

  /** Per-document BPE-ish token statistics: token count and distinct count —
    * the "how many training tokens is this corpus" accounting pass, one
    * linear scan. */
  def bpeStats(docs: DataFrame): DataFrame = {
    val t = tokensBpe(col("text"))
    docs.select(col("doc_id"),
      size(t).cast("long").as("n_bpe"),
      size(array_distinct(t)).cast("long").as("n_bpe_distinct"))
  }

  /** Rolling-hash document fingerprint (winnowing-style): min md5 over
    * character 8-gram windows — cheap containment-dup detector. md5 keeps
    * the fingerprint reproducible in any engine (the DuckDB oracle computes
    * the identical value); swap in xxhash64 where cross-engine parity is
    * not needed.
    */
  def fingerprint(docs: DataFrame, window: Int = 8): DataFrame = {
    val idx = sequence(lit(1), greatest(length(col("text")) - (window - 1), lit(1)))
    val grams = transform(idx, i => md5(col("text").substr(i, lit(window))))
    docs.select(col("doc_id"), array_min(grams).as("fingerprint"))
  }

  // ---- exact substring dedup (Lee et al. 2022, arXiv:2107.06499) -----------

  /** Maximal per-document removal spans covering every length-`minLen`
    * character window that occurs in at least `minDocs` DISTINCT documents —
    * the exact-substring training-data dedup of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"), re-expressed as a
    * relational pipeline instead of a monolithic suffix array.
    *
    * Shape: positions explode as a pure Column (`sequence` + `explode`, no
    * UDF), windows group on their content (exact — no hash false positives;
    * at 100 TB swap the group key to a 128-bit hash of the window so only
    * (hash, doc, pos) shuffles, never the text), duplicated windows join
    * back, and overlapping marks merge into maximal spans with the standard
    * cumulative-max interval trick — one window function over (doc, start),
    * partitioned by document, so the merge never leaves the doc's partition.
    *
    * `winnow` > 1 thins candidate positions for the very largest corpora by
    * winnowing (Schleimer et al. 2003 "local algorithms for document
    * fingerprinting"): keep a position only when its window's hash is the
    * minimum of the last `winnow` hashes. Selection is CONTENT-defined, so
    * two documents sharing a run pick the same in-run positions regardless
    * of alignment — any duplicated run of length >= minLen + winnow - 1 is
    * guaranteed to be detected (a positional stride has no such guarantee:
    * offsets differing mod stride would sample disjoint windows). A recall
    * knob, never a false span: marks are still content-grouped exactly.
    *
    * Output: (doc_id, span_start, span_end) — 1-based, end-exclusive.
    */
  def dupSpans(docs: DataFrame, minLen: Int = 40, minDocs: Int = 2,
               winnow: Int = 1): DataFrame = {
    require(minLen > 0 && winnow > 0 && minDocs >= 2,
      s"need minLen>0, winnow>0, minDocs>=2; got ($minLen, $winnow, $minDocs)")
    val all = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism) // spread
      // the per-position substring explosion (input arrives as 1 partition)
      .where(length(col("text")) >= minLen)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (minLen - 1))).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"), col("text").substr(col("p"), lit(minLen)).as("w"))
    val win = if (winnow <= 1) all else {
      val recent = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("p").rowsBetween(-(winnow - 1), 0)
      all.withColumn("h", xxhash64(col("w")))
        .withColumn("hmin", min("h").over(recent))
        .where(col("h") === col("hmin"))
        .select("doc_id", "p", "w")
    }
    val dup = win.groupBy("w").agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") >= minDocs).select("w")
    val marks = win.join(dup, Seq("w"))
      .select(col("doc_id"), col("p").cast("long").as("s"),
        (col("p") + minLen).cast("long").as("e"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("s", "e")
    marks
      .withColumn("pmax", max("e").over(
        byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("fresh", when(col("pmax").isNull || col("s") > col("pmax"), 1).otherwise(0))
      .withColumn("g", sum("fresh").over(byDoc))
      .groupBy("doc_id", "g")
      .agg(min("s").as("span_start"), max("e").as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Apply [[dupSpans]]: cut every span out of its document and stitch the
    * remainder — returns every input doc with its `clean` text (docs with no
    * span pass through unchanged). The stitch is a higher-order `aggregate`
    * over the doc's sorted spans (pure Column; per-doc work only), after one
    * shuffle grouping the spans onto their doc.
    */
  def removeDupSpans(docs: DataFrame, minLen: Int = 40, minDocs: Int = 2,
                     winnow: Int = 1): DataFrame = {
    val spans = dupSpans(docs, minLen, minDocs, winnow)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e")))).as("spans"))
    docs.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("spans").isNull, col("text")).otherwise(
          // fold spans left->right: acc = (next copy starts at pos, kept text)
          concat(
            aggregate(col("spans"),
              struct(lit(1L).as("pos"), lit("").as("kept")),
              (acc, sp) => struct(
                sp.getField("e").as("pos"),
                concat(acc.getField("kept"),
                  col("text").substr(acc.getField("pos"),
                    sp.getField("s") - acc.getField("pos"))).as("kept")),
              acc => acc.getField("kept")),
            col("text").substr(
              element_at(col("spans"), -1).getField("e"),
              length(col("text")).cast("long")))).as("clean"))
  }

  /** Non-distinct n-grams of a text column, occurrence order preserved
    * (unlike [[shingles]], which deduplicates for set semantics — LM
    * feature counting needs every occurrence). Built by the shared
    * [[ngramArray]] zip_with ladder (see its note on why the per-position
    * lambda formulations are slower).
    */
  def ngramsAll(text: Column, n: Int): Column =
    ngramArray(tokens(text), n)

  /** Corpus-unigram language-model score per document — the CCNet-style
    * quality proxy (Wenzek et al. 2020 score docs by LM perplexity; here
    * the LM is the corpus's own add-alpha-smoothed unigram model, so the
    * whole thing stays inside the engine and the oracle). For token w:
    * p(w) = (count(w) + alpha) / (total + alpha * |V|); per doc we report
    * mean log p and the perplexity exp(-mean). Low-perplexity docs look
    * like the corpus average; high perplexity flags outliers/noise.
    *
    * Scale shape: one explode, one vocab hash-aggregate (map-side combine;
    * vocab is Zipf-bounded far below corpus size), one hash join token->
    * vocab, one per-doc aggregate. Nothing quadratic; the totals are a
    * single tiny agg.
    */
  def unigramLogProb(docs: DataFrame, alpha: Double = 1.0): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val Array(total, v) = toks.agg(count(lit(1)), countDistinct(col("w")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val logp = log((col("c") + alpha) / (total + alpha * v))
    toks.join(vocab, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(logp), 6).as("logprob"),
        round(exp(-avg(logp)), 6).as("ppl"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per language,
    * order documents by LM perplexity (fluent first) and cut into `k`
    * equal-size buckets — bucket 0 is CCNet's "head", k-1 the "tail".
    * Deterministic: ties in (rounded) ppl break by doc_id.
    *
    * Scale shape: NO per-language global Window (that would put a whole
    * language in one task). The per-language rank is the repo's standard
    * distributed dense-rank — [[graft.core.Ids.assignDense]] over the
    * (lang, ppl, doc_id) sort key (range partition + per-partition
    * offsets), then rank-within-language = global rank − the language's
    * min rank (one tiny broadcast agg). bucket = floor(rank·k / n_lang).
    */
  def perplexityBuckets(docs: DataFrame, k: Int = 3, alpha: Double = 1.0): DataFrame = {
    require(k >= 2, s"perplexityBuckets: need k >= 2, got $k")
    val scored = unigramLogProb(docs, alpha)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(struct(col("lang"), col("ppl"), col("doc_id")).as("key"))
    val ranked = graft.core.Ids.assignDense(scored, "key")
      .select(col("key.doc_id").as("doc_id"), col("key.lang").as("lang"),
        col("id").as("grank"))
    val offs = ranked.groupBy("lang")
      .agg(min("grank").as("lang_off"), count(lit(1)).as("n_lang"))
    ranked.join(broadcast(offs), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        floor((col("grank") - col("lang_off")) * k / col("n_lang")).cast("long").as("bucket"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score each raw document by how much
    * more likely its hashed n-gram features are under the TARGET
    * distribution than under the raw-corpus distribution —
    * log w(doc) = sum over feature instances of [ln p_target(b) − ln
    * p_raw(b)], with features = unigrams + bigrams hashed into `buckets`
    * bins (md5-derived so the DuckDB oracle reproduces the bucketing
    * bit-for-bit) and add-alpha smoothing on both distributions. High-weight
    * docs are the ones importance resampling would keep.
    *
    * Scale shape: ONE explode+hash pass per corpus. The raw pass reduces
    * immediately to per-(doc, bucket) instance counts (<= docs x buckets
    * rows — map-side combinable); the raw bucket distribution, its total
    * AND the per-doc scoring all derive from that table, so the raw text
    * is never exploded or md5'd twice (guide §1.2: remove whole passes
    * before tuning anything inside one). Scoring is then a broadcast join
    * of the tiny ratio table against the count table, with
    * sum(count x logratio) replacing the instance-level sum — exact in
    * real arithmetic since every instance of bucket b contributes the
    * identical lr(b).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int = 1024,
                  alpha: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"dsir: need buckets >= 2, got $buckets")
    // spread the docs BEFORE the explode: a single-file parquet read is one
    // partition, which would serialize the per-feature md5 hashing onto one
    // task (same pathology + fix as the minhash shingle explode)
    def feats(df: DataFrame): DataFrame = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(concat(ngramsAll(col("text"), 1), ngramsAll(col("text"), 2))).as("g"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("g")), 1, 6), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))
    // the single pass over the raw corpus: per-(doc, bucket) feature counts
    val rDocB = feats(raw).groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // bucket tables are <= `buckets` rows: materialize once and derive the
    // totals from THEM (no .count() re-scan of the feature stream)
    val tCounts = feats(target).groupBy("b").agg(count(lit(1)).as("ct"))
      .localCheckpoint(true)
    val rCounts = rDocB.groupBy("b").agg(sum(col("c")).as("cr")).localCheckpoint(true)
    val totT = tCounts.agg(coalesce(sum(col("ct")), lit(0L))).first().getLong(0).toDouble
    val totR = rCounts.agg(coalesce(sum(col("cr")), lit(0L))).first().getLong(0).toDouble
    // every bucket raw features touch appears in rCounts, so the left join
    // only needs smoothing on the target side
    val ratio = rCounts.join(tCounts, Seq("b"), "left")
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + alpha) / (totT + alpha * buckets))
          - log((col("cr") + alpha) / (totR + alpha * buckets))).as("lr"))
    rDocB.join(broadcast(ratio), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_feats"), round(sum(col("c") * col("lr")), 6).as("logweight"))
  }

  /** Corpus-level line deduplication (the C4 "discard duplicate three-
    * sentence spans" / Dolma paragraph-dedup recipe, at line granularity):
    * every line keeps only its FIRST occurrence corpus-wide (smallest
    * (doc_id, line_no)); later occurrences are dropped and each document's
    * surviving lines are re-stitched in order.
    *
    * Scale shape: the first-occurrence pass is `groupBy(line).agg(min(
    * struct(doc_id, line_no)))` — map-side combinable, so a boilerplate
    * line repeated a billion times reduces to one row per map partition
    * before the shuffle (a `row_number` window would ship every copy of
    * every hot line to one reducer — exactly the skew dedup exists to kill).
    * The aggregate's output IS the kept-occurrence set, so no join back to
    * the line stream is needed; re-stitching is one doc-granularity
    * aggregate. At 100 TB, group on a 128-bit hash of the line and carry
    * the text only on the kept row.
    *
    * Output: (doc_id, text, n_lines, n_kept) — `text` is the deduplicated
    * document ("" when every line first occurred elsewhere), `n_lines` the
    * pre-dedup line count.
    */
  def lineDedup(docs: DataFrame, delim: String = "\n"): DataFrame = {
    val lines = docs.select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(delim), -1)))
      .select(col("doc_id"), col("pos").cast("long").as("line_no"), col("col").as("line"))
    val kept = lines.groupBy("line")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.line_no").as("line_no"), col("line"))
    val stitched = kept.groupBy("doc_id").agg(
      concat_ws(delim, transform(
        array_sort(collect_list(struct(col("line_no"), col("line")))),
        e => e.getField("line"))).as("text"),
      count(lit(1)).as("n_kept"))
    lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(stitched, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        col("n_lines"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Linear quality classifier trained and applied entirely as relational
    * aggregates — the CCNet/fastText pipeline stage ("train a cheap linear
    * model on seed-labeled documents, score the whole corpus"), with
    * logistic regression over hashed bag-of-words features and full-batch
    * gradient descent at a FIXED iteration count so the run is deterministic
    * and the DuckDB oracle can unroll the identical arithmetic.
    *
    * Features: tokens hashed into `buckets` bins (md5-derived, the proven
    * cross-engine bucketing idiom), tf-normalized per document. Model:
    * p_i = sigmoid(sum_j x_ij w_j + b), batch updates
    * w_j -= lr * sum_i (p_i - y_i) x_ij / N (bias likewise), weights
    * initialized to zero.
    *
    * Scale shape: the feature stream is one explode + one (doc, bucket)
    * aggregate; each GD step is a broadcast join of the stream against the
    * <=buckets-row weight table plus two doc-granularity aggregates — the
    * weight state is by-construction tiny (buckets rows), the sanctioned
    * collect-and-rebroadcast case, and nothing per-step grows with the
    * corpus. Scoring is the same broadcast join once more.
    *
    * `label` is evaluated against the input columns (e.g. `col("lang") ===
    * "en"`). Output: (doc_id, y, score) with score rounded to 6.
    */
  def qualityLr(docs: DataFrame, label: Column, buckets: Int = 32,
                lr: Double = 1.0, iters: Int = 3): DataFrame = {
    require(buckets >= 2 && iters >= 1 && lr > 0.0,
      s"qualityLr: need buckets>=2, iters>=1, lr>0; got ($buckets, $iters, $lr)")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col("doc_id"), tokens(col("text")).as("toks"),
      label.cast("boolean").cast("double").as("y"))
    // tf-normalized hashed bag-of-words, plus the bias as a constant
    // feature in bucket -1 so one weight table carries the whole model
    val feats = graft.core.Lineage.soft(base
      .select(col("doc_id"), col("y"), size(col("toks")).cast("double").as("nt"),
        explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("y"),
        pmod(conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))
      .agg((count(lit(1)) / first(col("nt"))).as("x"))
      .unionByName(base.select(col("doc_id"), col("y"),
        lit(-1L).as("b"), lit(1.0).as("x"))))
    val n = base.count().toDouble
    // weight state: one row per OBSERVED bucket (<= buckets + 1) —
    // by-construction tiny, collected and re-broadcast each step (the
    // sanctioned k-means-centroid pattern; see Lineage.cutAdaptive notes)
    var w: Seq[(Long, Double)] =
      feats.select(col("b")).distinct().as[Long].collect().sorted.map(_ -> 0.0).toSeq
    def scores(wDf: DataFrame): DataFrame = feats.join(wDf, Seq("b"))
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("x") * col("wv")).as("z"))
      .select(col("doc_id"), col("y"),
        (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"))
    for (_ <- 1 to iters) {
      val resid = scores(broadcast(w.toDF("b", "wv")))
        .select(col("doc_id"), (col("p") - col("y")).as("r"))
      val grads = feats.join(broadcast(resid), Seq("doc_id"))
        .groupBy("b").agg(sum(col("r") * col("x")).as("g"))
        .as[(Long, Double)].collect().toMap
      w = w.map { case (b, wv) => (b, wv - lr * grads.getOrElse(b, 0.0) / n) }
    }
    scores(broadcast(w.toDF("b", "wv")))
      .select(col("doc_id"), col("y"), round(col("p"), 6).as("score"))
  }

  /** Context-window chunking — split each document into overlapping
    * fixed-size token windows, the sequence-preparation step that turns
    * cleaned documents into training examples (every LLM pipeline ends
    * here): chunk `i` covers tokens `[i·stride, i·stride + chunkTokens)`
    * with `stride = chunkTokens − overlap`, so consecutive chunks share
    * exactly `overlap` tokens and their stride-prefixes concatenate back to
    * the original document. A document shorter than `chunkTokens` yields
    * one (short) chunk; the last chunk may be short but is never empty.
    *
    * Scale shape: one `transform(sequence(...))` + `posexplode` projection —
    * map-only, zero shuffle, whole-stage codegen; output rows ≈
    * tokens/stride per document regardless of corpus size.
    *
    * Output: (doc_id, chunk_id, chunk_text, n_tokens).
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    // Bind the token array once per row: inside the transform lambda a free
    // `tokens(col("text"))` would re-split the document for every chunk
    // (twice per chunk here) — as a bound attribute each slice is just an
    // array copy of its own chunk, so total work stays O(doc length).
    val prepped = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val toks = col("toks")
    // chunks needed: 1 + ceil(max(n - chunkTokens, 0) / stride)
    val extra = greatest(size(toks) - chunkTokens, lit(0))
    val nChunks = (lit(1) + ceil(extra.cast("double") / stride)).cast("int")
    // n_tokens = |slice(toks, i*stride+1, chunkTokens)| in closed form —
    // saves the second slice per chunk
    val chunks = transform(sequence(lit(0), nChunks - 1), i =>
      struct(
        array_join(slice(toks, i * stride + 1, lit(chunkTokens)), " ").as("chunk_text"),
        greatest(least(lit(chunkTokens), size(toks) - i * stride), lit(0))
          .cast("long").as("n_tokens")))
    prepped.select(col("doc_id"), posexplode(chunks))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col.chunk_text"), col("col.n_tokens"))
  }

  /** The seen-content hash table of a processed snapshot: distinct md5 of
    * every document text. This is what an incremental crawl pipeline
    * persists between snapshots (hash column only — 32 bytes/doc, not the
    * corpus).
    */
  def seenHashes(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("text_md5")).distinct()

  /** Incremental (cross-snapshot) exact dedup: flag each new-snapshot
    * document as novel iff its content hash is absent from the previously
    * `seen` hash table (CommonCrawl-style "only keep pages not already in an
    * earlier crawl"). Keeps every row with an `is_new` flag rather than
    * dropping, so downstream stats can count both sides; filter
    * `is_new = 1` for the anti-join semantics.
    *
    * Scale shape: one hash join on the 16-byte digest. The seen table for a
    * 10^12-doc history is too big to broadcast, so this is a shuffle hash
    * join on the hash key — and because the probe is highly selective when
    * snapshots overlap heavily, Spark's runtime row-level Bloom filter
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) prunes the probe
    * side before the shuffle, which is exactly the Bloom-filter pre-pass the
    * hand-rolled pipelines (CCNet, Dolma) implement manually.
    */
  def dedupIncremental(newDocs: DataFrame, seen: DataFrame): DataFrame =
    newDocs.withColumn("text_md5", md5(col("text")))
      .join(seen.select(col("text_md5")).distinct()
          .withColumn("seen_flag", lit(1L)),
        Seq("text_md5"), "left")
      .withColumn("is_new", when(col("seen_flag").isNull, 1L).otherwise(0L))
      .drop("seen_flag")
}
