package graft.algos

import graft.core.{CheckpointStore, Iterate, LinkGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weakly / strongly connected components.
  *
  * Reference: `clusters(mode=weak|strong)` (`__init__.py:613-622`,
  * `graphobject.c:4358-4387`) returns a membership vector; goldens compare
  * memberships up to relabeling (`test_decomposition.py:175-188,213-215`).
  *
  * Output convention here: (id, comp) where `comp` is the **minimum vertex id
  * in the component** — a deterministic, cluster-size-independent label that
  * needs no global sort; [[graft.core.GraphOps.canonicalizeMembership]]
  * densifies to 0..k-1 when igraph-style labels are required.
  */
object Components {

  /** WCC: min-label propagation with pointer-jumping ("shortcutting").
    *
    * Each round does (1) a neighbor-min hash join + groupBy over the
    * bidirected edge view, then (2) one label-table self-join that replaces
    * every label by its label's label — the union-find path-halving analog
    * that turns O(diameter) convergence into ~O(log diameter) rounds; web
    * graphs converge in a handful of supersteps. Lineage is cut every round.
    */
  def wcc(g: LinkGraph, store: Option[CheckpointStore] = None, maxIter: Int = 50,
          smallThreshold: Long = 1000000L): DataFrame = {
    // NOTE loops ride along in the persisted frame (they are a no-op for
    // min-label propagation and for union-find); the distributed join below
    // filters them per-scan from the cached rows. Keeping them means the
    // small-path vertex set can be derived from the COLLECTED rows instead
    // of from g.vertices — whose edge-endpoint derivation would re-run the
    // whole upstream pipeline (LSH candidate generation, pair confirm, ...)
    // once for the gate count and once more for the output set. That double
    // recompute was the dominant cost of every dedup query that ends in a
    // WCC over candidate pairs (q_embed_dedup_lsh: 3 full pipeline runs).
    val adj = g.bidirected.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist()
    // adaptive small-input fast path (the AQE posture, decided by a runtime
    // COUNT, never by assumption): WCC is a frequent inner stage — LSH
    // near-dup clustering, embedding dedup, line dedup all run it on a
    // CANDIDATE graph that is orders of magnitude smaller than the corpus —
    // and the distributed loop costs ~6 jobs a round in pure scheduling on a
    // graph that fits in one task. Under the gate, one collect + union-find
    // (union-by-min preserves the exact min-id labeling of the fixpoint)
    // replaces ~44 jobs with 3 (StageProbe, sf0.1 q_wcc). Above the gate —
    // any real web-scale run — nothing changes. Checkpointed runs keep the
    // distributed loop: resume tests replay per-round lineage.
    // Gate without extra jobs: explicit n when given; otherwise every vertex
    // is an endpoint of some collected row, so |V| <= |adj rows| <= gate.
    if (store.isEmpty && adj.count() <= smallThreshold
        && g.numVertices.forall(_ <= smallThreshold)) {
      val spark = g.spark
      import spark.implicits._
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x
        while (c != r) { val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt }
        r
      }
      val rows = adj.collect()
      rows.foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) { if (a < b) parent.put(b, a) else parent.put(a, b) }
      }
      val vset: Iterator[Long] = g.numVertices match {
        case Some(n) => Iterator.range(0L, n)
        case None    => // distinct endpoints, loops included — same set
          rows.iterator.flatMap(r => Iterator(r.getLong(0), r.getLong(1)))
            .to(scala.collection.immutable.SortedSet).iterator
      }
      val out = vset.map(v => (v, find(v))).toSeq
      adj.unpersist()
      return out.toDF("id", "comp")
    }
    val adjNoLoop = adj.where(col("src") =!= col("dst"))
    var labels = g.vertices.select(col("id"), col("id").as("comp")).transform(graft.core.Lineage.cut)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val t0 = System.currentTimeMillis()
      val nbrMin = adjNoLoop.join(labels, adjNoLoop("src") === labels("id"))
        .groupBy(col("dst").as("id")).agg(min(col("comp")).as("nbr_comp"))
      // pre-round label rides as `old` so the convergence count is a scan
      // of the checkpointed frame, not a shuffle join per round
      val step1 = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          col("comp").as("old"))
      // pointer jumping: comp <- comp(comp)
      val jump = step1.select(col("id").as("jid"), col("comp").as("jcomp"))
      val step2 = step1.join(jump, step1("comp") === jump("jid"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"),
          col("old"))
      val cut = Iterate.cut(step2, iter + 1, store, t0)
      changed = cut.where(col("comp") =!= col("old")).count()
      labels = cut.select("id", "comp")
      iter += 1
    }
    adj.unpersist()
    // silent truncation would be a wrong answer, not a slow one (ADVICE r01)
    require(changed == 0, s"wcc did not converge in $maxIter rounds")
    labels
  }

  /** Max-id propagation to fixpoint over `edges` (src -> dst) WITH pointer
    * jumping: after each neighbor-max round, `color(v) <- max(color(v),
    * color(color(v)))`. The jump is sound for reachability colorings —
    * `color(v) = c` means c relates to v (reaches v / is reached by v, per
    * edge orientation) and `color(c) = d` means d relates to c, so d relates
    * to v by transitivity. Turns O(diameter) rounds into ~O(log diameter),
    * the same shortcutting [[wcc]] uses.
    */
  private def maxColor(verts: DataFrame, edges: DataFrame): DataFrame = {
    var colors = verts.select(col("id"), col("id").as("color"))
      .transform(graft.core.Lineage.cut)
    var changed = 1L
    while (changed > 0) {
      val msg = edges.join(colors, edges("src") === colors("id"))
        .groupBy(col("dst").as("id")).agg(max(col("color")).as("in_color"))
      val step1 = colors.join(msg, Seq("id"), "left")
        .select(col("id"),
          greatest(col("color"), coalesce(col("in_color"), col("color"))).as("color"),
          col("color").as("old"))
      val jump = step1.select(col("id").as("jid"), col("color").as("jcolor"))
      val step2 = step1.join(jump, step1("color") === jump("jid"), "left")
        .select(col("id"),
          greatest(col("color"), coalesce(col("jcolor"), col("color"))).as("color"),
          col("old"))
        .transform(graft.core.Lineage.cut)
      changed = step2.where(col("color") =!= col("old")).count()
      colors = step2.select("id", "color")
    }
    colors
  }

  /** SCC by forward+backward max-coloring with partition splitting.
    *
    * Per round: (1) one trim pass (no-in / no-out vertices are singleton
    * SCCs); (2) pointer-jumped max colorings `cf(v)` = max id reaching v and
    * `cb(v)` = max id reachable from v; (3) every class `{v : cf(v) = cb(v)
    * = c}` is EXACTLY the SCC of c — c reaches the class and the class
    * reaches c, so c itself is inside it — peel all such classes at once
    * (the SCC of the globally maximal id always qualifies, so every round
    * makes progress); (4) delete every edge whose endpoints disagree on the
    * (cf, cb) pair — SCC-mates share both colors, so no intra-SCC edge is
    * lost, and the remaining graph splits into independent subproblems that
    * all advance inside the same DataFrames on subsequent rounds.
    *
    * Expressed entirely as join/groupBy supersteps with lineage cuts. Exact;
    * matches the reference's `clusters(mode="strong")` up to relabeling.
    *
    * Scale note: chains — the O(n)-round worst case of the round-3 coloring
    * implementation (SCCChainSpec pins this) — now resolve in ~2 rounds: the
    * colorings converge in O(log n) jumped rounds, the (cf, cb) pairs of a
    * chain are all distinct, so the split deletes every chain edge and the
    * next trim pass clears the vertices wholesale.
    */
  def scc(g: LinkGraph, maxRounds: Int = 200): DataFrame = {
    require(g.directed, "scc requires a directed graph")
    val spark = g.spark
    var remainingV = g.vertices.transform(graft.core.Lineage.cut)
    var remainingE = g.weighted.select("src", "dst")
      .where(col("src") =!= col("dst")).distinct().transform(graft.core.Lineage.cut)
    var result = spark.emptyDataFrame
      .withColumn("id", lit(0L)).withColumn("comp", lit(0L)).limit(0)
    var rounds = 0

    while (remainingV.count() > 0 && rounds < maxRounds) {
      rounds += 1
      // --- trim (one pass): no in- or no out-edges => singleton SCC. The
      // coloring + split below handles chains of trivial vertices in bulk,
      // so a single pass suffices — no inner fixpoint loop.
      val hasOut = remainingE.select(col("src").as("id")).distinct()
      val hasIn = remainingE.select(col("dst").as("id")).distinct()
      val trivial = remainingV
        .join(hasOut, Seq("id"), "left_anti")
        .union(remainingV.join(hasIn, Seq("id"), "left_anti"))
        .distinct().transform(graft.core.Lineage.cut)
      if (!trivial.isEmpty) {
        result = result.union(trivial.select(col("id"), col("id").as("comp"))).transform(graft.core.Lineage.cut)
        remainingV = remainingV.join(trivial, Seq("id"), "left_anti").transform(graft.core.Lineage.cut)
        remainingE = remainingE
          .join(trivial.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(trivial.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst").transform(graft.core.Lineage.cut)
      }
      if (remainingV.count() > 0) {
        val cf = maxColor(remainingV, remainingE)
        val cb = maxColor(remainingV,
          remainingE.select(col("dst").as("src"), col("src").as("dst")))
        val pairs = cf.join(cb.withColumnRenamed("color", "bcolor"), Seq("id"))
          .select(col("id"), col("color").as("cf"), col("bcolor").as("cb"))
          .transform(graft.core.Lineage.cut)
        // --- peel: cf == cb = c <=> v is in SCC(c)
        val done = pairs.where(col("cf") === col("cb"))
        val lbl = done.groupBy("cf").agg(min("id").as("comp"))
        val found = done.join(lbl, Seq("cf")).select(col("id"), col("comp"))
          .transform(graft.core.Lineage.cut)
        result = result.union(found).transform(graft.core.Lineage.cut)
        remainingV = remainingV.join(found.select("id"), Seq("id"), "left_anti")
          .transform(graft.core.Lineage.cut)
        // --- split: keep only edges whose endpoints share the (cf, cb) pair
        // (intra-SCC edges always do), minus anything touching a peeled SCC
        val sPairs = pairs.select(col("id").as("src"), col("cf").as("scf"), col("cb").as("scb"))
        val dPairs = pairs.select(col("id").as("dst"), col("cf").as("dcf"), col("cb").as("dcb"))
        remainingE = remainingE.join(sPairs, Seq("src")).join(dPairs, Seq("dst"))
          .where(col("scf") === col("dcf") && col("scb") === col("dcb"))
          .select("src", "dst")
          .join(found.select(col("id").as("src")), Seq("src"), "left_anti")
          .join(found.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .transform(graft.core.Lineage.cut)
      }
    }
    // exhausting the round budget would mean a membership that's silently
    // missing vertices — refuse instead
    require(remainingV.count() == 0, s"scc did not converge in $maxRounds rounds")
    result
  }

  /** `decompose(mode, maxcompno, minelements)` (`graphobject.c:13258-13271`):
    * component subgraphs, largest first, capped at `maxCompNo`, components
    * below `minElements` dropped. The returned handles are lazy views onto
    * the shared labeled edge table — only the label/size aggregate runs here.
    */
  def decompose(g: LinkGraph, strong: Boolean = false,
                maxCompNo: Int = Int.MaxValue, minElements: Int = 1): Seq[LinkGraph] = {
    val labels = if (strong) scc(g) else wcc(g)
    val picked = labels.groupBy("comp").agg(count(lit(1)).as("sz"))
      .where(col("sz") >= minElements)
      .orderBy(col("sz").desc, col("comp")).limit(maxCompNo)
      .select("comp").collect().map(_.getLong(0))
    picked.toSeq.map { cid =>
      graft.core.GraphOps.inducedSubgraph(g, labels.where(col("comp") === cid).select("id"))
    }
  }

  /** Largest component's vertex set (the reference's `giant()`,
    * `clustering.py:411-428`).
    */
  def giant(g: LinkGraph): DataFrame = {
    val labels = wcc(g)
    val top = labels.groupBy("comp").agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("comp")).limit(1)
    labels.join(broadcast(top), Seq("comp")).select("id")
  }
}
