package graft.algos

import graft.core.{Lineage, LinkGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Biconnected components and articulation points
  * (`graphobject.c:3977-4030, 13018, 13141`; goldens
  * `tests/test_structural.py:212-233`).
  *
  * The distributed path is Tarjan-Vishkin (1985, "An efficient parallel
  * biconnectivity algorithm" — public): unlike Hopcroft-Tarjan it needs no
  * DFS, only SOME rooted spanning forest, so it composes from machinery the
  * engine already has — the BFS forest (as in [[graft.ops.Extras.bridges]]),
  * per-level sweeps for preorder/subtree-size/low/high, and one WCC pass
  * over an auxiliary graph whose vertices are the tree edges:
  *
  *   - preorder `pre(v)` and descendant count `nd(v)` make the ancestor
  *     test interval arithmetic: u is an ancestor of w iff
  *     `pre(u) <= pre(w) < pre(u)+nd(u)`;
  *   - `low(v)` / `high(v)` = min / max preorder reachable from v's subtree
  *     via one non-tree edge (or within the subtree itself);
  *   - aux edges: (R1) each non-tree edge {x,y} with x,y UNRELATED joins
  *     tree edges (p(x),x)-(p(y),y); (R2) each tree edge (v,w), v=p(w)
  *     non-root, joins (p(v),v)-(v,w) iff `low(w) < pre(v)` or
  *     `high(w) >= pre(v)+nd(v)` (w's subtree escapes v's subtree — the
  *     `high` half is what makes a non-DFS tree sound: BFS cross edges to a
  *     later sibling subtree still climb through p(v));
  *   - WCC components of the aux graph = biconnected components; a vertex
  *     is an articulation point iff it lies in >= 2 blocks.
  *
  * All sweeps are per-level joins/aggregations (O(BFS-depth) supersteps,
  * linear total work, skew bounded by max BFS fanout); nothing is collected
  * to the driver until the user asks for the Seq view. Every stage boundary
  * is HARD lineage-cut ([[graft.core.Lineage.cut]]), not soft-persisted: the
  * sweeps reference shared frames (preorder, the per-vertex info record)
  * several times each, and a soft-persisted plan tree re-expands per
  * reference in every job's SQL-event plan description — the same
  * exponential-explainString pathology the PageRank loop documents (observed
  * here as minutes of driver-side regex work per action on a 10-vertex
  * graph). The classical
  * Hopcroft-Tarjan kernel is kept as [[runSequential]] — the parity
  * reference for the property tests.
  */
object Biconnected {

  final case class Result(components: Seq[Set[Long]], articulationPoints: Seq[Long])

  /** Distributed Tarjan-Vishkin. Returns (blocks, articulation):
    * `blocks` = one row per simple non-loop edge `(u, v, block)` with
    * u < v and `block` a stable label (the min tree-edge id of the block);
    * `articulation` = single-column `id` frame of the cut vertices.
    */
  def blocksDF(g: LinkGraph, smallThreshold: Long = 8000000L): (DataFrame, DataFrame) = {
    val spark = g.spark
    // canonical simple non-loop edges (the sequential kernel's view too)
    val simple = g.weighted.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .transform(Lineage.cut)
    val empty = spark.range(0)
    if (simple.isEmpty)
      return (empty.select(col("id").as("u"), col("id").as("v"), col("id").as("block")),
        empty.select(col("id")))

    // gated driver Hopcroft-Tarjan (the WCC/multiBfs posture): the
    // Tarjan-Vishkin level machinery below costs ~6 scheduled jobs per BFS
    // level (337 jobs at sf0.1, StageProbe q_articulation) while the whole
    // simple-edge set fits in one task; under the gate the classical
    // edge-stack DFS emits the identical per-edge blocks and articulation
    // set in 3 jobs. Above the gate the distributed path is unchanged
    // (runSequential-vs-run parity specs pin both).
    if (simple.count() <= smallThreshold) {
      import spark.implicits._
      val es = simple.collect().map(r => (r.getLong(0), r.getLong(1)))
      val vs = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val (blockRows, aps) = tarjanEdgeBlocks(es, vs)
      return (
        spark.createDataset(spark.sparkContext.parallelize(
          blockRows.toSeq, spark.sparkContext.defaultParallelism)).toDF("u", "v", "block"),
        spark.createDataset(spark.sparkContext.parallelize(
          aps, math.max(1, spark.sparkContext.defaultParallelism / 4))).toDF("id"))
    }

    val adj = simple.select(col("u").as("a"), col("v").as("b"))
      .union(simple.select(col("v").as("a"), col("u").as("b")))
      .repartition(col("a")).persist()
    adj.count()

    // --- 1. BFS forest from per-component min-id roots ------------------
    val und = LinkGraph(simple.select(col("u").as("src"), col("v").as("dst")),
      directed = false, g.numVertices)
    val comp = Components.wcc(und)
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame] // (v, parent)
    levels += Lineage.cut(comp.where(col("id") === col("comp"))
      .select(col("id").as("v"), lit(-1L).as("parent")))
    var visitedIds = levels(0).select("v").transform(Lineage.cut)
    var growing = true
    while (growing) {
      val next = levels.last.select(col("v").as("a"))
        .join(adj, Seq("a"))
        .groupBy(col("b").as("v")).agg(min(col("a")).as("parent"))
        .join(visitedIds, Seq("v"), "left_anti")
        .transform(Lineage.cut)
      if (next.isEmpty) growing = false
      else {
        levels += next
        visitedIds = visitedIds.union(next.select("v")).transform(Lineage.cut)
      }
    }
    val maxDepth = levels.size - 1
    val treeCanon = (1 to maxDepth).map(d => levels(d)
      .select(least(col("v"), col("parent")).as("u"), greatest(col("v"), col("parent")).as("v")))
      .reduceOption(_ union _)
      .getOrElse(empty.select(col("id").as("u"), col("id").as("v")))
      .transform(Lineage.cut)
    val nonTree = simple.join(treeCanon, Seq("u", "v"), "left_anti").transform(Lineage.cut)

    // --- 2. subtree sizes nd(v), deepest level first --------------------
    val ndByLevel = new Array[DataFrame](maxDepth + 1)
    var childNd: DataFrame = null // (v, cnd) aggregated from the level below
    for (d <- maxDepth to 0 by -1) {
      val base = levels(d)
      val nd =
        if (childNd == null) base.select(col("v"), col("parent"), lit(1L).as("nd"))
        else base.join(childNd, Seq("v"), "left")
          .select(col("v"), col("parent"), (lit(1L) + coalesce(col("cnd"), lit(0L))).as("nd"))
      ndByLevel(d) = Lineage.cut(nd)
      childNd = ndByLevel(d).groupBy(col("parent").as("v")).agg(sum("nd").as("cnd"))
    }

    // --- 3. preorder, top-down: siblings ordered by id, each child offset
    //        by the subtree sizes of its earlier siblings ----------------
    val preByLevel = new Array[DataFrame](maxDepth + 1)
    preByLevel(0) = Lineage.cut(levels(0).select(col("v"), lit(0L).as("pre")))
    for (d <- 1 to maxDepth) {
      val w = Window.partitionBy("parent").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withOff = ndByLevel(d)
        .withColumn("off", sum("nd").over(w) - col("nd"))
      preByLevel(d) = Lineage.cut(withOff
        .join(preByLevel(d - 1).select(col("v").as("parent"), col("pre").as("ppre")), Seq("parent"))
        .select(col("v"), (col("ppre") + lit(1L) + col("off")).as("pre")))
    }
    val preAll = preByLevel.reduce(_ union _).transform(Lineage.cut)

    // --- 4. low/high: non-tree neighbor preorders, swept up the forest --
    val nbrExtremes = nonTree.select(col("u").as("a"), col("v").as("b"))
      .union(nonTree.select(col("v").as("a"), col("u").as("b")))
      .join(preAll.select(col("v").as("b"), col("pre").as("bpre")), Seq("b"))
      .groupBy(col("a").as("v")).agg(min("bpre").as("nmin"), max("bpre").as("nmax"))
      .transform(Lineage.cut)
    val lhByLevel = new Array[DataFrame](maxDepth + 1)
    var childLh: DataFrame = null // (v, clow, chigh)
    for (d <- maxDepth to 0 by -1) {
      val base = levels(d)
        .join(preAll, Seq("v"))
        .join(nbrExtremes, Seq("v"), "left")
        .select(col("v"), col("parent"),
          least(col("pre"), coalesce(col("nmin"), col("pre"))).as("low0"),
          greatest(col("pre"), coalesce(col("nmax"), col("pre"))).as("high0"))
      val lh =
        if (childLh == null) base.select(col("v"), col("parent"),
          col("low0").as("low"), col("high0").as("high"))
        else base.join(childLh, Seq("v"), "left")
          .select(col("v"), col("parent"),
            least(col("low0"), coalesce(col("clow"), col("low0"))).as("low"),
            greatest(col("high0"), coalesce(col("chigh"), col("high0"))).as("high"))
      lhByLevel(d) = Lineage.cut(lh)
      childLh = lhByLevel(d).groupBy(col("parent").as("v"))
        .agg(min("low").as("clow"), max("high").as("chigh"))
    }
    val lhAll = lhByLevel.reduce(_ union _)

    // per-vertex structural record: (v, parent, pre, nd, low, high)
    val info = (0 to maxDepth).map(d => ndByLevel(d)).reduce(_ union _)
      .join(preAll, Seq("v"))
      .join(lhAll.select("v", "low", "high"), Seq("v"))
      .transform(Lineage.cut)

    // --- 5. auxiliary graph over tree-edge ids (= child vertex ids) -----
    // R1: non-tree {x,y}, pre(x) < pre(y), unrelated (y outside x's interval)
    val withPre = nonTree
      .join(info.select(col("v").as("u"), col("pre").as("upre"), col("nd").as("und")), Seq("u"))
      .join(info.select(col("v"), col("pre").as("vpre"), col("nd").as("vnd")), Seq("v"))
    val ordered = withPre.select(
      when(col("upre") < col("vpre"), col("u")).otherwise(col("v")).as("x"),
      when(col("upre") < col("vpre"), col("v")).otherwise(col("u")).as("y"),
      least(col("upre"), col("vpre")).as("xpre"),
      when(col("upre") < col("vpre"), col("und")).otherwise(col("vnd")).as("xnd"),
      greatest(col("upre"), col("vpre")).as("ypre"))
      .transform(Lineage.cut)
    val r1 = ordered.where(col("ypre") >= col("xpre") + col("xnd"))
      .select(col("x").as("src"), col("y").as("dst"))
    // R2: tree edge (v,w) with v=p(w) non-root and w's subtree escaping v's
    val r2 = info.where(col("parent") =!= -1L).as("w")
      .join(info.where(col("parent") =!= -1L)
        .select(col("v").as("parent"), col("pre").as("ppre"), col("nd").as("pnd")), Seq("parent"))
      .where(col("low") < col("ppre") || col("high") >= col("ppre") + col("pnd"))
      .select(col("parent").as("src"), col("v").as("dst"))

    val auxEdges = r1.union(r2).transform(Lineage.cut)
    val auxWcc =
      if (auxEdges.isEmpty) empty.select(col("id").as("id"), col("id").as("comp"))
      else Components.wcc(LinkGraph(auxEdges, directed = false, None))

    // every non-root vertex is a tree edge; isolated aux vertices (bridges)
    // become their own singleton block
    val blockOf = info.where(col("parent") =!= -1L).select(col("v"), col("parent"), col("pre"))
      .join(auxWcc.withColumnRenamed("id", "v"), Seq("v"), "left")
      .select(col("v"), col("parent"), col("pre"), coalesce(col("comp"), col("v")).as("block"))
      .transform(Lineage.cut)

    val treeBlocks = blockOf.select(
      least(col("v"), col("parent")).as("u"), greatest(col("v"), col("parent")).as("v"), col("block"))
    // a non-tree edge lies on the fundamental cycle through its larger-pre
    // endpoint's tree edge
    val nonTreeBlocks = ordered
      .join(blockOf.select(col("v").as("y"), col("block")), Seq("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"), col("block"))
    val blocks = treeBlocks.union(nonTreeBlocks).transform(Lineage.cut)

    val articulation = treeBlocks
      .select(col("u").as("id"), col("block"))
      .union(treeBlocks.select(col("v").as("id"), col("block")))
      .groupBy("id").agg(countDistinct("block").as("nb"))
      .where(col("nb") > 1).select("id")

    adj.unpersist()
    (blocks, articulation)
  }

  /** Distributed Tarjan-Vishkin, collected to the reference's Seq view:
    * components ordered by min member, articulation points sorted.
    */
  def run(g: LinkGraph, smallThreshold: Long = 8000000L): Result = {
    val (blocks, articulation) = blocksDF(g, smallThreshold)
    val comps = blocks
      .select(col("block"), array(col("u"), col("v")).as("uv"))
      .select(col("block"), explode(col("uv")).as("id"))
      .groupBy("block").agg(collect_set("id").as("members"))
      .collect()
      .map(r => r.getAs[Seq[Long]]("members").toSet)
      .sortBy(_.min)
      .toSeq
    val aps = articulation.collect().map(_.getLong(0)).sorted.toSeq
    Result(comps, aps)
  }

  /** Classical Hopcroft-Tarjan (iterative edge-stack) over the collected
    * adjacency — the small-graph kernel and the parity reference for the
    * distributed path.
    */
  def runSequential(g: LinkGraph): Result = {
    val edges = g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct
    val vertices = g.vertices.collect().map(_.getLong(0)).sorted
    val (blockRows, aps) = tarjanEdgeBlocks(edges, vertices)
    val comps = blockRows.groupBy(_._3).values
      .map(rows => rows.flatMap(r => Seq(r._1, r._2)).toSet)
      .toSeq.sortBy(_.min)
    Result(comps, aps)
  }

  /** The classical edge-stack DFS over collected (u < v, distinct, loop-free)
    * edges: per-edge block assignment + articulation set. Shared by
    * [[runSequential]] and [[blocksDF]]'s small-input gate.
    */
  private[graft] def tarjanEdgeBlocks(edges: Array[(Long, Long)], vertices: Array[Long])
      : (scala.collection.mutable.ArrayBuffer[(Long, Long, Long)], Seq[Long]) = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) = v :: adj(u); adj(v) = u :: adj(v) }
    adj.keys.toSeq.foreach(k => adj(k) = adj(k).sorted)

    val disc = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val aps = scala.collection.mutable.SortedSet.empty[Long]
    val blockRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var blockId = 0L
    val edgeStack = scala.collection.mutable.Stack.empty[(Long, Long)]
    var timer = 0

    for (root <- vertices if !disc.contains(root)) {
      // iterative DFS: frames of (vertex, parent, remaining-neighbor list)
      val stack = scala.collection.mutable.Stack((root, -1L, adj(root)))
      disc(root) = timer; low(root) = timer; timer += 1
      var rootChildren = 0
      while (stack.nonEmpty) {
        val (v, parent, rest) = stack.pop()
        rest match {
          case w :: tail =>
            stack.push((v, parent, tail))
            if (!disc.contains(w)) {
              if (v == root) rootChildren += 1
              edgeStack.push((v, w))
              disc(w) = timer; low(w) = timer; timer += 1
              stack.push((w, v, adj(w)))
            } else if (w != parent && disc(w) < disc(v)) {
              edgeStack.push((v, w))
              low(v) = math.min(low(v), disc(w))
            }
          case Nil =>
            if (parent != -1L) {
              low(parent) = math.min(low(parent), low(v))
              if (low(v) >= disc(parent)) {
                // pop the component's edges up to and including (parent, v)
                var popped = false
                var emitted = false
                while (!popped && edgeStack.nonEmpty) {
                  val (a, b) = edgeStack.pop()
                  blockRows += ((math.min(a, b), math.max(a, b), blockId))
                  emitted = true
                  if ((a, b) == ((parent, v))) popped = true
                }
                if (emitted) blockId += 1
                if (parent != root || rootChildren > 1) aps += parent
              }
            }
        }
      }
    }
    (blockRows, aps.toSeq)
  }

  /** `articulation_points` / `cut_vertices` (`graphobject.c:13018`). */
  def articulationPoints(g: LinkGraph): Seq[Long] = run(g).articulationPoints

  /** `biconnected_components` vertex sets (`graphobject.c:13141`). */
  def biconnectedComponents(g: LinkGraph): Seq[Set[Long]] = run(g).components
}
