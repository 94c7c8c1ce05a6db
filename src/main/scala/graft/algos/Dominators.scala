package graft.algos

import graft.core.{LinkGraph, Mode}
import org.apache.spark.sql.DataFrame

/** `dominator(root, mode)` (`graphobject.c:15528`; goldens
  * `test_structural.py:775-893`): the immediate-dominator tree of the flow
  * graph rooted at `root`. A require-gated driver kernel (SURVEY P3 —
  * dominator computation is inherently sequential): the Cooper–Harvey–
  * Kennedy iterative algorithm over reverse postorder, which converges in
  * a handful of passes on reducible graphs and is exact on any graph.
  *
  * Output: (id, idom) rows for vertices REACHABLE from the root; the root's
  * idom is -1 (the reference returns NaN for unreachable vertices — absent
  * rows here).
  */
object Dominators {

  val maxKernelVertices = 2000000L

  def dominator(g: LinkGraph, root: Long, mode: Mode = Mode.Out): DataFrame = {
    require(g.directed, "dominator requires a directed graph")
    val n0 = g.vcount()
    require(n0 <= maxKernelVertices,
      s"dominator is a sequential driver kernel — capped at $maxKernelVertices vertices ($n0 given)")
    val spark = g.spark
    import spark.implicits._
    val rawEdges = g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = if (mode == Mode.In) rawEdges.map(_.swap) else rawEdges
    val ids = g.vertices.collect().map(_.getLong(0)).sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val pred = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    edges.foreach { case (a, b) =>
      if (a != b) { adj(idx(a)) += idx(b); pred(idx(b)) += idx(a) }
    }
    val r = idx(root)
    // DFS from root -> reverse postorder
    val state = new Array[Int](n) // 0 unvisited, 1 on stack, 2 done
    val post = scala.collection.mutable.ArrayBuffer.empty[Int]
    val stack = scala.collection.mutable.ArrayBuffer((r, 0))
    state(r) = 1
    while (stack.nonEmpty) {
      val (u, i) = stack.last
      if (i < adj(u).length) {
        stack(stack.length - 1) = (u, i + 1)
        val v = adj(u)(i)
        if (state(v) == 0) { state(v) = 1; stack += ((v, 0)) }
      } else {
        stack.remove(stack.length - 1)
        state(u) = 2
        post += u
      }
    }
    val rpo = post.reverse // root first
    val rpoNum = new Array[Int](n)
    rpo.zipWithIndex.foreach { case (v, k) => rpoNum(v) = k }
    val idom = Array.fill(n)(-1)
    idom(r) = r
    def intersect(a0: Int, b0: Int): Int = {
      var a = a0; var b = b0
      while (a != b) {
        while (rpoNum(a) > rpoNum(b)) a = idom(a)
        while (rpoNum(b) > rpoNum(a)) b = idom(b)
      }
      a
    }
    var changed = true
    while (changed) {
      changed = false
      rpo.drop(1).foreach { v =>
        val processed = pred(v).filter(p => state(p) == 2 && idom(p) >= 0)
        if (processed.nonEmpty) {
          var nd = processed.head
          processed.tail.foreach(p => nd = intersect(p, nd))
          if (idom(v) != nd) { idom(v) = nd; changed = true }
        }
      }
    }
    (0 until n).filter(v => state(v) == 2 && idom(v) >= 0)
      .map(v => (ids(v), if (v == r) -1L else ids(idom(v))))
      .toDF("id", "idom")
  }
}
