package graft.algos

import graft.core.LinkGraph

/** Biconnected components and articulation points
  * (`graphobject.c:3977-4030, 13018, 13141`; goldens
  * `tests/test_structural.py:212-233`).
  *
  * Hopcroft-Tarjan needs DFS low-points, and DFS order is inherently
  * sequential (a BFS tree's cross edges break the low-point invariant), so
  * this runs the classical iterative edge-stack algorithm driver-side over
  * the collected simple undirected adjacency — the same small-graph kernel
  * strategy as [[Louvain.localMoveSequential]]. The distributed upgrade
  * path (documented, not built) is Tarjan-Vishkin: spanning tree + Euler
  * tour + an auxiliary-graph connectivity pass, all expressible on the
  * existing WCC machinery. [[graft.ops.Extras.bridges]] (the edge analog)
  * IS fully distributed.
  */
object Biconnected {

  final case class Result(components: Seq[Set[Long]], articulationPoints: Seq[Long])

  def run(g: LinkGraph): Result = {
    val edges = g.weighted.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .distinct
    val vertices = g.vertices.collect().map(_.getLong(0)).sorted
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    edges.foreach { case (u, v) => adj(u) = v :: adj(u); adj(v) = u :: adj(v) }
    adj.keys.toSeq.foreach(k => adj(k) = adj(k).sorted)

    val disc = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val aps = scala.collection.mutable.SortedSet.empty[Long]
    val comps = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
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
                val members = scala.collection.mutable.Set.empty[Long]
                var done = false
                while (!done && edgeStack.nonEmpty) {
                  val (a, b) = edgeStack.pop()
                  members += a; members += b
                  if ((a, b) == ((parent, v))) done = true
                }
                if (members.nonEmpty) comps += members.toSet
                if (parent != root || rootChildren > 1) aps += parent
              }
            }
        }
      }
    }
    Result(comps.toSeq, aps.toSeq)
  }

  /** `articulation_points` / `cut_vertices` (`graphobject.c:13018`). */
  def articulationPoints(g: LinkGraph): Seq[Long] = run(g).articulationPoints

  /** `biconnected_components` vertex sets (`graphobject.c:13141`). */
  def biconnectedComponents(g: LinkGraph): Seq[Set[Long]] = run(g).components
}
