package graft.algos

import graft.core.LinkGraph
import org.apache.spark.sql.functions._

/** Directed triad census — 16 isomorphism classes in the standard
  * MAN-label order (003, 012, 102, 021D, 021U, 021C, 111D, 111U, 030T,
  * 030C, 201, 120D, 120U, 120C, 210, 300).
  *
  * Reference: `triad_census` (`graphobject.c:14357`, wrapper
  * `__init__.py:636-651`, result type `datatypes.py:504-655`).
  *
  * Distributed shape: only triples with >= 2 connected dyads are ever
  * materialized (one wedge self-join on the symmetric connected-pair list,
  * then a 64-row broadcast lookup from dyad codes to triad class); triples
  * with exactly ONE connected dyad are counted in closed form per edge
  * (n − 2 − |N(a) ∪ N(b) ∖ {a,b}|, from degrees + common-neighbor counts),
  * and the all-null class is C(n,3) minus the rest. No O(n^3) anywhere —
  * cost is O(#wedges), the same as triangle counting.
  */
object Triads {

  // 6 possible arcs of a labeled 3-vertex digraph -> bit positions
  private val arcIdx: Map[(Int, Int), Int] =
    Map((0, 1) -> 0, (1, 0) -> 1, (0, 2) -> 2, (2, 0) -> 3, (1, 2) -> 4, (2, 1) -> 5)

  private def canon(mask: Int): Int = {
    val perms = Seq(Seq(0, 1, 2), Seq(0, 2, 1), Seq(1, 0, 2), Seq(1, 2, 0), Seq(2, 0, 1), Seq(2, 1, 0))
    perms.map { p =>
      var m = 0
      for (((a, b), bit) <- arcIdx) if ((mask & (1 << bit)) != 0) m |= 1 << arcIdx((p(a), p(b)))
      m
    }.min
  }

  /** Representatives in igraph order (igraph triad_census docstring):
    * 003; 012 A->B; 102 A<->B; 021D A<-B->C; 021U A->B<-C; 021C A->B->C;
    * 111D A<->B<-C; 111U A<->B->C; 030T A->B<-C,A->C; 030C A<-B<-C,A->C;
    * 201 A<->B<->C; 120D A<-B->C,A<->C; 120U A->B<-C,A<->C;
    * 120C A->B->C,A<->C; 210 A->B<->C,A<->C; 300 complete.
    */
  private[algos] val reps: Seq[Seq[(Int, Int)]] = Seq(
    Seq(),
    Seq((0, 1)),
    Seq((0, 1), (1, 0)),
    Seq((1, 0), (1, 2)),
    Seq((0, 1), (2, 1)),
    Seq((0, 1), (1, 2)),
    Seq((0, 1), (1, 0), (2, 1)),
    Seq((0, 1), (1, 0), (1, 2)),
    Seq((0, 1), (2, 1), (0, 2)),
    Seq((1, 0), (2, 1), (0, 2)),
    Seq((0, 1), (1, 0), (1, 2), (2, 1)),
    Seq((1, 0), (1, 2), (0, 2), (2, 0)),
    Seq((0, 1), (2, 1), (0, 2), (2, 0)),
    Seq((0, 1), (1, 2), (0, 2), (2, 0)),
    Seq((0, 1), (1, 2), (2, 1), (0, 2), (2, 0)),
    Seq((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)))

  private val canonToClass: Map[Int, Int] = reps.zipWithIndex.map { case (es, cl) =>
    canon(es.foldLeft(0)((m, e) => m | (1 << arcIdx(e)))) -> cl
  }.toMap

  /** Dyad codes (1 = first->second, 2 = second->first, 3 = mutual, 0 = none)
    * of the (i,j), (i,k), (j,k) dyads of a sorted triple -> triad class.
    * All 64 combos; shared with the DuckDB oracle as a VALUES table.
    */
  val codeClass: Map[(Int, Int, Int), Int] = (for {
    cij <- 0 to 3; cik <- 0 to 3; cjk <- 0 to 3
  } yield {
    var m = 0
    if ((cij & 1) != 0) m |= 1 << arcIdx((0, 1))
    if ((cij & 2) != 0) m |= 1 << arcIdx((1, 0))
    if ((cik & 1) != 0) m |= 1 << arcIdx((0, 2))
    if ((cik & 2) != 0) m |= 1 << arcIdx((2, 0))
    if ((cjk & 1) != 0) m |= 1 << arcIdx((1, 2))
    if ((cjk & 2) != 0) m |= 1 << arcIdx((2, 1))
    (cij, cik, cjk) -> canonToClass(canon(m))
  }).toMap

  val classNames: Seq[String] = Seq("003", "012", "102", "021d", "021u", "021c",
    "111d", "111u", "030t", "030c", "201", "120d", "120u", "120c", "210", "300")

  /** The 16 counts, igraph order. */
  def triadCensus(g: LinkGraph): Seq[Long] = {
    require(g.directed, "triad census needs a directed graph")
    val spark = g.spark
    import spark.implicits._
    val de = g.weighted.where(col("src") =!= col("dst")).select("src", "dst").distinct()
    val p = de.select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"),
      when(col("src") < col("dst"), 1).otherwise(2).as("bit"))
      .groupBy("a", "b").agg(sum_distinct(col("bit")).cast("int").as("code"))
      .persist()
    val cSym = p.select(col("a").as("x"), col("b").as("y"))
      .union(p.select(col("b"), col("a"))).persist()
    cSym.count()
    val n = g.vcount()

    // triples with >= 2 connected dyads: wedge join around the center
    val tri = cSym.alias("c1").join(cSym.alias("c2"),
        col("c1.y") === col("c2.x") && col("c1.x") < col("c2.y"))
      .select(col("c1.x").as("p1"), col("c1.y").as("p2"), col("c2.y").as("p3"))
      .select(least(col("p1"), col("p2"), col("p3")).as("i"),
        (col("p1") + col("p2") + col("p3")
          - least(col("p1"), col("p2"), col("p3"))
          - greatest(col("p1"), col("p2"), col("p3"))).as("j"),
        greatest(col("p1"), col("p2"), col("p3")).as("k"))
      .distinct()
    val codes = tri
      .join(p.select(col("a").as("i"), col("b").as("j"), col("code").as("cij")), Seq("i", "j"), "left")
      .join(p.select(col("a").as("i"), col("b").as("k"), col("code").as("cik")), Seq("i", "k"), "left")
      .join(p.select(col("a").as("j"), col("b").as("k"), col("code").as("cjk")), Seq("j", "k"), "left")
      .select(coalesce(col("cij"), lit(0)).as("cij"),
        coalesce(col("cik"), lit(0)).as("cik"), coalesce(col("cjk"), lit(0)).as("cjk"))
    val lut = codeClass.toSeq.map { case ((x, y, z), c) => (x, y, z, c) }
      .toDF("cij", "cik", "cjk", "cl")
    val multi = codes.join(broadcast(lut), Seq("cij", "cik", "cjk"))
      .groupBy("cl").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    // exactly-one-dyad triples, in closed form per connected pair
    val deg = cSym.groupBy(col("x").as("id")).agg(count(lit(1)).as("deg"))
    val com = cSym.alias("x1").join(cSym.alias("x2"),
        col("x1.x") === col("x2.x") && col("x1.y") < col("x2.y"))
      .groupBy(col("x1.y").as("a"), col("x2.y").as("b")).agg(count(lit(1)).as("cm"))
    val ones = p
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .join(com, Seq("a", "b"), "left")
      .select(col("code"),
        (lit(n) - 2 - (col("da") - 1) - (col("db") - 1) + coalesce(col("cm"), lit(0L))).as("iso"))
      .groupBy("code").agg(sum("iso").as("cnt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    p.unpersist(); cSym.unpersist()

    val counts = Array.fill(16)(0L)
    multi.foreach { case (cl, c) => counts(cl) += c }
    counts(1) += ones.getOrElse(1, 0L) + ones.getOrElse(2, 0L) // 012
    counts(2) += ones.getOrElse(3, 0L)                         // 102
    counts(0) = n * (n - 1) * (n - 2) / 6 - counts.drop(1).sum // 003
    counts.toSeq
  }
}
