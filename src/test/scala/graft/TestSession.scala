package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One SparkSession for the whole test JVM (Test / fork := true). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Collect a per-vertex metric column into an id-indexed array. */
  def vector(df: DataFrame, valueCol: String): Array[Double] = {
    val rows = df.select("id", valueCol).collect()
    val out = new Array[Double](rows.length)
    rows.foreach { r =>
      out(r.getLong(0).toInt) = r.get(1) match {
        case d: Double => d
        case l: Long   => l.toDouble
        case i: Int    => i.toDouble
      }
    }
    out
  }

  def longVector(df: DataFrame, valueCol: String): Array[Long] = {
    val rows = df.select("id", valueCol).collect()
    val out = new Array[Long](rows.length)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Canonical reindex of a membership list, mirroring the reference's
    * `reindexMembership` (`test_decomposition.py:175-188`).
    */
  def reindex(m: Seq[Long]): Seq[Int] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
    m.map(l => seen.getOrElseUpdate(l, seen.size))
  }
}
