package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Deterministic execution-shape probe: runs named SparkEntry queries and
  * prints jobs / stages / tasks / shuffle bytes from a SparkListener —
  * noise-free evidence for plan-shape A/Bs where wall clocks on this shared
  * host swing ±2× (BENCH.md methodology note). Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PROBE_QUERIES=q_louvain,q_leiden \
  *     sbt "runMain graft.StageProbe"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "q_louvain,q_leiden")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var tasks = 0L
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shufWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shufRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      jobs = 0; stages = 0; tasks = 0; shufWrite = 0; shufRead = 0
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(1500) // let the listener bus drain (private API in 4.x)
      println(f"""{"probe":"$name","rows":$n,"jobs":$jobs,"stages":$stages,"tasks":$tasks,"shuffle_write_mb":${shufWrite / 1e6}%.1f,"shuffle_read_mb":${shufRead / 1e6}%.1f}""")
    }
    spark.stop()
  }
}
