package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong
import graft.graph.Adjacency
import graft.algos.PageRank

/** Dev probe for the scaling protocol: runs 3 PageRank iterations on the
  * materialized edge table under different (cpus, aqe, partitions) configs
  * and prints wall time + aggregate task time + max concurrent-ish stats. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val edgePath = args(0)
    val nPages = args(1).toLong
    val cpuList = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq else Seq(8, 32)
    for {
      cpus <- cpuList
      aqe <- Seq(true, false)
    } {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 2)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val taskTime = new AtomicLong(0)
      val cpuTime = new AtomicLong(0)
      val gcTime = new AtomicLong(0)
      val tasks = new AtomicLong(0)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          taskTime.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
          cpuTime.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime / 1000000)
          gcTime.addAndGet(sc.stageInfo.taskMetrics.jvmGCTime)
          tasks.addAndGet(sc.stageInfo.numTasks)
        }
      })
      val edges = spark.read.parquet(edgePath)
      val adj = Adjacency.build(edges, nPages, cpus * 2)
      PageRank.run(spark, adj, tol = 0.0, maxIter = 1) // warm
      taskTime.set(0); cpuTime.set(0); gcTime.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      PageRank.run(spark, adj, tol = 0.0, maxIter = 3)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[scale] cpus=$cpus%2d aqe=$aqe%5s wall=$wall%6.2fs taskTime=${taskTime.get / 1000.0}%7.1fs cpu=${cpuTime.get / 1000.0}%7.1fs gc=${gcTime.get / 1000.0}%6.1fs tasks=${tasks.get}")
      spark.stop()
    }
  }
}
