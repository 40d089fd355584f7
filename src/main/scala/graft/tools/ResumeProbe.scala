package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.algos.PageRank
import graft.graph.Adjacency
import graft.runtime.IterationCheckpointer

/** Dev probe: split pagerank_resume's cost into build / first (checkpointed)
  * run / second (resumed) run, to find where the bench time goes. */
object ResumeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up: one plain iter5 (JIT + parquet read)
    tm("warmup pagerank_iter5")(SparkEntry.queries("pagerank_iter5")(spark, d).count())
    val ck = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val n = math.max(937L, math.round(9973.0 * math.sqrt(SparkEntry.sfOf(d) / 0.1)))
    val adj = tm("adjacency build")(Adjacency.build(
      SparkEntry.queries("edges_extract")(spark, d).select(col("src"), col("dst")),
      n, cpus.toInt))
    val c = new IterationCheckpointer(ck)
    tm("run1 (3 iters, ckpt)")(
      PageRank.run(spark, adj, 0.85, 0.0, 3, Some(c)).scores.count())
    tm("run2 (resume to 5)")(
      PageRank.run(spark, adj, 0.85, 0.0, 5, Some(c)).scores.count())
    spark.stop()
  }
}
