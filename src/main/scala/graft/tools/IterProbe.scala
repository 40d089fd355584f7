package graft.tools
import org.apache.spark.sql.SparkSession
import graft.graph.Adjacency
import graft.algos.PageRank

/** Dev probe: per-iteration wall time of the PageRank loop on a 5-node graph
  * (driver overhead dominates — catches plan/lineage blowup regressions). */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 0L))
      .toDF("src", "dst")
    val adj = Adjacency.build(edges, 5, 4)
    for (k <- Seq(1, 5, 10, 15, 20, 25)) {
      val t0 = System.nanoTime()
      PageRank.run(spark, adj, tol = 0.0, maxIter = k)
      println(f"[probe] maxIter=$k%3d total=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
