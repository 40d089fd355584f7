package graft

import org.apache.spark.sql.SparkSession
import graft.ingest.Pages
import graft.graph.Adjacency
import graft.algos.PageRank

/** Per-round benchmark (driver-run): times every SparkEntry query at the
  * given SF dir, plus the headline BASELINE metric — PageRank edges/sec on
  * the synthetic web graph (pages → href edges → CSR adjacency → pagerank).
  * Prints ONE JSON line. See BENCH/BASELINE.md for the two-parallelism
  * scaling protocol (graft.ScalingBench).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle dirs: the host's shared disk has bursty IO-wait from
      // other tenants; see BENCH/BASELINE.md methodology
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: PageRank throughput on the synthetic web graph
    val nPages = if (sfDir.contains("sf0.1")) 200000L
                 else if (sfDir.contains("sf0.01")) 50000L else 10000L
    val tg0 = System.nanoTime()
    val pages = Pages.synthesize(spark, nPages)
    val ids = Pages.idMap(pages)
    val edges = Pages.edges(pages, ids)
    val adj = Adjacency.build(edges, nPages, cpus.toInt)
    val tBuild = (System.nanoTime() - tg0) / 1e9
    val tp0 = System.nanoTime()
    val pr = PageRank.run(spark, adj, damping = 0.85, tol = 1e-6, maxIter = 50)
    val tPr = (System.nanoTime() - tp0) / 1e9
    val edgesPerSec = pr.edgesTraversed / tPr

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + tBuild + tPr
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","webgraph":{"pages":$nPages,"edges":${adj.numEdges},"build_sec":$tBuild%.3f,"pagerank_sec":$tPr%.3f,"pagerank_iters":${pr.iterations},"edges_per_sec":$edgesPerSec%.0f}}""")
    spark.stop()
  }
}
