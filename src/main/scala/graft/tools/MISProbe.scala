package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: MIS round trajectory + wall time at a given SF dir.
  * Usage: MISProbe <sfDir> [maxRounds] */
object MISProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxRounds = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    // the same sparsified lineitem graph SparkEntry's mis query runs on
    // (edgesGSym: mod-gmod vertices, no self-loops, symmetric closure)
    val n = if (graft.SparkEntry.sfOf(sfDir) <= 0.0101) 937L
            else math.max(937L, math.round(9973.0 *
              math.sqrt(graft.SparkEntry.sfOf(sfDir) / 0.1)))
    val e = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") % n).as("src"), (col("l_partkey") % n).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val sym = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      val r = graft.algos.MIS.run(spark, sym, 32, maxRounds)
      val n = r.mis.count()
      println(f"[misprobe] rounds=${r.rounds} mis=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
