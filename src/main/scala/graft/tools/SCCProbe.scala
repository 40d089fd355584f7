package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algos.SCC

/** Measure SCC outer-round count and wall time on the bench fixture —
  * used to decide where the sf0.1 wall-clock goes (outer rounds vs inner
  * fixpoint iterations). Usage: SCCProbe <sfDir> [mod] */
object SCCProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mod = if (args.length > 1) args(1).toInt else 23
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 9973L
    val e = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") % n).as("src"), (col("l_partkey") % n).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .filter((col("src") * 31 + col("dst")) % mod === 0)
    println(s"[probe] edges=${e.count()}")
    val t0 = System.nanoTime()
    val res = SCC.run(spark, e, 32)
    val rows = res.components.count()
    println(f"[probe] rounds=${res.rounds} colorIters=${res.colorIters} markIters=${res.markIters} rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    val sizes = res.components.groupBy("scc").count()
      .groupBy("count").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .orderBy(desc("count")).collect()
    println("[probe] scc size histogram (size -> #sccs): " +
      sizes.map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString(", "))
    spark.stop()
  }
}
