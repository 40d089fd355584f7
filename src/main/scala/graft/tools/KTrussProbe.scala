package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Ckpt
import graft.algos.KTruss

/** Per-round cost probe for the k-truss peel: prints surviving-edge count
  * and wall time per support round at a given SF dir — used to size the
  * ktruss bench fixture (the sf0.01-validated cascade must stay affordable
  * at the bench SF). Usage: KTrussProbe <sfDir> <k> <rounds>. */
object KTrussProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, k, rounds) = (args(0), args(1).toInt, args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args(0).contains("0.01")) 937L else 9973L
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = li.select((col("l_orderkey") % n).as("src"), (col("l_partkey") % n).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    var t0 = System.nanoTime()
    var cur = Ckpt.materialize(
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().repartition(cpus.toInt, col("src")))
    var nE = cur.df.count()
    println(f"[probe] build: ${(System.nanoTime() - t0) / 1e9}%.1fs, $nE edges")
    for (r <- 1 to rounds) {
      t0 = System.nanoTime()
      val supC = KTruss.supportCanon(cur.df.select(col("src"), col("dst")), cpus.toInt)
      val tSup = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val kept = supC.df.filter(col("sup") >= k - 2)
      val next = Ckpt.materialize(kept.unionByName(
          kept.select(col("dst").as("src"), col("src").as("dst"), col("sup")))
        .repartition(cpus.toInt, col("src")))
      val n2 = next.df.count()
      println(f"[probe] round $r: support ${tSup}%.1fs + filter/sym " +
        f"${(System.nanoTime() - t0) / 1e9}%.1fs, $nE -> $n2")
      cur.release(); supC.release()
      cur = next
      nE = n2
    }
    spark.stop()
  }
}
