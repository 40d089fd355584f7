package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
import graft.algos.ConnectedComponents

/** Dev probe: split dedup_clusters cost into jaccard-pairs vs CC phases. */
object DedupClusterProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    tm("warmup pairs")(Dedup.ngramJaccardPairs(docs, 0.05).count())
    val pairs = tm("pairs")(Dedup.ngramJaccardPairs(docs, 0.05)
      .select(col("doc_a"), col("doc_b")))
    val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val nDocs = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val cc = tm("cc")(ConnectedComponents.run(spark, sym, nDocs, 32))
    println(s"[probe] cc iterations: ${cc.iterations}")
    tm("cc collect")(cc.components.count())
    spark.stop()
  }
}
