package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.storage.StorageLevel

/** Package-private-bridging shim (the standard iterative-algorithm plan
  * truncation used by e.g. GraphFrames' AggregateMessages.getCachedDataFrame):
  * materialize a DataFrame to an InternalRow RDD and rewrap it as a brand-new
  * flat DataFrame.
  *
  * Why not `Dataset.localCheckpoint`? Spark's checkpoint carries the origin
  * plan's Statistics into the new LogicalRDD (`rewriteStatsAndConstraints`).
  * In an iterative loop where the previous state enters the next plan through
  * TWO branches (gather + convergence diff), the carried `sizeInBytes`
  * squares every iteration — BigInt digits double per round and driver-side
  * stats computation goes exponential (observed: iteration 21+ of a 5-node
  * PageRank taking minutes). Rewrapping via `internalCreateDataFrame` resets
  * stats to the default and keeps per-iteration planning cost O(1).
  */
object GraftSqlShims {

  /** Materialize `df` into a persisted InternalRow RDD and return a fresh
    * DataFrame over it (no lineage, no carried stats) plus the RDD handle
    * for later release. */
  def cachedDataFrame(df: DataFrame,
                      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                      sumColumn: Option[String] = None)
      : (DataFrame, RDD[InternalRow], Double) = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val cdf = df.asInstanceOf[classic.DataFrame]
    // optional fused aggregation: sum a double column DURING materialization
    // (saves iterative algorithms one full job + driver round-trip per round)
    val sumAcc = spark.sparkContext.doubleAccumulator("ckptSum")
    val rdd = sumColumn match {
      case Some(name) =>
        val idx = df.schema.fieldIndex(name)
        cdf.queryExecution.toRdd.map { r => sumAcc.add(r.getDouble(idx)); r.copy() }
          .persist(level)
      case None => cdf.queryExecution.toRdd.map(_.copy()).persist(level)
    }
    // RDD-level localCheckpoint: truncates the RDD lineage chain too (task
    // closures would otherwise serialize a per-iteration-growing RDD DAG)
    rdd.localCheckpoint()
    rdd.count() // eager materialization
    (spark.internalCreateDataFrame(rdd, df.schema), rdd, sumAcc.value)
  }
}
