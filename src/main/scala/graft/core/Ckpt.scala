package graft.core

import org.apache.spark.sql.{DataFrame, GraftSqlShims}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow

/** Iteration-state materialization for driver loops (PageRank / FastSV / LP /
  * BFS): eagerly computes the DataFrame into a persisted RDD and rewraps it
  * as a flat plan — O(1) per-iteration planning cost regardless of iteration
  * count (see GraftSqlShims for why plain `localCheckpoint` is exponential
  * here). `release()` frees the previous iteration's blocks so state memory
  * stays O(1) in iterations.
  */
final case class CkptState(df: DataFrame, private val rdd: RDD[InternalRow]) {
  def release(): Unit = rdd.unpersist(blocking = false)
}

object Ckpt {
  def materialize(df: DataFrame): CkptState = {
    val (flat, rdd, _, _) = GraftSqlShims.cachedDataFrame(df)
    CkptState(flat, rdd)
  }

  /** Materialize AND return the row count from the SAME materialization job
    * (cachedDataFrame counts the RDD to force it anyway) — loop drivers with
    * a size-based stop check save one job + driver round-trip per round. */
  def materializeWithCount(df: DataFrame): (CkptState, Long) = {
    val (flat, rdd, _, n) = GraftSqlShims.cachedDataFrame(df)
    (CkptState(flat, rdd), n)
  }

  /** Materialize AND sum a double column in the same pass (fused convergence
    * metric — one job per iteration instead of two). */
  def materializeWithSum(df: DataFrame, sumCol: String): (CkptState, Double) = {
    val (flat, rdd, s, _) = GraftSqlShims.cachedDataFrame(df, sumColumn = Some(sumCol))
    (CkptState(flat, rdd), s)
  }
}
