package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, Kernels, Ops}

final case class LPResult(labels: DataFrame, iterations: Int)

/** Synchronous min-label propagation (the reference's `min_second`-semiring
  * family, SURVEY.md §2.6 / north_star): every vertex starts with its own
  * label and repeatedly takes the minimum of its own and its neighbors'
  * labels (one `min_second` mxv + elementwise min accumulate per round)
  * until a fixed point. At convergence the label of each vertex is the
  * minimum vertex id of its connected component.
  *
  * Deliberately the plain iterative kernel (no FastSV shortcutting) — it is
  * the simple gather-accumulate building block; use ConnectedComponents for
  * the O(log n)-round variant.
  */
object LabelPropagation {

  def run(spark: SparkSession, edgesSym: DataFrame, n: Long, numPartitions: Int,
          maxIter: Int = 1000,
          checkpointer: Option[graft.runtime.IterationCheckpointer] = None): LPResult = {
    // edge side of the per-round gather join persisted pre-partitioned on dst
    val edges = edgesSym.repartition(numPartitions, col("dst")).persist()
    edges.count()
    var state = Ckpt.materialize(
      spark.range(n).select(col("id"), col("id").as("v")))
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val l = state.df
      // nl(i) = min_{j in N(i)} l(j)   [min_second mxv]
      val ll = l.select(col("id").as("_j"), col("v").as("_lv"))
      val nl = edges.join(ll, col("dst") === col("_j"))
        .groupBy(col("src").as("id")).agg(min(col("_lv")).as("v"))
      // accumulate: l = min(l, nl); changed-count fused into the same job
      val merged = Kernels.ewiseAddDF(l.select(col("id"), col("v")), nl, Seq("id"), Ops.minBin)
      val prev = l.select(col("id"), col("v").as("_pv"))
      val stepped = merged.join(prev, "id")
        .withColumn("_chg", when(col("v") =!= col("_pv"), 1.0).otherwise(0.0))
      val (newState, nChanged) = Ckpt.materializeWithSum(stepped, "_chg")
      changed = nChanged > 0
      state.release()
      state = newState
      iter += 1
      checkpointer.foreach(_.save(state.df.select(col("id"), col("v")), iter,
        Map("changed" -> nChanged.toLong.toString)))
    }
    edges.unpersist()
    LPResult(state.df.select(col("id"), col("v").as("label")), iter)
  }
}
