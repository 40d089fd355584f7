package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Kernels, Ops}

final case class CCResult(components: DataFrame, iterations: Int)

/** Connected components via FastSV (Zhang, Azad, Buluç; SIAM PP20), with the
  * exact semantics of the reference notebook
  * `/root/reference/notebooks/Connected Components -- FastSV.ipynb`:
  *
  *   f = 0..n-1 ; gp = f
  *   loop: mngp  = min_second(A @ gp)          — min grandparent of nbrs
  *         f[I] min= mngp  (I = old f values; duplicate targets pre-reduced
  *                          by min — the notebook's Reduce_assign, which
  *                          deliberately differs from GrB_assign dup rules)
  *         f = min(f, mngp) ; f = min(f, gp)   — hook + shortcut
  *         gp = f[f] ; stop when gp unchanged
  *
  * Edge input must be symmetric (both directions present). All vectors are
  * dense (id, v) DataFrames co-keyed on id; every step is an equi-join +
  * hash aggregation, and state is localCheckpoint'ed per iteration to
  * truncate lineage. Converges in O(log n) rounds.
  */
object ConnectedComponents {

  def run(spark: SparkSession, edgesSym: DataFrame, n: Long, numPartitions: Int,
          maxIter: Int = 64): CCResult = {
    val vertices = spark.range(n).select(col("id"))
      .repartition(numPartitions, col("id")).persist()
    vertices.count()

    var f = vertices.select(col("id"), col("id").as("v")).localCheckpoint(true)
    var gp = f          // f is the identity map, so gp = f(f) = f
    var gpPrev = f
    var iter = 0
    var changed = true

    def minMerge(a: DataFrame, b: DataFrame): DataFrame =
      Kernels.ewiseAddDF(a, b, Seq("id"), Ops.minBin)

    while (changed && iter < maxIter) {
      val fOld = f
      // mngp(i) = min_{j in N(i)} gp(j)   [min_second semiring mxv]
      val gpl = gp.select(col("id").as("_j"), col("v").as("_gp"))
      val mngp = edgesSym.join(gpl, col("dst") === col("_j"))
        .groupBy(col("src").as("id")).agg(min(col("_gp")).as("v"))

      // hooking: f[fOld(i)] min= mngp(i); duplicate targets reduced by min
      val scattered = fOld.select(col("id"), col("v").as("_t"))
        .join(mngp, "id")
        .groupBy(col("_t").as("id")).agg(min(col("v")).as("v"))

      var f1 = minMerge(fOld, scattered)
      f1 = minMerge(f1, mngp)     // f = min(f, mngp)
      f1 = minMerge(f1, gp)       // shortcut: f = min(f, gp)
      f = f1.localCheckpoint(true)

      // gp = f[f]
      val f2 = f.select(col("id").as("_k"), col("v").as("_gv"))
      gp = f.join(f2, f("v") === col("_k"))
        .select(f("id"), col("_gv").as("v"))
        .localCheckpoint(true)

      // change = lor-reduce of (gp != gpPrev)
      val prev = gpPrev.select(col("id"), col("v").as("_pv"))
      changed = gp.join(prev, "id")
        .agg(max(when(col("v") =!= col("_pv"), 1).otherwise(0)).as("c"))
        .collect()(0).getInt(0) == 1
      gpPrev = gp
      iter += 1
    }
    vertices.unpersist()
    CCResult(f.select(col("id"), col("v").as("component")), iter)
  }
}
