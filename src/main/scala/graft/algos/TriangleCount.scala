package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{GrbMask, GrbMatrix, GrbShape, Ops}

/** Triangle count with the reference kernel chain (SURVEY.md §7.1 algos):
  * L = tril(A) (select `src > dst`,
  * `/root/reference/graphblas/core/operator/indexunary.py:101`), then the
  * masked `plus_pair` matrix square `C(L.S) = L · Lᵀ`, then
  * `reduce_scalar(plus)`.
  *
  * The mask is applied BELOW the aggregation (mask-first join order): we
  * start from the mask edge (i,j) and join both neighbor lists, so the
  * intermediate is bounded by Σ_(i,j)∈L wedges(i,j) instead of the full
  * unmasked square — the pushdown Catalyst cannot infer (SURVEY.md §4.2).
  */
object TriangleCount {

  /** edgesSym: symmetric deduplicated (src, dst), no self-loops. */
  def count(edgesSym: DataFrame): Long = {
    // L appears three times in the join — cache it so the (possibly derived)
    // edge input is scanned and deduplicated once, not three times
    val l = edgesSym.filter(col("src") > col("dst"))
      .select(col("src"), col("dst")).persist()
    try {
      // mask-first: for each mask edge (i,j) in L, count common lower
      // neighbors k (k<j<i): L(i,k) ∧ L(j,k).
      val m = l.select(col("src").as("_i"), col("dst").as("_j"))
      val a = l.select(col("src").as("_i"), col("dst").as("_k"))
      val b = l.select(col("src").as("_j2"), col("dst").as("_k2"))
      m.join(a, "_i")
        .join(b, col("_j") === col("_j2") && col("_k") === col("_k2"))
        .count()
    } finally l.unpersist(false)
  }

  /** Per-edge triangle support: the masked plus_pair square itself,
    * C(L.S) = L·Lᵀ — (src, dst, v = #common neighbors), only for edges of L
    * that close at least one wedge. Exercises GrbMatrix.mxm mask pushdown. */
  def support(edgesSym: DataFrame, n: Long): DataFrame = {
    // L feeds three plan branches (left, transpose, mask) — persist it
    val l = GrbMatrix(
      edgesSym.filter(col("src") > col("dst"))
        .select(col("src"), col("dst"), lit(1.0).as("v")).persist(),
      GrbShape(n, n))
    l.mxm(l.transpose, Ops.plusPair, Some(l.structureMask())).df
  }
}
