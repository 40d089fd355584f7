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

  /** edgesSym: symmetric deduplicated (src, dst), no self-loops.
    *
    * Counts via the degree-ORIENTED enumeration (KTruss.orientedTriangles):
    * each triangle exactly once at its (deg,id)-minimum corner. The id-tril
    * masked form this replaces bounds the wedge intermediate by
    * Σ wedges-over-L, which on power-law web graphs still lets a high-id
    * hub fan out over its full lower neighborhood; orienting by DEGREE
    * bounds every vertex's fan-out by O(√E) — the same count, an
    * asymptotically smaller join (measured 143.9M → 21.9M wedge rows at
    * the sf0.1 symmetric fixture in the KTruss work). */
  def count(edgesSym: DataFrame): Long = {
    val parts = edgesSym.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // the (possibly derived) symmetric input feeds three plan branches
    // (degrees, orientation, close join) — scan and deduplicate it once
    val e = edgesSym.select(col("src"), col("dst")).persist()
    e.count()
    try {
      val (tri, o) = KTruss.orientedTriangles(e, parts)
      try tri.count() finally o.release()
    } finally e.unpersist(false)
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
