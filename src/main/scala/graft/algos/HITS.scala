package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ckpt
import graft.graph.Adjacency

final case class HitsResult(scores: DataFrame, iterations: Int)

/** Kleinberg HITS over the semiring substrate: per iteration
  *
  *   a = normalize₂(Aᵀ h)   (authority: plus_second gather over IN-edges)
  *   h = normalize₂(A a)    (hub:       plus_second gather over OUT-edges)
  *
  * — two `plus_second`-semiring mxv products (the same kernel family the
  * reference expresses them with) plus an L2 scalar reduction each.
  *
  * Spark-first shape: BOTH gathers run the zero-exchange plan of
  * `PageRank.run`, each against its own persisted CSR-bucket adjacency —
  * the forward adjacency for the authority step and the REVERSED (in-edge)
  * adjacency for the hub step. Building the transpose layout once at graph
  * build (its own single shuffle) is what keeps every iteration free of
  * edge-scale shuffles in both directions; per iteration only the two small
  * score vectors and their map-side-combined partials move. The L2 norms
  * are driver-side scalar reductions (`Vector.reduce` analogue) folded into
  * the state-materialization pass.
  *
  * Missing = absent throughout: a vertex with no in-edges has NO authority
  * entry (not an explicit 0), and a sink has no hub entry — GraphBLAS
  * sparsity semantics, which the full-outer final join preserves.
  */
object HITS {

  /** @param adjOut adjacency of (src → dst) edges, as built by `Adjacency`
    * @param adjIn  adjacency of the REVERSED edges (dst → src) */
  def run(spark: SparkSession, adjOut: Adjacency, adjIn: Adjacency,
          maxIter: Int = 20): HitsResult = {
    val n = adjOut.numVertices
    val p = adjOut.numPartitions

    // h0 = uniform unit-L2 vector over the full universe
    var hState = Ckpt.materialize(
      spark.range(n).repartition(p, col("id"))
        .select(col("id"), lit(1.0 / math.sqrt(n.toDouble)).as("v")))
    var aState = hState // replaced on first iteration
    var h = hState.df
    var a = h
    var iter = 0

    /** one normalized gather: scores joined to `adj` on its bucket key,
      * exploded, partial-agg'd per neighbor, then L2-normalized. The raw
      * sum-of-squares is computed in the SAME materialization pass as the
      * gather result (one job), and the cheap normalizing projection is
      * re-materialized so the next consumer sees a flat plan. */
    def gatherNormalized(adj: Adjacency, scores: DataFrame) = {
      val contrib = adj.rows
        .join(scores, adj.rows("src") === scores("id"))
        .select(col("dsts"), col("v").as("c"))
        .select(explode(col("dsts")).as("_dn"), col("c"))
        .select(col("_dn").cast("long").as("dst"), col("c"))
      val raw = contrib.groupBy("dst").agg(sum(col("c")).as("v"))
        .select(col("dst").as("id"), col("v"), (col("v") * col("v")).as("_sq"))
      val (rawState, sumSq) = Ckpt.materializeWithSum(raw, "_sq")
      val norm = math.sqrt(sumSq)
      val scaled = Ckpt.materialize(
        rawState.df.select(col("id"), (col("v") / norm).as("v")))
      rawState.release()
      scaled
    }

    while (iter < maxIter) {
      val aNew = gatherNormalized(adjOut, h)
      if (iter > 0) aState.release()
      aState = aNew
      a = aNew.df
      val hNew = gatherNormalized(adjIn, a)
      hState.release()
      hState = hNew
      h = hNew.df
      iter += 1
    }

    val out = h.select(col("id"), col("v").as("hub"))
      .join(a.select(col("id"), col("v").as("authority")), Seq("id"), "full_outer")
    HitsResult(out, iter)
  }
}
