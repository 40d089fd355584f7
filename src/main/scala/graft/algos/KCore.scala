package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ckpt

final case class KCoreResult(core: DataFrame, rounds: Int)

/** k-core: the maximal subgraph in which every vertex has degree ≥ k,
  * by synchronous BSP peeling — per round, drop every vertex whose degree
  * in the CURRENT subgraph is < k, then drop edges touching a dropped
  * endpoint; fixpoint in at most |V| rounds, typically a handful.
  *
  * Expressed GraphBLAS-style as the reference would (degree reduce +
  * select(≥k) + structural input mask on both edge endpoints), and
  * Spark-first: the surviving-edge set is the iteration state, re-persisted
  * per round — `deg ≥ k` survivors come from one hash aggregation over it,
  * and the edge filter is two semi-joins against that (shrinking) survivor
  * set. The src-side semi-join is zero-exchange (edges stay hash-partitioned
  * on src); the dst-side one re-shuffles only the ALREADY-FILTERED edge
  * remainder, which shrinks geometrically over rounds. Each round is 2 jobs.
  *
  * Early-stop note: the survivor set only ever shrinks, so an unchanged
  * count means an unchanged set and every further round is a no-op — the
  * early-stopped state is bit-identical to any fixed larger unroll (which
  * is what lets a fixed-round SQL oracle check a converging run).
  *
  * Output: (id, deg) for vertices of the peeled subgraph, deg = degree
  * within it.
  */
object KCore {

  def run(spark: SparkSession, edgesSym: DataFrame, k: Int,
          numPartitions: Int, maxRounds: Int = 32): KCoreResult = {
    // FLAT Ckpt state per round, not persist(): a persisted DataFrame keeps
    // its full lineage, so round r's plan nests all r-1 predecessors —
    // measured a ~4 MB final plan after 8 rounds at sf0.1, with per-round
    // analysis/planning cost growing linearly. The rewrap is O(1) planning
    // per round and declares the hash(src) layout so the degree aggregation
    // stays exchange-free.
    var (e, nEdges) = Ckpt.materializeWithCount(
      edgesSym.repartition(numPartitions, col("src")))
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // drop-side formulation: this round's victims (deg < k) are usually a
      // small fringe, so the two endpoint filters are ANTI-joins against a
      // tiny relation — AQE turns both into broadcast joins at runtime and
      // the (big, shrinking) edge state is never re-shuffled; under an
      // aggressive k whose first round drops half the graph, AQE falls back
      // to shuffle joins on its size estimate. (The semi-join-on-survivors
      // form forces two edge-scale shuffles EVERY round.) dst anti first,
      // src anti last: the materialized state then re-declares hash(src).
      val dropped = e.df.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k).select(col("src").as("id"))
      val (e2, n2) = Ckpt.materializeWithCount(e.df
        .join(dropped.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .join(dropped.select(col("id").as("src")), Seq("src"), "left_anti")
        .select(col("src"), col("dst")))
      e.release()
      converged = n2 == nEdges // edge set shrinks monotonically
      nEdges = n2
      e = e2
      rounds += 1
    }
    // the final round's blocks back the returned aggregation (session-scoped)
    val core = e.df.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    KCoreResult(core, rounds)
  }
}
