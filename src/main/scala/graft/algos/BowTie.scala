package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ckpt

final case class BowTieResult(classes: DataFrame, coreId: Long, rounds: Int)

/** Bow-tie decomposition of a directed web graph (Broder et al., "Graph
  * structure in the Web", WWW 2000): pick the giant SCC as the CORE, then
  * classify every other vertex as IN (reaches the core), OUT (reached from
  * the core), or OTHER (tendrils, tubes, disconnected — the full five-way
  * refinement needs two more reachability passes and is rarely reported).
  *
  * CORE = the largest SCC from [[SCC.run]] (ties broken by smaller scc id,
  * so the choice is deterministic). The two reachability passes are
  * frontier-free full-set propagations: `reach := reach ∪ N⁻(reach)`
  * iterated to fixpoint on the src-partitioned edge state (and the reverse
  * for OUT), the same shape as one BFS round with the monotone-set
  * count-fixpoint fused into the state materialization. At web scale both
  * passes touch each edge O(diameter-of-DAG-of-SCCs) times — the classic
  * trade for avoiding any per-vertex mutable state.
  *
  * Output: (id, cls) with cls ∈ {'core','in','out','other'}.
  */
object BowTie {

  /** grow `seed` to its full ancestor set along `edges` (vertices that can
    * REACH the seed); pass reversed edges for descendants. */
  private def ancestors(seed: DataFrame, edges: DataFrame,
                        numPartitions: Int): graft.core.CkptState = {
    var state = Ckpt.materialize(
      seed.select("id").repartition(numPartitions, col("id")))
    var n = state.df.count()
    var grew = true
    while (grew) {
      val m = state.df.select("id")
      val grown = edges.join(m, edges("dst") === m("id"))
        .select(col("src").as("id"))
        .unionByName(m).distinct()
        .repartition(numPartitions, col("id"))
      val (next, n2) = Ckpt.materializeWithSum(
        grown.select(col("id"), lit(1.0).as("_chg")), "_chg")
      state.release()
      state = next
      grew = n2.toLong > n
      n = n2.toLong
    }
    state
  }

  def run(spark: SparkSession, edges: DataFrame,
          numPartitions: Int): BowTieResult = {
    val sccRes = SCC.run(spark, edges, numPartitions)
    val comp = sccRes.components // already a flat materialized Ckpt plan

    // giant SCC, deterministic tie-break on the smaller scc id
    val coreId = comp.groupBy("scc").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("scc"))
      .select(col("scc")).limit(1).collect().head.getLong(0)
    val core = comp.filter(col("scc") === coreId).select("id")

    val e = edges.select(col("src"), col("dst"))
      .repartition(numPartitions, col("dst"))
      .sortWithinPartitions("dst").persist()
    val eRev = edges.select(col("dst").as("src"), col("src").as("dst"))
      .repartition(numPartitions, col("dst"))
      .sortWithinPartitions("dst").persist()
    e.count(); eRev.count()

    val canReachCore = ancestors(core, e, numPartitions)     // ⊇ core
    val reachedFromCore = ancestors(core, eRev, numPartitions)

    val inSet = canReachCore.df.select(col("id"), lit(true).as("_in"))
    val outSet = reachedFromCore.df.select(col("id"), lit(true).as("_out"))
    val classes = comp
      .join(inSet, Seq("id"), "left")
      .join(outSet, Seq("id"), "left")
      .select(col("id"),
        when(col("scc") === coreId, "core")
          .when(col("_in").isNotNull, "in")
          .when(col("_out").isNotNull, "out")
          .otherwise("other").as("cls"))
    val out = Ckpt.materialize(classes).df
    Seq(e, eRev).foreach(_.unpersist(blocking = false))
    canReachCore.release()
    reachedFromCore.release()
    BowTieResult(out, coreId, sccRes.rounds)
  }
}
