package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Ckpt

final case class SCCResult(components: DataFrame, rounds: Int)

/** Strongly connected components of a DIRECTED graph by trim + forward
  * min-coloring + backward marking (Orzan's coloring algorithm with the
  * Trim step of FW-BW-Trim; Slota/Rajamanickam/Madduri's multistep method
  * is the same skeleton) — the standard data-parallel SCC, and the core of
  * the classic web-graph bow-tie decomposition (giant SCC / IN / OUT).
  *
  * Per outer round, over the still-unassigned subgraph:
  *  1. TRIM: a vertex with no in-edge or no out-edge inside the subgraph is
  *     a singleton SCC (it cannot lie on a cycle) — one distinct each way;
  *     on web graphs this strips the tendril mass cheaply.
  *  2. COLOR: propagate c(v) = min(c(v), min_{(u,v)∈E} c(u)) to fixpoint —
  *     c(v) = the smallest vertex that reaches v. Each step is the same
  *     shape as one FastSV gather: equi-join on the src-partitioned edge
  *     state + hash agg on dst, change flag fused into the state
  *     materialization job (one job per step).
  *  3. MARK: every color class c contains its eponymous root (c(c) = c, by
  *     minimality); SCC(root) = vertices of the class that reach the root.
  *     Any v→…→root path inside the class stays inside the class (an
  *     intermediate u is reached by c and reaches the root, so c(u) < c
  *     would contradict c(root) = c), so marking propagates along
  *     INTRA-CLASS edges only: one equi-join per step against the
  *     dst-partitioned intra-class edge set; the set is monotone, so the
  *     fixpoint check is the row count, fused into the materialization.
  *  4. Assign scc = color for marked vertices; peel them and repeat.
  *
  * Outer rounds = length of the longest SCC chain not absorbed by trim
  * (worst case O(V) on a path graph — which trim dissolves from the ends
  * instead; real web graphs take a handful of rounds). Every step is an
  * equi-join + aggregation over co-partitioned state; the only driver-side
  * values are the per-step scalar counts. Vertices still unassigned when
  * `maxRounds` hits are absent from the output (document-by-count: callers
  * compare `components.count()` to their vertex count).
  */
object SCC {

  def run(spark: SparkSession, edges: DataFrame, numPartitions: Int,
          maxRounds: Int = 64, maxColorIters: Int = 256): SCCResult = {
    // round-boundary state lives in FLAT Ckpt rewraps (not DataFrame
    // persist): a persisted DF's lineage would reach back through the
    // PREVIOUS round's released Ckpt rdds, and any later cache rebuild
    // (AQE re-plan, eviction, non-cascading unpersist of an upstream) then
    // recomputes a destroyed localCheckpoint — flat scans have no lineage
    var eState = Ckpt.materialize(edges.select(col("src"), col("dst"))
      .repartition(numPartitions, col("src")))
    var vState = Ckpt.materialize(eState.df.select(col("src").as("id"))
      .unionByName(eState.df.select(col("dst").as("id"))).distinct()
      .repartition(numPartitions, col("id")))
    var nVerts = vState.df.count()

    var assigned = Ckpt.materialize(
      spark.range(0).select(col("id"), col("id").as("scc")))
    var rounds = 0

    while (nVerts > 0 && rounds < maxRounds) {
      val e = eState.df
      val verts = vState.df
      // ---- 1. trim: no in-edge or no out-edge => singleton SCC ----------
      val hasIn = e.select(col("dst").as("id")).distinct()
      val hasOut = e.select(col("src").as("id")).distinct()
      val trimmed = verts
        .join(hasIn, Seq("id"), "left_anti")
        .unionByName(verts.join(hasOut, Seq("id"), "left_anti"))
        .distinct()
        .select(col("id"), col("id").as("scc"))

      // ---- 2. forward min-coloring to fixpoint --------------------------
      val live = verts.join(trimmed.select("id"), Seq("id"), "left_anti")
      // partitioned+sorted on src, the per-step join key (the dst-side hash
      // agg is the step's one unavoidable shuffle, exactly as in FastSV)
      val eLive = e
        .join(trimmed.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(trimmed.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst"))
        .repartition(numPartitions, col("src"))
        .sortWithinPartitions("src").persist()
      eLive.count()

      var cState = Ckpt.materialize(
        live.select(col("id"), col("id").as("c"))
          .repartition(numPartitions, col("id")))
      var changed = true
      var inner = 0
      while (changed && inner < maxColorIters) {
        val c = cState.df
        val cu = c.select(col("id").as("_u"), col("c").as("_cu"))
        val upd = eLive.join(cu, col("src") === col("_u"))
          .groupBy(col("dst").as("id")).agg(min(col("_cu")).as("_m"))
        val next = c.join(upd, Seq("id"), "left")
          .select(col("id"),
            least(col("c"), coalesce(col("_m"), col("c"))).as("c"),
            when(col("_m") < col("c"), 1.0).otherwise(0.0).as("_chg"))
        val (nextState, nChanged) = Ckpt.materializeWithSum(next, "_chg")
        cState.release()
        cState = nextState
        changed = nChanged > 0
        inner += 1
      }
      val colors = cState.df

      // ---- 3. backward marking along intra-class edges ------------------
      val cs = colors.select(col("id").as("_s"), col("c").as("_cs"))
      val cd = colors.select(col("id").as("_d"), col("c").as("_cd"))
      val intra = eLive
        .join(cs, col("src") === col("_s"))
        .join(cd, col("dst") === col("_d"))
        .filter(col("_cs") === col("_cd"))
        .select(col("src"), col("dst"))
        .repartition(numPartitions, col("dst"))
        .sortWithinPartitions("dst").persist()
      intra.count()

      var mState = Ckpt.materialize(
        colors.filter(col("id") === col("c")).select(col("id"))
          .repartition(numPartitions, col("id")))
      var nMarked = mState.df.count()
      var grew = true
      while (grew) {
        val m = mState.df.select("id")
        val grown = intra.join(m, intra("dst") === m("id"))
          .select(col("src").as("id"))
          .unionByName(m).distinct()
          .repartition(numPartitions, col("id"))
        // monotone set: fixpoint == unchanged count, fused into the job
        val (next, n2d) = Ckpt.materializeWithSum(
          grown.select(col("id"), lit(1.0).as("_chg")), "_chg")
        mState.release()
        mState = next
        grew = n2d.toLong > nMarked
        nMarked = n2d.toLong
      }

      val sccOfMarked = mState.df.select("id").join(colors, "id")
        .select(col("id"), col("c").as("scc"))

      // ---- 4. assign and peel ------------------------------------------
      val newAssigned = Ckpt.materialize(
        assigned.df.unionByName(trimmed).unionByName(sccOfMarked))
      // peel with THIS round's assignments only (earlier rounds are already
      // out of the state) — the anti-join build side stays round-sized
      val peeled = trimmed.select("id").unionByName(sccOfMarked.select("id"))

      val newVState = Ckpt.materialize(
        verts.join(peeled, Seq("id"), "left_anti")
          .repartition(numPartitions, col("id")))
      val newEState = Ckpt.materialize(e
        .join(peeled.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(peeled.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select(col("src"), col("dst"))
        .repartition(numPartitions, col("src")))
      val nv = newVState.df.count()

      Seq(eLive, intra).foreach(_.unpersist(blocking = false))
      cState.release()
      mState.release()
      assigned.release()
      eState.release()
      vState.release()
      assigned = newAssigned
      eState = newEState
      vState = newVState
      nVerts = nv
      rounds += 1
    }
    eState.release()
    vState.release()
    SCCResult(assigned.df, rounds)
  }
}
