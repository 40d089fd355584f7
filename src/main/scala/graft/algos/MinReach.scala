package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, CkptState}

/** Shared accelerated fixpoint for directed min-label reachability:
  *
  *   c(v) ← min( c(v), min_{(u,v)∈edges} c(u), c(c(v)) )
  *
  * i.e. one edge-relaxation hop PLUS one FastSV-style pointer jump per
  * materialized state. The jump is sound because c(v) is always a vertex
  * that REACHES v (init: v itself; relax: c(u) reaches u and u→v; jump:
  * c(c(v)) reaches c(v) which reaches v) and never undershoots the true
  * minimum; at any fixpoint of plain relaxation c is already exact (walk
  * the min path and chain the inequalities), so jumping only accelerates —
  * it collapses chains of color inheritance logarithmically, cutting the
  * iteration count from O(eccentricity) toward O(log) (measured on the
  * bench fixture: 32 → 7 materializations for the same fixpoint).
  *
  * Sentinel labels smaller than every vertex id (e.g. -1 for "seed set" in
  * bow-tie reachability) pass through untouched: they never match a vertex
  * id in the jump map, so `coalesce` keeps them terminal.
  *
  * `edges` must be (src, dst), hash-partitioned and sorted on src (the
  * per-hop join key — zero-exchange against the hash-partitioned state);
  * `init` is (id, c) over the full vertex set being colored. Each iteration
  * is ONE materialized job: relax gather + state merge + jump self-join,
  * with the change flag fused into the materialization. Returns the
  * materialized fixpoint state (caller releases) and the iteration count.
  */
object MinReach {

  def minReachColor(init: DataFrame, edges: DataFrame, numPartitions: Int,
                    maxIters: Int = 256,
                    debugTag: String = "minreach"): (CkptState, Int) = {
    var state = Ckpt.materialize(
      init.repartition(numPartitions, col("id")))
    var changed = true
    var iters = 0
    // one (relax + jump) step as a derived plan over (id, c, _c0): _c0 (the
    // label at the START of the materialized job) rides along so the change
    // flag needs no join-back. Jumping through the step's OWN relax result
    // (c1∘c1): a stale jump through the materialized previous state
    // (FastSV's gp = f[f]) was measured SLOWER here despite touching only
    // flat scans — by the time colors coalesce, the jump join keys collapse
    // onto the few surviving colors and the extra exchange pair is
    // skew-bound; the derived-plan self-join costs one repeated edge gather
    // but rides the same stages.
    def step(c: DataFrame): DataFrame = {
      val cu = c.select(col("id").as("_u"), col("c").as("_cu"))
      val upd = edges.join(cu, col("src") === col("_u"))
        .groupBy(col("dst").as("id")).agg(min(col("_cu")).as("_m"))
      val relax = c.join(upd, Seq("id"), "left")
        .select(col("id"),
          least(col("c"), coalesce(col("_m"), col("c"))).as("c1"),
          col("_c0"))
      val jmpMap = relax.select(col("id").as("_j"), col("c1").as("_cj"))
      relax.join(jmpMap, col("c1") === col("_j"), "left")
        .select(col("id"),
          least(col("c1"), coalesce(col("_cj"), col("c1"))).as("c"),
          col("_c0"))
    }
    while (changed && iters < maxIters) {
      val c0 = state.df.select(col("id"), col("c"), col("c").as("_c0"))
      // ONE step per materialized job. A fused double step (step∘step, the
      // fixpoint is schedule-independent so it would be correct) was
      // MEASURED 3× the per-job cost here — the step-1 subtree feeds both
      // the step-2 gather and the step-2 merge branch and recomputes, so
      // the halved job count lost to the per-job blowup.
      val next = step(c0)
        .select(col("id"), col("c"),
          when(col("c") < col("_c0"), 1.0).otherwise(0.0).as("_chg"))
      val t0 = System.nanoTime()
      val (nextState, nChanged) = Ckpt.materializeWithSum(next, "_chg")
      if (sys.env.contains("GRAFT_SCC_DEBUG"))
        System.err.println(f"[$debugTag] iter $iters%d: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs changed=$nChanged%.0f")
      state.release()
      state = nextState
      changed = nChanged > 0
      iters += 1
    }
    (state, iters)
  }
}
