package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over an undirected graph: Adamic-Adar scores
  * `AA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w))` for non-adjacent candidate
  * pairs. (Every common neighbor w has deg(w) ≥ 2 by construction, so the
  * 1/ln term is finite.)
  *
  * Spark-first shape: one wedge self-join on the shared center (u—w—v,
  * u < v to canonicalize orientation), the center's inverse-log-degree
  * weight joined BEFORE the pair aggregation, one hash aggregation per
  * pair, and a left-anti join against the edge set to mask out already-
  * linked pairs — equi-joins and partial aggregation only.
  *
  * Scale guard (`maxCenterDeg`): wedge count is Σ_w deg(w)², so one
  * web-scale hub generates deg² candidate pairs. Centers above the cap are
  * dropped from wedge generation BEFORE the self-join — the standard
  * df-cap; high-degree centers contribute the least signal anyway
  * (1/ln(deg) → 0), which is the analytic justification for capping.
  */
object LinkPrediction {

  def adamicAdar(edgesSym: DataFrame,
                 maxCenterDeg: Int = Int.MaxValue): DataFrame = {
    // e feeds FOUR plan branches (both wedge sides, the degree histogram,
    // and the anti-join mask) — without a persist the upstream
    // extract/symmetrize/distinct chain re-runs per branch (the fan-out
    // recompute gotcha); materialize eagerly so cold branches don't race
    val e = edgesSym.persist()
    e.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxCenterDeg)
      .select(col("src").as("_w"), col("deg"))
    val a = e.select(col("src").as("u"), col("dst").as("w"))
    val b = e.select(col("src").as("_w2"), col("dst").as("v"))
    val wedges = a
      .join(deg, col("w") === col("_w")) // capped centers only
      .join(b, col("w") === col("_w2") && col("u") < col("v"))
      .groupBy("u", "v").agg(sum(lit(1.0) / log(col("deg"))).as("score"))
    val result = wedges
      .join(e, wedges("u") === e("src") && wedges("v") === e("dst"), "left_anti")
      .select(col("u").as("src"), col("v").as("dst"), col("score"))
    // materialize, then release the edge cache (cache-hygiene contract:
    // CacheManager must be empty after each pipeline op)
    val out = graft.core.Ckpt.materialize(result).df
    e.unpersist(blocking = false)
    out
  }

  /** Jaccard link prediction: `J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)|` for
    * non-adjacent pairs, with `|N(u)∪N(v)| = deg(u)+deg(v)-cn` so the union
    * never materializes. Same one-wedge-join shape as Adamic-Adar, except
    * the per-center weight is 1 (a plain pair COUNT — cheaper partial
    * aggregation) and the u/v degrees join AFTER the pair aggregation, on
    * the already-collapsed pair relation rather than the wedge fan-out.
    *
    * `maxCenterDeg` caps wedge generation exactly as in [[adamicAdar]]
    * (Σ deg² hub guard); u/v degrees stay UNcapped — the cap bounds the
    * candidate generator, not the score definition.
    */
  def jaccard(edgesSym: DataFrame,
              maxCenterDeg: Int = Int.MaxValue): DataFrame = {
    val e = edgesSym.persist()
    e.count()
    val degAll = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val degCtr = degAll.filter(col("deg") <= maxCenterDeg)
      .select(col("src").as("_w"))
    val a = e.select(col("src").as("u"), col("dst").as("w"))
    val b = e.select(col("src").as("_w2"), col("dst").as("v"))
    val pairs = a
      .join(degCtr, col("w") === col("_w"))
      .join(b, col("w") === col("_w2") && col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
    val du = degAll.select(col("src").as("_u"), col("deg").as("deg_u"))
    val dv = degAll.select(col("src").as("_v"), col("deg").as("deg_v"))
    val scored = pairs
      .join(du, col("u") === col("_u"))
      .join(dv, col("v") === col("_v"))
      .select(col("u"), col("v"),
        (col("cn").cast("double") /
          (col("deg_u") + col("deg_v") - col("cn"))).as("score"))
    val result = scored
      .join(e, scored("u") === e("src") && scored("v") === e("dst"), "left_anti")
      .select(col("u").as("src"), col("v").as("dst"), col("score"))
    val out = graft.core.Ckpt.materialize(result).df
    e.unpersist(blocking = false)
    out
  }
}
