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
    val deg = edgesSym.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxCenterDeg)
      .select(col("src").as("_w"), col("deg"))
    val a = edgesSym.select(col("src").as("u"), col("dst").as("w"))
    val b = edgesSym.select(col("src").as("_w2"), col("dst").as("v"))
    val wedges = a
      .join(deg, col("w") === col("_w")) // capped centers only
      .join(b, col("w") === col("_w2") && col("u") < col("v"))
      .groupBy("u", "v").agg(sum(lit(1.0) / log(col("deg"))).as("score"))
    wedges
      .join(edgesSym, wedges("u") === edgesSym("src") &&
        wedges("v") === edgesSym("dst"), "left_anti")
      .select(col("u").as("src"), col("v").as("dst"), col("score"))
  }
}
