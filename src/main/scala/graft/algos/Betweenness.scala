package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Ckpt, CkptState}

/** Seed-sampled betweenness centrality — Brandes' algorithm (Brandes 2001;
  * the LAGraph/GraphBLAS batched formulation: σ by level-synchronous
  * frontier pushes, δ by the mirrored backward sweep) restricted to a
  * source sample S, the standard web-scale estimator (exact BC is O(V·E)):
  * bc(v) = Σ_{s∈S} δ_s(v), δ_s(v) = Σ_{w: succ} σ_s(v)/σ_s(w)·(1+δ_s(w)).
  *
  * Batching: all |S| trees run in ONE loop with a `source` key column —
  * each forward level is one gather join + one (source,dst) hash
  * aggregation summing path counts, each backward level one join against
  * the NEXT level's (σ, δ) rows; the edge relation (persisted
  * pre-partitioned+sorted on src) is scanned once per level per phase
  * regardless of |S|. Path counts are exact BIGINTs (no float drift in σ);
  * only δ is FP, and it is computed level-synchronously so its value is a
  * deterministic expression per row — the only order-dependence is the
  * final per-vertex sum, absorbed by the caller's rounding.
  *
  * `maxDepth` truncation: paths longer than maxDepth are ignored — a
  * deterministic "bounded-radius Brandes" matching the same-R oracle
  * unroll exactly (for R ≥ the sample's eccentricity it IS exact Brandes).
  *
  * Output: (id, bc) for vertices with at least one contributing pair —
  * sources themselves and leaf-level vertices carry δ=0 and are absent.
  */
object Betweenness {

  def run(spark: SparkSession, edges: DataFrame, sources: Seq[Long],
          maxDepth: Int = 32, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    require(sources.nonEmpty && sources.distinct.size == sources.size)
    // input-sized edge cache when numPartitions > 0 (the SparkEntry.gparts
    // discipline — see BFS.levels); the per-level aggregation exchanges keep
    // the session parallelism so partial aggregation survives
    val e = (if (numPartitions > 0) edges.repartition(numPartitions, col("src"))
             else edges.repartition(col("src")))
      .sortWithinPartitions("src").persist()
    e.count()

    // ---- forward: per-level frontiers with exact shortest-path counts σ.
    // ONE job per level (was 3): the frontier count is fused into the
    // materialization and `visited` is the union of the per-level flat
    // states (the MIS winners trick) — the anti-join shuffles the same
    // |visited| rows either way.
    val f0 = Ckpt.materialize(
      sources.map(s => (s, s, 1L)).toDF("source", "id", "sig"))
    var visitedPlan = f0.df.select(col("source"), col("id"))
    val frontiers = scala.collection.mutable.ArrayBuffer[CkptState](f0)
    var depth = 0
    var alive = sources.size.toLong
    while (alive > 0 && depth < maxDepth) {
      depth += 1
      val prev = frontiers.last.df
      val (next, n) = Ckpt.materializeWithCount(
        e.join(prev, e("src") === prev("id"))
          .groupBy(prev("source"), e("dst").as("id"))
          .agg(sum(prev("sig")).as("sig"))
          .join(visitedPlan, Seq("source", "id"), "left_anti"))
      alive = n
      if (alive > 0) {
        visitedPlan = visitedPlan.unionByName(
          next.df.select(col("source"), col("id")))
        frontiers += next
      } else next.release()
    }
    val dMax = frontiers.size - 1 // deepest non-empty level

    // ---- backward: δ sweep from level dMax-1 down to 1
    // level-dMax vertices have no in-radius successors -> δ = 0
    // ONE job per backward level (was 2): per-level δ states accumulate as
    // flat scans and union ONCE into the final aggregation (winners trick)
    var delta = Ckpt.materialize(frontiers(dMax).df
      .select(col("source"), col("id"), lit(0.0).as("delta")))
    val deltas = scala.collection.mutable.ListBuffer[CkptState]()
    for (l <- (dMax - 1) to 1 by -1) {
      val v = frontiers(l).df
      val w = frontiers(l + 1).df
        .join(delta.df.withColumnRenamed("delta", "dw"),
          Seq("source", "id"), "left")
        .select(col("source"), col("id").as("wid"), col("sig").as("wsig"),
          coalesce(col("dw"), lit(0.0)).as("dw"))
      val dl = Ckpt.materialize(
        e.join(v, e("src") === v("id"))
          .join(w, v("source") === w("source") && e("dst") === w("wid"))
          .groupBy(v("source"), v("id"))
          .agg(sum(v("sig").cast("double") / col("wsig") *
            (col("dw") + 1.0)).as("delta")))
      if (deltas.isEmpty) delta.release() // the level-dMax all-zero seed
      deltas += dl
      delta = dl
    }
    e.unpersist()
    // the per-level δ states back the returned aggregation (released with
    // the session); frontiers beyond the seed are consumed
    if (deltas.isEmpty) delta.release()
    frontiers.foreach(_.release())
    if (deltas.isEmpty) { // radius-1 sample: nothing strictly between
      Seq.empty[(Long, Double)].toDF("id", "bc")
    } else {
      deltas.map(_.df).reduce(_.unionByName(_))
        .groupBy("id").agg(sum("delta").as("bc"))
    }
  }
}
