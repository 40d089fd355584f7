package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Level BFS (reference `notebooks/Example B.1 -- Level BFS.ipynb`): frontier
  * expansion with a structural-complement mask — `q(~v.S) << q vxm A` over
  * the any/min semiring; here: frontier join edges, anti-join already-
  * visited, iterate. Levels are exact shortest hop counts. */
object BFS {

  def levels(spark: SparkSession, edges: DataFrame, source: Long,
             maxDepth: Int = 64,
             checkpointer: Option[graft.runtime.IterationCheckpointer] = None,
             numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    import graft.core.Ckpt
    // frontier expansion joins on src every round — persist pre-partitioned.
    // numPartitions > 0 sizes the cached edge relation from the INPUT (the
    // SparkEntry.gparts discipline: the gather's map side then runs that
    // many tasks per level instead of the session parallelism); 0 keeps the
    // session default. The per-level aggregation exchanges stay at the
    // session parallelism on purpose — pre-repartitioning them would
    // satisfy the distribution requirement and silently drop the partial
    // (map-side) aggregation.
    val e = (if (numPartitions > 0) edges.repartition(numPartitions, col("src"))
             else edges.repartition(col("src")))
      .sortWithinPartitions("src").persist()
    e.count()
    // ONE job per level (guide §1.2/§2.4 — remove jobs, not tune them): the
    // frontier size comes fused from the materialization (was a second job)
    // and `visited` is the UNION of the per-level flat states (the MIS
    // winners trick) instead of a re-materialized relation (was a third job).
    // The union is k flat scans after k levels — the anti-join shuffles the
    // same |visited| rows either way, so per-level work is unchanged.
    val seed = Ckpt.materialize(Seq((source, 0L)).toDF("id", "level"))
    // per-level states stay materialized: their blocks back the returned
    // union (total |V| rows — the Coloring picks discipline)
    var visitedPlan = seed.df
    var frontier = seed.df.select(col("id"))
    var depth = 0L
    var frontierSize = 1L
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val (next, n) = Ckpt.materializeWithCount(
        e.join(frontier, e("src") === frontier("id"))
          .select(e("dst").as("id")).distinct()
          .join(visitedPlan, Seq("id"), "left_anti") // mask: ~visited.S
          .select(col("id"), lit(depth).as("level")))
      frontierSize = n
      if (n > 0) {
        visitedPlan = visitedPlan.unionByName(next.df)
        frontier = next.df.select(col("id"))
      } else next.release()
      checkpointer.foreach(_.save(visitedPlan, depth.toInt,
        Map("frontier" -> frontierSize.toString)))
    }
    e.unpersist()
    visitedPlan
  }

  /** Parent BFS (reference `Example B.3 -- Parent BFS.ipynb`): the notebook
    * shape is `w(~visited.S) << q vxm A` over the positional `any_secondi`
    * family — the product's VALUE is the frontier vertex's INDEX, i.e. the
    * parent. We run exactly that, through the NAMED `min_firsti` semiring
    * (q(k) ⊗ A(k,j): firsti = k = the parent candidate; min = deterministic
    * tie-break, our documented stand-in for the nondeterministic `any`,
    * SURVEY.md §7.4), with the complement mask pushed below the min-
    * aggregation (Core.vxm mask). parent(source) = source. */
  def parents(spark: SparkSession, edges: DataFrame, source: Long,
              maxDepth: Int = 64, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    import graft.core._
    // same input-sized edge cache as `levels`
    val e = (if (numPartitions > 0) edges.repartition(numPartitions, col("src"))
             else edges.repartition(col("src")))
      .sortWithinPartitions("src").persist()
    e.count()
    // shape is declarative only (ids are externally assigned); the kernels
    // never materialize the universe
    val a = GrbMatrix(e.withColumn("v", lit(1.0)), GrbShape(1L << 40, 1L << 40))
    // same ONE-job-per-level shape as `levels`: fused frontier count +
    // union-of-flat-states visited (blocks back the returned frame)
    val seed = Ckpt.materialize(Seq((source, source)).toDF("id", "v"))
    var visitedPlan = seed.df
    var frontier = seed.df
    var depth = 0
    var frontierSize = 1L
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val q = GrbVector(frontier, 1L << 40)
      val notVisited = GrbMask(visitedPlan.select("id"), complement = true)
      val (next, n) = Ckpt.materializeWithCount(
        q.vxm(a, Ops.semiring("min_firsti"), Some(notVisited)).df)
      frontierSize = n
      if (n > 0) {
        visitedPlan = visitedPlan.unionByName(next.df)
        frontier = next.df
      } else next.release()
    }
    e.unpersist()
    visitedPlan.select(col("id"), col("v").cast("long").as("parent"))
  }
}
