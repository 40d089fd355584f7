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
             checkpointer: Option[graft.runtime.IterationCheckpointer] = None): DataFrame = {
    import spark.implicits._
    import graft.core.Ckpt
    // frontier expansion joins on src every round — persist pre-partitioned
    val e = edges.repartition(col("src")).sortWithinPartitions("src").persist()
    e.count()
    var visited = Ckpt.materialize(Seq((source, 0L)).toDF("id", "level"))
    var frontier = visited.df.select(col("id"))
    var lastNext: Option[graft.core.CkptState] = None
    var depth = 0L
    var frontierSize = 1L
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val next = Ckpt.materialize(
        e.join(frontier, e("src") === frontier("id"))
          .select(e("dst").as("id")).distinct()
          .join(visited.df, Seq("id"), "left_anti") // mask: ~visited.S
          .select(col("id"), lit(depth).as("level")))
      frontierSize = next.df.count()
      val newVisited = Ckpt.materialize(visited.df.unionByName(next.df))
      visited.release()
      lastNext.foreach(_.release()) // previous frontier, now consumed
      lastNext = Some(next)
      visited = newVisited
      frontier = next.df.select(col("id"))
      checkpointer.foreach(_.save(visited.df, depth.toInt,
        Map("frontier" -> frontierSize.toString)))
    }
    lastNext.foreach(_.release())
    e.unpersist()
    visited.df
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
              maxDepth: Int = 64): DataFrame = {
    import spark.implicits._
    import graft.core._
    val e = edges.repartition(col("src")).sortWithinPartitions("src").persist()
    e.count()
    // shape is declarative only (ids are externally assigned); the kernels
    // never materialize the universe
    val a = GrbMatrix(e.withColumn("v", lit(1.0)), GrbShape(1L << 40, 1L << 40))
    var visited = Ckpt.materialize(Seq((source, source)).toDF("id", "v"))
    var frontier = visited.df
    var lastNext: Option[CkptState] = None
    var depth = 0
    var frontierSize = 1L
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val q = GrbVector(frontier, 1L << 40)
      val notVisited = GrbMask(visited.df.select("id"), complement = true)
      val next = Ckpt.materialize(
        q.vxm(a, Ops.semiring("min_firsti"), Some(notVisited)).df)
      frontierSize = next.df.count()
      val newVisited = Ckpt.materialize(visited.df.unionByName(next.df))
      visited.release()
      lastNext.foreach(_.release())
      lastNext = Some(next)
      visited = newVisited
      frontier = next.df
    }
    lastNext.foreach(_.release())
    e.unpersist()
    visited.df.select(col("id"), col("v").cast("long").as("parent"))
  }
}
