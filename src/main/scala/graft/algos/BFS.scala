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

  /** Parent BFS (reference `Example B.3 -- Parent BFS.ipynb`): the reference
    * uses the nondeterministic `any_secondi` semiring; we make it
    * deterministic as min-parent (documented divergence, SURVEY.md §7.4):
    * parent(v) = min u with edge u→v and level(u) = level(v)-1; source's
    * parent is itself. */
  def parents(spark: SparkSession, edges: DataFrame, source: Long,
              maxDepth: Int = 64): DataFrame = {
    val lv = levels(spark, edges, source, maxDepth).cache()
    val child = lv.select(col("id"), col("level"))
    val par = lv.select(col("id").as("_pid"), col("level").as("_plevel"))
    val nonSource = child.filter(col("id") =!= source)
      .join(edges, edges("dst") === child("id"))
      .join(par, edges("src") === col("_pid") && col("_plevel") === col("level") - 1)
      .groupBy(col("id")).agg(min(col("_pid")).as("parent"))
    import spark.implicits._
    nonSource.unionByName(Seq((source, source)).toDF("id", "parent"))
  }
}
