package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Level BFS (reference `notebooks/Example B.1 -- Level BFS.ipynb`): frontier
  * expansion with a structural-complement mask — `q(~v.S) << q vxm A` over
  * the any/min semiring; here: frontier join edges, anti-join already-
  * visited, iterate. Levels are exact shortest hop counts. */
object BFS {

  def levels(spark: SparkSession, edges: DataFrame, source: Long,
             maxDepth: Int = 64): DataFrame = {
    import spark.implicits._
    var visited = Seq((source, 0L)).toDF("id", "level").localCheckpoint(true)
    var frontier = visited.select(col("id"))
    var depth = 0L
    var frontierSize = 1L
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val next = edges.join(frontier, edges("src") === frontier("id"))
        .select(edges("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti") // mask: ~visited.S
        .select(col("id"), lit(depth).as("level"))
        .localCheckpoint(true)
      frontierSize = next.count()
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next.select(col("id"))
    }
    visited
  }
}
