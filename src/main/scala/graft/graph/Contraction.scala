package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph contraction (quotient graph): collapse each vertex into its group
  * and emit the group-level weighted edge table. The canonical web-graph
  * instance is the page graph → host graph projection (every link-graph
  * paper reports both), but the operator is general: community → super-graph
  * coarsening, site-level PageRank inputs, multilevel partitioning.
  *
  * Two forms, picked by how the grouping is known:
  *
  *  - `contract(edges, groups)` — the grouping is a RELATION
  *    `(id, grp)` (e.g. community assignments from label propagation).
  *    Plan: two equi-joins on the vertex id (src then dst) + one hash
  *    aggregation. At web scale both joins shuffle on the vertex id — the
  *    same key the adjacency is already hash-partitioned on, so the edge
  *    side's exchange is reusable; the groups side is a skinny two-column
  *    relation. No broadcast is forced (the mapping has one row per VERTEX —
  *    unbounded); AQE may still choose one at small SF.
  *
  *  - `contractBy(edges, f)` — the grouping is a pure FUNCTION of the vertex
  *    id/url (host extraction, id-range blocking). Plan: projection + one
  *    hash aggregation, NO join at all — this is the form a 10^12-page
  *    host-graph build must use, and partial aggregation collapses the
  *    (heavily duplicated) group pairs map-side before the only shuffle.
  *
  * Output: `(src_g, dst_g, weight)` where weight = number of underlying
  * edges between the two groups (parallel edges collapse into the weight —
  * the standard quotient-multigraph convention). Intra-group edges become
  * diagonal rows unless `dropSelfLoops` (the default — host-internal links
  * dominate raw web-edge counts and are noise for inter-host analytics).
  */
object Contraction {

  def contract(edges: DataFrame, groups: DataFrame,
               dropSelfLoops: Boolean = true): DataFrame = {
    val gs = groups.select(col("id").as("_sid"), col("grp").as("src_g"))
    val gd = groups.select(col("id").as("_did"), col("grp").as("dst_g"))
    val mapped = edges
      .join(gs, edges("src") === gs("_sid"))
      .join(gd, edges("dst") === gd("_did"))
      .select(col("src_g"), col("dst_g"))
    val kept = if (dropSelfLoops) mapped.filter(col("src_g") =!= col("dst_g"))
               else mapped
    kept.groupBy("src_g", "dst_g").agg(count(lit(1)).as("weight"))
  }

  def contractBy(edges: DataFrame, f: Column => Column,
                 dropSelfLoops: Boolean = true): DataFrame = {
    val mapped = edges.select(f(col("src")).as("src_g"), f(col("dst")).as("dst_g"))
    val kept = if (dropSelfLoops) mapped.filter(col("src_g") =!= col("dst_g"))
               else mapped
    kept.groupBy("src_g", "dst_g").agg(count(lit(1)).as("weight"))
  }
}
