package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.ingest.Pages
import graft.pipeline.UrlOps

class ContractionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // 5 edges over groups {0,1}->0, {2,3}->1
  private def edges =
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
  private def groups =
    Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)).toDF("id", "grp")

  test("contract: parallel edges collapse into the weight, intra-group " +
    "edges drop by default, diagonal rows appear when kept") {
    val got = Contraction.contract(edges, groups).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 1L) -> 2L, (1L, 0L) -> 1L))
    val withLoops = Contraction.contract(edges, groups, dropSelfLoops = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(withLoops === Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 2L, (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("contractBy: the projection form agrees with the relation form when " +
    "the mapping is the same function") {
    val rel = Contraction.contract(
      edges, spark.range(4).select(col("id"), (col("id") / 2).cast("long").as("grp")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val proj = Contraction.contractBy(edges, c => (c / 2).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rel === proj)
  }

  test("Pages.hostGraph matches a driver-side host recount of the raw hrefs") {
    val pages = Pages.synthesize(spark, 60, nSites = 5)
    val links = Pages.extractLinks(pages)
      .select(UrlOps.host(col("url")).as("a"), UrlOps.host(col("dst_url")).as("b"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = links.filter { case (a, b) => a != b }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Pages.hostGraph(pages).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.keys.flatMap(k => Seq(k._1, k._2)).forall(_.endsWith(".example")))
  }

  test("contractBy plans with NO join — projection + one aggregation only") {
    // the whole point of the projection form: at 10^12 pages a vertex-id
    // join (or the id map itself) must never materialize for a host-graph
    // build. Pin it at the Catalyst level.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = Contraction.contractBy(edges, c => (c / 2).cast("long"))
      .queryExecution.optimizedPlan
    assert(plan.collect { case j: Join => j }.isEmpty, plan.toString)
    assert(plan.collect { case a: Aggregate => a }.size == 1, plan.toString)
  }
}
