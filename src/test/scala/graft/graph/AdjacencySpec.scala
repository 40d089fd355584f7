package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Direct tests of the CSR-bucket adjacency layout — the skew-control and
  * dtype-packing contracts the iterative algorithms rely on (SURVEY.md §1.4;
  * north_star "explicit salting of high-degree hub vertices"). */
class AdjacencySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("hub out-degree is chunk-salted: no packed row exceeds maxChunk, " +
    "deg stays the FULL degree, edges survive exactly") {
    // one hub (0 → 1..500) over maxChunk=64, plus a normal vertex
    val edges = ((1 to 500).map(d => (0L, d.toLong)) :+ (7L, 3L)).toDF("src", "dst")
    val adj = Adjacency.build(edges, 501, numPartitions = 4, maxChunk = 64)
    try {
      val rows = adj.rows.select(col("src"), col("deg"),
        size(col("dsts")).as("len")).collect()
      val hubRows = rows.filter(_.getLong(0) == 0L)
      // ceil(500/64) = 8 chunks, each within the bound, full degree on every row
      assert(hubRows.length == 8, s"expected 8 salted chunks, got ${hubRows.length}")
      assert(hubRows.forall(_.getInt(2) <= 64), "a chunk exceeds maxChunk")
      assert(hubRows.forall(_.getLong(1) == 500L), "deg must be the FULL out-degree")
      assert(rows.filter(_.getLong(0) == 7L).map(_.getLong(1)).toSeq == Seq(1L))
      // no edge lost or duplicated by the salting
      assert(adj.numEdges == 501L)
      val back = adj.rows.select(col("src"), explode(col("dsts")).as("dst"))
        .collect().map(r => (r.getLong(0), r.get(1).toString.toLong)).toSet
      assert(back == ((1 to 500).map(d => (0L, d.toLong)) :+ (7L, 3L)).toSet)
    } finally adj.unpersist()
  }

  test("neighbor arrays int-pack iff the vertex universe fits 32 bits") {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    def elemType(a: Adjacency) =
      a.rows.schema("dsts").dataType.asInstanceOf[ArrayType].elementType
    val small = Adjacency.build(edges, 3, numPartitions = 2)
    val big = Adjacency.build(edges, Int.MaxValue.toLong + 10, numPartitions = 2)
    try {
      assert(elemType(small) == IntegerType, "small universe must int-pack")
      assert(elemType(big) == LongType, "a >2^31 universe must stay long")
    } finally { small.unpersist(); big.unpersist() }
  }
}
