package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The custom codegen dot-product expression vs the composed
  * HigherOrderFunction form it replaces (same values, both eval paths). */
class DotProductSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("graft_dot: float/double arrays, codegen and interpreted agree with HOF") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
      (Array(-1.5f, 0.0f, 2.5f), Array(2.0, 9.0, -4.0))
    ).toDF("af", "bd")
    val rows = df.select(
      DotProduct(col("af"), col("bd")).as("dp"),
      hofDot(col("af"), col("bd")).as("hof"),
      DotProduct(col("af"), col("af")).as("ff"),
      DotProduct(col("bd"), col("bd")).as("dd")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(rows(0).getDouble(0) === 32.0)
    assert(rows(0).getDouble(2) === 14.0)
    assert(rows(0).getDouble(3) === 77.0)
    // null array propagates null
    val n = df.select(DotProduct(lit(null).cast("array<double>"), col("bd")))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("graft_dot matches HOF on the test embeddings (whole-stage codegen path)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = emb.select(
        DotProduct(col("embedding"), col("embedding")).as("dp"),
        hofDot(col("embedding"), col("embedding")).as("hof"))
      .filter(abs(col("dp") - col("hof")) > 1e-12)
    assert(bad.count() === 0)
  }
}
