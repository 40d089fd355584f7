package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class ClusteringSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val Q = 16777216.0

  test("kmeans separates two well-separated blobs; assignment is layout-independent") {
    // ids 0 and 1 (the k=2 init) sit one in each blob
    val rows =
      Seq((0L, Seq(1.0f, 0.05f)), (1L, Seq(0.02f, 1.0f))) ++
        (2 to 6).map(i => (i.toLong, Seq(1.0f + 0.01f * i, 0.02f * i))) ++
        (7 to 11).map(i => (i.toLong, Seq(0.01f * (i - 7), 1.0f - 0.015f * i)))
    val emb = rows.toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(emb, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(((0L to 0L) ++ (2L to 6L)).map(got).toSet == Set(0L))
    assert(((1L to 1L) ++ (7L to 11L)).map(got).toSet == Set(1L))

    // sparse/offset id space: the init is the k LOWEST ids, not `id < k`
    val offset = emb.select((col("vec_id") + 500L).as("vec_id"), col("embedding"))
    val got2 = Clustering.kmeansAssign(offset, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2.keySet == (500L to 511L).toSet)
    assert(got2.map { case (id, c) => (id - 500L, c - 500L) } == got)
  }

  test("kmeans assignment is bit-identical across partitionings (real embeddings)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(parts: Int) =
      Clustering.kmeansAssign(emb.repartition(parts), k = 8, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(2) == run(13))
  }

  test("Lloyd rounds never increase within-cluster SSE") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 150)
    // driver-side SSE on the same quantized vectors kmeans itself sees
    val x = emb.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray
        .map(v => math.floor(v.toDouble * Q) / Q)
    }.toMap
    def sse(assign: Map[Long, Long]): Double =
      assign.groupBy(_._2).values.map { members =>
        val vs = members.keys.toArray.map(x)
        val dim = vs.head.length
        val mean = Array.tabulate(dim)(j => vs.map(_(j)).sum / vs.length)
        vs.map(v => v.indices.map(j => (v(j) - mean(j)) * (v(j) - mean(j))).sum).sum
      }.sum
    val sses = (1 to 3).map { it =>
      sse(Clustering.kmeansAssign(emb, k = 4, iters = it).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
    assert(sses(1) <= sses(0) + 1e-9)
    assert(sses(2) <= sses(1) + 1e-9)
  }

  test("QuantizeArray codegen agrees with the composed transform form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 100)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val native = m(emb.select(col("vec_id"),
      graft.functions.QuantizeArray(col("embedding")).as("q")))
    val composed = m(emb.select(col("vec_id"),
      transform(col("embedding"),
        v => floor(v.cast("double") * 16777216.0) / 16777216.0).as("q")))
    assert(native == composed)
    // double-typed arrays and negatives go through the same path
    val d = Seq((1L, Seq(0.1, -2.5, 0.0, 1.0 / 3.0))).toDF("vec_id", "embedding")
    assert(m(d.select(col("vec_id"),
      graft.functions.QuantizeArray(col("embedding")).as("q"))) ==
      m(d.select(col("vec_id"), transform(col("embedding"),
        v => floor(v * 16777216.0) / 16777216.0).as("q"))))
  }

  test("semanticDedup drops the larger id of a planted duplicate, keeps the rest") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 40).select(col("vec_id"), col("embedding"))
    val clone = base.filter(col("vec_id") === 5)
      .select(lit(1000L).as("vec_id"), col("embedding"))
    val got = Clustering.semanticDedup(base.unionByName(clone),
      k = 4, iters = 2, threshold = 0.99).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 41)
    // identical vectors share a cluster deterministically; cos = 1.0 ≥ 0.99
    assert(got(1000L)._2 == 0L, "the clone (larger id) must be dropped")
    assert(got(5L)._2 == 1L, "the original (smaller id) must be kept")
    assert(got(1000L)._1 == got(5L)._1, "clone and original share a cluster")
    // nothing else in 40 random embeddings reaches cosine 0.99
    assert(got.filterNot(_._1 == 1000L).values.forall(_._2 == 1L))
  }
}
