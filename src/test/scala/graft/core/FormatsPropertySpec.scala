package graft.core

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck guards for the construction/interchange family: every format
  * conversion must round-trip random sparse matrices EXACTLY (values are
  * small integers stored as doubles, so no conversion may lose a bit), and
  * the packed CSR/CSC buckets must come out sorted — the invariant the
  * adjacency kernels rely on. */
object FormatsPropertySpec extends Properties("FormatsProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  /** random sparse 6×6 COO with distinct coordinates, values 1..9 */
  val genCoo: Gen[Map[(Long, Long), Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 5L); j <- Gen.chooseNum(0L, 5L)
      v <- Gen.chooseNum(1, 9)
    } yield ((i, j), v.toDouble))

  private def mat(coo: Map[(Long, Long), Double]): GrbMatrix =
    GrbMatrix.fromCoo(spark,
      coo.toSeq.map { case ((i, j), v) => (i, j, v) }, GrbShape(6, 6))

  private def asTriples(coo: Map[(Long, Long), Double]): Set[(Long, Long, Double)] =
    coo.map { case ((i, j), v) => (i, j, v) }.toSet

  property("toCsrBuckets -> fromCsrBuckets == identity; dsts sorted per bucket") =
    forAll(genCoo) { coo =>
      if (coo.isEmpty) true
      else {
        val packed = Formats.toCsrBuckets(mat(coo).df)
        val sorted = packed.collect().forall { r =>
          val ds = r.getSeq[Long](1)
          ds == ds.sorted
        }
        val back = Formats.fromCsrBuckets(packed)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        sorted && back == asTriples(coo)
      }
    }

  property("toCscBuckets -> fromCscBuckets == identity; srcs sorted per bucket") =
    forAll(genCoo) { coo =>
      if (coo.isEmpty) true
      else {
        val packed = Formats.toCscBuckets(mat(coo).df)
        val sorted = packed.collect().forall { r =>
          val ss = r.getSeq[Long](1)
          ss == ss.sorted
        }
        val back = Formats.fromCscBuckets(packed)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        sorted && back == asTriples(coo)
      }
    }

  property("toDense -> fromDense(missing=0) == identity (values never 0)") =
    forAll(genCoo) { coo =>
      val dense = Formats.toDense(mat(coo))
      val back = Formats.fromDense(spark,
        dense.map(_.toSeq).toSeq, missing = Some(0.0))
      Formats.toCoo(back).toSet == asTriples(coo)
    }

  property("toDicts -> fromDicts == identity") =
    forAll(genCoo) { coo =>
      val d = Formats.toDicts(mat(coo))
      val want = coo.groupBy(_._1._1).map { case (i, g) =>
        i -> g.map { case ((_, j), v) => (j, v) }
      }
      d == want &&
        Formats.toCoo(Formats.fromDicts(spark, d, GrbShape(6, 6))).toSet ==
          asTriples(coo)
    }

  property("vector toDenseVector -> fromDenseVector(missing=0) == identity") =
    forAll(Gen.mapOf(Gen.zip(Gen.chooseNum(0L, 5L),
        Gen.chooseNum(1, 9).map(_.toDouble)))) { pairs =>
      val v = GrbVector.fromPairs(spark, pairs.toSeq, 6L)
      val dense = Formats.toDenseVector(v)
      val back = Formats.fromDenseVector(spark, dense.toSeq, missing = Some(0.0))
      back.df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
        pairs.toSet
    }

  property("mmwrite -> mmread == identity (general real)") =
    forAll(genCoo) { coo =>
      val dir = java.nio.file.Files.createTempDirectory("mmrt")
      val path = dir.resolve("m.mtx").toString
      try {
        Formats.mmwrite(mat(coo), path)
        val back = Formats.mmread(spark, path)
        back.shape == GrbShape(6, 6) &&
          Formats.toCoo(back).toSet == asTriples(coo)
      } finally {
        java.nio.file.Files.deleteIfExists(dir.resolve("m.mtx"))
        java.nio.file.Files.deleteIfExists(dir)
      }
    }
}
