package graft.core

import org.scalacheck.{Gen, Properties, Prop, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck properties on tiny random COO matrices (SURVEY.md §5):
  * distributed kernels vs naive driver-side algebra. */
object KernelPropertySpec extends Properties("Kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  val genCoo: Gen[Map[(Long, Long), Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 5L); j <- Gen.chooseNum(0L, 5L)
      v <- Gen.chooseNum(-4, 4)
    } yield ((i, j), v.toDouble))

  def toM(m: Map[(Long, Long), Double]): GrbMatrix =
    GrbMatrix.fromCoo(spark, m.toSeq.map { case ((i, j), v) => (i, j, v) }, GrbShape(6, 6))

  def collect(m: GrbMatrix): Map[(Long, Long), Double] =
    m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  property("mxm plus_times == naive sparse product") = forAll(genCoo, genCoo) { (a, b) =>
    val want = (for {
      i <- 0L until 6L; j <- 0L until 6L
      terms = (0L until 6L).flatMap(k =>
        for { x <- a.get((i, k)); y <- b.get((k, j)) } yield x * y)
      if terms.nonEmpty
    } yield (i, j) -> terms.sum).toMap
    collect(toM(a).mxm(toM(b), Ops.plusTimes)) == want
  }

  property("ewise_add plus commutative; structure = union") = forAll(genCoo, genCoo) { (a, b) =>
    val ab = collect(toM(a).ewiseAdd(toM(b), Ops.plus))
    val ba = collect(toM(b).ewiseAdd(toM(a), Ops.plus))
    ab == ba && ab.keySet == (a.keySet ++ b.keySet)
  }

  property("ewise_mult structure = intersection") = forAll(genCoo, genCoo) { (a, b) =>
    collect(toM(a).ewiseMult(toM(b), Ops.times)).keySet ==
      (a.keySet intersect b.keySet)
  }

  property("mask semi+anti partitions the input") = forAll(genCoo, genCoo) { (a, b) =>
    val m = toM(b).structureMask()
    val inside = collect(GrbMatrix(
      Kernels.maskFilter(toM(a).df, m, Seq("src", "dst")), GrbShape(6, 6)))
    val outside = collect(GrbMatrix(
      Kernels.maskFilter(toM(a).df, GrbMask(m.keys, complement = true),
        Seq("src", "dst")), GrbShape(6, 6)))
    inside.keySet.intersect(outside.keySet).isEmpty && (inside ++ outside) == a
  }
}
