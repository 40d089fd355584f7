package graft.core

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession
import graft.core.Extras._

/** ScalaCheck guards over the GENERATED op catalogs — the surfaces the
  * example-pinned OpCatalogSpec samples one point of, randomized here:
  *
  *   1. the `{monoid}_{binop}` semiring cross-product
  *      (`operator/semiring.py:185-218` builds these combinatorially):
  *      a random semiring drawn from the 4×9 arithmetic block is resolved
  *      BY NAME through `Ops.semiring` and its mxm / mxv / vxm are compared
  *      against an independent driver-side naive fold using plain JVM
  *      arithmetic — a wrong identity, swapped operand, or monoid/binop
  *      mix-up in the generated catalog fails here even if the handful of
  *      named semirings OpCatalogSpec pins stay correct;
  *   2. row/col/scalar reduce under every arithmetic monoid
  *      (`matrix.py:1240` reduce_rowwise / reduce_columnwise /
  *      reduce_scalar), vs the same driver folds;
  *   3. the Aggregator catalog (`core/operator/agg.py`): every named
  *      aggregator's distributed answer vs a driver re-computation on the
  *      same pairs, with the positional family (argmin/argmax) checked only
  *      on draws whose extremum is unique (the reference, like min_by,
  *      returns an arbitrary witness on ties).
  *
  * Tiny fixtures (≤ 6×6) — semantics pins; scale behavior of the same
  * kernels is pinned by PlanSpec and the Q fixtures. */
object SemiringAggPropertySpec extends Properties("SemiringAgg") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  val N = 6L
  val genCoo: Gen[Map[(Long, Long), Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, N - 1); j <- Gen.chooseNum(0L, N - 1)
      v <- Gen.chooseNum(-4, 4)
    } yield ((i, j), v.toDouble))
  val genVec: Gen[Map[Long, Double]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, N - 1); v <- Gen.chooseNum(-4, 4)
    } yield (i, v.toDouble))

  def toM(m: Map[(Long, Long), Double]): GrbMatrix =
    GrbMatrix.fromCoo(spark, m.toSeq.map { case ((i, j), v) => (i, j, v) },
      GrbShape(N, N))
  def toV(m: Map[Long, Double]): GrbVector =
    GrbVector.fromPairs(spark, m.toSeq, N)
  def collect(m: GrbMatrix): Map[(Long, Long), Double] =
    m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  def collectV(v: GrbVector): Map[Long, Double] =
    v.df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  // driver-side scalar meanings of the arithmetic monoid/binop names —
  // written against the SPEC (operator tables in SURVEY §2.6), not by
  // importing the Column implementations under test
  val monoidF: Map[String, (Double, Double) => Double] = Map(
    "plus" -> (_ + _), "min" -> math.min, "max" -> math.max, "times" -> (_ * _))
  val binopF: Map[String, (Double, Double) => Double] = Map(
    "times" -> (_ * _), "plus" -> (_ + _), "min" -> math.min,
    "max" -> math.max, "first" -> ((a, _) => a), "second" -> ((_, b) => b),
    "pair" -> ((_, _) => 1.0), "minus" -> (_ - _), "rminus" -> ((a, b) => b - a))
  val genSemiringName: Gen[String] = for {
    mn <- Gen.oneOf(monoidF.keySet.toSeq)
    bn <- Gen.oneOf(binopF.keySet.toSeq)
  } yield s"${mn}_$bn"

  def naiveMxm(a: Map[(Long, Long), Double], b: Map[(Long, Long), Double],
               name: String): Map[(Long, Long), Double] = {
    val Array(mn, bn) = name.split("_", 2)
    val (mf, bf) = (monoidF(mn), binopF(bn))
    (for {
      i <- 0L until N; j <- 0L until N
      terms = (0L until N).flatMap(k =>
        for { x <- a.get((i, k)); y <- b.get((k, j)) } yield bf(x, y))
      if terms.nonEmpty
    } yield (i, j) -> terms.reduce(mf)).toMap
  }

  property("mxm under any {plus,min,max,times}×{9 binop} semiring == driver fold") =
    forAll(genCoo, genCoo, genSemiringName) { (a, b, name) =>
      collect(toM(a).mxm(toM(b), Ops.semiring(name))) == naiveMxm(a, b, name)
    }

  // mxv = mxm against an n×1 column; vxm = a 1×n row against the matrix.
  // The kernels take the vector path (Core.scala:233,433) — this guard pins
  // that both paths agree with the same driver fold as the matrix path.
  property("mxv / vxm under a random semiring == driver folds") =
    forAll(genCoo, genVec, genSemiringName) { (a, u, name) =>
      val Array(mn, bn) = name.split("_", 2)
      val (mf, bf) = (monoidF(mn), binopF(bn))
      val wantMxv = (for {
        i <- 0L until N
        terms = (0L until N).flatMap(k =>
          for { x <- a.get((i, k)); y <- u.get(k) } yield bf(x, y))
        if terms.nonEmpty
      } yield i -> terms.reduce(mf)).toMap
      val wantVxm = (for {
        j <- 0L until N
        terms = (0L until N).flatMap(k =>
          for { x <- u.get(k); y <- a.get((k, j)) } yield bf(x, y))
        if terms.nonEmpty
      } yield j -> terms.reduce(mf)).toMap
      collectV(toM(a).mxv(toV(u), Ops.semiring(name))) == wantMxv &&
        collectV(toV(u).vxm(toM(a), Ops.semiring(name))) == wantVxm
    }

  property("reduce row/col/scalar under every arithmetic monoid == driver folds") =
    forAll(genCoo, Gen.oneOf(monoidF.keySet.toSeq)) { (a, mn) =>
      val mf = monoidF(mn)
      val m = Ops.monoids(mn)
      def fold(g: Map[(Long, Long), Double] => Map[Long, Seq[Double]]) =
        g(a).view.mapValues(_.reduce(mf)).toMap
      val wantRow = fold(_.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2)).toMap)
      val wantCol = fold(_.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2)).toMap)
      val wantScalar = if (a.isEmpty) None else Some(a.values.reduce(mf))
      collectV(toM(a).reduceRowwise(m)) == wantRow &&
        collectV(toM(a).reduceColumnwise(m)) == wantCol &&
        toM(a).reduceScalar(m).map(_.toString.toDouble) == wantScalar
    }

  def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <=
      1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
  def asD(x: Any): Double = x match {
    case d: Double => d
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case b: Boolean => if (b) 1.0 else 0.0
    case o => o.toString.toDouble
  }

  // aggregators defined on any real-valued draw (incl. zeros/negatives)
  property("aggregator catalog (general family) == driver recomputation") =
    forAll(genVec.suchThat(_.nonEmpty)) { u =>
      val vs = u.values.toSeq
      val v = toV(u)
      def agg(name: String): Double = asD(v.aggregate(name).get)
      val expect: Map[String, Double] = Map(
        "sum" -> vs.sum,
        "prod" -> vs.product,
        "min" -> vs.min,
        "max" -> vs.max,
        "all" -> (if (vs.forall(_ != 0.0)) 1.0 else 0.0),
        "any" -> (if (vs.exists(_ != 0.0)) 1.0 else 0.0),
        "count" -> vs.size.toDouble,
        "count_nonzero" -> vs.count(_ != 0.0).toDouble,
        "count_zero" -> vs.count(_ == 0.0).toDouble,
        "sum_of_squares" -> vs.map(x => x * x).sum,
        "exists" -> 1.0,
        "hypot" -> math.sqrt(vs.map(x => x * x).sum),
        "L0norm" -> vs.count(_ != 0.0).toDouble,
        "L1norm" -> vs.map(math.abs).sum,
        "L2norm" -> math.sqrt(vs.map(x => x * x).sum),
        "Linfnorm" -> vs.map(math.abs).max,
        "mean" -> vs.sum / vs.size,
        "peak_to_peak" -> (vs.max - vs.min),
        "varp" -> vs.map(x => math.pow(x - vs.sum / vs.size, 2)).sum / vs.size,
        "root_mean_square" -> math.sqrt(vs.map(x => x * x).sum / vs.size),
        // stable driver logsumexp mirroring agg.py:382-404's recipe
        "logaddexp" -> {
          val m = vs.max
          m + math.log(vs.map(x => math.exp(x - m)).sum)
        },
        "logaddexp2" -> {
          val m = vs.max
          m + math.log(vs.map(x => math.pow(2, x - m)).sum) / math.log(2.0)
        },
        "first_index" -> u.keys.min.toDouble,
        "last_index" -> u.keys.max.toDouble)
      expect.forall { case (name, want) =>
        val got = agg(name)
        val ok = close(got, want)
        if (!ok) println(s"aggregator $name: got $got want $want on $u")
        ok
      } && {
        // positional witnesses: exact ids when the extremum is unique;
        // any_value/first/last must return SOME stored value
        val minV = vs.min; val maxV = vs.max
        val argminOk = vs.count(_ == minV) > 1 ||
          agg("argmin") == u.find(_._2 == minV).get._1.toDouble
        val argmaxOk = vs.count(_ == maxV) > 1 ||
          agg("argmax") == u.find(_._2 == maxV).get._1.toDouble
        argminOk && argmaxOk && vs.contains(agg("any_value")) &&
          agg("first") == u(u.keys.min) && agg("last") == u(u.keys.max)
      }
    }

  // aggregators whose driver meaning needs strictly positive inputs
  // (log / inverse recipes: agg.py geometric/harmonic/sum_of_inverses)
  property("aggregator catalog (positive-only family) == driver recomputation") =
    forAll(Gen.nonEmptyMap(for {
      i <- Gen.chooseNum(0L, N - 1); v <- Gen.chooseNum(1, 8)
    } yield (i, v.toDouble))) { u =>
      val vs = u.values.toSeq
      val v = toV(u)
      def agg(name: String): Double = asD(v.aggregate(name).get)
      close(agg("geometric_mean"), math.exp(vs.map(math.log).sum / vs.size)) &&
        close(agg("harmonic_mean"), vs.size / vs.map(1.0 / _).sum) &&
        close(agg("sum_of_inverses"), vs.map(1.0 / _).sum) &&
        close(agg("bitwise_all"),
          vs.map(_.toLong).reduce(_ & _).toDouble) &&
        close(agg("bitwise_any"),
          vs.map(_.toLong).reduce(_ | _).toDouble) && {
          // sample variance / stddev need n >= 2 for a defined answer
          vs.size < 2 || {
            val mean = vs.sum / vs.size
            val sv = vs.map(x => math.pow(x - mean, 2)).sum / (vs.size - 1)
            close(agg("vars"), sv) && close(agg("stds"), math.sqrt(sv)) &&
              close(agg("stdp"), math.sqrt(sv * (vs.size - 1) / vs.size))
          }
        }
    }
}
