package graft.algos

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck guards for the whole-graph statistics suite: every
  * [[GraphStats]] operator checked against a driver-side brute-force
  * simulation on random graphs over a tiny vertex universe (same convention
  * as AlgoPropertySpec / KernelPropertySpec). The driver replicates the
  * EXACT documented semantics — integer moment sums combined in one double
  * expression, Spark's HALF_UP rounding — so the comparisons are to 1e-9,
  * far below the operators' own rounding grain. */
object GraphStatsPropertySpec extends Properties("GraphStatsProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  // undirected (canonical src < dst, loop-free) edge sets over 7 vertices —
  // discard-free construction (no `if i != j` generator filter, which can
  // trip ScalaCheck's give-up ratio on an unlucky streak)
  val genUndirected: Gen[Set[(Long, Long)]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 6L); j0 <- Gen.chooseNum(0L, 5L)
      j = if (j0 >= i) j0 + 1 else j0
    } yield ((math.min(i, j), math.max(i, j)), ())).map(_.keySet)

  // directed edge sets (self-loops kept — reciprocity must count a loop as
  // its own reverse, the histogram must bucket its degree)
  val genDirected: Gen[Set[(Long, Long)]] =
    Gen.mapOf(for {
      i <- Gen.chooseNum(0L, 6L); j <- Gen.chooseNum(0L, 6L)
    } yield ((i, j), ())).map(_.keySet)

  private def sym(es: Set[(Long, Long)]): Seq[(Long, Long)] =
    (es ++ es.map { case (a, b) => (b, a) }).toSeq

  /** Spark's round(double, s): HALF_UP on the decimal string value */
  private def rnd(x: Double, s: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  private def nbrs(es: Set[(Long, Long)]): Map[Long, Set[Long]] =
    sym(es).groupBy(_._1).map { case (v, g) => (v, g.map(_._2).toSet) }

  /** canonical triangles a < b < c */
  private def triangles(es: Set[(Long, Long)]): Set[(Long, Long, Long)] =
    for {
      (a, b) <- es; (b2, c) <- es if b2 == b && es((a, c))
    } yield (a, b, c)

  private def degs(es: Set[(Long, Long)]): Map[Long, Long] =
    nbrs(es).map { case (v, s) => (v, s.size.toLong) }

  property("localClustering == driver 2 tri / deg(deg-1)") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val deg = degs(es)
        val triPer = triangles(es).toSeq
          .flatMap { case (a, b, c) => Seq(a, b, c) }
          .groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
        val want = deg.map { case (v, d) =>
          (v, d, if (d < 2) 0.0
                 else rnd(triPer.getOrElse(v, 0L) * 2.0 / (d * (d - 1)), 6))
        }.toSet
        val got = GraphStats.localClustering(sym(es).toDF("src", "dst"),
            numPartitions = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)) &&
          got.forall { case (v, d, x) =>
            want.exists { case (v2, d2, y) =>
              v2 == v && d2 == d && math.abs(x - y) <= 1e-9 } }
      }
    }

  property("transitivity == driver 6 tri / sum deg(deg-1)") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val w2 = degs(es).values.map(d => d * (d - 1)).sum
        val want = if (w2 == 0) 0.0
                   else rnd(triangles(es).size * 6.0 / w2, 9)
        val got = GraphStats.transitivity(sym(es).toDF("src", "dst"),
            numPartitions = 4)
          .collect()(0).getDouble(0)
        math.abs(got - want) <= 1e-9
      }
    }

  property("assortativity == driver Pearson over exact integer moments") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val deg = degs(es)
        val xy = sym(es).map { case (u, v) => (deg(u), deg(v)) }
        val n = xy.size.toLong
        val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
        val sxy = xy.map(p => p._1 * p._2).sum
        val sxx = xy.map(p => p._1 * p._1).sum
        val syy = xy.map(p => p._2 * p._2).sum
        val den = math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble)
        val got = GraphStats.assortativity(sym(es).toDF("src", "dst"))
          .collect()(0).getDouble(0)
        if (den == 0.0) got.isNaN
        else math.abs(got - rnd((n * sxy - sx * sy).toDouble / den, 6)) <= 1e-9
      }
    }

  property("reciprocity == driver reverse-membership ratio on digraphs") =
    forAll(genDirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val r = es.count { case (a, b) => es((b, a)) }
        val want = rnd(r.toDouble / es.size, 6)
        val got = GraphStats.reciprocity(es.toSeq.toDF("src", "dst"))
          .collect()(0).getDouble(0)
        math.abs(got - want) <= 1e-9
      }
    }

  property("degreeHistogram == driver bit-length buckets") =
    forAll(genDirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val want = es.toSeq.groupBy(_._1).map { case (_, g) => g.size.toLong }
          .groupBy(d => java.lang.Long.toBinaryString(d).length)
          .map { case (b, g) => (b.toLong, g.size.toLong) }
        val got = GraphStats.degreeHistogram(es.toSeq.toDF("src", "dst"))
          .collect()
          .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
        got == want
      }
    }

  property("modularity(labels = id mod 2) == driver Newman Q") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val lbl = (v: Long) => v % 2
        val twoM = 2L * es.size
        val sw = sym(es).count { case (u, v) => lbl(u) == lbl(v) }.toLong
        val sd2 = degs(es).toSeq.groupBy { case (v, _) => lbl(v) }
          .map { case (_, g) => g.map(_._2).sum }
          .map(dc => dc * dc).sum
        val want = rnd(sw.toDouble / twoM
          - sd2.toDouble / (twoM.toDouble * twoM.toDouble), 9)
        val vs = es.flatMap { case (a, b) => Seq(a, b) }
        val got = GraphStats.modularity(sym(es).toDF("src", "dst"),
            vs.toSeq.map(v => (v, lbl(v))).toDF("id", "label"))
          .collect()(0).getDouble(0)
        math.abs(got - want) <= 1e-9
      }
    }

  property("sMetric == driver sum deg(u) deg(v) over canonical edges") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val deg = degs(es)
        val want = es.toSeq.map { case (u, v) => deg(u) * deg(v) }.sum
        val got = GraphStats.sMetric(sym(es).toDF("src", "dst"))
          .collect()(0).getLong(0)
        got == want
      }
    }

  property("squareClustering == driver wedge-pair formula (uncapped)") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val nb = nbrs(es)
        val deg = degs(es)
        val want = nb.map { case (v, nv) =>
          val pairs = for {
            u <- nv.toSeq; w <- nv.toSeq if u < w
          } yield {
            val q = ((nb(u) intersect nb(w)) - v).size.toLong
            val theta = if (es((math.min(u, w), math.max(u, w)))) 1L else 0L
            (q, deg(u) + deg(w) - q - 2 - theta * 2)
          }
          val num = pairs.map(_._1).sum
          val den = pairs.map(_._2).sum
          (v, if (den == 0) 0.0 else rnd(num.toDouble / den, 6))
        }
        val got = GraphStats.squareClustering(sym(es).toDF("src", "dst"),
            numPartitions = 4)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        got.keySet == want.keySet &&
          want.forall { case (v, x) => math.abs(got(v) - x) <= 1e-9 }
      }
    }

  property("squareClustering capped == uncapped when cap >= max possible degree") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val e = sym(es).toDF("src", "dst")
        val unc = GraphStats.squareClustering(e, 4)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val cap = GraphStats.squareClustering(e, 4, maxCenterDeg = 6)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        unc == cap // universe is 7 vertices, loop-free: max possible deg = 6
      }
    }

  property("generalizedDegree == driver per-edge triangle histogram") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val nb = nbrs(es)
        val want = sym(es)
          .map { case (v, u) => (v, (nb(v) intersect nb(u)).size.toLong) }
          .groupBy(identity).map { case ((v, t), g) => ((v, t), g.size.toLong) }
        val got = GraphStats.generalizedDegree(sym(es).toDF("src", "dst"),
            numPartitions = 4)
          .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
        got == want
      }
    }

  property("richClub == driver per-threshold phi over both histograms") =
    forAll(genUndirected) { es =>
      if (es.isEmpty) true
      else {
        import spark.implicits._
        val deg = degs(es)
        val maxd = deg.values.max
        val want = (0L until maxd).flatMap { k =>
          val nk = deg.values.count(_ > k).toLong
          val ek = es.count { case (u, v) => math.min(deg(u), deg(v)) > k }.toLong
          if (nk < 2) None
          else Some((k, nk, ek, rnd(ek * 2.0 / (nk * (nk - 1)), 6)))
        }.toSet
        val got = GraphStats.richClub(sym(es).toDF("src", "dst"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
        got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)) &&
          got.forall { case (k, nk, ek, phi) =>
            want.exists { case (k2, n2, e2, p2) =>
              k2 == k && n2 == nk && e2 == ek && math.abs(phi - p2) <= 1e-9 } }
      }
    }
}
