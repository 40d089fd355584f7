package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck guards for k-means and SemDeDup: a full driver replication of
  * Lloyd's rounds under the engine's determinism contract — dyadic
  * quantization to q/2^24, integer centroid numerators, lowest-id
  * bootstrap, lexicographic (score, cluster) tie-break — must match the
  * distributed assignment EXACTLY, and the SemDeDup keep/drop rule must
  * equal the brute-force smaller-id-neighbor test within driver clusters. */
object ClusteringPropertySpec extends Properties("ClusteringProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val Q = 16777216.0 // 2^24

  val genEmb: Gen[Seq[(Long, Seq[Float])]] = for {
    n <- Gen.chooseNum(3, 10)
    vs <- Gen.listOfN(n, Gen.listOfN(3, Gen.chooseNum(-40, 40).map(_ / 8f)))
  } yield vs.map(v => if (v.forall(_ == 0f)) v.updated(0, 1f) else v)
    .zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def quant(v: Seq[Float]): Array[Double] =
    v.map(x => math.floor(x.toDouble * Q) / Q).toArray

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** driver Lloyd: returns the final hard assignment under the engine's
    * exact arithmetic (see Clustering.kmeansAssign) */
  private def driverKmeans(emb: Seq[(Long, Seq[Float])], k: Int,
                           iters: Int): Map[Long, Long] = {
    val xq = emb.map { case (id, v) => (id, quant(v)) }
    var cents: Seq[(Long, Array[Double])] =
      xq.sortBy(_._1).take(k).map { case (id, x) => (id, x) }
    def assign(): Map[Long, Long] = xq.map { case (id, x) =>
      id -> cents.map { case (cid, c) => ((dot(c, c) - dot(x, c) * 2.0), cid) }
        .minBy(identity)._2
    }.toMap
    for (_ <- 1 until iters) {
      val a = assign()
      cents = xq.groupBy { case (id, _) => a(id) }.toSeq.map { case (cid, g) =>
        val dim = g.head._2.length
        val arr = Array.tabulate(dim) { p =>
          val s = g.map { case (_, x) => (x(p) * Q).toLong }.sum
          s.toDouble / (g.size * Q)
        }
        (cid, arr)
      }.sortBy(_._1)
    }
    assign()
  }

  property("kmeansAssign(k=3, iters=3) == driver Lloyd under the dyadic contract") =
    forAll(genEmb) { emb =>
      import spark.implicits._
      val want = driverKmeans(emb, k = 3, iters = 3)
      val got = Clustering.kmeansAssign(
          emb.map { case (i, v) => (i, v.toArray) }.toDF("vec_id", "embedding"),
          k = 3, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }

  property("semanticDedup == driver smaller-id-neighbor rule within clusters") =
    forAll(genEmb) { emb =>
      import spark.implicits._
      val threshold = 0.35
      val a = driverKmeans(emb, k = 3, iters = 2)
      val vecs = emb.toMap
      def fdot(x: Seq[Float], y: Seq[Float]): Double =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p.toDouble * q.toDouble }
      def cos(x: Seq[Float], y: Seq[Float]): Double =
        java.math.BigDecimal.valueOf(
            fdot(x, y) / (math.sqrt(fdot(x, x)) * math.sqrt(fdot(y, y))))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val want = emb.map { case (id, v) =>
        val dropped = emb.exists { case (o, w) =>
          o < id && a(o) == a(id) && cos(v, w) >= threshold
        }
        (id, a(id), if (dropped) 0L else 1L)
      }.toSet
      val got = Clustering.semanticDedup(
          emb.map { case (i, v) => (i, v.toArray) }.toDF("vec_id", "embedding"),
          k = 3, iters = 2, threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == want
    }
}
