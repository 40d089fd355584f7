package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck guards for the embedding-similarity family: random small
  * integer-component vectors (never all-zero, so cosine is total) checked
  * against full driver re-evaluations — the same sequential double fold as
  * the native DotProduct expression, the same deterministic hyperplane
  * formula, the same HALF_UP rounding — so brute-force ranking, LSH
  * bucketing, multi-probe candidate generation, and thresholded pair
  * mining must all agree exactly. */
object SimilarityPropertySpec extends Properties("SimilarityProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  val genEmb: Gen[Seq[(Long, Seq[Float])]] = for {
    n <- Gen.chooseNum(4, 12)
    vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-5, 5).map(_.toFloat)))
  } yield vs.map(v => if (v.forall(_ == 0f)) v.updated(0, 1f) else v)
    .zipWithIndex.map { case (v, i) => (i.toLong, v) }

  /** DotProduct's exact fold: widen each float, sequential += */
  private def dot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }

  private def rnd6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    rnd6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))

  /** the engine's deterministic pseudo-random hyperplane component */
  private def plane(j: Int, k: Int): Double =
    ((j.toLong * 64L + k) * 2654435761L % 2147483647L % 1000L) / 1000.0 - 0.5

  private def bucket(v: Seq[Float], nBits: Int): Long =
    (0 until nBits).map { j =>
      val proj = v.zipWithIndex.foldLeft(0.0) { case (s, (x, k)) =>
        s + x.toDouble * plane(j, k)
      }
      if (proj > 0) 1L << j else 0L
    }.sum

  private def topK(sims: Seq[(Long, Long, Double)], k: Int) =
    sims.groupBy(_._1).toSeq.flatMap { case (q, g) =>
      g.sortBy { case (_, c, s) => (-s, c) }
        .take(k).zipWithIndex
        .map { case ((_, c, s), i) => (q, c, s, (i + 1).toLong) }
    }.toSet

  property("bruteForceTopK == driver exact cosine ranking") =
    forAll(genEmb) { emb =>
      import spark.implicits._
      val e = emb.map { case (i, v) => (i, v.toArray) }
      val want = topK(for {
        (q, qe) <- emb if q < 3; (c, ce) <- emb if c != q
      } yield (q, c, cos(qe, ce)), k = 4)
      val got = Similarity.bruteForceTopK(e.toDF("vec_id", "embedding"),
          nQueries = 3, k = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      got == want
    }

  property("lshBuckets == driver hyperplane sign bits") =
    forAll(genEmb, Gen.chooseNum(1, 4)) { case (emb, nBits) =>
      import spark.implicits._
      val e = emb.map { case (i, v) => (i, v.toArray) }
      val want = emb.map { case (i, v) => (i, bucket(v, nBits)) }.toSet
      val got = Similarity.lshBuckets(e.toDF("vec_id", "embedding"), nBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == want
    }

  property("annTopKMultiProbe == driver probe-set candidate ranking") =
    forAll(genEmb) { emb =>
      import spark.implicits._
      val e = emb.map { case (i, v) => (i, v.toArray) }
      val targetOcc = 4
      val nBits = math.max(1,
        math.ceil(math.log(emb.size.toDouble / targetOcc) / math.log(2.0)).toInt)
      val b = emb.map { case (i, v) => (i, bucket(v, nBits)) }.toMap
      val vecs = emb.toMap
      val want = topK(for {
        (q, _) <- emb
        probes = (b(q) +: (0 until nBits).map(j => b(q) ^ (1L << j))).toSet
        (c, _) <- emb if c != q && probes(b(c))
      } yield (q, c, cos(vecs(q), vecs(c))), k = 4)
      val got = Similarity.annTopKMultiProbe(e.toDF("vec_id", "embedding"),
          k = 4, targetOcc = targetOcc)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      got == want
    }

  property("cosineSimPairs == driver same-bucket thresholded pairs") =
    forAll(genEmb) { emb =>
      import spark.implicits._
      val e = emb.map { case (i, v) => (i, v.toArray) }
      val targetOcc = 4
      val nBits = math.max(1,
        math.ceil(math.log(emb.size.toDouble / targetOcc) / math.log(2.0)).toInt)
      val b = emb.map { case (i, v) => (i, bucket(v, nBits)) }.toMap
      val vecs = emb.toMap
      val want = (for {
        (a, _) <- emb; (c, _) <- emb
        if a < c && b(a) == b(c)
        s = cos(vecs(a), vecs(c)) if s >= 0.2
      } yield (a, c, s)).toSet
      val got = Similarity.cosineSimPairs(e.toDF("vec_id", "embedding"),
          threshold = 0.2, targetOcc = targetOcc)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      got == want
    }
}
