package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck guards for the selection operators: the bigram-LM bits score
  * checked hash-free against driver count arithmetic (the 62-bit ids are
  * injective on this vocabulary), and the DSIR log-weights checked against
  * a FULL driver replication of the polynomial token hashes, 62-bit
  * uid/bid combine, bucket folding, and add-k λ estimation — so the whole
  * feature-hash chain is pinned end to end. */
object SelectionPropertySpec extends Properties("SelectionProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee")

  val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    ts <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ts.mkString(" ")

  val genDocs: Gen[Seq[(Long, String)]] = for {
    k <- Gen.chooseNum(1, 6)
    ds <- Gen.listOfN(k, genDoc)
  } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def toks(text: String): Seq[String] = text.trim.split(" +").toSeq

  private def rnd6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  property("lmBits == driver add-k bigram NLL over corpus counts") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val k = 0.5
      val allToks = docs.flatMap { case (_, t) => toks(t) }
      val cu = allToks.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      val vocabN = cu.size.toLong
      val allBi = docs.flatMap { case (_, t) => toks(t).sliding(2).filter(_.size == 2) }
        .map { case Seq(a, b) => (a, b) }
      val cb = allBi.groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
      val want = docs.map { case (id, t) =>
        val bs = toks(t).sliding(2).filter(_.size == 2).toSeq
          .map { case Seq(a, b) =>
            (math.log(cu(a) + k * vocabN) - math.log(cb((a, b)) + k)) /
              math.log(2.0)
          }
        (id, bs.size.toLong,
          if (bs.isEmpty) None else Some(rnd6(bs.sum / bs.size)))
      }
      val got = Selection.lmBits(docs.toDF("doc_id", "text"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toList
      got.map(x => (x._1, x._2)).toSet == want.map(x => (x._1, x._2)).toSet &&
        want.forall { case (id, n, b) =>
          got.exists { case (id2, n2, b2) => id2 == id && n2 == n &&
            ((b, b2) match {
              case (None, None) => true
              case (Some(x), Some(y)) => math.abs(x - y) <= 1e-9
              case _ => false
            })
          }
        }
    }

  // ---- exact driver replication of the Dedup polynomial hash chain ----
  private val P = 2147483647L
  private val P2 = 2147483629L
  private val K = 1000003L

  private def powMod(base: Long, k: Int, p: Long): Long = {
    var r = 1L; var i = 0
    while (i < k) { r = r * base % p; i += 1 }
    r
  }

  private def polyHash(t: String, base: Long, prime: Long, lenMul: Long): Long = {
    val padded = (t + "#" * 24).substring(0, 24)
    val terms = (1 to 24).map(i =>
      padded.charAt(i - 1).toLong * powMod(base, 24 - i, prime) % prime)
    (terms.sum + t.length.toLong * lenMul % prime) % prime
  }

  private def h1(t: String): Long = polyHash(t, 31, P, 10007L)
  private def h2(t: String): Long = polyHash(t.reverse, 37, P2, 10009L)

  /** occRows replicated: per token occurrence, the 62-bit uid and (when a
    * bigram starts here) the 62-bit bid */
  private def occ(text: String): Seq[(Long, Option[Long])] = {
    val tk = toks(text)
    tk.zipWithIndex.map { case (t, i) =>
      val uid = h1(t) * 2147483648L + h2(t)
      val bid =
        if (i + 1 < tk.size)
          Some((h1(t) * K + h1(tk(i + 1))) % P * 2147483648L +
            (h2(t) * K + h2(tk(i + 1))) % P2)
        else None
      (uid, bid)
    }
  }

  property("dsirWeights == driver hash-chain + bucket-lambda replication") =
    forAll(Gen.zip(genDocs, Gen.listOfN(3, genDoc))) { case (docs, tgt) =>
      import spark.implicits._
      val buckets = 13
      val k = 0.5
      def feats(text: String): Seq[Long] =
        occ(text).flatMap { case (uid, bid) =>
          uid % buckets +: bid.map(_ % buckets).toSeq
        }
      val cr = docs.flatMap(d => feats(d._2)).groupBy(identity)
        .map { case (b, g) => (b, g.size.toLong) }
      val ct = tgt.flatMap(feats).groupBy(identity)
        .map { case (b, g) => (b, g.size.toLong) }
      val nr = cr.values.sum.toDouble
      val nt = ct.values.sum.toDouble
      val lam = (0L until buckets.toLong).map { b =>
        b -> (math.log((ct.getOrElse(b, 0L) + k) / (nt + k * buckets)) -
          math.log((cr.getOrElse(b, 0L) + k) / (nr + k * buckets)))
      }.toMap
      val want = docs.map { case (id, t) =>
        val fs = feats(t)
        (id, fs.size.toLong, rnd6(fs.map(lam).sum))
      }
      val got = Selection.dsirWeights(docs.toDF("doc_id", "text"),
          tgt.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"), buckets = buckets, k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      got.map(x => (x._1, x._2)).toSet == want.map(x => (x._1, x._2)).toSet &&
        want.forall { case (id, n, wgt) =>
          got.exists { case (id2, n2, w2) =>
            id2 == id && n2 == n && math.abs(w2 - wgt) <= 1e-9 }
        }
    }
}
