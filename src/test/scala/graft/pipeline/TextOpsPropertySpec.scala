package graft.pipeline

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck guards for the text-analysis operators: random corpora over a
  * vocabulary that mixes stopwords, language markers, punctuation, and
  * PII-shaped strings, checked against driver re-evaluations of the exact
  * documented arithmetic (same regexes via java.util.regex, same StrictMath
  * log fold for entropy, Spark's HALF_UP rounding mirrored). */
object TextOpsPropertySpec extends Properties("TextOpsProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val vocab = Vector("the", "and", "of", "is", "der", "die", "und",
    "ist", "le", "la", "et", "est", "Zebra!", "q9", "x", "the")

  val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ts <- Gen.listOfN(n, Gen.oneOf(vocab))
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + ts.mkString(" ") + pad

  val genDocs: Gen[Seq[(Long, String)]] = for {
    k <- Gen.chooseNum(1, 6)
    ds <- Gen.listOfN(k, genDoc)
  } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def toks(text: String): Seq[String] = text.trim.split(" +").toSeq

  private def rnd(x: Double, s: Int): Double =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  property("tokenCounts == driver whitespace count + ceil(len/4)") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val want = docs.map { case (id, t) =>
        (id, toks(t).size.toLong, math.ceil(t.length / 4.0).toLong)
      }.toSet
      val got = TextOps.tokenCounts(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == want
    }

  property("qualityScore == driver length/stopword/alpha ratios") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val stop = Set("the", "a", "of", "and", "to", "in", "is")
      val want = docs.map { case (id, t) =>
        val tk = toks(t)
        val n = tk.size
        (id, n.toLong,
          rnd(t.replace(" ", "").length.toDouble / math.max(n, 1), 6),
          rnd(tk.count(stop).toDouble / math.max(n, 1), 6),
          rnd(t.replaceAll("[^a-zA-Z]", "").length.toDouble /
            math.max(t.length, 1), 6))
      }.toSet
      val got = TextOps.qualityScore(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
      got == want
    }

  property("langId == driver marker argmax with first-wins tie-break") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val markers = Seq(
        "en" -> Set("the", "and", "of", "is"),
        "de" -> Set("der", "die", "und", "ist"),
        "fr" -> Set("le", "la", "et", "est"))
      val want = docs.map { case (id, t) =>
        val tk = toks(t)
        val scored = markers.map { case (l, ms) => (l, tk.count(ms).toLong) }
        val best = scored.reduce((a, b) => if (b._2 > a._2) b else a)
        (id, best._1, best._2)
      }.toSet
      val got = TextOps.langId(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      got == want
    }

  property("fingerprints == driver md5 + rolling 31-polynomial of head16") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val M = 2147483647L
      def pow31(k: Int): Long = {
        var r = 1L; var i = 0
        while (i < k) { r = r * 31 % M; i += 1 }
        r
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = docs.map { case (id, t) =>
        val norm = t.replaceAll("[^a-zA-Z0-9 ]", "").toLowerCase
        val hex = md.digest(norm.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        val head16 = (norm + "################").substring(0, 16)
        val roll = (1 to 16).map { i =>
          head16.charAt(i - 1).toLong * pow31(16 - i) % M
        }.sum % M
        (id, hex, roll)
      }.toSet
      val got = TextOps.fingerprints(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      got == want
    }

  property("charEntropy == driver single-pass histogram with StrictMath fold") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val want = docs.map { case (id, t) =>
        val lower = t.toLowerCase
        val counts = new Array[Long](27)
        lower.foreach { c =>
          if (c >= 'a' && c <= 'z') counts(c - 'a') += 1
          else if (c == ' ') counts(26) += 1
        }
        val total = counts.sum.toDouble
        val h =
          if (total <= 0.0) 0.0
          else counts.foldLeft(0.0) { (acc, n) =>
            if (n == 0) acc
            else {
              val p = n / total
              acc + -p * (StrictMath.log(p) / StrictMath.log(2.0))
            }
          }
        id -> h
      }.toMap
      val got = TextOps.charEntropy(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      got.keySet == want.keySet &&
        want.forall { case (id, x) => math.abs(got(id) - x) <= 1e-12 }
    }

  property("gopherRepetition == driver n-gram duplicate fractions") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      def fr(grams: Seq[String]): (Double, Double) =
        if (grams.isEmpty) (0.0, 0.0)
        else {
          val byG = grams.groupBy(identity).map(_._2.size.toLong)
          (rnd(1.0 - byG.size.toDouble / grams.size, 6),
            rnd(byG.max.toDouble / grams.size, 6))
        }
      val want = docs.map { case (id, t) =>
        val tk = toks(t)
        val (dup2, top2) = fr(tk.sliding(2).filter(_.size == 2)
          .map(_.mkString("")).toSeq)
        val (dup3, _) = fr(tk.sliding(3).filter(_.size == 3)
          .map(_.mkString("")).toSeq)
        (id, dup2, dup3, top2)
      }.toSet
      val got = TextOps.gopherRepetition(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).toSet
      got == want
    }

  val genPiiDoc: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    ts <- Gen.listOfN(n, Gen.oneOf("plain", "word", "a@b.com", "x.y@mail.co",
      "+1234-5678-99", "10.0.0.1", "999.999.999.999", "not@", "1.2.3"))
  } yield ts.mkString(" ")

  property("piiScrub == driver ordered regex redaction + match counts") =
    forAll(Gen.listOfN(4, genPiiDoc)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def count(t: String, re: String): Int = {
        val m = java.util.regex.Pattern.compile(re).matcher(t)
        var c = 0; while (m.find()) c += 1; c
      }
      val want = docs.map { case (id, t) =>
        val scrubbed = t.replaceAll(TextOps.emailRe, "<EMAIL>")
          .replaceAll(TextOps.phoneRe, "<PHONE>")
          .replaceAll(TextOps.ipRe, "<IP>")
        (id, count(t, TextOps.emailRe), count(t, TextOps.phoneRe),
          count(t, TextOps.ipRe), scrubbed)
      }.toSet
      val got = TextOps.piiScrub(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getString(4))).toSet
      got == want
    }

  property("bm25 == driver Okapi formula over exact corpus stats") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val terms = Seq("the", "la")
      val n = docs.size.toDouble
      val dl = docs.map { case (id, t) => (id, toks(t).size.toLong) }.toMap
      val avgdl = dl.values.sum.toDouble / docs.size
      val tf = docs.flatMap { case (id, t) =>
        toks(t).filter(terms.contains).groupBy(identity)
          .map { case (term, g) => ((id, term), g.size.toLong) }
      }.toMap
      val dfT = tf.keys.groupBy(_._2).map { case (term, g) => (term, g.size.toLong) }
      val want = tf.keys.groupBy(_._1).map { case (id, keys) =>
        id -> keys.toSeq.sortBy(_._2).map { case (_, term) =>
          val idf = math.log((n - dfT(term) + 0.5) / (dfT(term) + 0.5) + 1.0)
          val sat = tf((id, term)) * (1.2 + 1) /
            (tf((id, term)) + ((1 - 0.75) + 0.75 * dl(id) / avgdl) * 1.2)
          idf * sat
        }.sum
      }
      val got = TextOps.bm25(docs.toDF("doc_id", "text"), terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      got.keySet == want.keySet &&
        want.forall { case (id, x) => math.abs(got(id) - x) <= 1e-9 }
    }

  property("tfidfTopTerms == driver smoothed tf-idf with (score desc, term) rank") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val n = docs.size.toDouble
      val tf = docs.flatMap { case (id, t) =>
        toks(t).groupBy(identity).map { case (term, g) => ((id, term), g.size.toLong) }
      }.toMap
      val dfT = tf.keys.groupBy(_._2).map { case (term, g) => (term, g.size.toLong) }
      val want = tf.keys.groupBy(_._1).toSeq.flatMap { case (id, keys) =>
        keys.toSeq
          .map { case (_, term) =>
            (term, rnd(tf((id, term)) *
              (math.log((1.0 + n) / (1.0 + dfT(term))) + 1.0), 9))
          }
          .sortBy { case (term, s) => (-s, term) }
          .zipWithIndex.take(3)
          .map { case ((term, s), i) => (id, term, s, (i + 1).toLong) }
      }.toSet
      val got = TextOps.tfidfTopTerms(docs.toDF("doc_id", "text"), k = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getLong(3))).toSet
      got == want
    }
}
