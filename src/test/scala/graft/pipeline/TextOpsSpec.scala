package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Unit cases for the text-analysis column ops (the oracle queries cover the
  * corpus-scale behavior; these pin the per-doc edge cases). */
class TextOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("charEntropy: degenerate, uniform, case-folded, and out-of-universe inputs") {
    val docs = Seq(
      (1L, "aaaa"),        // single symbol -> 0 bits
      (2L, "ab"),          // two equiprobable symbols -> exactly 1 bit
      (3L, "AB!!??"),      // case-folds to ab; punctuation outside universe ignored
      (4L, "!!??123"),     // nothing in universe -> total=0 -> defined 0.0
      (5L, "")             // empty text -> 0.0
    ).toDF("doc_id", "text")
    val out = TextOps.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 0.0)
    assert(math.abs(out(2L) - 1.0) < 1e-12)
    assert(math.abs(out(3L) - 1.0) < 1e-12)
    assert(out(4L) === 0.0)
    assert(out(5L) === 0.0)
  }

  test("bm25: hand-computed scores; term-free docs absent; tf saturation") {
    val docs = Seq(
      (0L, "spark join"),
      (1L, "join join table x"),
      (2L, "x y z")
    ).toDF("doc_id", "text")
    val got = TextOps.bm25(docs, Seq("spark", "join", "table"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=3; df: spark 1, join 2, table 1
    val (k1, b, n, avgdl) = (1.2, 0.75, 3.0, 3.0)
    def idf(df: Int) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def sat(tf: Long, dl: Long) =
      tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    val want = Map(
      0L -> (idf(1) * sat(1, 2) + idf(2) * sat(1, 2)),
      1L -> (idf(2) * sat(2, 4) + idf(1) * sat(1, 4)))
    assert(got.keySet == want.keySet) // d2 has no query term -> absent
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12) }
    // saturation: doubling tf at fixed dl raises the score sublinearly
    val d = Seq((0L, "q q a b c d e f"), (1L, "q a b c d e f g"))
      .toDF("doc_id", "text")
    val s = TextOps.bm25(d, Seq("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(0L) > s(1L) && s(0L) < 2 * s(1L))
  }

  test("tfidfTopTerms: hand-computed scores, rank order, and tie-break by term") {
    val docs = Seq(
      (0L, "a a b"),
      (1L, "a c"),
      (2L, "c c c d")
    ).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    // N=3; df: a=2, b=1, c=2, d=1; idf = ln((1+N)/(1+df)) + 1
    def s(tf: Long, df: Int) =
      math.round(tf * (math.log(4.0 / (1 + df)) + 1.0) * 1e9) / 1e9
    assert(got((0L, "a")) == ((s(2, 2), 1L)))
    assert(got((0L, "b")) == ((s(1, 1), 2L)))
    // doc 1: a and c tie exactly — term order breaks it: a before c
    assert(got((1L, "a")) == ((s(1, 2), 1L)))
    assert(got((1L, "c")) == ((s(1, 2), 2L)))
    assert(got((2L, "c")) == ((s(3, 2), 1L)))
    assert(got((2L, "d")) == ((s(1, 1), 2L)))
    assert(got.size == 6)
  }

  test("gopherRepetition: hand-computed duplicate-ngram fractions") {
    val docs = Seq(
      (1L, "a a a a"),    // bigrams: 3×"a a" -> dup2 = 1 - 1/3; trigrams 2×
      (2L, "a b c d"),    // all distinct -> dup2 = dup3 = 0, top2 = 1/3
      (3L, "x")           // no ngrams at all -> all 0
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRepetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((0.666667, 0.5, 1.0)))
    assert(out(2L) === ((0.0, 0.0, 0.333333)))
    assert(out(3L) === ((0.0, 0.0, 0.0)))
  }

  test("piiScrub: counts and redacts email, phone, ipv4; order prevents " +
    "the phone pass from eating email digits") {
    val docs = Seq(
      (1L, "mail a9_b@sub.example.org now"),
      (2L, "dial +1-555-123-9876 or +49-30-1234567 thanks"),
      (3L, "host 192.168.0.1 and 10.0.255.3"),
      (4L, "none here"),
      (5L, "u12345678@ex.co plus 999.999 but not 1.2.3")  // short ip-like: no match
    ).toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L) === ((1, 0, 0, "mail <EMAIL> now")))
    assert(out(2L) === ((0, 2, 0, "dial <PHONE> or <PHONE> thanks")))
    assert(out(3L) === ((0, 0, 2, "host <IP> and <IP>")))
    assert(out(4L) === ((0, 0, 0, "none here")))
    assert(out(5L) === ((1, 0, 0, "<EMAIL> plus 999.999 but not 1.2.3")))
  }

  test("charEntropy matches a driver-side Shannon computation on real text") {
    val text = "the quick brown fox jumps over the lazy dog"
    val counts = TextOps.entropyChars.map(c => text.count(_ == c).toDouble)
    val total = counts.sum
    val expected = counts.filter(_ > 0).map(c => -(c / total) * (math.log(c / total) / math.log(2))).sum
    val got = TextOps.charEntropy(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head.getDouble(1)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
    // natural-language band sanity: well inside (3.5, 4.5) bits
    assert(got > 3.5 && got < 4.5)
  }
}
