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
