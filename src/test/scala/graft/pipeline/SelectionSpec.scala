package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Data-selection ops: the bigram LM score against a hand-computed add-k
  * model, and DSIR importance weights against their defining properties
  * (target docs tilt positive, per-doc feature accounting, layout
  * independence). */
class SelectionSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  test("lmBits matches the hand-computed add-k bigram model") {
    // corpus: "a b a", "a b" → C(a)=3, C(b)=2, V=2; C(a,b)=2, C(b,a)=1
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val out = Selection.lmBits(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val k = 0.5
    val bitsAB = (math.log(3 + k * 2) - math.log(2 + k)) / math.log(2)
    val bitsBA = (math.log(2 + k * 2) - math.log(1 + k)) / math.log(2)
    assert(out(1L)._1 == 2L && out(2L)._1 == 1L)
    assert(math.abs(out(1L)._2 - BigDecimal((bitsAB + bitsBA) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(2L)._2 - BigDecimal(bitsAB)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("lmBits: rarer continuations cost more bits; single-token docs get null") {
    // "q z" occurs once, "a b" five times → bits(q→z) > bits(a→b)
    val rows = (1L to 5L).map(i => (i, "a b")) :+ (6L, "q z") :+ (7L, "solo")
    val docs = rows.toDF("doc_id", "text")
    val out = Selection.lmBits(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(6L).getDouble(2) > out(1L).getDouble(2))
    assert(out(7L).getLong(1) == 0L && out(7L).isNullAt(2))
    assert(out.size == 7)
  }

  test("dsirWeights: target-like docs get strictly larger log-weights") {
    // raw corpus dominated by "x y"-style docs; target = the "p q" docs.
    // A held-out "p q r" doc shares 2/3 unigrams + 1/2 bigrams with the
    // target and must outweigh an "x y z" doc that shares nothing.
    val docs = ((1L to 20L).map(i => (i, "x y z")) ++
      Seq((21L, "p q s"), (22L, "p q r"), (23L, "x y z"))).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 21L)
    val w = Selection.dsirWeights(docs, target, buckets = 512).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(22L) > w(23L),
      s"target-like doc should outweigh off-target: ${w(22L)} vs ${w(23L)}")
    // identical docs get identical weights; feature accounting is 2n-1
    val nf = Selection.dsirWeights(docs, target, buckets = 512).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nf.forall(_._2 == 5L)) // 3 unigrams + 2 bigrams
    assert(w(1L) == w(23L))
  }

  test("LM + DSIR models round-trip through save/load; scoring a reloaded " +
    "model is bit-identical; a type-mismatched dir is refused") {
    val docs = ((1L to 12L).map(i => (i, s"a b c w${i % 5}")) :+
      (13L, "solo")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 3L)
    val dir = java.nio.file.Files.createTempDirectory("graft-selmodel").toString

    val lm = Selection.trainLm(docs)
    Selection.saveLm(lm, s"$dir/lm")
    val lm2 = Selection.loadLm(spark, s"$dir/lm")
    assert(lm2.vocab == lm.vocab)
    val direct = Selection.lmBits(docs)
    val reloaded = Selection.scoreLm(docs, lm2)
    assert(direct.exceptAll(reloaded).count() == 0 &&
      reloaded.exceptAll(direct).count() == 0)

    val ds = Selection.trainDsir(docs, target, buckets = 256)
    Selection.saveDsir(ds, s"$dir/dsir")
    val ds2 = Selection.loadDsir(spark, s"$dir/dsir")
    assert(ds2.buckets == 256)
    val directW = Selection.dsirWeights(docs, target, buckets = 256)
    val reloadedW = Selection.scoreDsir(docs, ds2)
    assert(directW.exceptAll(reloadedW).count() == 0 &&
      reloadedW.exceptAll(directW).count() == 0)

    // cross-loading refuses loudly: the metadata type tag is checked
    intercept[IllegalArgumentException](Selection.loadLm(spark, s"$dir/dsir"))
    intercept[IllegalArgumentException](Selection.loadDsir(spark, s"$dir/lm"))
  }

  test("dsirWeights is partitioning-independent (exact)") {
    val base = (1L to 40L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} tail"))
    val a = Selection.dsirWeights(base.toDF("doc_id", "text").repartition(1),
      base.filter(_._1 % 8 == 0).toDF("doc_id", "text"), buckets = 256)
    val b = Selection.dsirWeights(base.toDF("doc_id", "text").repartition(7),
      base.filter(_._1 % 8 == 0).toDF("doc_id", "text"), buckets = 256)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
