package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class SamplingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("split: total coverage, near-nominal fractions, layout-independent") {
    val keys = (0L until 10000L).toDF("id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.split(keys, col("id"), fr)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 10000L)
    assert(math.abs(got("train") - 8000L) < 200)
    assert(math.abs(got("val") - 1000L) < 100)
    assert(math.abs(got("test") - 1000L) < 100)
    // the assignment is a function of the row, not the partition layout
    val a = Sampling.split(keys, col("id"), fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.split(keys.repartition(17), col("id"), fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("bernoulli: near-nominal rate; salts decorrelate; p edge cases") {
    val keys = (0L until 10000L).toDF("id")
    val s0 = Sampling.bernoulli(keys, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(s0.size - 2500) < 150)
    val s1 = Sampling.bernoulli(keys, col("id"), 0.25, salt = 7)
      .collect().map(_.getLong(0)).toSet
    // different salt -> a substantially different (but same-rate) subset
    assert(math.abs(s1.size - 2500) < 150)
    val overlap = (s0 & s1).size.toDouble / s0.size
    assert(overlap > 0.1 && overlap < 0.5) // ~p expected under independence
    assert(Sampling.bernoulli(keys, col("id"), 0.0).count() == 0)
    assert(Sampling.bernoulli(keys, col("id"), 1.0).count() == 10000)
  }

  test("topN: exact size, layout-independent membership, prefix-nested") {
    val keys = (0L until 5000L).toDF("id")
    val s100 = Sampling.topN(keys, col("id"), 100).collect()
      .map(_.getLong(0)).toSet
    assert(s100.size == 100)
    val s100b = Sampling.topN(keys.repartition(13), col("id"), 100)
      .collect().map(_.getLong(0)).toSet
    assert(s100b == s100)
    // a smaller sample is a PREFIX of a larger one (same hash order) —
    // the property that makes the sample size tunable after the fact
    val s40 = Sampling.topN(keys, col("id"), 40).collect()
      .map(_.getLong(0)).toSet
    assert(s40.subsetOf(s100))
  }

  test("stratified: per-group rates honored, unknown groups use default") {
    val rows = (0L until 6000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "lang")
    val kept = Sampling.stratified(rows, col("id"), col("lang"),
        Seq("en" -> 0.1, "de" -> 0.5), default = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("en") - 200L) < 80, s"en ${kept("en")}")
    assert(math.abs(kept("de") - 1000L) < 150, s"de ${kept("de")}")
    assert(kept("fr") == 2000L) // default 1.0 keeps everything
  }

  test("capPerGroup: big groups cut to ~cap, small groups untouched") {
    val rows = ((0L until 4000L).map((_, "big")) ++
      (4000L until 4020L).map((_, "small"))).toDF("id", "g")
    val kept = Sampling.capPerGroup(rows, col("id"), col("g"), cap = 100)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("big") - 100L) < 50, s"big ${kept("big")}")
    assert(kept("small") == 20L) // rate = min(1, 100/20) = 1
    // original columns pass through, helper columns dropped
    val cols = Sampling.capPerGroup(rows, col("id"), col("g"), cap = 100)
      .columns.toSeq
    assert(cols == Seq("id", "g"))
  }
}
