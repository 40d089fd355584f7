package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck guards for deterministic sampling: every operator is a pure
  * integer function of the row key, so the driver replicates the EXACT
  * threshold arithmetic (salted multiplicative hash mod M = 2³¹−1) and the
  * engine must agree bit-for-bit — on any partitioning. Layout independence
  * is the 100-TB contract: the same corpus sampled on a 1-partition and a
  * 7-partition layout must select the SAME rows (unlike rand(seed), whose
  * draw depends on row order within partitions). */
object SamplingPropertySpec extends Properties("SamplingProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val M = 2147483647L
  private def mult(salt: Long): Long = (2654435761L + (salt % M) * 40503L) % M
  private def hb(key: Long, salt: Long): Long = (key % M) * mult(salt) % M

  val genRows: Gen[(List[(Long, String)], Long)] = for {
    n <- Gen.chooseNum(1, 40)
    keys <- Gen.listOfN(n, Gen.chooseNum(0L, 1000000000000L))
    groups <- Gen.listOfN(n, Gen.oneOf("en", "de", "fr"))
    salt <- Gen.chooseNum(0L, 1000L)
  } yield (keys.distinct.zip(groups).map { case (k, g) => (k, g) }, salt)

  property("bernoulli == driver hash threshold, invariant across partitionings") =
    forAll(genRows, Gen.chooseNum(0.0, 1.0)) { case ((rows, salt), p) =>
      import spark.implicits._
      val want = rows.filter { case (k, _) => hb(k, salt) < (p * M).toLong }
        .map(_._1).toSet
      val df1 = rows.toDF("key", "grp").repartition(1)
      val df7 = rows.toDF("key", "grp").repartition(7)
      val got1 = Sampling.bernoulli(df1, col("key"), p, salt)
        .collect().map(_.getLong(0)).toSet
      val got7 = Sampling.bernoulli(df7, col("key"), p, salt)
        .collect().map(_.getLong(0)).toSet
      got1 == want && got7 == want
    }

  property("split == driver cumulative thresholds; labels partition the input") =
    forAll(genRows) { case (rows, salt) =>
      import spark.implicits._
      val fr = Seq(("train", 0.6), ("val", 0.2), ("test", 0.2))
      val cum = Sampling.thresholds(fr.map(_._2))
      val want = rows.map { case (k, _) =>
        val h = hb(k, salt)
        (k, if (h < cum(0)) "train" else if (h < cum(1)) "val" else "test")
      }.toMap
      val got = Sampling.split(rows.toDF("key", "grp"), col("key"), fr, salt)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      got == want
    }

  property("topN == driver smallest (hash, key) prefix") =
    forAll(genRows, Gen.chooseNum(0, 10)) { case ((rows, salt), n) =>
      import spark.implicits._
      val want = rows.map(_._1).sortBy(k => (hb(k, salt), k)).take(n).toSet
      val got = Sampling.topN(rows.toDF("key", "grp").repartition(5),
          col("key"), n, salt)
        .collect().map(_.getLong(0)).toSet
      got == want
    }

  property("stratified == driver per-group rates with default") =
    forAll(genRows) { case (rows, salt) =>
      import spark.implicits._
      val rates = Seq(("en", 0.3), ("de", 0.8))
      val thr = Map("en" -> (0.3 * M).toLong, "de" -> (0.8 * M).toLong)
      val want = rows.filter { case (k, g) =>
        hb(k, salt) < thr.getOrElse(g, M) // default 1.0 → threshold M
      }.map(_._1).toSet
      val got = Sampling.stratified(rows.toDF("key", "grp"), col("key"),
          col("grp"), rates, default = 1.0, salt = salt)
        .collect().map(_.getLong(0)).toSet
      got == want
    }

  property("capPerGroup == driver cap*M div n_g rule; kept size never exceeds group size") =
    forAll(genRows, Gen.chooseNum(0L, 8L)) { case ((rows, salt), cap) =>
      import spark.implicits._
      val ng = rows.groupBy(_._2).map { case (g, r) => (g, r.size.toLong) }
      val c = math.max(cap, 1L) // engine requires cap >= 1
      val want = rows.filter { case (k, g) =>
        hb(k, salt) < math.min(c * M / ng(g), M)
      }.map(_._1).toSet
      val got = Sampling.capPerGroup(rows.toDF("key", "grp").repartition(3),
          col("key"), col("grp"), c, salt)
        .collect().map(_.getLong(0)).toSet
      got == want
    }
}
