package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck guards for the dedup pipeline: each operator checked against
  * a driver-side brute-force simulation on random tiny corpora (small
  * shared vocabulary so cross-document shingle overlap is common). The
  * LSH/banding operators are checked for COMPLETENESS AND SOUNDNESS against
  * brute force over the engine's own signatures — the property that makes
  * bucketed candidate generation trustworthy at 100 TB: banding must find
  * exactly the pairs the signature relation defines, never a sampled
  * subset. */
object DedupPropertySpec extends Properties("DedupProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee")

  val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    ts <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ts.mkString(" ")

  /** 1..7 docs with dense ids 0..k-1 */
  val genDocs: Gen[Seq[(Long, String)]] = for {
    k <- Gen.chooseNum(1, 7)
    ds <- Gen.listOfN(k, genDoc)
  } yield ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Spark-identical tokenization: split(trim(text), " +") */
  private def toks(text: String): Seq[String] = text.trim.split(" +").toSeq

  /** distinct word w-shingles per doc, as strings (the engine hashes them
    * to 62-bit longs; at this vocab size the hash is collision-free, so
    * set sizes agree) */
  private def shingleSet(text: String, w: Int): Set[String] = {
    val t = toks(text)
    if (t.size < w) Set.empty
    else t.sliding(w).map(_.mkString("_")).toSet
  }

  private def rnd6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** driver ngramJaccardPairs: df-capped shingle universe, exact set
    * Jaccard, rounded like the engine, thresholded */
  private def driverPairs(docs: Seq[(Long, String)], threshold: Double,
                          w: Int, maxDf: Int): Map[(Long, Long), Double] = {
    val sh = docs.map { case (id, t) => (id, shingleSet(t, w)) }.toMap
    val df = sh.values.toSeq.flatten.groupBy(identity)
      .map { case (s, g) => (s, g.size) }
    val capped = sh.map { case (id, s) => (id, s.filter(df(_) <= maxDf)) }
    val ids = docs.map(_._1).sorted
    (for {
      a <- ids; b <- ids if a < b
      common = (capped(a) intersect capped(b)).size if common > 0
      j = rnd6(common.toDouble /
        (capped(a).size + capped(b).size - common)) if j >= threshold
    } yield ((a, b), j)).toMap
  }

  property("exact dedup == driver group-by-text min-id + count") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val want = docs.groupBy(_._2)
        .map { case (_, g) => (g.map(_._1).min, g.size.toLong) }.toSet
      val got = Dedup.exact(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == want
    }

  property("ngramJaccardPairs(w=2) == driver capped set Jaccard") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val want = driverPairs(docs, threshold = 0.25, w = 2, maxDf = 50)
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          threshold = 0.25, w = 2, maxDf = 50)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      got.keySet == want.keySet &&
        want.forall { case (p, x) => math.abs(got(p) - x) <= 1e-9 }
    }

  property("ngramJaccardPairs df-cap: maxDf=1 yields no pairs; maxDf=2 == driver capped universe") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val none = Dedup.ngramJaccardPairs(df, threshold = 0.0, w = 2,
        maxDf = 1).count() == 0L
      val want = driverPairs(docs, threshold = 0.1, w = 2, maxDf = 2)
      val got = Dedup.ngramJaccardPairs(df, threshold = 0.1, w = 2, maxDf = 2)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      none && got.keySet == want.keySet &&
        want.forall { case (p, x) => math.abs(got(p) - x) <= 1e-9 }
    }

  property("dedupClusters == driver union-find over the thresholded pairs") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val pairs = driverPairs(docs, threshold = 0.25, w = 2, maxDf = 50).keySet
      val n = docs.size
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map { v =>
        (v.toLong, find(v).toLong, if (find(v) == v) 1L else 0L)
      }.toSet
      val got = Dedup.dedupClusters(spark, docs.toDF("doc_id", "text"),
          threshold = 0.25, w = 2, maxDf = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == want
    }

  property("minhash LSH banding == brute force over the engine's signatures; identical docs always candidates") =
    forAll(genDocs) { base =>
      import spark.implicits._
      // corpus with forced exact duplicates: ids k..2k-1 mirror 0..k-1
      val k = base.size
      val docs = base ++ base.map { case (id, t) => (id + k, t) }
      val df = docs.toDF("doc_id", "text")
      val sigs = Dedup.minhashSignatures(df)
        .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toVector)
        .toMap
      // driver banding: Horner fold of each band's 4 rows, same constants
      def bandKeys(sig: Vector[Long]): Seq[(Int, Long)] =
        (0 until 2).map { b =>
          (b, (0 until 4).foldLeft(0L)((acc, r) =>
            (acc * 31L + sig(4 * b + r)) % 1000000007L))
        }
      val ids = sigs.keySet.toSeq.sorted
      val want = (for {
        a <- ids; b <- ids if a < b
        if bandKeys(sigs(a)).toSet.intersect(bandKeys(sigs(b)).toSet).nonEmpty
      } yield (a, b)).toSet
      val got = Dedup.minhashLshCandidates(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val identicalCovered = docs.forall { case (id, t) =>
        id >= k || toks(t).size < 3 || got((id, id + k))
      }
      got == want && identicalCovered
    }

  property("simhash banding == brute-force hamming <= 2 over the engine's signatures") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val sigs = Dedup.simhash(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ids = sigs.keySet.toSeq.sorted
      val want = (for {
        a <- ids; b <- ids if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong if h <= 2
      } yield ((a, b), h)).toMap
      val got = Dedup.simhashDupPairs(df, maxHamming = 2)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      got == want
    }

  property("dedupSpans(k=2) == driver first-occurrence span reassembly") =
    forAll(genDocs) { docs =>
      import spark.implicits._
      val spans = docs.flatMap { case (id, t) =>
        toks(t).zipWithIndex.groupBy(_._2 / 2).toSeq
          .map { case (s, g) => (id, s.toLong, g.map(_._1).mkString(" ")) }
      }
      val winners = spans.groupBy(_._3)
        .map { case (txt, g) => (txt, g.map(x => (x._1, x._2)).min) }
      val want = spans
        .filter { case (id, s, txt) => winners(txt) == ((id, s)) }
        .groupBy(_._1)
        .map { case (id, g) => (id, g.sortBy(_._2).map(_._3).mkString(" ")) }
      val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), k = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == want
    }

  property("decontaminate(w=2) == driver shared-shingle counts") =
    forAll(Gen.zip(genDocs, Gen.listOfN(2, genDoc))) { case (docs, bench) =>
      import spark.implicits._
      val benchSh = bench.flatMap(shingleSet(_, 2)).toSet
      val want = docs.map { case (id, t) =>
        val hits = (shingleSet(t, 2) intersect benchSh).size.toLong
        (id, hits, if (hits > 0) 1L else 0L)
      }.toSet
      val got = Dedup.decontaminate(docs.toDF("doc_id", "text"),
          bench.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"), w = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == want
    }
}
