package graft.ingest

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkTestSession

/** ScalaCheck guards for the synthetic page generator — the input every
  * benchmark and the scaling protocol's bit-identical-input contract rest
  * on. A driver-side replication of the full LCG arithmetic (site mapping,
  * word selection, link targets, timestamps, html assembly) must reproduce
  * `synthesize` exactly for random (n, nSites, avgLinks); text extraction
  * must be byte-identical per url; and the href→id edge pipeline must equal
  * a driver extraction mapped through sorted-url ranks. */
object PagesPropertySpec extends Properties("PagesProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = SparkTestSession.spark

  private val M = 2147483647L
  private val words = Array(
    "crawl", "web", "graph", "page", "link", "rank", "spark", "scala",
    "vertex", "edge", "query", "data", "index", "merge", "shuffle", "join",
    "sparse", "matrix", "vector", "semiring", "monoid", "mask", "reduce",
    "the", "a", "of", "and", "to", "in", "is")
  private val langs = Array("en", "de", "fr", "es", "zh", "ru")

  private def mix(x: Long, a: Long, b: Long): Long =
    java.lang.Math.floorMod(x * a + b, M)

  private def siteOf(id: Long, nSites: Long): Long = {
    val u = mix(id, 1103515245L, 12345L).toDouble / M
    math.floor(math.pow(u, 2.0) * nSites).toLong
  }
  private def urlOf(id: Long, nSites: Long): String =
    s"https://site${siteOf(id, nSites)}.example/p/$id"

  final case class DriverPage(url: String, tsSec: Long, html: String,
                              text: String, lang: String,
                              targets: Seq[Long])

  /** exact driver replication of Pages.synthesize row arithmetic */
  private def driverPage(id: Long, n: Long, nSites: Long, avgLinks: Int): DriverPage = {
    val h1 = mix(id, 1103515245L, 12345L)
    val h2 = mix(id, 69069L, 362437L)
    val h3 = mix(id, 1664525L, 1013904223L)
    val nWords = (java.lang.Math.floorMod(h2, 24L) + 8L).toInt
    val text = (0 until nWords).map { i =>
      val idx = java.lang.Math.floorMod(h1 + (i.toLong * 2654435761L) % M,
        words.length.toLong).toInt
      words(idx)
    }.mkString(" ")
    val nLinks = (java.lang.Math.floorMod(h3, 2L * avgLinks - 3) + 2L).toInt
    val targets = (1 to nLinks).map { i =>
      val u = mix(h3 + i.toLong * 40503L, 1103515245L, 12345L).toDouble / M
      math.floor(math.pow(u, 3.0) * n).toLong
    }
    val linksHtml = targets.map(t => s"""<a href="${urlOf(t, nSites)}">l</a>""").mkString
    val html = s"<html><head><title>p$id</title></head><body><p>$text</p>" +
      s"<div>$linksHtml</div></body></html>"
    DriverPage(urlOf(id, nSites),
      1600000000L + java.lang.Math.floorMod(h2, 31536000L),
      html, text,
      langs(java.lang.Math.floorMod(h1, langs.length.toLong).toInt),
      targets)
  }

  val genShape: Gen[(Long, Long, Int)] = for {
    n <- Gen.chooseNum(1L, 60L)
    nSites <- Gen.chooseNum(3L, 50L)
    avgLinks <- Gen.chooseNum(3, 12)
  } yield (n, nSites, avgLinks)

  property("synthesize == driver LCG replication: url/warc_ts/html/text/lang, every row") =
    forAll(genShape) { case (n, nSites, avgLinks) =>
      val got = Pages.synthesize(spark, n, nSites, avgLinks).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          new String(r.getAs[Array[Byte]](2), java.nio.charset.StandardCharsets.UTF_8),
          r.getString(3), r.getString(4)))
        .sortBy(_._1)
      val want = (0L until n).map { id =>
        val p = driverPage(id, n, nSites, avgLinks)
        (p.url, p.tsSec * 1000L, p.html, p.text, p.lang)
      }.sortBy(_._1)
      got.toSeq == want
    }

  property("extractText(synthesize) is byte-identical to the text column per url") =
    forAll(genShape) { case (n, nSites, avgLinks) =>
      val pages = Pages.synthesize(spark, n, nSites, avgLinks)
      val joined = Pages.extractText(pages)
        .withColumnRenamed("text", "extracted")
        .join(pages.select("url", "text"), "url")
      joined.collect().forall(r => r.getAs[String]("extracted") == r.getAs[String]("text")) &&
        joined.count() == n
    }

  property("edges == driver href targets through sorted-url dense ranks, deduped") =
    forAll(genShape) { case (n, nSites, avgLinks) =>
      val pages = Pages.synthesize(spark, n, nSites, avgLinks)
      val ids = Pages.idMap(pages)
      val got = Pages.edges(pages, ids).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rank = (0L until n).map(urlOf(_, nSites)).sorted.zipWithIndex
        .map { case (u, i) => (u, i.toLong) }.toMap
      val want = (0L until n).flatMap { id =>
        val p = driverPage(id, n, nSites, avgLinks)
        p.targets.map(t => (rank(p.url), rank(urlOf(t, nSites))))
      }.toSet
      got == want
    }
}
