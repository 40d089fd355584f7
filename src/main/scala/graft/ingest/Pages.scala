package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic Common-Crawl-style page table + href→edge extraction
  * (BASELINE.json `input_hint`): schema
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  *
  * Determinism rule: every generated value is a pure arithmetic function of
  * the row id (LCG-style mixes kept under 2^31 so products never overflow
  * Long even under ANSI mode). NO `rand()` — Spark's rand is seeded per
  * partition, so its output would change between local[8] and local[32]
  * runs; the scaling-efficiency protocol requires bit-identical input at
  * both parallelism levels.
  *
  * Skew is built in deliberately (power-law link targets via u^3 mapping) so
  * hub-salting and skew handling are actually exercised.
  *
  * The `text` column is generated FIRST and embedded verbatim into `html`;
  * extraction back out of html must be byte-identical per url (verified by
  * sha2 comparison in tests — SURVEY.md §7.4).
  */
object Pages {

  private val M = 2147483647L // 2^31 - 1
  private def mix(c: Column, a: Long, b: Long): Column = pmod(c * a + b, lit(M))

  private val words = Array(
    "crawl", "web", "graph", "page", "link", "rank", "spark", "scala",
    "vertex", "edge", "query", "data", "index", "merge", "shuffle", "join",
    "sparse", "matrix", "vector", "semiring", "monoid", "mask", "reduce",
    "the", "a", "of", "and", "to", "in", "is")

  private val langs = Array("en", "de", "fr", "es", "zh", "ru")

  def siteOf(id: Column, nSites: Long): Column = {
    // power-law-ish site assignment: low site ids get many more pages
    val u = mix(id, 1103515245L, 12345L).cast("double") / M
    floor(pow(u, 2.0) * nSites).cast("long")
  }

  def urlOf(id: Column, nSites: Long): Column =
    concat(lit("https://site"), siteOf(id, nSites), lit(".example/p/"), id)

  /** Generate the page table: n pages, ~`avgLinks` outlinks each. */
  def synthesize(spark: SparkSession, n: Long, nSites: Long = 1000,
                 avgLinks: Int = 10): DataFrame = {
    val id = col("id")
    val h1 = mix(id, 1103515245L, 12345L)
    val h2 = mix(id, 69069L, 362437L)
    val h3 = mix(id, 1664525L, 1013904223L)

    val nWords = (pmod(h2, lit(24L)) + 8L).cast("int")
    val text = concat_ws(" ",
      transform(sequence(lit(0), nWords - 1), i =>
        element_at(
          lit(words),
          (pmod(h1 + i.cast("long") * 2654435761L % M, lit(words.length.toLong)) + 1).cast("int"))))

    val nLinks = (pmod(h3, lit(2L * avgLinks - 3)) + 2L).cast("int")
    // power-law target selection: u^3 concentrates in-links on low page ids
    val linkTargets = transform(sequence(lit(1), nLinks), i => {
      val u = mix(h3 + i.cast("long") * 40503L, 1103515245L, 12345L).cast("double") / M
      floor(pow(u, 3.0) * n).cast("long")
    })
    val linksHtml = concat_ws("",
      transform(linkTargets, t =>
        concat(lit("<a href=\""), urlOf(t, nSites), lit("\">l</a>"))))

    spark.range(n).select(
      urlOf(id, nSites).as("url"),
      timestamp_seconds(lit(1600000000L) + pmod(h2, lit(31536000L))).as("warc_ts"),
      encode(concat(
        lit("<html><head><title>p"), id, lit("</title></head><body><p>"),
        text,
        lit("</p><div>"), linksHtml, lit("</div></body></html>")), "UTF-8").as("html"),
      text.as("text"),
      element_at(lit(langs), (pmod(h1, lit(langs.length.toLong)) + 1).cast("int")).as("lang"))
  }

  /** Extract the text body back out of the raw html bytes. Pure projection —
    * the bytes between <p> and </p> pass through undecoded-semantics-wise
    * (UTF-8 in/out), so `text` stays byte-identical per url. */
  def extractText(pages: DataFrame): DataFrame =
    pages.select(col("url"),
      regexp_extract(decode(col("html"), "UTF-8"), "<p>([^<]*)</p>", 1).as("text"))

  /** href extraction: html → (url, dst_url) link pairs. */
  def extractLinks(pages: DataFrame): DataFrame =
    pages.select(col("url"),
        explode(regexp_extract_all(decode(col("html"), "UTF-8"),
          lit("href=\"([^\"]+)\""), lit(1))).as("dst_url"))

  /** Deterministic dense id assignment by sorted-url rank (FIXTURES.md §1).
    * Scalable shape: global range-sort by url, then zipWithIndex over the
    * sorted partitions (the one place RDD is genuinely forced — a
    * single-partition window would serialize the whole table through one
    * task at 10^12 rows). */
  def idMap(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select("url").orderBy("url")
      .rdd.zipWithIndex
      .map { case (r, i) => (r.getString(0), i) }
      .toDF("url", "id")
  }

  /** Host-level quotient of the link graph, straight from the raw hrefs:
    * each endpoint url projects to its host (a pure column function) and the
    * host pairs aggregate — `Contraction.contractBy`, so the whole build is
    * ONE projection + one hash aggregation with map-side combine, no id-map
    * join at all. This is the form a 10^12-page host-graph build must take:
    * the page-level id space never materializes. */
  def hostGraph(pages: DataFrame): DataFrame =
    graft.graph.Contraction.contractBy(
      extractLinks(pages).select(col("url").as("src"), col("dst_url").as("dst")),
      graft.pipeline.UrlOps.host(_))

  /** Full pipeline: pages → href links → id-mapped, deduped (src,dst) edges. */
  def edges(pages: DataFrame, ids: DataFrame): DataFrame = {
    val links = extractLinks(pages)
    val srcIds = ids.select(col("url"), col("id").as("src"))
    val dstIds = ids.select(col("url").as("dst_url"), col("id").as("dst"))
    links.join(srcIds, "url").join(dstIds, "dst_url")
      .select(col("src"), col("dst")).distinct()
  }
}
