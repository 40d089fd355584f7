package graft.pipeline

import java.util.regex.Pattern

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck guards for the URL column ops: random structured URLs
  * (mixed-case schemes/hosts, userinfo, ports, duplicate/trailing slashes,
  * queries, fragments with embedded '?') checked against a driver
  * re-evaluation of the SAME regex rules via java.util.regex — the engine's
  * patterns are plain Java regexes, so the driver is an exact independent
  * executor, not a reimplementation. Plus the algebraic property that makes
  * normalize a valid crawl-frontier key: idempotence. */
object UrlOpsPropertySpec extends Properties("UrlOpsProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  lazy val spark = SparkTestSession.spark

  val genUrl: Gen[String] = for {
    sch <- Gen.oneOf("http", "https", "HTTP", "HtTpS", "ftp")
    user <- Gen.option(Gen.oneOf("u", "a:b"))
    nLab <- Gen.chooseNum(1, 3)
    labels <- Gen.listOfN(nLab, Gen.oneOf("Example", "WWW", "co", "uk", "x1"))
    port <- Gen.option(Gen.oneOf(80, 443, 8080))
    nSeg <- Gen.chooseNum(0, 3)
    segs <- Gen.listOfN(nSeg, Gen.oneOf("A", "b", "", "img.png"))
    trail <- Gen.oneOf("", "/", "//")
    qry <- Gen.option(Gen.oneOf("?x=1", "?x=1&y=2", "?"))
    frag <- Gen.option(Gen.oneOf("#top", "#sec?x=1", "#"))
  } yield sch + "://" + user.map(_ + "@").getOrElse("") +
    labels.mkString(".") + port.map(":" + _).getOrElse("") +
    (if (segs.isEmpty) "" else "/" + segs.mkString("/")) + trail +
    qry.getOrElse("") + frag.getOrElse("")

  /** Spark regexp_extract semantics: unanchored find, "" when no match */
  private def rex(s: String, re: String, g: Int): String = {
    val m = Pattern.compile(re).matcher(s)
    if (m.find()) Option(m.group(g)).getOrElse("") else ""
  }

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostportRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  private def dScheme(u: String) = rex(u, schemeRe, 1).toLowerCase
  private def dHostport(u: String) =
    rex(u, hostportRe, 1).replaceFirst("^[^/@]*@", "")
  private def dHost(u: String) =
    dHostport(u).replaceFirst(":[0-9]*$", "").toLowerCase
  private def dPort(u: String): Option[Int] = {
    val p = rex(dHostport(u), ":([0-9]+)$", 1)
    if (p.isEmpty) None else Some(p.toInt)
  }
  private def dPath(u: String) = rex(u, pathRe, 1)
  private def dQuery(u: String) = rex(u, "^[^#?]*([?][^#]*)", 1)
  private def dDomain(u: String) = rex(dHost(u), "([^.]+[.][^.]+)$", 1)
  private def dPathDepth(u: String): Int = {
    val squeezed = dPath(u).replaceAll("/+", "/").replaceAll("^/|/$", "")
    if (squeezed.isEmpty) 0 else squeezed.count(_ == '/') + 1
  }
  private def dNormalize(u: String): String = {
    val sch = dScheme(u)
    val keep = dPort(u).filter(p =>
      !((sch == "http" && p == 80) || (sch == "https" && p == 443)))
    val rawPath = dPath(u).replaceAll("/+$", "")
    sch + "://" + dHost(u) + keep.map(":" + _).getOrElse("") +
      (if (rawPath.isEmpty) "/" else rawPath) + dQuery(u)
  }

  property("component extraction == driver java.util.regex evaluation") =
    forAll(genUrl) { u =>
      import spark.implicits._
      val r = Seq(u).toDF("url").select(
        UrlOps.scheme(col("url")), UrlOps.host(col("url")),
        UrlOps.port(col("url")), UrlOps.path(col("url")),
        UrlOps.query(col("url")), UrlOps.domain(col("url")),
        UrlOps.pathDepth(col("url"))).collect()(0)
      r.getString(0) == dScheme(u) &&
        r.getString(1) == dHost(u) &&
        (if (r.isNullAt(2)) dPort(u).isEmpty else dPort(u).contains(r.getInt(2))) &&
        r.getString(3) == dPath(u) &&
        r.getString(4) == dQuery(u) &&
        r.getString(5) == dDomain(u) &&
        r.getInt(6) == dPathDepth(u)
    }

  property("normalize == driver rule composition, and is idempotent") =
    forAll(genUrl) { u =>
      import spark.implicits._
      val once = Seq(u).toDF("url")
        .select(UrlOps.normalize(col("url")).as("n"))
        .collect()(0).getString(0)
      val twice = Seq(once).toDF("url")
        .select(UrlOps.normalize(col("url")).as("n"))
        .collect()(0).getString(0)
      once == dNormalize(u) && twice == once
    }
}
