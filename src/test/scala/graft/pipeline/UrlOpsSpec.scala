package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Per-component edge cases for the URL ops (the `url_normalize` oracle
  * query covers the corpus-scale behavior against DuckDB running the SAME
  * regex patterns). */
class UrlOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def eval(url: String): (String, String, Any, Int, String) = {
    val r = Seq(url).toDF("u").select(
      UrlOps.host(col("u")), UrlOps.domain(col("u")), UrlOps.port(col("u")),
      UrlOps.pathDepth(col("u")), UrlOps.normalize(col("u"))).collect().head
    (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) null else r.getInt(2), r.getInt(3), r.getString(4))
  }

  test("bare host, mixed case, trailing slash: root path normalizes to /") {
    assert(eval("https://Example.COM/") ===
      (("example.com", "example.com", null, 0, "https://example.com/")))
    // no path at all gets the same canonical root
    assert(eval("https://Example.COM") ===
      (("example.com", "example.com", null, 0, "https://example.com/")))
  }

  test("userinfo dropped, default port dropped, duplicate slashes kept, " +
    "trailing slash and fragment stripped, query kept") {
    assert(eval("HTTP://user:pw@WWW.Example.com:80/a//b/?x=1#f") ===
      (("www.example.com", "example.com", 80, 2,
        "http://www.example.com/a//b?x=1")))
  }

  test("non-default port survives normalization; path case is significant") {
    assert(eval("https://a.b.co.uk:8443/Path/One") ===
      (("a.b.co.uk", "co.uk", 8443, 2, "https://a.b.co.uk:8443/Path/One")))
  }

  test("http default-port rule is scheme-aware: :443 on http is NOT default") {
    assert(eval("http://h.example:443/x") ===
      (("h.example", "h.example", 443, 1, "http://h.example:443/x")))
  }

  test("schemeless input degrades to empty components (hrefs must be " +
    "resolved to absolute urls upstream)") {
    val (h, _, p, d, _) = eval("example.com/x")
    assert(h === "" && p === null && d === 0)
  }

  test("'?' inside a fragment is NOT a query (RFC 3986 allows it there): " +
    "normalize drops the whole fragment") {
    // an unanchored query regex would resurrect '?x=1' from the fragment
    assert(eval("https://h.example/path#sec?x=1")._5 ===
      "https://h.example/path")
    // and a real query followed by a fragment still survives intact
    assert(eval("https://h.example/path?q=2#sec?x=1")._5 ===
      "https://h.example/path?q=2")
  }
}
