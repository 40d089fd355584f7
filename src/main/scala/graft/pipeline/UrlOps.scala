package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL column ops for web-crawl tables (`input_hint`: pages keyed by
  * `url:string`): component extraction and RFC-3986-style syntax
  * normalization, all as flat codegen Column expressions — no UDFs, no
  * higher-order functions, so they inline into the page-table scan
  * projection at any scale.
  *
  * Every regex here stays inside the Java-regex ∩ RE2 common subset
  * (character classes, anchors, groups, greedy quantifiers; no lookaround,
  * no backreferences) so the DuckDB oracle can run the IDENTICAL pattern.
  *
  * Normalization semantics (the usual crawl-frontier canonicalization):
  * lowercase scheme and host, drop userinfo, drop the scheme-default port
  * (http:80 / https:443), drop the fragment, strip trailing slashes from
  * the path (root stays `/`), keep query and path content (path case and
  * internal duplicate slashes are SIGNIFICANT per RFC 3986 — only the
  * syntax-based rules applied here are always-safe).
  */
object UrlOps {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostportRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, schemeRe, 1))

  /** host:port with userinfo stripped, original case */
  private def hostport(url: Column): Column =
    regexp_replace(regexp_extract(url, hostportRe, 1), "^[^/@]*@", "")

  def host(url: Column): Column =
    lower(regexp_replace(hostport(url), ":[0-9]*$", ""))

  /** explicit port, null when absent (ANSI-safe: '' is nullif'd pre-cast) */
  def port(url: Column): Column =
    nullif(regexp_extract(hostport(url), ":([0-9]+)$", 1), lit("")).cast("int")

  /** path component (no query/fragment), original case, may be "" */
  def path(url: Column): Column = regexp_extract(url, pathRe, 1)

  /** query incl. '?', "" when absent. Anchored scan: the '?' must appear
    * BEFORE any '#' — RFC 3986 allows '?' inside a fragment (`#sec?x=1`),
    * and an unanchored `([?][^#]*)` would resurrect such fragment content
    * as a bogus query (wrong crawl-frontier key after normalize). */
  def query(url: Column): Column =
    regexp_extract(url, "^[^#?]*([?][^#]*)", 1)

  /** last-two-labels approximation of the registrable domain. The real
    * public-suffix list is a data file this image does not ship; under a
    * multi-label suffix (a.b.co.uk) this degenerates to the suffix itself
    * (co.uk) — the documented limit of the offline fallback. */
  def domain(url: Column): Column =
    regexp_extract(host(url), "([^.]+[.][^.]+)$", 1)

  /** number of non-empty path segments: /a//b/ -> 2, / -> 0, "" -> 0 */
  def pathDepth(url: Column): Column = {
    val squeezed = regexp_replace(regexp_replace(path(url), "/+", "/"), "^/|/$", "")
    when(squeezed === "", lit(0)).otherwise(
      length(squeezed) - length(regexp_replace(squeezed, "/", "")) + 1)
  }

  def normalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p.isNotNull &&
      !((sch === "http" && p === 80) || (sch === "https" && p === 443))
    val portPart = when(keepPort, concat(lit(":"), p.cast("string"))).otherwise(lit(""))
    val rawPath = regexp_replace(path(url), "/+$", "")
    val pathPart = when(rawPath === "", lit("/")).otherwise(rawPath)
    concat(sch, lit("://"), h, portPart, pathPart, query(url))
  }
}
