package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing and normalization for web-corpus curation.
  *
  * A crawl-derived training corpus keys provenance, dedup and
  * blocklists on normalized URLs and registered domains; the reference
  * has no URL surface. Spark ships `parse_url`, but its component
  * semantics are engine-private — these helpers use plain anchored
  * regexes instead (RE2-safe: no backtracking constructs, no
  * lookarounds), so every component is portable column arithmetic that
  * an oracle can mirror verbatim, and the whole chain stays inside
  * whole-stage codegen.
  *
  * Normalization applied by [[normalized]]:
  *   - scheme and host lowercased (path/query case is significant)
  *   - default ports stripped (http:80, https:443); others kept
  *   - fragment dropped
  *   - `utm_*` tracking parameters dropped, `?`/`&` separators healed
  *   - empty path becomes `/`
  */
object UrlOps {

  private val auth = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** scheme, lowercased. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** host, lowercased, port stripped. */
  def host(url: Column): Column =
    regexp_extract(lower(regexp_extract(url, auth, 1)), "^([^:]+)", 1)

  /** explicit port as a string; '' when absent. */
  def portStr(url: Column): Column =
    regexp_extract(regexp_extract(url, auth, 1), ":([0-9]+)$", 1)

  /** path component ('' when absent — see [[normalized]] for the
    * canonical '/' form).
    */
  def path(url: Column): Column =
    regexp_extract(url, auth + "([^?#]*)", 2)

  /** query string without the '?', tracking params NOT stripped;
    * '' when absent.
    */
  def query(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** registered domain: last two dot-labels of the host (the public-
    * suffix list is out of scope offline; two-label is the standard
    * approximation for gTLDs).
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** query with utm_* params removed and separators healed: drop each
    * `utm_...&` / trailing `utm_...`, then a dangling trailing '&'.
    */
  private def cleanQuery(q: Column): Column =
    regexp_replace(regexp_replace(q, "utm_[^&]*&?", ""), "&$", "")

  /** Canonical URL string (see object scaladoc for the rules). */
  def normalized(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = portStr(url)
    val keepPort = (p =!= "") &&
      !((sch === "http" && p === "80") || (sch === "https" && p === "443"))
    val pth = when(path(url) === "", "/").otherwise(path(url))
    val q = cleanQuery(query(url))
    concat(sch, lit("://"), h,
      when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
      pth,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }
}
