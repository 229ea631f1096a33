package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** URL/domain-level corpus curation — the CommonCrawl-style steps a
  * web-scale training pipeline runs before any content-based dedup:
  * canonicalize URLs (one page, many spellings), collapse exact URL
  * duplicates, and cap the number of documents any one registered
  * domain contributes (boilerplate farms otherwise dominate the
  * corpus).
  *
  * Everything is built-in string expressions — codegen'd, map-side,
  * zero shuffle until the final per-URL/per-domain aggregate. Every
  * regex is ANCHORED and single-match, so DuckDB's default
  * (non-global) `regexp_replace` reproduces the Spark (global)
  * semantics verbatim — the oracle-portability rule for this family.
  */
object UrlOps {

  /** Canonical form of a URL for exact dedup:
    *  - fragment and query string dropped (tracking params make query
    *    strings dedup poison; pages that genuinely key on query args
    *    are the curator's accepted loss),
    *  - scheme dropped (http ≡ https for identity),
    *  - host lowercased, default ports (:80/:443) and a leading
    *    `www.` stripped,
    *  - path kept case-SENSITIVE minus a trailing slash.
    * Output: `host/path`, e.g. `site3.co.uk/p/9`. */
  def normalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noQuery = regexp_replace(noFrag, "\\?.*$", "")
    val noScheme = regexp_replace(noQuery, "(?i)^https?://", "")
    val host = lower(regexp_extract(noScheme, "^([^/]*)", 1))
    val path = regexp_replace(noScheme, "^[^/]*", "")
    val canonHost =
      regexp_replace(regexp_replace(host, ":(80|443)$", ""), "^www\\.", "")
    concat(canonHost, regexp_replace(path, "/$", ""))
  }

  /** Host of a [[normalize]]d URL (the part before the first `/`). */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^([^/]*)", 1)

  /** Two-part public suffixes recognized by [[registeredDomain]].
    * A full public-suffix list is data, not code — at production scale
    * this would be a broadcast lookup table; the common cases suffice
    * for the operator's shape and its oracle. */
  val TwoPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "com.au", "com.br", "co.in", "com.cn", "co.nz")

  /** Registered (pay-level) domain of a host: the last two labels, or
    * the last three when the trailing two form a known two-part public
    * suffix — `sub.site3.co.uk` → `site3.co.uk`, `www.site3.com` →
    * `site3.com`. Single-label hosts pass through unchanged. */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    // Branch guards keep every element_at in-bounds (Spark 4 throws on
    // out-of-range element_at); CaseWhen evaluates only the matched
    // branch per row, so the single-label row never touches parts[-2].
    val lastTwo =
      concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    when(size(parts) < 2, host)
      .when(size(parts) >= 3 && lastTwo.isin(TwoPartSuffixes: _*),
        concat_ws(".", element_at(parts, -3), lastTwo))
      .otherwise(lastTwo)
  }

  /** Keep at most `k` documents per registered domain, by `order`
    * (deterministic — ties must be broken by a unique column). Runs on
    * [[TopKPerKey]]'s bounded per-key heaps: state is O(domains × k)
    * regardless of how many documents a domain contributes — the
    * boilerplate-farm domain with 10⁹ pages costs the same as one with
    * k. The input frame must already carry a `domain` column. */
  def perDomainCap(docs: DataFrame, order: Seq[Column], k: Int): DataFrame =
    TopKPerKey.perKey(docs, Seq(col("domain")), order, k)
}
