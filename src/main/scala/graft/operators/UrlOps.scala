package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL/domain-level corpus filtering — the web-crawl
  * front door of a training-data pipeline (RefinedWeb/FineWeb-style URL
  * dedup and domain blocklisting; the reference's ingest surface stops at
  * row sources, so this extends it the way its users extend Sqoop imports
  * with free-form column expressions).
  *
  * Everything here is a chain of codegen'd built-ins (`regexp_replace` /
  * `regexp_extract` / `lower`) — zero UDFs, so normalization runs inside
  * whole-stage codegen and is expressible 1:1 in the DuckDB oracle. The
  * regex pipeline IS the spec: each step is documented and mirrored in the
  * q134 gate SQL.
  *
  * Scale shape: `normalizeUrl`/`urlHost`/`registrableDomain` are per-row
  * narrow expressions (no shuffle). `urlDedup` is one groupBy on the
  * normalized URL (short keys — the shuffle carries ~100 B/row, not the
  * document). `domainFilter` broadcasts the blocklist (domain lists are
  * thousands of rows, never corpus-sized).
  */
object UrlOps {

  /** Tracking-parameter names stripped by [[normalizeUrl]] (the common
    * cross-site click/campaign identifiers; utm_* as a family). */
  private[graft] val TrackingParams =
    "(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src)"

  /** Canonicalize a URL into a dedup key. Steps, in order:
    *  1. trim; drop the `#fragment`;
    *  2. lowercase the `scheme://host[:port]` prefix (path/query case kept);
    *  3. strip userinfo (`user:pw@`);
    *  4. strip default ports (`:443` for https, `:80` for http);
    *  5. strip a leading `www.`;
    *  6. remove tracking query params (utm_*, fbclid, gclid, msclkid,
    *     mc_eid, ref, ref_src) wherever they sit in the query string;
    *  7. drop a dangling `?`/`&` and trailing slashes.
    * Non-URL strings pass through mostly unchanged (step 2 matches nothing).
    */
  def normalizeUrl(url: Column): Column = {
    val u1 = trim(url)
    val u2 = regexp_replace(u1, "#.*$", "")
    val prefix = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"
    val u3 = concat(lower(regexp_extract(u2, prefix, 0)),
      regexp_replace(u2, prefix, ""))
    val u4 = regexp_replace(u3, "//[^/@?#]*@", "//")
    val u5 = regexp_replace(u4, "^(https://[^/:?#]*):443([/?].*)?$", "$1$2")
    val u6 = regexp_replace(u5, "^(http://[^/:?#]*):80([/?].*)?$", "$1$2")
    val u7 = regexp_replace(u6, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    // tracking params: (a) '&p=v' anywhere, (b) '?p=v&' at query start,
    // (c) '?p=v' as the whole query — after (a) at most one tracking param
    // remains and it is query-initial, so (b)/(c) need a single pass.
    val t1 = regexp_replace(u7, "&" + TrackingParams + "=[^&#]*", "")
    val t2 = regexp_replace(t1, "\\?" + TrackingParams + "=[^&#]*&", "?")
    val t3 = regexp_replace(t2, "\\?" + TrackingParams + "=[^&#]*$", "")
    val c1 = regexp_replace(t3, "[?&]$", "")
    regexp_replace(c1, "/+$", "")
  }

  /** Lowercased host of a URL — userinfo and port stripped; empty string
    * when the value does not look like `scheme://host…`. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Registrable domain (eTLD+1) heuristic over a host: keeps three labels
    * when the suffix is a common two-level public suffix (`co.uk`,
    * `com.au`, …), two labels otherwise. A heuristic, not the full PSL —
    * the alternation lists the high-traffic second-level suffixes; swap in
    * a broadcast PSL table via [[domainFilter]]-style joins if exactness
    * matters. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host,
      "([^.]+\\.(?:co|com|net|org|gov|edu|ac)\\.[a-z]{2}|[^.]+\\.[^.]+)$", 1)

  /** URL-level exact dedup: one survivor (min id) per normalized URL, with
    * the group size. One groupBy keyed on the short normalized string. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), normalizeUrl(col(urlCol)).as("norm_url"))
      .groupBy(col("norm_url"))
      .agg(min(col(idCol)).as("keep_" + idCol), count(lit(1)).as("n_urls"))

  /** The ids [[urlDedup]] does NOT keep, in one window pass: a row
    * loses iff its id differs from its normalized-URL group's min id —
    * the exact complement of the survivor set (`keep = min(id)` per
    * group), without anti-joining the corpus against its own deduped
    * self (which carries the upstream chain twice through the plan and
    * runs the URL aggregate a second time). Used by the drop-ledger
    * audit path. */
  def urlDedupLosers(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), normalizeUrl(col(urlCol)).as("__nu"))
      .withColumn("__keep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__nu"))))
      .filter(col(idCol) =!= col("__keep"))
      .select(col(idCol))

  /** Drop (or keep only) rows whose registrable domain appears in
    * `domains`. The list is broadcast — a blocklist is never corpus-sized.
    * `mode = "deny"` removes listed domains (UT1-style blocklisting);
    * `mode = "allow"` keeps only listed domains (curated-source corpora).
    */
  def domainFilter(df: DataFrame, urlCol: String, domains: DataFrame,
      domainCol: String, mode: String = "deny"): DataFrame = {
    require(mode == "deny" || mode == "allow", s"bad mode: $mode")
    val keyed = df.withColumn("__dom", registrableDomain(urlHost(col(urlCol))))
    val list = broadcast(domains.select(col(domainCol).as("__blocked")).distinct())
    val joined =
      if (mode == "deny")
        keyed.join(list, keyed("__dom") === list("__blocked"), "left_anti")
      else
        keyed.join(list, keyed("__dom") === list("__blocked"), "left_semi")
    joined.drop("__dom")
  }

  /** Per-registrable-domain corpus census: row count + one example URL
    * (min by normalized form, so the example is deterministic). */
  def domainCounts(df: DataFrame, urlCol: String): DataFrame =
    df.select(registrableDomain(urlHost(col(urlCol))).as("domain"),
        normalizeUrl(col(urlCol)).as("__norm"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_pages"), min(col("__norm")).as("example_url"))
}
