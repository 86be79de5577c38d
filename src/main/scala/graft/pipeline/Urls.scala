package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level deduplication — the first dedup pass
  * of a web-crawl pipeline (cheaper than any content hash: two crawls of
  * the same page differ in tracking params and case long before they
  * differ in text).
  *
  * Everything is a chain of column regexps (codegen, zero UDF), and every
  * pattern is RE2-compatible (no lookaround, no backtracking constructs)
  * so the DuckDB oracle replays the identical chain.
  */
object Urls {

  /** Canonical form of a URL column:
    *  1. lowercase the scheme and authority (path/query stay case-sensitive),
    *  2. drop the default port (:80 for http, :443 for https),
    *  3. drop the fragment,
    *  4. drop tracking params (utm_*, fbclid, gclid) wherever they sit in
    *     the query string, then repair the separators ("?&" -> "?",
    *     trailing "?"/"&" -> ""),
    *  5. collapse duplicate slashes in the path (never the "//" of the
    *     scheme separator),
    *  6. drop a trailing slash, including one directly before "?".
    *
    * Order matters (4 must run after 3 so a fragment can't hide a tracking
    * param; 6 must run last so 4's separator repair can't re-expose a
    * trailing slash) — the oracle replays the same order. */
  def canonicalize(url: Column): Column = {
    // 1. scheme://authority is everything up to the first /?# after "://".
    val lowerHead = concat(
      lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""))
    // 2. default ports (authority is already lowercase).
    val noPort = regexp_replace(
      regexp_replace(lowerHead, "^(http://[^/?#]*):80([/?#]|$)", "$1$2"),
      "^(https://[^/?#]*):443([/?#]|$)", "$1$2")
    // 3. fragment.
    val noFrag = regexp_replace(noPort, "#.*$", "")
    // 4. tracking params, by position, so the "?" never gets eaten:
    //    (a) non-initial "&track=v" anywhere, (b) query-initial
    //    "?track=v&" keeps the "?" for the next param (only one param can
    //    be query-initial, so one pass suffices after (a)), (c) a tracker
    //    as the only param drops the "?" too; then a defensive dangling
    //    "?"/"&" cleanup.
    val track = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"
    val fixedSep = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(noFrag, s"&$track=[^&#]*", ""),
          s"\\?$track=[^&#]*&", "?"),
        s"\\?$track=[^&#]*$$", ""),
      "[?&]$", "")
    // 5. duplicate path slashes ("://" is protected by the non-colon
    //    capture; global replace handles every run).
    val onePath = regexp_replace(fixedSep, "([^:/])/{2,}", "$1/")
    // 6. trailing slash, also before the query.
    regexp_replace(regexp_replace(onePath, "/\\?", "?"), "/$", "")
  }

  /** URL-level dedup: canonicalize, then keep the minimum-id row per
    * canonical URL — one hash shuffle on the canonical form (same shape
    * as Dedup.exactIds). Returns (idCol, canonical, n_dups) where n_dups
    * is the group size the survivor represents. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("canonical"))
      .groupBy(col("canonical"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(col(idCol), col("canonical"), col("n_dups"))
}
