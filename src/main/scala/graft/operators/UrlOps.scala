package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and per-host crawl rollups — the layer between
  * the fetch-outcome census ([[Multimodal.warcHttpMeta]]) and the text
  * corpus: two fetches of `HTTP://Ex.COM:80/a/./b/../c?id=1&utm_x=2#f`
  * and `http://ex.com/a/c?id=1` are the same page, and every crawl
  * dedup / politeness / rollup decision needs them to compare equal.
  *
  * Everything here is a pure Column program over RE2-safe regexes (no
  * lookaround, no backreferences) so a DuckDB oracle replays the
  * IDENTICAL passes — the repo's htmlExtract/BpeishPattern stance —
  * and whole-stage codegen keeps it a narrow zero-shuffle map.
  *
  * Relation to [[QualityRules.canonicalizeUrl]] (q282): that one is the
  * cheap frontier-dedup KEY (whole-authority lowercase, param resort,
  * trailing-slash strip — aggressive merging, not a valid URL). This is
  * the RFC-grade page IDENTITY: the output is itself a fetchable URL
  * (dot-segments resolved, default ports dropped, param order kept),
  * the form host rollups, politeness budgets, and recrawl planning key
  * on. Both stay: frontier keys want recall, identities want precision.
  *
  * Normalization rules (documented choices):
  *  - scheme + host lowercased; only absolute http/https URLs
  *    canonicalize (anything else → null);
  *  - default ports dropped (http:80, https:443), explicit non-default
  *    ports kept;
  *  - fragment dropped;
  *  - duplicate slashes collapsed, then RFC 3986 dot-segment removal
  *    via fixed regex passes (depth ≤ 8 `..` nesting — beyond that
  *    both engines stop at the same fixpoint, so exactness holds);
  *  - tracking params stripped (utm_*, gclid, fbclid, ref), remaining
  *    params kept IN ORIGINAL ORDER (no resort — a documented
  *    conservative choice: resorting merges more but can conflate
  *    order-sensitive endpoints);
  *  - empty path → "/"; percent-encoding left untouched (normalizing
  *    it safely needs a decode table, out of regex reach).
  */
object UrlOps {

  private def rep(c: Column, pat: String, to: String, times: Int): Column =
    (1 to times).foldLeft(c)((acc, _) => regexp_replace(acc, pat, to))

  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, SchemePat, 1))

  private def hostPort(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  def urlHost(u: Column): Column =
    lower(regexp_replace(hostPort(u), ":[0-9]*$", ""))

  def urlPort(u: Column): Column =
    regexp_extract(hostPort(u), ":([0-9]+)$", 1)

  def urlPathRaw(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  def urlQueryRaw(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\\?([^#]*)", 1)

  /** A path segment that is NOT `.` or `..` — RE2-safe (no lookahead):
    * starts with a non-dot, or is a dot followed by a non-dot, or is
    * two dots followed by more. `..`-popping must never treat a `..`
    * as the popped segment (`/../../x` would lose pops).
    */
  private val Seg = "([^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)"

  /** Collapse duplicate slashes, then remove `.` and `..` segments with
    * fixed global-replace passes (both engines scan leftmost, continue
    * after each match — identical fixpoints; adversarial all-`..`
    * chains pop one level per pass, so nesting depth ≤ 8 resolves
    * fully and deeper chains stop at the same point in both engines).
    */
  def normalizePath(p: Column): Column = {
    val base = when(p === "", lit("/")).otherwise(p)
    val collapsed = regexp_replace(base, "/+", "/")
    val noDot = regexp_replace(rep(collapsed, "/\\./", "/", 4), "/\\.$", "/")
    val noDd = rep(noDot, s"/$Seg/\\.\\./", "/", 8)
    val noDdTail = rep(noDd, s"/$Seg/\\.\\.$$", "/", 2)
    regexp_replace(rep(noDdTail, "^/\\.\\./", "/", 4), "^/\\.\\.$", "/")
  }

  /** Drop tracking params (utm_*, gclid, fbclid, ref) and empty pairs;
    * keep the rest in original order.
    */
  def stripTracking(q: Column): Column =
    array_join(filter(split(q, "&"), x =>
      x =!= "" && !x.rlike("^(utm_[^=&]*|gclid|fbclid|ref)(=|$)")), "&")

  /** Canonical form of an absolute http/https URL; null for anything
    * else (relative refs, other schemes, empty host).
    */
  def canonicalizeUrl(u: Column): Column = {
    val sch = urlScheme(u)
    val h = urlHost(u)
    val p = urlPort(u)
    val portPart = when(p === "" ||
        (sch === "http" && p === "80") ||
        (sch === "https" && p === "443"), lit(""))
      .otherwise(concat(lit(":"), p))
    val q = stripTracking(urlQueryRaw(u))
    val qPart = when(q === "", lit("")).otherwise(concat(lit("?"), q))
    when(sch.isin("http", "https") && h =!= "",
      concat(sch, lit("://"), h, portPart, normalizePath(urlPathRaw(u)), qPart))
  }

  /** Last-two-labels registered domain — a deliberate heuristic (a real
    * public-suffix list is data, not code; co.uk-style suffixes roll up
    * one label short). Single-label hosts map to themselves.
    */
  def registeredDomain(host: Column): Column = {
    val d = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(d === "", host).otherwise(d)
  }

  /** robots.txt rule extraction for one crawler agent (RFC 9309,
    * documented simplifications): comments strip at `#`, consecutive
    * `User-agent` lines share a group, and the MOST SPECIFIC applicable
    * group set wins — groups naming `agent` exactly (case-insensitive)
    * if any exist for the host, else the `*` groups; rules from
    * non-applicable groups are ignored entirely (not unioned — the RFC
    * group-selection rule crawlers actually follow). Empty `Disallow:`
    * (allow-everything idiom) contributes no rule; fields other than
    * allow/disallow (crawl-delay, sitemap) pass through the parse but
    * emit nothing here. No percent-decoding or `*`/`$` wildcard
    * support (documented; wildcard rules would need a regex compile per
    * rule). Output: (host, rule_path, is_allow).
    *
    * Scale: one narrow line explode + a per-host window over robots
    * LINES (bodies are KB-sized; one per host) — nothing frontier-sized
    * moves.
    */
  def robotsRules(robots: DataFrame, hostCol: String, txtCol: String,
      agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val fields = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("ln", "raw")))
      .select(col("host"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .select(col("host"), col("ln"),
        lower(trim(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
          .as("field"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1))
          .as("value"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grouped = fields.withColumn("grp",
      sum(when(col("field") === "user-agent" &&
        coalesce(lag(col("field"), 1).over(w), lit("")) =!= "user-agent", 1)
        .otherwise(0)).over(w))
    val ua = grouped
      .filter(col("field") === "user-agent" &&
        (lower(col("value")) === agentLc || col("value") === "*"))
      .groupBy(col("host"), col("grp"))
      .agg(min(when(lower(col("value")) === agentLc, 1).otherwise(2))
        .as("pref"))
    val best = ua.groupBy(col("host")).agg(min(col("pref")).as("pref"))
    val applicable = ua.join(best, Seq("host", "pref")).select("host", "grp")
    grouped.join(applicable, Seq("host", "grp"))
      .filter(col("field").isin("allow", "disallow") && col("value") =!= "")
      .select(col("host"), col("value").as("rule_path"),
        (col("field") === "allow").as("is_allow"))
  }

  /** Frontier gate over [[robotsRules]] output: per URL the
    * longest-matching rule wins, allow beating disallow on equal
    * length (the RFC 9309 precedence), no matching rule → allowed.
    * Output: (id, url, host, path, allowed, matched_rule).
    *
    * Scale: the rules frame is host-count-sized (KB-bodies, one per
    * host) — broadcast; each frontier row fans out to at most its
    * host's rule count and collapses in a per-id window. The frontier
    * never shuffles beyond that window.
    */
  def robotsGate(frontier: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame): DataFrame = {
    val u = col(urlCol)
    val f = frontier.select(col(idCol), u.as("url"), urlHost(u).as("host"),
      when(urlPathRaw(u) === "", "/").otherwise(urlPathRaw(u)).as("path"))
    val j = f.join(broadcast(rules), Seq("host"), "left")
      .withColumn("m", col("rule_path").isNotNull &&
        col("path").startsWith(col("rule_path")))
    // null-free ordering keys: null-ordering defaults differ across
    // engines, and all-m-false groups emit the same row whichever
    // member ranks first
    val wv = Window.partitionBy(col(idCol)).orderBy(col("m").desc,
      coalesce(length(col("rule_path")), lit(-1)).desc,
      col("is_allow").desc, col("rule_path"))
    j.withColumn("__rn", row_number().over(wv)).filter(col("__rn") === 1)
      .select(col(idCol), col("url"), col("host"), col("path"),
        when(col("m"), col("is_allow")).otherwise(lit(true)).as("allowed"),
        when(col("m"), col("rule_path")).as("matched_rule"))
  }

  /** Per-(domain, host) crawl rollup over raw fetched URLs: fetch
    * counts by outcome class plus the dedup collapse the canonicalizer
    * buys (n_urls vs distinct canonical forms). One hash-partial +
    * final aggregation pair keyed by (domain, host, canonical) then
    * (domain, host) — Spark plans count(DISTINCT) exactly that way, so
    * a hot host skews one partition at worst and AQE splits it. Rows
    * that do not canonicalize (non-http, relative) are excluded — they
    * are not fetchable page identities.
    */
  def hostRollup(df: DataFrame, urlCol: String, statusCol: String): DataFrame = {
    val u = col(urlCol)
    val canon = canonicalizeUrl(u)
    df.filter(canon.isNotNull)
      .select(urlHost(u).as("host"), canon.as("canonical"),
        col(statusCol).as("__st"))
      .withColumn("domain", registeredDomain(col("host")))
      .groupBy(col("domain"), col("host"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canonical")).as("n_canonical"),
        sum(when(col("__st").between(200, 299), 1L).otherwise(0L)).as("n_ok"),
        sum(when(col("__st").between(300, 399), 1L).otherwise(0L)).as("n_redirect"),
        sum(when(col("__st").between(400, 499), 1L).otherwise(0L)).as("n_client_err"),
        sum(when(col("__st") >= 500, 1L).otherwise(0L)).as("n_server_err"))
  }
}
