package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy evaluation (RFC 9309, the prefix-match
  * core) — the missing half of crawl hygiene: the corpus-side
  * operators decide what to KEEP, this decides what should have been
  * FETCHED; auditing a crawl against the policies it was subject to
  * (and re-filtering third-party dumps whose collectors ignored
  * them) is a standard webtext compliance pass. Reference analog:
  * none — [EXT], training-data ops.
  *
  * Documented simplifications (all replayed verbatim by the oracle):
  * prefix-only path matching (no `*`/`$` wildcards), exact
  * case-insensitive agent tokens, and the RFC's group model —
  * CONSECUTIVE `User-agent:` lines share the following rule block;
  * rules before any group header have no agents and bind nothing.
  * Empty-path rules (`Disallow:` = "allow everything") are no-ops
  * dropped AFTER grouping — they still delimit UA runs, so a
  * whitelist group never merges into its successor. Decision: most
  * specific agent
  * first (a domain with any exact-agent group ignores its `*`
  * groups for that agent), then LONGEST matching path wins, allow
  * beating disallow at equal length; no matching rule = allowed.
  *
  * Scale shape: parsing explodes each robots payload into its lines
  * and windows PER DOMAIN (a robots.txt is a few hundred lines — the
  * window partition is file-sized, never corpus-sized). The rule
  * table is domain-grain and rides to the corpus as a BROADCAST
  * join; the per-url verdict is ONE map-side-combinable max(struct)
  * — no window sort over the corpus, urls with no applicable rule
  * never produce more than their single left-join row.
  */
object Robots {

  /** Shared key/value line grammar (engine + oracle). `crawl-delay`
    * is a recognized GROUP-MEMBER line: it delimits `User-agent:`
    * runs exactly like a rule line does (else two groups separated
    * only by a delay line — the common real-world layout — would
    * merge, handing the specific agent the `*` group's rules), but it
    * contributes no rule; [[crawlDelays]] reads its value separately.
    */
  val KeyPattern: String = "(?i)^(user-agent|allow|disallow|crawl-delay)\\s*:"
  val ValuePattern: String = "(?i)^(?:user-agent|allow|disallow)\\s*:\\s*(\\S*)"

  /** `Sitemap:` directive line (engine + oracle). */
  val SitemapPattern: String = "(?i)^sitemap\\s*:\\s*(\\S+)"

  /** `Crawl-delay:` line value (engine + oracle). */
  val DelayValuePattern: String = "(?i)^crawl-delay\\s*:\\s*(\\S+)"

  /** Numeric guard for delay values — try_cast semantics shared with
    * the oracle (ANSI Spark throws on a bad cast; an invalid value
    * like `Crawl-delay: fast` must be ignored, not fatal).
    */
  val NumberPattern: String = "^[0-9]+(\\.[0-9]+)?$"

  /** (agents, ruleLines) group frames: agents = one (domain, gid,
    * agent) row per `User-agent:` line — a group PRESENCE record even
    * when the group carries no usable rules (the RFC's empty-group =
    * allow-everything case rides on this); ruleLines = one (domain,
    * gid, allow, path) row per non-empty-path rule. Empty-path RULE
    * lines stay visible through the grouping window and drop only
    * afterwards: a no-op `Disallow:` between two `User-agent:` lines
    * still ENDS the first UA run (dropping it pre-window would merge
    * a leading whitelist group into the next group and hand the
    * whitelisted agent that group's rules — the opposite verdict).
    * Empty-token `User-agent:` lines, by contrast, are INVALID and
    * drop pre-window: they neither start groups nor end UA runs.
    * The cleaned line is staged in its own select so the
    * comment-strip/trim tree evaluates once per line, not once per
    * extracted field (SCALE.md invariant 7).
    */
  private def cleanedLines(robots: DataFrame, domainCol: String,
      txtCol: String): DataFrame =
    robots.select(col(domainCol).as("domain"),
      posexplode(split(col(txtCol), "\n")).as(Seq("idx", "raw")))
      .select(col("domain"), col("idx"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("l"))

  private def groups(robots: DataFrame, domainCol: String,
      txtCol: String): (DataFrame, DataFrame, DataFrame) = {
    val lines = cleanedLines(robots, domainCol, txtCol)
    val classified = lines.select(col("domain"), col("idx"),
      lower(regexp_extract(col("l"), KeyPattern, 1)).as("key"),
      regexp_extract(col("l"), ValuePattern, 1).as("value"))
      // an empty-token `User-agent:` line is INVALID (RFC 9309 needs a
      // product token) and is ignored entirely — it must neither start
      // a group (orphaning the rules after it) nor end a UA run; the
      // empty-path allow/disallow lines below are VALID no-op rules
      // and stay visible so they still delimit UA runs
      .filter(col("key") =!= "" &&
        !(col("key") === "user-agent" && col("value") === ""))
    val w = Window.partitionBy("domain").orderBy("idx")
    val grouped = classified
      .withColumn("prev_key", lag(col("key"), 1).over(w))
      // a UA line STARTS a group unless it extends a UA run
      .withColumn("hdr", (col("key") === "user-agent" &&
        (col("prev_key").isNull || col("prev_key") =!= "user-agent"))
        .cast("long"))
      .withColumn("gid", sum(col("hdr")).over(w))
      .filter(col("gid") >= 1)
    val agents = grouped
      .filter(col("key") === "user-agent" && col("value") =!= "")
      .select(col("domain"), col("gid"), lower(col("value")).as("agent"))
    val ruleLines = grouped
      .filter(col("key").isin("allow", "disallow") && col("value") =!= "")
      .select(col("domain"), col("gid"),
        (col("key") === "allow").as("allow"), col("value").as("path"))
    val starts = grouped.filter(col("hdr") === 1L)
      .select(col("domain"), col("idx").as("sidx"), col("gid"))
    (agents, ruleLines, starts)
  }

  /** Parsed rule table: one (domain, agent, allow, path) row per
    * (group agent, rule) pair — a rule under a multi-agent header
    * appears once per agent. Comments (`#…`) stripped, unknown lines
    * ignored, empty-path rules dropped. NOTE: a group whose rules are
    * all empty-path no-ops has no row here — [[verdicts]] decides
    * agent shadowing from group PRESENCE, not from this table.
    */
  def rules(robots: DataFrame, domainCol: String = "domain",
      txtCol: String = "robots_txt"): DataFrame = {
    val (agents, ruleLines, _) = groups(robots, domainCol, txtCol)
    agents.join(ruleLines, Seq("domain", "gid"))
      .select(col("domain"), col("agent"), col("allow"), col("path"))
  }

  /** Url path for matching: everything after the authority (query
    * kept — robots prefixes may cover it); pathless urls match "/".
    */
  def urlPath(url: Column): Column = {
    val p = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** Verdict table for `agent`: (idCol, url, allowed, rule_path) per
    * input url — `rule_path` the winning rule (longest match, allow
    * beats disallow at equal length, lexicographically-last path
    * breaks exact ties deterministically), null when no rule
    * applied. Keep `allowed` to filter, keep the whole table to
    * audit.
    *
    * `hintBroadcast` (default true) pins the rule join broadcast —
    * right up to config-scale rule tables (millions of domains). A
    * FULL-web rule table (10^8+ domains) exceeds broadcast size: pass
    * false and the join falls back to a shuffle hash join on domain,
    * which the per-url max(struct) agg downstream absorbs (the urls
    * were about to shuffle on (id, url) anyway).
    */
  def verdicts(urls: DataFrame, robots: DataFrame, agent: String,
      idCol: String = "doc_id", urlCol: String = "url",
      hintBroadcast: Boolean = true): DataFrame = {
    require(agent.nonEmpty && agent.trim == agent)
    val (agents, ruleLines, _) = groups(robots, "domain", "robots_txt")
    val r = agents.join(ruleLines, Seq("domain", "gid"))
      .select(col("domain"), col("agent"), col("allow"), col("path"))
    val specific = r.filter(col("agent") === agent.toLowerCase)
    // shadowing is decided by group PRESENCE (User-agent lines), not
    // by surviving rules: an exact-agent group whose rules are all
    // empty-path no-ops still shadows the domain's `*` groups — the
    // RFC's explicit-whitelist pattern ("User-agent: bot\nDisallow:")
    // means allow-everything for bot, not fall-through to `*`
    val specificDomains = agents.filter(col("agent") === agent.toLowerCase)
      .select("domain").distinct()
    val star = r.filter(col("agent") === "*")
      .join(specificDomains, Seq("domain"), "left_anti")
    val applicable = specific.unionByName(star)
      .select(col("domain"), col("allow"), col("path"))
    val u = urls.select(col(idCol), col(urlCol).as("url"),
      graft.text.UrlNorm.registrableDomain(col(urlCol)).as("domain"),
      urlPath(col(urlCol)).as("upath"))
    u.join(if (hintBroadcast) broadcast(applicable) else applicable,
        Seq("domain"), "left")
      .select(col(idCol), col("url"),
        when(col("path").isNotNull && col("upath").startsWith(col("path")),
          struct(length(col("path")).as("len"),
            col("allow").cast("int").as("a"), col("path").as("p")))
          .as("m"))
      .groupBy(col(idCol), col("url"))
      .agg(max(col("m")).as("best"))
      .select(col(idCol), col("url"),
        coalesce(col("best.a") === 1, lit(true)).as("allowed"),
        col("best.p").as("rule_path"))
  }

  /** `Sitemap:` directives — the sitemaps.org discovery mechanism
    * (RFC 9309 carries them as "other records"): one DISTINCT
    * (domain, sitemap_url) row per directive. The key is
    * group-INDEPENDENT — valid anywhere in the file, before, inside,
    * or after `User-agent:` groups (it never starts or ends a UA
    * run: [[groups]]' KeyPattern doesn't know it, so it falls through
    * as an ignored unknown line there, and this pass reads the raw
    * lines directly). Case-insensitive key, comments stripped by the
    * shared line cleaning (a `#` fragment in the url is comment per
    * robots grammar — crawlers don't fetch fragments), empty-value
    * lines dropped, first whitespace ends the url.
    *
    * This is the discovery edge between the crawl-policy modules:
    * feed these urls to a fetcher and the bodies into
    * [[Sitemaps.urls]] → [[Sitemaps.coverage]]. Scale shape: map-side
    * explode (a robots.txt is a few hundred lines), ONE distinct on
    * the narrow (domain, url) pair frame — robots bodies never
    * shuffle.
    */
  def sitemapDirectives(robots: DataFrame, domainCol: String = "domain",
      txtCol: String = "robots_txt"): DataFrame =
    robots.select(col(domainCol).as("domain"),
        explode(split(col(txtCol), "\n")).as("raw"))
      .select(col("domain"),
        regexp_extract(trim(regexp_replace(col("raw"), "#.*$", "")),
          SitemapPattern, 1).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")
      .distinct()

  /** Per-domain effective `Crawl-delay:` for `agent` — the politeness
    * interval a fetch scheduler keys its per-host token buckets on
    * (non-RFC but honored by the Bing/Yandex lineage; crawl ops audit
    * it even when the fetcher ignores it). One (domain, delay_secs)
    * row per domain where a delay APPLIES to the agent; domains with
    * no applicable delay emit nothing.
    *
    * Semantics, aligned with [[verdicts]]' group model: a delay line
    * is a group MEMBER (it delimits UA runs like a rule line — see
    * [[KeyPattern]]) and BINDS to the group whose start most recently
    * precedes it; a delay before any group binds nothing (the
    * rules-before-groups rule). Agent choice is group
    * PRESENCE shadowing: a domain with any exact-agent group takes
    * delays only from those groups — a specific whitelist group with
    * no delay therefore yields NO delay, even when `*` carries one.
    * Invalid values (`Crawl-delay: fast`) are ignored (try_cast
    * discipline, [[NumberPattern]]); several applicable delays
    * resolve to the MAX — the conservative politeness bound.
    *
    * Scale shape: line explode + the group window stay file-sized
    * per domain; the delay→start binding joins two file-scale frames
    * per domain; the final agg is one map-side-combinable max on a
    * domain-grain frame. Nothing here ever reaches corpus size.
    */
  def crawlDelays(robots: DataFrame, agent: String,
      domainCol: String = "domain", txtCol: String = "robots_txt"): DataFrame = {
    require(agent.nonEmpty && agent.trim == agent)
    val (agents, _, starts) = groups(robots, domainCol, txtCol)
    val delays = cleanedLines(robots, domainCol, txtCol)
      .select(col("domain"), col("idx"),
        regexp_extract(col("l"), DelayValuePattern, 1).as("v"))
      .filter(col("v").rlike(NumberPattern))
      .select(col("domain"), col("idx"), col("v").cast("double").as("delay"))
    val bound = delays.join(starts, Seq("domain"))
      .filter(col("sidx") < col("idx"))
      .groupBy(col("domain"), col("idx"), col("delay"))
      .agg(max(col("gid")).as("gid"))
    val a = agent.toLowerCase
    val specificDomains = agents.filter(col("agent") === a)
      .select("domain").distinct()
    val applicable = agents.filter(col("agent") === a)
      .select("domain", "gid")
      .unionByName(agents.filter(col("agent") === "*")
        .select("domain", "gid")
        .join(specificDomains, Seq("domain"), "left_anti"))
      .distinct()
    bound.join(applicable, Seq("domain", "gid"))
      .groupBy("domain")
      .agg(max(col("delay")).as("delay_secs"))
  }
}
