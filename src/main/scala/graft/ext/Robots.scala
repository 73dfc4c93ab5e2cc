package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and crawl-permission screening (RFC 9309, the
  * Robots Exclusion Protocol) — the compliance gate at the very front
  * of a crawl pipeline: before a fetched URL's content may enter the
  * corpus, the host's robots rules for our user-agent must allow its
  * path.
  *
  * Semantics implemented (the deterministic core of RFC 9309):
  *
  *   - lines are `Field: value` with `#` comments stripped; field
  *     names case-insensitive; CRLF tolerated
  *   - consecutive `User-agent` lines STACK into one group; the
  *     group's rules run until the next group starts
  *   - group selection: if ANY group names our agent exactly
  *     (case-insensitive), the union of those groups' rules applies
  *     (RFC: same-agent groups combine); otherwise the `*` groups
  *     apply; a host with neither — or with no robots row at all —
  *     is fully allowed
  *   - rule matching is by path PREFIX; the longest matching rule
  *     wins, and at equal length `Allow` beats `Disallow` (Google's
  *     published tie-break, adopted by RFC 9309)
  *   - an empty rule value (`Disallow:` with nothing) matches no
  *     path — the classic allow-everything idiom
  *   - `*`/`$` wildcard rules are OUT of this subset (documented;
  *     they need regex compilation per rule, and the overwhelming
  *     majority of real rules are plain prefixes)
  *
  * Scale shape: rule derivation is line-proportional over the robots
  * corpus (one posexplode + two windows per host); the screen is one
  * broadcast hash join from URL hosts to the (small: rules-per-host ×
  * hosts) rule table with the prefix filter applied after the probe,
  * then one struct-max per URL — the [[UrlOps.blockScreen]]
  * discipline: never a non-equi join against the corpus.
  */
object Robots {

  /** Classified directive lines with their group ids:
    * (host, i, kind ∈ ua|allow|disallow|delay, v, gid). Shared by the
    * path rules and the Crawl-delay parse.
    */
  private def classified(robots: DataFrame, host: Column,
                         body: Column): DataFrame = {
    val lines = robots.select(host.as("host"),
      posexplode(split(body, "\n")).as(Seq("i", "raw")))
    val cleaned = trim(regexp_replace(
      regexp_replace(col("raw"), "\r", ""), "#.*$", ""))
    // single source of truth: ONE field alternation both classifies
    // the line (via the extracted field name) and strips the prefix,
    // so the two cannot drift if the directive grammar grows
    val fieldAlt = "(?i)^(user-agent|allow|disallow|crawl-delay)\\s*:"
    val field = lower(regexp_extract(cleaned, fieldAlt, 1))
    val kind = when(field === "user-agent", "ua")
      .when(field === "allow", "allow")
      .when(field === "disallow", "disallow")
      .when(field === "crawl-delay", "delay")
    val value = trim(regexp_replace(cleaned, fieldAlt, ""))
    val d = lines
      .select(col("host"), col("i"), kind.as("kind"), value.as("v"))
      .filter(col("kind").isNotNull)
    val w = Window.partitionBy("host").orderBy("i")
    val newGroup = when(col("kind") === "ua" &&
      coalesce(lag("kind", 1).over(w), lit("")) =!= "ua", 1).otherwise(0)
    d.withColumn("gid", sum(newGroup).over(w))
  }

  /** Per-(host, gid) agent-applicability flags for the classified
    * lines (exact groups shadow `*` host-wide).
    */
  private def groupFlags(g: DataFrame, agent: String): DataFrame =
    g.filter(col("kind") === "ua")
      .groupBy(col("host"), col("gid"))
      .agg(
        max((lower(col("v")) === agent.toLowerCase).cast("int")).as("has_exact"),
        max((col("v") === "*").cast("int")).as("has_star"))
      .withColumn("host_exact",
        max(col("has_exact")).over(Window.partitionBy("host")))

  private val applies =
    (col("host_exact") === 1 && col("has_exact") === 1) ||
      (col("host_exact") === 0 && col("has_star") === 1)

  /** Parse per-host robots bodies into the applicable rule table for
    * `agent`: (host, allow, prefix). Empty-value rules are dropped
    * here (they match nothing by construction).
    */
  def rulesFor(robots: DataFrame, host: Column, body: Column,
               agent: String): DataFrame = {
    val g = classified(robots, host, body)
    g.filter(col("kind").isin("allow", "disallow") && col("v") =!= "")
      .join(groupFlags(g, agent), Seq("host", "gid"))
      .filter(applies)
      .select(col("host"), (col("kind") === "allow").as("allow"),
        col("v").as("prefix"))
  }

  /** Applicable per-host Crawl-delay in MILLISECONDS: fractional
    * seconds parse (`0.5` is common in the wild), floored onto the
    * millisecond grid so everything downstream is integer arithmetic;
    * the MAXIMUM across applicable groups and repeated lines wins
    * (the conservative reading). Unparseable or empty values drop;
    * hosts without a directive are absent — the caller supplies its
    * fleet default.
    */
  def crawlDelays(robots: DataFrame, host: Column, body: Column,
                  agent: String): DataFrame = {
    val g = classified(robots, host, body)
    g.filter(col("kind") === "delay" && col("v").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .join(groupFlags(g, agent), Seq("host", "gid"))
      .filter(applies)
      .groupBy(col("host"))
      .agg(max(floor(col("v").cast("double") * 1000).cast("long"))
        .as("delay_ms"))
  }

  /** Politeness schedule for a fetch queue: per host, URLs take slots
    * in deterministic (path, id) order and slot k fetches at
    * `k · delay_ms` — the earliest schedule honoring the host's
    * Crawl-delay from time zero. One window per host; hosts without a
    * delay directive use `defaultDelayMs`. Appends (slot, fetch_at_ms).
    */
  def politenessSchedule(urls: DataFrame, id: Column, url: Column,
                         delays: DataFrame, defaultDelayMs: Long): DataFrame = {
    val u = urls.withColumn("__ps_h", UrlOps.host(url))
      .withColumn("__ps_p", UrlOps.path(url))
    val w = Window.partitionBy(col("__ps_h"))
      .orderBy(col("__ps_p"), id)
    u.join(broadcast(delays.select(col("host").as("__ps_h"),
        col("delay_ms").as("__ps_d"))), Seq("__ps_h"), "left")
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_at_ms",
        col("slot") * coalesce(col("__ps_d"), lit(defaultDelayMs)))
      .drop("__ps_h", "__ps_p", "__ps_d")
  }

  /** The applicable rules collapsed to ONE row per host:
    * (host, rules array<struct<prefix, allow>>) — the shape a crawler
    * CACHES robots decisions in, and the shape a STREAMING screen
    * needs: the per-URL longest-match verdict becomes a pure
    * expression over the joined array (see [[verdict]]), so the
    * screen is one stream-static equi-join with no aggregation state.
    */
  def hostRules(robots: DataFrame, host: Column, body: Column,
                agent: String): DataFrame =
    rulesFor(robots, host, body, agent)
      .groupBy(col("host"))
      .agg(collect_list(struct(col("prefix"), col("allow"))).as("rules"))

  /** Longest-match verdict for `path` over a [[hostRules]] array —
    * a fold that keeps the best (longest prefix, Allow on ties) rule;
    * NULL rules (host absent) or no matching rule → allowed. Pure
    * column arithmetic: usable per-row in a stream.
    */
  def verdict(rules: Column, path: Column): Column = {
    val matched = filter(coalesce(rules,
        array().cast("array<struct<prefix:string,allow:boolean>>")),
      r => substring(path, lit(1), length(r.getField("prefix"))) ===
        r.getField("prefix"))
    val best = aggregate(matched,
      struct(lit(-1).as("l"), lit(true).as("allow")),
      (acc, r) => {
        val rl = length(r.getField("prefix"))
        val better = (rl > acc.getField("l")) ||
          (rl === acc.getField("l") && r.getField("allow"))
        when(better, struct(rl.as("l"), r.getField("allow").as("allow")))
          .otherwise(acc)
      })
    when(size(matched) === 0, lit(true)).otherwise(best.getField("allow"))
  }

  /** Screen candidate URLs against per-host robots bodies: `df` plus
    * `allowed` and `rule_len` (length of the winning rule's prefix;
    * NULL = no rule matched → allowed by default).
    */
  def screen(df: DataFrame, id: Column, url: Column,
             robots: DataFrame, rhost: Column, body: Column,
             agent: String): DataFrame = {
    // One broadcast join + a row-expression verdict (r17): the rules
    // were ALREADY assumed broadcast-sized, so folding them to one
    // (host, rules array) row per host and taking the longest-match
    // argmax with array_max over the matched prefixes removes both
    // corpus shuffles of the previous shape (theta-join → groupBy(id)
    // → join back to df, which also re-planned df's subtree twice).
    // array_max over struct(l, allow) keeps the exact max(struct)
    // ordering — longest prefix wins, equal-length Allow beats
    // Disallow (the tie-break gate q148 pins).
    val rules = rulesFor(robots, rhost, body, agent)
    val hostRules = rules.groupBy(col("host"))
      .agg(collect_list(struct(col("prefix"), col("allow"))).as("__rules"))
    val matched = filter(col("__rules"),
      r => col("__r_p").startsWith(r.getField("prefix")))
    val best = array_max(transform(matched,
      r => struct(length(r.getField("prefix")).as("l"),
        r.getField("allow").as("allow"))))
    df.withColumn("__r_h", UrlOps.host(url))
      .withColumn("__r_p", UrlOps.path(url))
      .join(broadcast(hostRules), col("__r_h") === col("host"), "left")
      .withColumn("__best", best)
      .withColumn("allowed", coalesce(col("__best.allow"), lit(true)))
      .withColumn("rule_len", col("__best.l"))
      .drop("__r_h", "__r_p", "host", "__rules", "__best")
  }
}
