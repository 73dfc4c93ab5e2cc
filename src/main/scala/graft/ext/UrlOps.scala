package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  * Component parsing:
  *   - userinfo (`user:pw@`) is stripped from the authority before
  *     host/port extraction
  *   - bracketed IPv6 hosts (`[::1]:8080`) yield the bare address
  *   - the query is anchored AFTER authority + path, so a '?' inside
  *     a fragment (`#a?b`) is never mistaken for a query
  *
  * Normalization applied by [[normalized]]:
  *   - scheme and host lowercased (path/query case is significant)
  *   - default ports stripped (http:80, https:443); others kept
  *   - fragment dropped
  *   - `utm_*` tracking parameters dropped — matched only at a
  *     parameter boundary (`(^|&)utm_`), so `utm_` INSIDE a name or
  *     value is never touched — and `?`/`&` separators healed
  *   - empty path becomes `/`
  */
object UrlOps {

  private val auth = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** authority with any userinfo prefix stripped (the authority cannot
    * contain '/', so a greedy up-to-'@' strip is exact).
    */
  private def hostPort(url: Column): Column =
    regexp_replace(regexp_extract(url, auth, 1), "^[^@]*@", "")

  /** scheme, lowercased. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** host, lowercased, userinfo and port stripped; bracketed IPv6
    * literals yield the bare address.
    */
  def host(url: Column): Column = {
    val a = lower(hostPort(url))
    when(substring(a, 1, 1) === "[",
      regexp_extract(a, "^\\[([^\\]]*)\\]", 1))
      .otherwise(regexp_extract(a, "^([^:]+)", 1))
  }

  /** explicit port as a string; '' when absent (anchored at the end of
    * the authority, so it is IPv6- and userinfo-safe).
    */
  def portStr(url: Column): Column =
    regexp_extract(hostPort(url), ":([0-9]+)$", 1)

  /** path component ('' when absent — see [[normalized]] for the
    * canonical '/' form).
    */
  def path(url: Column): Column =
    regexp_extract(url, auth + "([^?#]*)", 2)

  /** query string without the '?', tracking params NOT stripped;
    * '' when absent. Anchored after authority + path — a '?' that
    * first appears inside the fragment is not a query.
    */
  def query(url: Column): Column =
    regexp_extract(url, auth + "[^?#]*\\?([^#]*)", 2)

  /** Multi-label public suffixes under which registrations happen one
    * label deeper — a trimmed snapshot of the well-known public-suffix
    * rules covering the high-traffic ccTLD registries (the full PSL is
    * ~10k rules; wildcard `*.x` and exception `!y.x` rules are out of
    * scope for this snapshot). The list is compiled into one codegen'd
    * IN predicate — no lookup table, no join.
    */
  private val multiPartSuffixes: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    // Japan / Korea / Greater China / SE Asia
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "co.id", "or.id", "net.id", "web.id", "ac.id", "sch.id", "go.id", "my.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.th", "in.th", "or.th", "ac.th", "go.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn", "biz.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph",
    // South Asia / Middle East / Africa
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "nic.in",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "biz.pk", "web.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "bel.tr", "k12.tr",
    "web.tr", "av.tr", "dr.tr",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng", "i.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "co.za", "net.za", "org.za", "edu.za", "gov.za", "ac.za", "web.za",
    // Latin America
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "co.ve", "info.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "fin.ec", "med.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy",
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do", "web.do",
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt",
    "co.cr", "or.cr", "ac.cr", "fi.cr", "go.cr", "ed.cr", "sa.cr")

  /** registered domain: the public-suffix boundary plus one label.
    * A trimmed PSL snapshot handles the common 2-label suffixes
    * (`bbc.co.uk` → `bbc.co.uk`, not `co.uk`); everything else uses
    * the standard 2-label gTLD form. A host that IS a public suffix
    * (`co.uk` itself) falls back to the 2-label form.
    */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val last2 = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last3 =!= "" && last2.isin(multiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** query with utm_* params removed — each match anchored at a
    * parameter boundary `(^|&)` so `utm_` inside another parameter's
    * name or value is preserved — then a dangling leading '&' healed.
    */
  private def cleanQuery(q: Column): Column =
    regexp_replace(regexp_replace(q, "(^|&)utm_[^&]*", ""), "^&", "")

  /** UT1-style URL blocklist screen: a rule table
    * `(domain, prefix, rule_id)` where `domain` blocks that host AND
    * every subdomain (dot-suffix match — the blocklist convention:
    * 'example.org' covers 'ads.example.org'), and a non-empty
    * `prefix` narrows the rule to paths starting with it ('' = the
    * whole domain). Returns `df` plus `block_rule` (the smallest
    * matching rule_id — deterministic when rules overlap; NULL =
    * clean) and `blocked`.
    *
    * Scale shape: dot-suffix matching is NOT a join condition — that
    * would be a non-equi OR predicate, which Spark can only plan as a
    * nested-loop join (O(corpus × rules): intractable against a
    * real ~2M-rule blocklist). Instead each host EXPLODES into its
    * bounded dot-suffix chain (`a.b.c` → [a.b.c, b.c, c] — ≤ label
    * count entries, ~5 for real hosts) and the probe is an EQUI-join
    * on the suffix: a broadcast hash join, ~2M-row build side, the
    * corpus never shuffles. The path-prefix narrowing filters the
    * candidate matches after the hash probe. Rule domains are
    * lowercased/trimmed on the build side (blocklist files are
    * mixed-case in the wild; hosts are already lowercased by
    * [[host]]). Semantics mirrored in gate q126's oracle.
    */
  def blockScreen(df: DataFrame, id: Column, url: Column,
                  rules: DataFrame): DataFrame = {
    val probe = df.select(id.as("__bs_id"), host(url).as("__bs_h"),
      path(url).as("__bs_p"))
    // dot-suffix chain: for parts [a,b,c] the suffixes a.b.c, b.c, c
    val parts = split(col("__bs_h"), "\\.")
    val suffixes = transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts)), "."))
    val r = rules.select(lower(trim(col("domain"))).as("__bl_d"),
      col("prefix").as("__bl_p"), col("rule_id").as("__bl_r"))
    val hits = probe
      .select(col("__bs_id"), col("__bs_p"), explode(suffixes).as("__bs_sfx"))
      .join(broadcast(r), col("__bs_sfx") === col("__bl_d"))
      .filter(col("__bl_p") === lit("") ||
        col("__bs_p").startsWith(col("__bl_p")))
      .groupBy(col("__bs_id")).agg(min(col("__bl_r")).as("block_rule"))
    df.join(hits, id === col("__bs_id"), "left")
      .withColumn("blocked", col("block_rule").isNotNull)
      .drop("__bs_id")
  }

  /** Streaming face of [[blockScreen]]: drop blocked rows with ONE
    * broadcast left-anti join whose condition carries the dot-suffix
    * and path-prefix semantics directly — no explode, no
    * re-aggregation, so it is legal and stateless in a streaming
    * chain (micro-batch nested-loop against the broadcast rule
    * table). Same verdicts as [[blockScreen]] (pinned in
    * CrawlPipelineSpec) but O(batch × rules) per micro-batch — the
    * right trade for a stream's batch sizes; the equi-join
    * [[blockScreen]] remains the corpus-scale batch path.
    */
  def blockFiltered(df: DataFrame, url: Column, rules: DataFrame): DataFrame = {
    val h = host(url)
    val p = path(url)
    val r = broadcast(rules.select(lower(trim(col("domain"))).as("__bl_d"),
      col("prefix").as("__bl_p")))
    df.join(r,
      (h === col("__bl_d") || h.endsWith(concat(lit("."), col("__bl_d")))) &&
        (col("__bl_p") === lit("") || p.startsWith(col("__bl_p"))),
      "left_anti")
  }

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
