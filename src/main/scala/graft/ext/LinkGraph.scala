package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-level link-graph analytics — the web-graph quality prior that
  * large-scale curation pipelines (Common Crawl ranking, URL-level
  * quality filtering) attach to every crawled document.
  *
  * The reference has no graph surface (its corpus is two flat CSV
  * feeds); this module is part of the LLM-pipeline extension surface.
  * The input is an edge list (src_host, dst_host) — typically built by
  * extracting link targets from crawled HTML and reducing them to
  * registered hosts with [[UrlOps.host]] — and the output is a
  * per-host PageRank score usable as a join-side quality prior in the
  * Gopher/CCNet-style cascades.
  *
  * Scale shape (the 100 TB story): every iteration is ONE shuffle —
  * the edge list joins the current rank vector on `src` (both sides
  * hash-partitioned on the same key, so the edge side's exchange is
  * reusable across iterations) and aggregates contributions by `dst`.
  * The dangling-node mass is a one-row aggregate crossJoin-broadcast
  * back onto the rank vector, never a driver-side collect. State per
  * iteration is one row per host (the rank vector) — at web scale
  * ~10^8 rows, far below the edge count, and the whole loop is
  * edge-proportional with a fixed iteration count.
  *
  * Determinism (the oracle-gate discipline): per-edge contribution
  * terms and the dangling mass are quantized onto an exact integer
  * grid — `floor(term * 1e15)` — BEFORE summing, so the aggregation
  * is an exact integer sum: order- and partition-invariant AND
  * engine-portable. The grid step is pure IEEE double arithmetic
  * (multiply, floor), which every engine computes bit-identically;
  * a direct double→DECIMAL cast is NOT portable (Spark rounds the
  * shortest decimal representation half-up, DuckDB scales in double),
  * and that 1-ulp divergence is exactly what the grid removes. The
  * scaled sums stay below 2^53 because total rank mass is ≤ 1, so the
  * sum-of-longs → double cast is exact at any corpus size. All other
  * arithmetic is straight-line IEEE double with a fixed expression
  * tree mirrored in the oracle SQL.
  */
object LinkGraph {

  /** Deterministic PageRank over a directed host graph.
    *
    * Multi-edges are collapsed (DISTINCT src→dst) so out-degree is the
    * count of distinct link targets; self-loops are kept as given.
    * Dangling nodes (no out-edges) redistribute their mass uniformly,
    * the textbook formulation:
    *
    *   r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/odeg(u) + d·(Σ_dangling r)/N
    *
    * @param edges  edge list; only `srcCol`/`dstCol` are read
    * @param iters  fixed power-iteration count (callers needing
    *               convergence detection compare successive outputs)
    * @return one row per host: (host STRING, rank DOUBLE); ranks sum
    *         to ~1 up to the quantization grid
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()

    val nodes = e.select($"src".as("host"))
      .unionAll(e.select($"dst".as("host")))
      .distinct()
      .cache()
    val n = nodes.count() // bounded driver scalar: one row per host
    require(n > 0, "pageRank: empty edge list")

    val outdeg = e.groupBy($"src").agg(count(lit(1)).as("odeg"))
    // Join edges to out-degrees once; the loop reuses this DataFrame so
    // the (src-keyed) exchange below it is reused across iterations.
    val eDeg = e.join(outdeg, "src")

    val base = (1.0 - damping) / n
    val grid = 1.0e15
    var ranks = nodes.select($"host", lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val dm = ranks
        .join(outdeg, ranks("host") === outdeg("src"), "left_anti")
        .agg((coalesce(sum(floor($"rank" * lit(grid))), lit(0L))
          .cast("double") / lit(grid)).as("dm"))
      val contrib = eDeg
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .groupBy($"dst")
        .agg((sum(floor(((lit(damping) * $"rank") / $"odeg") * lit(grid)))
          .cast("double") / lit(grid)).as("csum"))
      ranks = nodes
        .join(contrib, nodes("host") === contrib("dst"), "left")
        .crossJoin(broadcast(dm))
        .select(nodes("host"),
          (coalesce($"csum", lit(0.0)) +
            (lit(base) + (lit(damping) * $"dm") / lit(n.toDouble))).as("rank"))
        // Truncate lineage: each iteration references the previous rank
        // vector three times (dangling mass, contributions, carry), so
        // an unbroken plan grows ~3^iters and analysis time explodes.
        // The rank vector is host-sized state — materializing it per
        // iteration is the cheap side of the loop, and values are
        // unaffected.
        .localCheckpoint(true)
    }
    ranks
  }

  /** Unrolled DuckDB mirror of [[pageRank]] for oracle gates: the SQL
    * is GENERATED per iteration from the same formula so the two
    * engines share a single source of truth for the expression tree.
    * `edgesCte` must define a relation `e(src, dst)` (already
    * distinct). Damping is emitted as a SQL literal; pass values with
    * short exact decimal forms (0.85, 0.5, …) so the literal parses to
    * the identical IEEE double the Scala side uses.
    */
  def pageRankOracleSql(edgesCte: String, iters: Int, damping: Double): String = {
    // DuckDB parses bare numeric literals as DECIMAL and computes
    // (1.0 - 0.85) EXACTLY — Scala computes it in IEEE doubles — so
    // every literal is cast to DOUBLE before any arithmetic touches it.
    val d = s"CAST(${damping.toString} AS DOUBLE)"
    val nD = "(SELECT CAST(n AS DOUBLE) FROM nn)"
    val it = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""d$i AS (SELECT CAST(coalesce(sum(CAST(floor(rank * 1.0e15) AS BIGINT)), 0) AS DOUBLE) / 1.0e15 AS dm
         |        FROM $p WHERE host NOT IN (SELECT src FROM outdeg)),
         |c$i AS (SELECT dst, CAST(sum(CAST(floor((($d * rank) / odeg) * 1.0e15) AS BIGINT)) AS DOUBLE) / 1.0e15 AS csum
         |        FROM e JOIN outdeg USING (src) JOIN $p ON $p.host = e.src
         |        GROUP BY dst),
         |r$i AS (SELECT nodes.host,
         |               coalesce(c$i.csum, 0.0) +
         |                 ((CAST(1.0 AS DOUBLE) - $d) / $nD +
         |                  ($d * d$i.dm) / $nD) AS rank
         |        FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.host, d$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |nodes AS (SELECT DISTINCT host FROM
       |            (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |outdeg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       |r0 AS (SELECT host, CAST(1.0 AS DOUBLE) / $nD AS rank FROM nodes),
       |$it
       |SELECT host, rank FROM r$iters ORDER BY host""".stripMargin
  }

  /** TrustRank — personalized PageRank whose reset (and dangling)
    * mass flows ONLY to a trusted seed set instead of uniformly to
    * all hosts (Gyöngyi et al., VLDB 2004: propagate trust from a
    * hand-vetted seed list; hosts reachable mostly from spam get
    * scores near zero). The standard host-level spam screen for crawl
    * curation: join the scores onto documents and drop (or
    * down-weight) hosts below a trust floor.
    *
    *   r'(v) = (1−d)·p(v) + d·Σ_{u→v} r(u)/odeg(u) + d·(Σ_dangling r)·p(v)
    *
    * where p(v) = 1/|S| for seed hosts, 0 otherwise; r₀ = p. Same
    * per-iteration shuffle shape, integer-grid quantization, and
    * lineage truncation as [[pageRank]]. Seeds not present in the
    * graph still receive reset mass (they are added as nodes), so a
    * vetted-but-unlinked host keeps a nonzero score.
    *
    * @param seeds one string column of trusted hosts
    */
  def trustRank(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, iters: Int,
                damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()
    val seedHosts = seeds.select(seeds.columns.head)
      .select(col(seeds.columns.head).cast("string").as("host"))
      .distinct()

    val nodes = e.select($"src".as("host"))
      .unionAll(e.select($"dst".as("host")))
      .unionAll(seedHosts)
      .distinct()
      .cache()
    val ns = seedHosts.count() // bounded: the vetted seed list
    require(ns > 0, "trustRank: empty seed set")

    val seedP = 1.0 / ns
    val nodesP = nodes
      .join(seedHosts.withColumnRenamed("host", "__seed"),
        nodes("host") === col("__seed"), "left")
      .select(nodes("host"),
        when(col("__seed").isNotNull, lit(seedP)).otherwise(lit(0.0)).as("p"))
      .cache()

    val outdeg = e.groupBy($"src").agg(count(lit(1)).as("odeg"))
    val eDeg = e.join(outdeg, "src")

    val oneMinusD = 1.0 - damping
    val grid = 1.0e15
    var ranks = nodesP.select($"host", $"p".as("rank"))
    for (_ <- 1 to iters) {
      val dm = ranks
        .join(outdeg, ranks("host") === outdeg("src"), "left_anti")
        .agg((coalesce(sum(floor($"rank" * lit(grid))), lit(0L))
          .cast("double") / lit(grid)).as("dm"))
      val contrib = eDeg
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .groupBy($"dst")
        .agg((sum(floor(((lit(damping) * $"rank") / $"odeg") * lit(grid)))
          .cast("double") / lit(grid)).as("csum"))
      ranks = nodesP
        .join(contrib, nodesP("host") === contrib("dst"), "left")
        .crossJoin(broadcast(dm))
        .select(nodesP("host"),
          (coalesce($"csum", lit(0.0)) +
            (lit(oneMinusD) * $"p" + (lit(damping) * $"dm") * $"p")).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Unrolled DuckDB mirror of [[trustRank]]. `graphCte` must define
    * `e(src, dst)` (distinct) AND `s(host)` (the distinct seed set).
    */
  def trustRankOracleSql(graphCte: String, iters: Int, damping: Double): String = {
    val d = s"CAST(${damping.toString} AS DOUBLE)"
    val it = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""d$i AS (SELECT CAST(coalesce(sum(CAST(floor(rank * 1.0e15) AS BIGINT)), 0) AS DOUBLE) / 1.0e15 AS dm
         |        FROM $p WHERE host NOT IN (SELECT src FROM outdeg)),
         |c$i AS (SELECT dst, CAST(sum(CAST(floor((($d * rank) / odeg) * 1.0e15) AS BIGINT)) AS DOUBLE) / 1.0e15 AS csum
         |        FROM e JOIN outdeg USING (src) JOIN $p ON $p.host = e.src
         |        GROUP BY dst),
         |r$i AS (SELECT np.host,
         |               coalesce(c$i.csum, 0.0) +
         |                 ((CAST(1.0 AS DOUBLE) - $d) * np.p +
         |                  ($d * d$i.dm) * np.p) AS rank
         |        FROM np LEFT JOIN c$i ON c$i.dst = np.host, d$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCte,
       |nodes AS (SELECT DISTINCT host FROM
       |            (SELECT src AS host FROM e UNION ALL SELECT dst FROM e
       |             UNION ALL SELECT host FROM s)),
       |sn AS (SELECT count(*) AS ns FROM s),
       |np AS (SELECT nodes.host,
       |              CASE WHEN nodes.host IN (SELECT host FROM s)
       |                THEN CAST(1.0 AS DOUBLE) / (SELECT CAST(ns AS DOUBLE) FROM sn)
       |                ELSE CAST(0.0 AS DOUBLE) END AS p
       |       FROM nodes),
       |outdeg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       |r0 AS (SELECT host, p AS rank FROM np),
       |$it
       |SELECT host, rank FROM r$iters ORDER BY host""".stripMargin
  }

  /** Host-level edge extraction from crawled HTML: every absolute
    * http(s) `href` target reduced to its lowercased host via
    * [[UrlOps.host]], distinct per (document host → target host).
    * Narrow per-row work (regexp + explode) — no shuffle until the
    * final distinct, which is the edge-list dedup any graph build
    * pays. Relative links carry no cross-host signal and are skipped.
    */
  def hostEdgesFromHtml(docs: DataFrame, srcHost: Column, html: Column): DataFrame =
    docs
      .select(srcHost.cast("string").as("src"),
        explode(regexp_extract_all(html,
          lit("(?i)href\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1))).as("__target"))
      .filter(col("__target").rlike("(?i)^https?://"))
      .select(col("src"), UrlOps.host(col("__target")).as("dst"))
      .filter(col("dst").isNotNull && col("dst") =!= "")
      .distinct()
}
