package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
}
