package graft

import graft.CoreQueries.Q
import graft.ext.UnigramLm

/** Round-13 extension gates (q198+): lattice-DP unigram-LM training
  * over realistic word lengths — the forward-backward E-step of Kudo
  * 2018 §3.2 proper, replacing the exhaustive breakpoint-mask
  * enumeration whose HUGEINT bound pinned the round-12 face to
  * [a-z]{1,3}. The lattice face trains on [a-z]{1,8} (which covers
  * 100% of the gate corpus's whitespace tokens), on the 2^10 weight
  * grid that keeps every intermediate cross-engine HUGEINT-safe at
  * L = 8 (see [[graft.ext.UnigramLm]]'s bound derivation). Same
  * contract as [[ExtQueries]]: every gate pairs a Spark face with a
  * DuckDB oracle mirroring the exact arithmetic term for term.
  */
object ExtQueries3 {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.table(s, dir, name)

  private val LWG = 1024L           // UnigramLm.LatticeWeightGrid
  private val MaxLen = 8            // lattice word/piece length cap

  /** WG^(l−1) as a HUGEINT literal (1024^7 = 2^70 overflows BIGINT,
    * so the powers are emitted as decimal strings).
    */
  private def powCase(c: String): String =
    (1 to MaxLen).map(l =>
        s"WHEN $l THEN CAST(${BigInt(LWG).pow(l - 1)} AS HUGEINT)")
      .mkString(s"(CASE $c ", " ", " END)")

  /** Base CTEs of the lattice oracle: the [a-z]{1,8} word universe
    * with HUGEINT frequencies, the capped piece-occurrence table
    * (word, start, len, piece), and the seed weights — substring
    * occurrence counts renormalized onto the 2^10 grid. Mirrors
    * [[UnigramLm.trainLattice]]'s seeding exactly.
    */
  private def latticeBaseCtes(src: String): String =
    s"""ltok AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
       |         FROM $src),
       |lwc AS (SELECT w, CAST(count(*) AS HUGEINT) AS f FROM ltok
       |        WHERE regexp_matches(w, '^[a-z]{1,$MaxLen}$$') GROUP BY w),
       |locc AS MATERIALIZED (SELECT w, f, CAST(s AS INT) AS s, CAST(l AS INT) AS l,
       |                substring(w, CAST(s + 1 AS INT), CAST(l AS INT)) AS p
       |         FROM lwc,
       |         LATERAL (SELECT unnest(generate_series(0, length(w) - 1)) AS s) ss,
       |         LATERAL (SELECT unnest(generate_series(1,
       |                    least(length(w) - s, $MaxLen))) AS l) ll),
       |lcp AS MATERIALIZED (SELECT p, CAST(sum(f) AS HUGEINT) AS c FROM locc GROUP BY p),
       |ltt AS (SELECT CAST(sum(c) AS HUGEINT) AS t FROM lcp),
       |lw0 AS MATERIALIZED (SELECT p, (c * $LWG) // t AS wt FROM lcp, ltt)""".stripMargin

  /** One exact-integer lattice EM iteration in SQL, reading weights
    * from CTE `prevW` and emitting `lw$n`. The forward DP unrolls as
    * position-chained CTEs la${n}_0..la${n}_8 (α(e) sums
    * α(s)·wt·WG^(l−1) over occurrences ending at e — every
    * dependency is on a strictly smaller position, so the chain is
    * acyclic); the backward DP chains on distance-from-end
    * lb${n}_0..lb${n}_8. The E-step floor-divides the exact
    * per-occurrence segmentation mass α(s)·wt·WG^(l−1)·β(e) once per
    * occurrence on the 10^6 count grid — mirrors
    * [[UnigramLm.trainLattice]]'s emStepLattice term for term.
    */
  private def latticeIterBlock(n: Int, prevW: String): String = {
    val ow = s"low$n"
    val alpha = (1 to MaxLen).map { e =>
      s"""la${n}_$e AS MATERIALIZED (SELECT * FROM la${n}_${e - 1} UNION ALL
         |  SELECT o.w, CAST($e AS INT) AS i,
         |         CAST(sum(pa.a * o.wt * o.pl) AS HUGEINT) AS a
         |  FROM $ow o JOIN la${n}_${e - 1} pa ON pa.w = o.w AND pa.i = o.s
         |  WHERE o.s + o.l = $e GROUP BY o.w)""".stripMargin
    }.mkString(",\n")
    val beta = (1 to MaxLen).map { k =>
      s"""lb${n}_$k AS MATERIALIZED (SELECT * FROM lb${n}_${k - 1} UNION ALL
         |  SELECT o.w, o.s AS j,
         |         CAST(sum(o.wt * o.pl * nb.b) AS HUGEINT) AS b
         |  FROM $ow o JOIN lb${n}_${k - 1} nb ON nb.w = o.w AND nb.j = o.s + o.l
         |  WHERE o.s = length(o.w) - $k GROUP BY o.w, o.s)""".stripMargin
    }.mkString(",\n")
    s"""$ow AS MATERIALIZED (SELECT o.w, o.f, o.s, o.l, o.p, pw.wt, ${powCase("o.l")} AS pl
       |        FROM locc o JOIN $prevW pw ON o.p = pw.p WHERE pw.wt > 0),
       |la${n}_0 AS (SELECT w, CAST(0 AS INT) AS i, CAST(1 AS HUGEINT) AS a
       |             FROM lwc),
       |$alpha,
       |lb${n}_0 AS (SELECT w, CAST(length(w) AS INT) AS j,
       |                    CAST(1 AS HUGEINT) AS b FROM lwc),
       |$beta,
       |lz$n AS (SELECT w, a AS z FROM la${n}_$MaxLen WHERE i = length(w)),
       |le$n AS (SELECT o.p,
       |           sum((o.f * (pa.a * o.wt * o.pl * nb.b) * 1000000) // z.z) AS ec
       |         FROM $ow o
       |         JOIN la${n}_$MaxLen pa ON pa.w = o.w AND pa.i = o.s
       |         JOIN lb${n}_$MaxLen nb ON nb.w = o.w AND nb.j = o.s + o.l
       |         JOIN lz$n z ON z.w = o.w
       |         WHERE z.z > 0
       |         GROUP BY o.p),
       |let$n AS (SELECT CAST(sum(ec) AS HUGEINT) AS et FROM le$n),
       |lw$n AS MATERIALIZED (SELECT p, (ec * $LWG) // et AS wt FROM le$n, let$n)""".stripMargin
  }

  /** Lattice-DP unigram-LM vocabulary induction
    * ([[UnigramLm.trainLattice]]): two exact-integer EM iterations
    * over the [a-z]{1,8} word universe via the forward-backward DP,
    * unrolled verbatim in SQL. Every arithmetic step is integer —
    * 2^10-grid renormalization, DP accumulation, per-occurrence
    * posterior floor-divisions — so the learned weights hash-match
    * cross-engine with no float anywhere. This is the face that
    * trains on realistic word lengths: at sf0.01 the [a-z]{1,8}
    * universe covers every whitespace token of the corpus, where the
    * round-12 [a-z]{1,3} face covered ~20%.
    */
  val q198 = Q(
    "q198_unigram_lattice",
    (s, dir) => {
      import s.implicits._
      UnigramLm.trainLattice(t(s, dir, "documents"), $"text",
          maxWordLen = MaxLen, maxPieceLen = MaxLen, iters = 2)
        .toDF("piece", "weight")
        .orderBy($"piece")
    },
    Some(s"""WITH ${latticeBaseCtes("documents")},
            |${latticeIterBlock(1, "lw0")},
            |${latticeIterBlock(2, "lw1")}
            |SELECT p AS piece, CAST(wt AS BIGINT) AS weight
            |FROM lw2 WHERE wt > 0 ORDER BY piece""".stripMargin))

  /** The full SentencePiece prune loop on the lattice face
    * ([[UnigramLm.trainLatticePruned]]): 2 lattice EM passes, one
    * vocabulary cut — keep every single-codepoint piece plus the 16
    * best multi-codepoint pieces by (weight DESC, piece ASC) — then
    * one more EM pass over the survivors, with the pruned pieces'
    * probability mass redistributing. The q193 recipe lifted to the
    * DP face.
    */
  val q199 = Q(
    "q199_lattice_prune",
    (s, dir) => {
      import s.implicits._
      UnigramLm.trainLatticePruned(t(s, dir, "documents"), $"text",
          maxWordLen = MaxLen, maxPieceLen = MaxLen,
          emIters = 2, keepMulti = 16, postIters = 1)
        .toDF("piece", "weight")
        .orderBy($"piece")
    },
    Some(s"""WITH ${latticeBaseCtes("documents")},
            |${latticeIterBlock(1, "lw0")},
            |${latticeIterBlock(2, "lw1")},
            |lpr AS MATERIALIZED (SELECT p, wt FROM lw2 WHERE length(p) = 1
            |        UNION ALL
            |        SELECT p, wt FROM (
            |          SELECT p, wt,
            |                 row_number() OVER (ORDER BY wt DESC, p) AS rn
            |          FROM lw2 WHERE length(p) > 1 AND wt > 0) rk
            |        WHERE rn <= 16),
            |${latticeIterBlock(3, "lpr")}
            |SELECT p AS piece, CAST(wt AS BIGINT) AS weight
            |FROM lw3 WHERE wt > 0 ORDER BY piece""".stripMargin))

  /** Word-count-ledger maintenance composed with the lattice trainer:
    * build the ledger on two thirds of the corpus at maxWordLen = 8,
    * admit the held-out third, retrain via
    * [[UnigramLm.trainLatticeFromLedger]] — and the result must equal
    * training from scratch on the full corpus (q198's oracle
    * VERBATIM, the q194 discipline). Pins that the ledger algebra and
    * the structural maxWordLen binding compose with the DP face.
    */
  val q200 = Q(
    "q200_lattice_admit",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val state = UnigramLm.ledger(docs.filter($"doc_id" % 3 =!= 0),
        $"text", maxWordLen = MaxLen)
      UnigramLm.trainLatticeFromLedger(
          UnigramLm.admit(state, docs.filter($"doc_id" % 3 === 0), $"text"),
          maxPieceLen = MaxLen, iters = 2)
        .toDF("piece", "weight")
        .orderBy($"piece")
    },
    q198.oracle)

  val all: Seq[Q] = Seq(q198, q199, q200)
}
