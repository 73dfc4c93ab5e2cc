package graft

import graft.CoreQueries.Q
import graft.ExtQueries3.{cjk, cyr, greek, latticeIterBlock, latticeSeedCtes,
  latticeViterbiCtes, sparkPick, sqlPick, MaxLen}
import graft.ext.UnigramLm

/** Round-14 extension gates (q213+): MULTILINGUAL lattice unigram-LM
  * training — the byte-symbol lift of the q198 trainer (VERDICT r13
  * item 1). The [a-z]{1,8} face cannot learn a single non-Latin
  * piece; here every whitespace token of ≤ 8 UTF-8 bytes, any script,
  * maps to its byte-symbol string ([[graft.functions.ByteBpeUtil]]'s
  * chr(0x100+b) placeholder alphabet — the GPT-2 byte trick the q201
  * oracle already mirrors) and the UNCHANGED lattice DP trains over
  * symbols. Both gates run on q201's planted Greek/Cyrillic/CJK
  * fixture, so the learned vocabulary provably contains multibyte
  * non-Latin pieces and the serve side provably does NOT fall back on
  * them. Same contract as every gate file: the DuckDB oracle mirrors
  * the exact integer arithmetic term for term.
  */
object ExtQueries4 {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Tables.table(s, dir, name)

  // ---- the shared multilingual fixture (q201's planting, verbatim) --

  /** The planted multilingual frame: every third document gets a Greek
    * trigram, a Cyrillic bigram, and a CJK bigram appended,
    * arithmetically chosen so both engines plant identical text.
    */
  private def plantedDocs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    import org.apache.spark.sql.functions.{concat, lit}
    t(s, dir, "documents").filter($"doc_id" % 3 === 0)
      .select($"doc_id", concat($"text",
        lit(" "), sparkPick(greek, 1), sparkPick(greek, 7), sparkPick(greek, 3),
        lit(" "), sparkPick(cyr, 1), sparkPick(cyr, 5),
        lit(" "), sparkPick(cjk, 1), sparkPick(cjk, 11)).as("text"))
  }

  // no continuation line may START with '||': gate oracles interpolate
  // this into an outer stripMargin string, which would eat the first
  // bar and leave a bare '|' operator
  private val dCte: String =
    s"""d AS (SELECT doc_id,
       |             text || ' ' || ${sqlPick(greek, 1)} || ${sqlPick(greek, 7)} || ${sqlPick(greek, 3)} ||
       |             ' ' || ${sqlPick(cyr, 1)} || ${sqlPick(cyr, 5)} ||
       |             ' ' || ${sqlPick(cjk, 1)} || ${sqlPick(cjk, 11)} AS text
       |      FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  // ---- byte-symbol lattice base CTEs ---------------------------------

  /** The 256-row byte↦placeholder-char map (the q201 recipe):
    * hex pair → chr(256 + byte).
    */
  private val byteMapCte: String =
    s"""bm(h, c) AS (VALUES ${(0 until 256).map(b =>
         f"('$b%02X', chr(${256 + b}))").mkString(",")})""".stripMargin

  /** Base CTEs of the byte-face lattice oracle: whitespace tokens of
    * ≤ MaxLen UTF-8 bytes (ANY script — the charset filter of the
    * [a-z] face replaced by an octet-length bound), mapped to their
    * byte-symbol strings through hex(encode(w)), then the SHARED
    * [[ExtQueries3.latticeSeedCtes]] over the symbol universe. A
    * symbol string's character length IS the word's octet count, so
    * the q198 HUGEINT bound derivation applies verbatim at L = 8.
    * Keeps `lmap` (raw word → symbol string) around for serve-side
    * joins.
    */
  private val latticeBytesBaseCtes: String =
    s"""ltok AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS rw
       |         FROM d),
       |lraw AS MATERIALIZED (SELECT rw, CAST(count(*) AS HUGEINT) AS f FROM ltok
       |        WHERE rw <> '' AND strlen(rw) <= $MaxLen GROUP BY rw),
       |$byteMapCte,
       |bs AS (SELECT rw, i, bm.c
       |       FROM (SELECT rw,
       |                    unnest(regexp_extract_all(hex(encode(rw)), '..')) AS h,
       |                    generate_subscripts(
       |                      regexp_extract_all(hex(encode(rw)), '..'), 1) AS i
       |             FROM lraw) u JOIN bm USING (h)),
       |lmap AS MATERIALIZED (SELECT rw, string_agg(c, '' ORDER BY i) AS w
       |        FROM bs GROUP BY rw),
       |lwc AS MATERIALIZED (SELECT w, CAST(sum(f) AS HUGEINT) AS f
       |       FROM lraw JOIN lmap USING (rw) GROUP BY w),
       |$latticeSeedCtes""".stripMargin

  /** Multilingual lattice-DP unigram-LM training
    * ([[UnigramLm.trainLatticeBytes]]): two exact-integer EM
    * iterations over the byte-symbol universe of q201's planted
    * Greek/Cyrillic/CJK fixture. The oracle rebuilds each ≤8-byte
    * word's symbol string from hex(encode(w)) through the
    * chr(256+byte) table and runs the q198 lattice CTE chain
    * UNCHANGED over symbols — the learned pieces (byte sequences,
    * including the multibyte UTF-8 prefixes of the planted scripts)
    * hash-match cross-engine with no float anywhere. This is the
    * trainer that serves a real multilingual corpus: where the
    * [a-z]{1,8} face drops every non-Latin word from the training
    * universe, this one learns Greek/Cyrillic/CJK pieces from the
    * same fixture (LatticeBytesSpec pins that the vocabulary contains
    * whole planted words as pieces).
    */
  val q213 = Q(
    "q213_lattice_bytes",
    (s, dir) => {
      import s.implicits._
      UnigramLm.trainLatticeBytes(plantedDocs(s, dir), $"text",
          maxWordBytes = MaxLen, maxPieceLen = MaxLen, iters = 2)
        .toDF("piece", "weight")
        .orderBy($"piece")
    },
    Some(s"""WITH $dCte,
            |$latticeBytesBaseCtes,
            |${latticeIterBlock(1, "lw0")},
            |${latticeIterBlock(2, "lw1")}
            |SELECT p AS piece, CAST(wt AS BIGINT) AS weight
            |FROM lw2 WHERE wt > 0 ORDER BY piece""".stripMargin))

  /** The byte-face SERVE side with a per-script fallback breakdown —
    * the gate that pins "multilingual words do not fall back": train
    * (q213's chain), build the Viterbi (word, n_pieces) table over
    * byte symbols ([[UnigramLm.encodeTableLatticeBytes]]), then
    * measure fertility per SCRIPT CLASS (a token is `nonlatin` iff
    * its UTF-8 octet count exceeds its codepoint count) through
    * [[graft.ext.TokenizerEval.fertility]]. The `nonlatin` row's
    * n_fallback must hash-match ZERO — every planted Greek/Cyrillic/
    * CJK token trains and serves (the [a-z] face fell back on 100% of
    * them); `latin`-row fallback counts exactly the >8-byte English
    * words. Fallback pieces are octet counts (byte-symbol codepoint
    * fallback), mirrored as coalesce(np, length(rw)) with np from the
    * symbol-string Viterbi.
    */
  val q214 = Q(
    "q214_lattice_bytes_fertility",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val d = plantedDocs(s, dir)
      val vocab = UnigramLm.trainLatticeBytes(d, $"text",
        maxWordBytes = MaxLen, maxPieceLen = MaxLen, iters = 2)
      val universe = UnigramLm.wordCountsBytes(d, $"text", MaxLen)
        .select($"word").as[String].collect().toSeq.sorted
      val table = UnigramLm.encodeTableLatticeBytes(universe, vocab.toMap, MaxLen)
        .toDF("word", "n_pieces")
      val toks = d.select(
        explode(split(lower(trim($"text")), "\\s+")).as("w"))
      graft.ext.TokenizerEval.fertility(toks,
          when(octet_length($"w") > length($"w"), lit("nonlatin"))
            .otherwise(lit("latin")), $"w", table)
        .select($"grp".as("script"), $"n_words", $"n_pieces",
          $"n_fallback", $"fertility")
        .orderBy($"script")
    },
    Some(s"""WITH $dCte,
            |$latticeBytesBaseCtes,
            |${latticeIterBlock(1, "lw0")},
            |${latticeIterBlock(2, "lw1")},
            |$latticeViterbiCtes,
            |ft AS (SELECT t.rw,
            |              CASE WHEN strlen(t.rw) > length(t.rw)
            |                   THEN 'nonlatin' ELSE 'latin' END AS script,
            |              vnp.np, CAST(length(t.rw) AS BIGINT) AS chars
            |       FROM ltok t
            |       LEFT JOIN lmap m ON m.rw = t.rw
            |       LEFT JOIN vnp ON vnp.w = m.w)
            |SELECT script,
            |       CAST(count(*) AS BIGINT) AS n_words,
            |       CAST(sum(coalesce(np, chars)) AS BIGINT) AS n_pieces,
            |       CAST(sum(CASE WHEN np IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            |         AS n_fallback,
            |       CAST(sum(coalesce(np, chars)) AS DOUBLE) / count(*)
            |         AS fertility
            |FROM ft GROUP BY script ORDER BY script""".stripMargin))

  val all: Seq[Q] = Seq(q213, q214)
}
