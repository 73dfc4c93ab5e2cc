package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for LLM training-data pipelines (BASELINE
  * north star; SURVEY.md §7.2 step 9): token counting, character-class
  * stats, stopword ratios, a deterministic language-ID heuristic, and a
  * quality score.
  *
  * Everything here is a pure Column expression built from codegen'd
  * built-ins — no UDFs — so at 100 TB these run inside whole-stage
  * codegen at scan speed, and each has an exact ANSI-SQL mirror for the
  * DuckDB oracle (ExtQueries).
  */
object TextAnalysis {

  /** Whitespace tokenization (the `\s+` regex matches the oracle's
    * string_split_regex exactly).
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Lexical diversity (type-token ratio): distinct lowercased
    * whitespace tokens over total tokens — the within-document
    * complement of the repetition filters: boilerplate, keyword
    * stuffing, and template pages run LOW; generated word salad runs
    * suspiciously HIGH (every token fresh). Integer counts + one IEEE
    * division, zero shuffle (gate q196). Empty text follows the
    * corpus-wide split convention (one empty token → ratio 1.0);
    * treat as a split-count stat like [[mixedScriptStats]].
    */
  def typeTokenStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = split(lower(trim(text)), "\\s+")
    df.select(id.as("id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("ttr",
        col("n_distinct").cast("double") / col("n_tokens").cast("double"))
  }

  def charCount(c: Column): Column = length(c)

  /** Count of characters in a regex class, via length difference (same
    * trick is expressible in DuckDB with regexp_replace(...,'g')).
    */
  def classCount(c: Column, charClass: String): Column =
    length(c) - length(regexp_replace(c, charClass, ""))

  def digitCount(c: Column): Column = classCount(c, "[0-9]")
  def upperCount(c: Column): Column = classCount(c, "[A-Z]")
  def spaceCount(c: Column): Column = classCount(c, " ")

  /** Number of tokens that appear in `words` — native codegen'd
    * expression (the composable size(filter(tokens)) form evaluates an
    * interpreted higher-order filter; langId runs it per language, so
    * the doc pipeline paid seven interpreted passes per row).
    */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    graft.functions.TokenSetCount(c, words)

  /** Small distinctive stopword lists per language. The heuristic is the
    * standard one (score each language's list, take the argmax with a
    * fixed preference order) — deterministic, SQL-expressible.
    */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "una", "y", "es"),
    "fr" -> Seq("le", "les", "une", "et", "est"))

  /** First-wins argmax over (language, score) columns: entry i is the
    * answer when its score is >= every LATER entry's (list order is the
    * tie preference) — the shared chain behind [[langId]] and
    * [[langIdWide]], mirrored as a CASE ladder in the oracles.
    */
  private def argmaxLang(scores: Seq[(String, Column)]): Column =
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), acc) =>
        val rest = scores.drop(i + 1)
        if (rest.isEmpty) acc
        else when(rest.map(r => s >= r._2).reduce(_ && _), lang).otherwise(acc)
    }

  /** n-gram/stopword language-ID: argmax over per-language hit counts,
    * ties resolved by list order.
    */
  def langId(c: Column): Column =
    argmaxLang(langWords.map { case (lang, ws) => lang -> stopwordCount(c, ws) })

  /** Unicode script character classes for the non-Latin branch of
    * [[langIdWide]], as `\x{…}` ranges — the ONE hex-escape syntax
    * Java regex and RE2 share, so the identical pattern string runs in
    * Spark and the DuckDB oracle. The ranges are BMP-only, but the
    * cross-engine identity does NOT depend on a BMP corpus: Spark's
    * `length` counts CODEPOINTS (`UTF8String.numChars` walks UTF-8
    * sequence starts — an astral char is 1, not 2), exactly like
    * DuckDB's `length`, and Java regex matches astral input as single
    * codepoints like RE2 — so both the class counts and the non-space
    * denominator in [[langIdWide]] agree on emoji / CJK-extension-B
    * text too. Gate q97 plants an astral row engineered to FLIP its
    * branch under UTF-16-unit counting, pinning this every round.
    * "ja" deliberately maps the KANA block only — kana is the ja/zh
    * discriminator (Japanese text mixes kana with the CJK ideographs
    * "zh" matches; Chinese text has no kana).
    */
  val scriptClasses: Seq[(String, String)] = Seq(
    "ru" -> "[\\x{0400}-\\x{04FF}]",
    "el" -> "[\\x{0370}-\\x{03FF}]",
    "ar" -> "[\\x{0600}-\\x{06FF}\\x{0750}-\\x{077F}]",
    "he" -> "[\\x{0590}-\\x{05FF}]",
    "hi" -> "[\\x{0900}-\\x{097F}]",
    "th" -> "[\\x{0E00}-\\x{0E7F}]",
    "ko" -> "[\\x{AC00}-\\x{D7A3}\\x{1100}-\\x{11FF}\\x{3130}-\\x{318F}]",
    "ja" -> "[\\x{3040}-\\x{30FF}]",
    "zh" -> "[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]")

  /** Latin-script stopword lists for [[langIdWide]]: the [[langWords]]
    * four first (tie-preference compatibility), then Italian,
    * Portuguese, Dutch. Lists are small and DISTINCTIVE by design —
    * shared function words ("e" it/pt, "is" en/nl) are outweighed by
    * each list's unshared members on real text.
    */
  val langWordsWide: Seq[(String, Seq[String])] = langWords ++ Seq(
    "it" -> Seq("il", "della", "che", "e", "è"),
    "pt" -> Seq("o", "uma", "que", "e", "não"),
    "nl" -> Seq("de", "het", "een", "en", "is"))

  /** Wide-coverage language-ID: script detection first (a non-Latin
    * script owning ≥ 30% of non-space characters decides — Cyrillic→ru,
    * Greek→el, Arabic→ar, Hebrew→he, Devanagari→hi, Thai→th,
    * Hangul→ko, kana→ja, kana-free CJK→zh), stopword argmax over
    * [[langWordsWide]] otherwise. Same determinism contract as
    * [[langId]]: one codegen'd expression, list order breaks ties,
    * oracle-mirrored CASE for CASE (gate q97). Script-language
    * PRECISION on planted multilingual docs is pinned in
    * TextWideLangSpec's confusion matrix.
    *
    * The 30% threshold keeps a Latin document quoting a few foreign
    * words on the stopword path, while genuinely non-Latin text (whose
    * letters are nearly all in one script block) clears it with a wide
    * margin; ja's score counts kana + ideographs jointly so
    * kanji-heavy Japanese still routes ja (kana presence is the
    * discriminator, kana share is not).
    */
  def langIdWide(c: Column): Column = {
    val counts = scriptClasses.map { case (l, cls) => l -> classCount(c, cls) }
    val byLang = counts.toMap
    val adjusted = counts.map {
      case ("ja", kana) => "ja" -> when(kana > 0, kana + byLang("zh")).otherwise(lit(0))
      case other => other
    }
    val nonSpace = greatest(charCount(c) - spaceCount(c), lit(1))
    val maxScript = greatest(adjusted.map(_._2): _*)
    val scriptLang = argmaxLang(adjusted)
    val latinLang = argmaxLang(
      langWordsWide.map { case (lang, ws) => lang -> stopwordCount(c, ws) })
    when(maxScript * 10 >= nonSpace * 3, scriptLang).otherwise(latinLang)
  }

  /** Heuristic quality score in [0,1]: stopword density + non-digit
    * purity + a length prior. One arithmetic tree, mirrored verbatim in
    * the oracle SQL so the IEEE result is bit-identical.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val nChar = greatest(charCount(c), lit(1)).cast("double")
    val stop = stopwordCount(c, langWords.head._2).cast("double")
    lit(0.4) * (stop / nTok) +
      lit(0.3) * (lit(1.0) - digitCount(c).cast("double") / nChar) +
      lit(0.3) * least(nTok / lit(100.0), lit(1.0))
  }

  /** BPE-style pre-tokenization pattern: letter runs, digit runs, and
    * single punctuation marks (the GPT-2 pre-tokenizer family, ASCII
    * classes only so Java regex and RE2 agree byte-for-byte).
    */
  val SubwordPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Subword-unit count under the BPE-ish pre-tokenizer — the better
    * proxy for LLM token cost than whitespace tokens (punctuation and
    * number runs count separately).
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit(SubwordPattern), lit(0)))

  /** Subwords per whitespace token ("fertility") — high values flag
    * punctuation-/number-dense documents that tokenize expensively.
    */
  def fertility(c: Column): Column =
    subwordCount(c).cast("double") / tokenCount(c).cast("double")

  /** Gopher-style repetition statistics: per document, the share of
    * word n-gram occurrences taken by the single most frequent n-gram
    * (`top_ratio` near 1 ⇒ boilerplate/looping text — the standard
    * repetition filter for training corpora), plus total and distinct
    * n-gram counts.
    *
    * Spark shape: positional n-gram explode (native WordNGramSeq — the
    * count needs every occurrence, not the distinct set) → two hash
    * aggregations. Both shuffles carry (id, gram) / (id) keyed rows
    * only; exact integer counts and one final IEEE division keep the
    * result oracle-comparable bit-for-bit.
    */
  def repetitionStats(df: DataFrame, id: Column, text: Column, n: Int = 2): DataFrame = {
    val grams = df.select(id.as("__id"),
      explode(graft.functions.NGrams.wordNGramSeq(text, n)).as("__g"))
    grams.groupBy("__id", "__g").agg(count(lit(1)).as("__c"))
      .groupBy("__id").agg(
        sum(col("__c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        (max(col("__c")).cast("double") / sum(col("__c"))).as("top_ratio"))
  }

  /** PII-style scrub patterns (ASCII-only so Java regex and RE2 agree
    * byte-for-byte): email-shaped tokens and standalone runs of 4+
    * digits (ids, phone fragments, zip-ish numbers).
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern: String = "[0-9]{4,}"

  /** Redact emails then long digit runs with typed placeholders — the
    * standard pre-training scrub step. Pure codegen'd regexp_replace
    * chain (replace-all on both engines; DuckDB needs the 'g' flag).
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")

  /** Occurrence counts of the scrub patterns (audit trail for the
    * redaction step).
    */
  def emailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0)))
  def longNumberCount(c: Column): Column =
    size(regexp_extract_all(c, lit(LongNumberPattern), lit(0)))

  /** One dotted-quad octet, VALIDATED in the regex itself (0-255, no
    * leading zeros past a single 0) — so "1.2.3.999" is a version
    * string, not an address, without any numeric cast. RE2-safe.
    */
  val Ipv4OctetPattern: String = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

  /** Maximal dotted quad: the boundary groups forbid an adjacent digit
    * or dot, so "1.2.3.4.5" redacts nothing (no quad inside a longer
    * dotted run) — the same maximal-span contract the `<NUM>` and
    * `<CARD>` rules use. Boundaries are CAPTURED, not looked-around:
    * RE2 (the oracle engine) has no lookbehind, and this way the one
    * pattern text drives both engines.
    */
  val Ipv4Pattern: String =
    s"(^|[^0-9.])($Ipv4OctetPattern\\.$Ipv4OctetPattern\\." +
      s"$Ipv4OctetPattern\\.$Ipv4OctetPattern)([^0-9.]|$$)"

  /** Redact valid IPv4 addresses to `<IP>` (the PII class the generic
    * `<NUM>` rule misses: octets are short digit runs). Two passes
    * because the captured right boundary consumes one character — in
    * "1.2.3.4 5.6.7.8" the first match eats the space, so the second
    * quad only matches on the rerun; the pattern is its own fixed
    * point after two passes. Compose BEFORE [[redactPii]] so quads
    * survive to be typed `<IP>` rather than `<NUM>`-fragmented.
    * Caveat (documented, shared with the oracle): text whose final
    * character is a newline hits the Java-vs-RE2 `$` divergence —
    * operate on newline-free or trimmed text.
    */
  def redactIpv4(c: Column): Column = {
    def once(x: Column) = regexp_replace(x, Ipv4Pattern, "$1<IP>$7")
    once(once(c))
  }

  /** NANP-style FORMATTED phone number: optional +CC (1-2 digits),
    * 3-digit area code (optionally parenthesized), exchange, line —
    * with space/dot/dash separators REQUIRED between the groups:
    * bare digit runs stay the `<NUM>` rule's job, so the two classes
    * never fight over the same span. Boundaries are CAPTURED, not
    * looked-around (the RE2-shared rule the `<IP>` pattern set); the
    * left boundary also excludes `+` and `(` so a match cannot start
    * mid-prefix.
    */
  val PhonePattern: String =
    "(^|[^0-9+(])((\\+[0-9]{1,2}[ .-])?\\(?[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4})([^0-9]|$)"

  /** Redact formatted phone numbers to `<PHONE>`. Two passes, same
    * reason as [[redactIpv4]]: the captured right boundary consumes
    * one character, so back-to-back phones need the rerun; the
    * pattern is its own fixed point after two passes. Compose BEFORE
    * [[redactPii]] so the digit groups survive to be typed `<PHONE>`
    * rather than `<NUM>`-fragmented. Same trailing-newline `$` caveat
    * as the IPv4 rule.
    */
  def redactPhones(c: Column): Column = {
    def once(x: Column) = regexp_replace(x, PhonePattern, "$1<PHONE>$4")
    once(once(c))
  }

  /** Exact edit-distance confirm pass over candidate pairs — the
    * sketch-proposes / exact-measure-disposes discipline
    * ([[winnowPairs]] and the banded LSH joins propose; this
    * disposes). Join-shaped: candidates pick up both texts by id,
    * `levenshtein` (codegen'd built-in, O(len²) per pair — affordable
    * exactly BECAUSE it only runs on the candidate set, never all
    * pairs) scores them, keep `dist ≤ maxDist`. Candidate columns
    * pass through, so sketch evidence (shared counts, bands) stays
    * attached to the confirmed pair.
    */
  def confirmPairsEdit(docs: DataFrame, id: Column, text: Column,
                       pairs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    pairs
      .join(docs.select(id.as("id1"), text.as("__t1")), Seq("id1"))
      .join(docs.select(id.as("id2"), text.as("__t2")), Seq("id2"))
      // banded form (r17): O(len · maxDist) cells, -1 past the bound;
      // surviving pairs carry the exact same distance (FuzzyJoin note)
      .withColumn("dist",
        levenshtein(col("__t1"), col("__t2"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .drop("__t1", "__t2")
  }

  /** Rule-based sentence segmentation — the deterministic granularity
    * between [[graft.ext.ParagraphDedup]]'s blank-line blocks and
    * whole documents, used for sentence-level dedup/boilerplate
    * signals (common-sentence detection is a classic template
    * indicator). Boundary: a terminator run `[.!?]+` followed by
    * whitespace; each sentence is the trimmed segment, empties
    * dropped, order preserved. Mechanism: mark boundaries with U+0001
    * (consuming the whitespace) then split — no lookbehind, so the
    * oracle mirrors it in RE2-based engines where `(?<=...)` does not
    * exist. Abbreviation periods ("Dr. Smith") DO split — the
    * documented rule-based limitation; model-grade segmentation is a
    * different tool. Per-row expressions only, zero shuffle (the
    * transform/filter lambdas are interpreted HOFs — fine for
    * segment-level arrays; see CutpointCell for when that matters).
    */
  def sentences(c: Column): Column =
    filter(
      transform(
        split(regexp_replace(c, "([.!?]+)\\s+", "$1\u0001"), "\u0001"),
        s => trim(s)),
      s => s =!= "")

  /** 64-bit content fingerprint (xxhash64 builtin — codegen'd, seed 42). */
  /** Canonical text normalization — the cleaning pass that runs before
    * shingling/dedup so that cosmetic variants (tabs vs spaces, CRLF,
    * stray control bytes, case) collapse to one canonical form:
    * strip NON-whitespace C0 controls + DEL first, THEN collapse all
    * whitespace runs to single spaces, trim, lowercase. Order matters:
    * stripping after collapsing leaves 'a  b' as 'a  b' (the
    * bytes around the stripped control were already two separate
    * runs), defeating canonicalization. Narrow codegen'd regexp
    * chain; engine-portable (mirrored in the q56/q59 oracles).
    */
  def normalize(c: Column): Column =
    // explicit whitespace class, not \s: Java \s includes \x0b, RE2's
    // does not — spelling it out keeps every engine byte-identical.
    // control class excludes \t\n\x0b\f\r, which are whitespace and
    // must survive until the collapse turns them into spaces
    lower(trim(regexp_replace(
      regexp_replace(c, "[\\x00-\\x08\\x0e-\\x1f\\x7f]", ""),
      "[ \\t\\n\\r\\f\\x0b]+", " ")))

  /** HTML → text extraction: the step before any text analysis in a
    * web-corpus pipeline. Deterministic regexp chain (no parser
    * dependency, mirrors in any engine with RE2/PCRE):
    * script/style blocks dropped whole, remaining tags become spaces,
    * then the six ubiquitous entities decode — &amp; LAST so decoded
    * entities cannot re-form tags or double-decode. Compose with
    * [[normalize]] for canonical whitespace. This is boilerplate
    * STRIPPING, not readability extraction — a main-content extractor
    * (trafilatura-class) needs a DOM model and is out of engine scope.
    */
  def htmlToText(c: Column): Column = {
    val noBlocks = regexp_replace(c,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]+>", " ")
    // entity strings hold no regex metacharacters, so the same literal
    // pattern text works in Java regex and RE2 (Pattern.quote's \Q…\E
    // would be Java-only and unmirrorable in the oracle)
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (col, (ent, ch)) =>
        regexp_replace(col, ent, ch)
      }
  }

  def fingerprint(c: Column): Column = xxhash64(c)

  /** Winnowing fingerprints (rolling-hash document fingerprinting, as
    * in MOSS): hash every k-gram, slide a window of `w` consecutive
    * k-gram hashes, keep the minimum per window, dedupe. Two documents
    * sharing a sufficiently long substring are guaranteed to share a
    * fingerprint — the standard local-similarity sketch, robust to
    * insertions that whole-document hashing (fingerprint above) is not.
    * Built on the native CharNGrams expression; selection windows are
    * per-row array ops over the (small) hash sequence.
    */
  def winnowFingerprints(c: Column, k: Int = 5, w: Int = 4): Column = {
    val grams = graft.functions.NGrams.charNGramSeq(c, k)
    val hashes = transform(grams, g => xxhash64(g))
    val nWins = greatest(size(hashes) - (w - 1), lit(1))
    array_distinct(transform(sequence(lit(1), nWins),
      i => array_min(slice(hashes, i, lit(w)))))
  }

  /** [[winnowFingerprints]] with the engine-portable md5-Horner hash
    * ([[MinHashLsh.portableHash32]]) instead of Spark-private
    * xxhash64 — same selection rule, but any engine can recompute the
    * fingerprints, which makes the sketch oracle-checkable and usable
    * as an EXCHANGE format between systems (the original MOSS use
    * case: compare fingerprint sets produced by different tools).
    * Per-row array face — right for fingerprinting alongside other
    * per-doc signals; for corpus-scale fingerprint JOINS use
    * [[winnowFingerprintsDf]], whose explode/window shape shuffles
    * hashes, not text, and keeps the md5s in codegen.
    */
  def winnowFingerprintsPortable(c: Column, k: Int = 5, w: Int = 4): Column = {
    val grams = graft.functions.NGrams.charNGramSeq(c, k)
    val hashes = transform(grams, g => MinHashLsh.portableHash32(g))
    val nWins = greatest(size(hashes) - (w - 1), lit(1))
    array_distinct(transform(sequence(lit(1), nWins),
      i => array_min(slice(hashes, i, lit(w)))))
  }

  /** Corpus-scale winnowing: (id, fingerprint) pairs, distinct per
    * document — [[winnowFingerprintsPortable]] as a DataFrame explode +
    * per-document sliding window MIN (`rowsBetween(0, w-1)` over gram
    * position), then a distinct on (id, fp). The only wide exchanges
    * carry (id, pos, hash64) triples and the deduped fingerprints —
    * never document text — and the per-doc window partitions by id, so
    * the operator scales the way the engine's digest-shuffle dedup
    * paths do. Rows whose text is shorter than k contribute nothing
    * (no gram exists to fingerprint).
    */
  def winnowFingerprintsDf(df: DataFrame, id: Column, text: Column,
                           k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val g = df.select(id.as("id"),
      posexplode(graft.functions.NGrams.charNGramSeq(text, k)).as(Seq("pos", "g")))
    val h = g.select(col("id"), col("pos"),
      MinHashLsh.portableHash32(col("g")).as("hval"))
    val win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    val per = Window.partitionBy("id")
    h.select(col("id"), col("pos"),
        min(col("hval")).over(win).as("fp"),
        count(lit(1)).over(per).as("__ng"))
      .filter(col("pos") <= greatest(col("__ng") - w, lit(0)))
      .select(col("id"), col("fp")).distinct()
  }

  /** MOSS-style local-similarity candidates: pairs of documents
    * sharing at least `minShared` winnow fingerprints. Fingerprints
    * present in more than `maxDf` documents are excluded first —
    * ubiquitous grams (" the ") would pair everything with everything;
    * the df cap keeps the self-join output pair-bound, the same
    * discipline the banded MinHash join applies over DISTINCT
    * signatures. Detects SHARED SUBSTRINGS (quotes, licences, lifted
    * passages), which whole-document MinHash misses when the rest of
    * the documents differ. Shuffles carry (id, fp) pairs only.
    */
  def winnowPairs(df: DataFrame, id: Column, text: Column,
                  k: Int = 5, w: Int = 4,
                  minShared: Int = 3, maxDf: Int = 10): DataFrame = {
    require(minShared >= 1 && maxDf >= 2, "minShared >= 1, maxDf >= 2")
    val fps = winnowFingerprintsDf(df, id, text, k, w)
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select(col("fp"))
    val f2 = fps.join(rare, Seq("fp"), "left_semi")
    f2.as("a").join(f2.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Mixed-script (homoglyph) token screen: per document, how many
    * whitespace tokens mix characters from two or more of the three
    * mutually-confusable alphabets (Latin, Cyrillic, Greek) — the
    * "pаypal with a Cyrillic а" shape. Legitimate text switches
    * script BETWEEN tokens (names, quotes, loanwords); switching
    * WITHIN a token is the signature of homoglyph obfuscation
    * (spam evading wordlists, phishing domains, SEO poison), and a
    * corpus screen wants it counted before any wordlist filter runs —
    * the wordlist cannot match what is not spelled in one script.
    * Only the tri-confusable set counts: Latin+CJK or Latin+Arabic
    * inside a token is ordinary romaji/transliteration context, not
    * an evasion signal.
    *
    * Scale: one per-row expression tree (split + three script
    * regexes per token), zero shuffle, whole-stage codegen — rides
    * along any scan. Script ranges use the `\x{…}` hex-escape syntax
    * shared by Java regex and RE2 (the [[langIdWide]] discipline), so
    * the oracle mirrors the classes verbatim.
    *
    * Output: (id, n_tokens, n_mixed, flagged).
    *
    * Token-count caveat: tokens come from `split(trim(text), "\s+")`,
    * the corpus-wide tokenization idiom — empty text therefore counts
    * as n_tokens = 1 (one empty token) and text starting with a
    * tab/newline contributes a leading empty token. The oracle and
    * the engine share the convention (gate q183 pins it), and empty
    * tokens can never count as MIXED (they match no script class), so
    * only n_tokens carries the off-by-one; treat it as a split count,
    * not an exact word count.
    */
  def mixedScriptStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val latin = "[A-Za-z]"
    val cyr = "[\\x{0400}-\\x{04FF}]"
    val greek = "[\\x{0370}-\\x{03FF}]"
    val toks = split(trim(text), "\\s+")
    def mixed(t: Column): Column =
      (t.rlike(latin) && t.rlike(cyr)) ||
        (t.rlike(latin) && t.rlike(greek)) ||
        (t.rlike(cyr) && t.rlike(greek))
    df.select(id.as("id"),
      size(toks).cast("long").as("n_tokens"),
      size(filter(toks, mixed _)).cast("long").as("n_mixed"))
      .withColumn("flagged", col("n_mixed") > 0L)
  }

  /** WITHIN-document duplicate-line removal (CCNet's `dedup_lines` /
    * the in-page half of C4's line dedup): drop every repeat of a line
    * inside the SAME document, keeping the first occurrence in
    * original order. Complements [[ParagraphDedup]], which removes
    * lines duplicated ACROSS documents — a nav menu repeated ten times
    * within one page is invisible to a cross-doc df count when the
    * page itself is unique.
    *
    * Pure per-row expression — `array_distinct` preserves
    * first-occurrence order by contract — so the operator is
    * ZERO-shuffle and stays inside whole-stage codegen: at 100 TB it
    * rides along any scan for free. Output: (id, clean_text, n_lines,
    * n_removed).
    */
  def dedupLinesWithin(df: DataFrame, id: Column, text: Column,
                       sep: String = "\n"): DataFrame = {
    val ls = split(text, java.util.regex.Pattern.quote(sep))
    val kept = array_distinct(ls)
    df.select(id.as("id"),
              array_join(kept, sep).as("clean_text"),
              size(ls).cast("long").as("n_lines"),
              (size(ls) - size(kept)).cast("long").as("n_removed"))
  }
}
