package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-native Bloom filter for membership prefiltering.
  *
  * The 100 TB use case: decontamination / blocklist checks where the
  * key set (eval benchmark, banned URLs) is small and the probed side
  * is the corpus. Broadcasting the raw key set costs O(total key
  * bytes); a Bloom filter costs O(bits) — here `words` 32-bit words
  * packed in BIGINTs inside ONE map column, cross-broadcast to every
  * probe task. A Bloom hit is then confirmed by an exact join over the
  * (tiny, candidate-proportional) hit set, so false positives never
  * reach the output: result ≡ exact semi-join, at prefilter cost.
  *
  * Everything is engine-portable column arithmetic (md5 nibble Horner
  * folds, double hashing h1 + i·(2·h2+1) over the bit space, bit_or
  * word packing) — no UDFs, no driver-side bitsets, no engine-private
  * hash constants — so the whole pipeline is oracle-checkable
  * bit-for-bit AND stays inside whole-stage codegen (the k probe
  * positions are unrolled at plan-build time; no interpreted
  * higher-order functions). `md5(key)` is materialized ONCE per row by
  * an explicit projection; the 16 nibble reads and all k probes are
  * substring arithmetic over that one hex value.
  *
  * Contrast with `Decontaminate` (n-gram overlap, broadcast gram keys):
  * this operator answers exact-membership at a fraction of the
  * broadcast size; compose both for gram-level checks over huge eval
  * suites (bloom over gram keys).
  */
object Bloom {

  /** 0-15 value of one lowercase-hex char (portable: CASE + ascii). */
  private def nib(c: Column): Column =
    when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)

  /** 32-bit value from hex chars [from, from+8) of an md5-hex column:
    * BIGINT Horner fold, identical in any engine with md5/ascii/
    * substring (mirrors `MinHashLsh.portableHash32`'s nibble trick).
    */
  private def hash32Slice(hex: Column, from: Int): Column =
    (from until from + 8).map(j => nib(substring(hex, j, 1)))
      .foldLeft(lit(0L))((acc, d) => acc * 16 + d)

  /** md5 hex of a key column — the one hash evaluation per row. */
  def keyHex(key: Column): Column = md5(key.cast("binary"))

  /** Double-hash probe positions (Kirsch-Mitzenmacher): h1 + i·step
    * with an odd step, over m = 32·words bits. h1/h2 come from
    * disjoint md5 slices of the key; the odd step keeps the k probes
    * spread even when h2 % m collapses.
    */
  private def positions(hex: Column, k: Int, words: Int): Seq[Column] = {
    val m = 32L * words
    val h1 = hash32Slice(hex, 1)
    val step = hash32Slice(hex, 9) * 2 + 1
    (0 until k).map(i => (h1 + lit(i.toLong) * step) % m)
  }

  /** shiftleft(1L, bits) with a COLUMN bit count — functions.shiftleft
    * only accepts a literal count.
    */
  private def bitMask(bits: Column): Column =
    call_function("shiftleft", lit(1L), bits.cast("int"))

  /** Build the filter over the DISTINCT keys of `keys`: one row, one
    * `bloom` column of map<word_idx → packed 32-bit word>. Words with
    * no bits set are absent (probe treats absent as 0). The build is
    * one explode(k)+bit_or aggregation — linear in |keys|, output
    * ≤ `words` entries regardless of key count. Distinct runs on the
    * 16-byte md5, not the raw key bytes.
    */
  def build(df: DataFrame, key: Column, k: Int, words: Int): DataFrame = {
    val hexKeys = df.select(keyHex(key).as("__h")).distinct()
    hexKeys
      .select(explode(array(positions(col("__h"), k, words): _*)).as("__pos"))
      .select((col("__pos") / 32).cast("int").as("__w"),
        bitMask(col("__pos") % 32).as("__m"))
      .groupBy("__w").agg(expr("bit_or(__m)").as("__word"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__word"))))
        .as("bloom"))
  }

  /** Membership test against a `bloom` map column (from [[build]] —
    * same k/words or the answer is meaningless), given the row's
    * PRE-COMPUTED md5 hex (see [[keyHex]]). All k probe words are
    * checked inline (k unrolled constants), so the predicate is a flat
    * codegen'd expression tree.
    */
  def mightContainHex(bloom: Column, hex: Column, k: Int, words: Int): Column =
    positions(hex, k, words).map { p =>
      val w = coalesce(element_at(bloom, (p / 32).cast("int")), lit(0L))
      w.bitwiseAND(bitMask(p % 32)) =!= lit(0L)
    }.reduce(_ && _)

  /** Convenience form over the raw key; prefer [[mightContainHex]]
    * after an explicit `keyHex` projection in hot paths.
    */
  def mightContain(bloom: Column, key: Column, k: Int, words: Int): Column =
    mightContainHex(bloom, keyHex(key), k, words)

  /** Exact-membership decontamination with a Bloom prefilter:
    * train rows whose `text` appears verbatim in `eval`, flagged.
    * Output: (id, confirmed) for every Bloom CANDIDATE — confirmed
    * false rows are the filter's false positives (kept visible so the
    * FP rate is observable; callers dropping contamination anti-join
    * on `confirmed`). Result set ≡ exact join for confirmed=true.
    *
    * The confirm join keys on the md5 hex ALREADY computed for the
    * probe — never the raw eval text — so the broadcast stays O(bits)
    * + O(16 bytes · |eval|) end-to-end even when eval rows are long
    * documents. Digest equality stands in for text equality, the same
    * trade [[ExactDedup]] makes with sha2 (md5 collisions are
    * negligible against a benign eval suite).
    */
  def decontaminateExact(train: DataFrame, eval: DataFrame,
                         id: Column, text: Column,
                         k: Int = 3, words: Int = 8): DataFrame = {
    val bloom = build(eval, text, k, words)
    val evalKeys = eval.select(keyHex(text).as("__ehex")).distinct()
    // spread the train scan before the per-row md5 key + bloom probe
    // (single-file local scans serialize that map stage; no-op on
    // multi-split inputs) — output is per-row, partition-insensitive
    val cand = org.apache.spark.sql.GraftBridge
      .spreadForMapWork(train.toDF(), id)
      .select(id.as("id"), keyHex(text).as("__hex"))
      .crossJoin(broadcast(bloom))
      .filter(mightContainHex(col("bloom"), col("__hex"), k, words))
    cand
      .join(broadcast(evalKeys), cand("__hex") === evalKeys("__ehex"), "left")
      .select(col("id"), col("__ehex").isNotNull.as("confirmed"))
  }

  /** Per-FILE Bloom filters — the data-skipping index min/max stats
    * can't provide: point lookups on a high-cardinality, unsorted key
    * (URL, content digest) hit every file's [min, max] range, but a
    * per-file bitset answers "could this file hold this key?" in
    * O(k) word probes. One build scan (distinct (file, md5) →
    * position explode → bit_or per file); output is file-cardinality
    * — metadata scale, persistable next to the footer stats. Same
    * md5-derived double-hash scheme as [[build]], so the index is
    * engine-portable and rebuild-equals-incremental-OR (bit_or
    * commutes — blooms of incremental loads merge by word-wise OR).
    */
  def fileBlooms(df: DataFrame, file: Column, key: Column, k: Int,
                 words: Int): DataFrame = {
    // the per-row md5 key runs in the distinct's MAP stage — spread
    // first so a single-file local scan doesn't serialize it (no-op
    // on multi-split or already-shuffled inputs); bit_or commutes, so
    // the blooms are partition-invariant
    val dfS = org.apache.spark.sql.GraftBridge.spreadForMapWork(df.toDF(), file)
    val hexKeys = dfS.select(file.as("file"), keyHex(key).as("__h")).distinct()
    hexKeys
      .select(col("file"),
        explode(array(positions(col("__h"), k, words): _*)).as("__pos"))
      .select(col("file"), (col("__pos") / 32).cast("int").as("__w"),
        bitMask(col("__pos") % 32).as("__m"))
      .groupBy(col("file"), col("__w")).agg(expr("bit_or(__m)").as("__word"))
      .groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__word"))))
        .as("bloom"))
  }

  /** Files each probe key might live in, from a [[fileBlooms]] index:
    * the file-skipping decision as a DataFrame. The probe side is the
    * handful of keys a point lookup carries — broadcast against the
    * metadata-scale bloom table; candidates are a SUPERSET of the
    * truth (no false negatives — the Bloom contract; pinned in
    * BloomSpec) and the false-positive excess is the measurable skip
    * cost. Output: (probe, file).
    */
  def candidateFiles(blooms: DataFrame, probes: DataFrame, probeKey: Column,
                     k: Int, words: Int): DataFrame = {
    val p = probes.select(probeKey.as("probe"), keyHex(probeKey).as("__ph"))
      .distinct()
    blooms.crossJoin(broadcast(p))
      .filter(mightContainHex(col("bloom"), col("__ph"), k, words))
      .select(col("probe"), col("file"))
  }

  /** Point lookup with Bloom file skipping: restrict the scan to
    * [[candidateFiles]] (at real scale: partition-prune the parquet
    * paths), then confirm key equality exactly — false positives cost
    * a candidate-file read, never a wrong row. Result ≡ the full-scan
    * filter (gate q171 pins it under a plain-join oracle). The
    * candidate list is (|probes| × few files) — broadcast; the
    * corpus-side join keys on (file, key) so only candidate files'
    * rows survive the semi-join shape.
    */
  def prunedLookup(df: DataFrame, file: Column, key: Column,
                   blooms: DataFrame, probes: DataFrame, probeKey: Column,
                   k: Int, words: Int): DataFrame = {
    val cand = candidateFiles(blooms, probes, probeKey, k, words)
      .select(col("file").as("__cf"), col("probe").as("__cp"))
    df.withColumn("__file", file)
      .join(broadcast(cand),
        col("__file") === col("__cf") && key === col("__cp"))
      .drop("__cf", "__cp")
  }
}
