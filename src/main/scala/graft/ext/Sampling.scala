package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic, engine-portable sampling / splitting for training-data
  * pipelines.
  *
  * Every operator keys off `md5(key || salt)` — not `rand()` and not
  * Spark's `sample()` — because a 100 TB curation job needs sampling
  * decisions that are (a) reproducible across runs, clusters, and
  * partitionings, (b) stable under re-partitioning of the input (a
  * per-row pure function of the key), and (c) auditable ("why is this
  * row in val?" has an answer). md5 rather than xxhash64 so an external
  * system (or the DuckDB oracle) can reproduce the exact assignment —
  * every engine has md5; Spark's xxhash64 constant is Spark-private.
  *
  * All derivations are narrow per-row expressions — no shuffle, fully
  * codegen'd, pushdown-friendly.
  */
object Sampling {

  /** Value 0-15 of one lowercase-hex character. */
  private def nib(c: Column): Column =
    when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)

  /** Deterministic bucket in [0, 256): first two hex chars of
    * md5(key || salt). ~uniform for any key distribution.
    */
  def bucket256(key: Column, salt: String = ""): Column = {
    val h = md5(concat(key.cast("string"), lit(salt)).cast("binary"))
    nib(substring(h, 1, 1)) * 16 + nib(substring(h, 2, 1))
  }

  /** Named split assignment from cumulative bucket widths (out of 256).
    *
    * `cuts` maps split name → width; widths must sum to 256 (e.g.
    * train/val/test 204/26/26 ≈ 80/10/10). Assignment is a pure
    * function of the key: adding or removing OTHER rows never moves a
    * row between splits (critical for incremental corpus builds —
    * yesterday's train doc cannot silently become tomorrow's test doc).
    */
  def hashSplit(key: Column, cuts: Seq[(String, Int)], salt: String = ""): Column = {
    require(cuts.map(_._2).sum == 256, "split widths must sum to 256")
    val b = bucket256(key, salt)
    val (expr, _) = cuts.foldLeft((null: Column, 0)) {
      case ((acc, cum), (name, width)) =>
        val hi = cum + width
        val branch = if (acc == null) when(b < hi, name)
                     else acc.when(b < hi, name)
        (branch, hi)
    }
    expr
  }

  /** Per-stratum deterministic sampling: keep a row iff its bucket256
    * (salted) falls below the stratum's fraction (in 256ths). The
    * fractions column is any expression over the row (e.g. a CASE on
    * language), so over- and under-sampling strata for mixture tuning
    * is one filter — no per-stratum jobs, no shuffle.
    */
  def stratifiedSample(df: DataFrame, key: Column, fraction256: Column,
                       salt: String = ""): DataFrame =
    df.filter(bucket256(key, salt) < fraction256)

  /** Deterministic global shuffle order: position of each row when
    * sorted by (md5(key || salt), key). The training-data "shuffle the
    * corpus" step as a reproducible total order — same permutation on
    * every run and every engine, re-derivable for any row.
    *
    * CAUTION — not the scale path: an unpartitioned row_number window
    * requires AllTuples distribution, i.e. Spark funnels the whole
    * dataset through ONE task. Fine for bounded frames and oracle
    * comparison; use `shuffled` (range-partitioned sort + zipWithIndex)
    * for corpus-scale data.
    */
  def shufflePosition(key: Column, salt: String = ""): Column = {
    val h = md5(concat(key.cast("string"), lit(salt)).cast("binary"))
    row_number().over(Window.orderBy(h.asc, key.asc))
  }

  /** Deterministic weighted interleave of N corpora — the training-
    * mixture step ("3 parts web, 1 part code") as a reproducible total
    * order. Each source is independently md5-shuffled (scale-safe
    * `shuffled`), then row r of a weight-w source lands at mix key
    * (r - 0.5) / w — so a weight-3 source contributes ~3 rows per
    * 1 row of a weight-1 source at every prefix of the mixture, which
    * is what training curricula need (the property holds at every
    * cutoff, not just in aggregate). Consumers order by (mix_key,
    * source_id) for the exact mixture order; the key is a pure
    * function of (source, row), so any engine re-derives it.
    *
    * All inputs must share a schema; output adds source_id, pos,
    * mix_key.
    */
  def weightedInterleave(sources: Seq[(DataFrame, Int)], key: String,
                         salt: String = ""): DataFrame = {
    require(sources.nonEmpty && sources.forall(_._2 > 0))
    sources.zipWithIndex.map { case ((df, w), i) =>
      shuffled(df, col(key), salt)
        .withColumn("source_id", lit(i))
        .withColumn("mix_key", (col("pos").cast("double") - 0.5) / w)
    }.reduce(_ unionByName _)
  }

  /** Temperature-based mixture sampling — the standard training-mix
    * primitive (cf. multilingual/multi-corpus sampling with
    * p_g ∝ c_g^α): down-sample each group so the SAMPLED mass of
    * group g is proportional to c_g^α, with the smallest group kept
    * in full. Keep rate per group:
    *
    *   rate_g = (c_min / c_g)^(1-α)      (α ∈ [0,1]; α=1 keeps all,
    *                                      α=0 equalizes all groups)
    *
    * Rates derive from ONE tiny grouped count (groups = languages /
    * sources — broadcast back, no second scan); the keep decision is
    * the [[bucket256]] discipline at 32-bit granularity: a pure
    * per-row function of (key, salt), so the sample is reproducible
    * across runs, clusters and partitionings, and adding rows to one
    * group never flips another group's rows.
    *
    * α = 0.5 is special-cased through `sqrt`, which IEEE 754 requires
    * to be correctly rounded — so the rate doubles are bit-identical
    * on any engine and the sampled row SET is oracle-checkable
    * (`pow` carries no such guarantee; other α values remain
    * deterministic per-engine but not bit-portable).
    *
    * Output: input rows that survive, plus the group's `rate`.
    */
  def temperatureSample(df: DataFrame, group: Column, key: Column,
                        alpha: Double, salt: String = ""): DataFrame =
    sampleByRates(df, group, key, temperatureRates(df, group, alpha), salt)

  /** The per-group keep-rate table (`__grp`, `rate`) for
    * [[temperatureSample]] — exposed so rates can be computed once on
    * a reference corpus snapshot, persisted, and re-applied later
    * (e.g. to a document STREAM via [[sampleByRates]], where a global
    * group count is not computable).
    */
  def temperatureRates(df: DataFrame, group: Column, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    val counts = df.groupBy(group.as("__grp"))
      .agg(count(lit(1)).as("__c"))
    val cmin = counts.agg(min(col("__c")).as("__cmin"))
    val ratio = col("__cmin").cast("double") / col("__c").cast("double")
    val rateExpr =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, 1.0 - alpha)
    counts.crossJoin(broadcast(cmin))
      .select(col("__grp"), rateExpr.as("rate"))
  }

  /** Apply a (`__grp`, `rate`) table to rows: keep a row iff its
    * portable 32-bit hash of (key, salt) falls under its group's
    * rate. Works identically on a batch frame and on a STREAMING
    * frame (stream-static broadcast join + stateless per-row filter —
    * no watermark, no state store), so a batch-computed mixture can
    * govern continuous ingest.
    *
    * Rows whose group is ABSENT from the rates table are governed by
    * `defaultRate` — the case a snapshot-computed mixture hits when a
    * new language/source appears in continuous ingest after rates were
    * persisted. The default of 1.0 keeps unseen groups whole (never
    * silently drop data the snapshot didn't know about); pass 0.0 to
    * quarantine-by-omission, or any rate between for a conservative
    * prior.
    */
  def sampleByRates(df: DataFrame, group: Column, key: Column,
                    rates: DataFrame, salt: String = "",
                    defaultRate: Double = 1.0): DataFrame = {
    require(defaultRate >= 0.0 && defaultRate <= 1.0,
      s"defaultRate in [0,1], got $defaultRate")
    val h32 = MinHashLsh.portableHash32(
      concat(key.cast("string"), lit(salt)))
    df.join(broadcast(rates), group === col("__grp"), "left")
      .withColumn("rate", coalesce(col("rate"), lit(defaultRate)))
      .filter(h32 < col("rate") * 4294967296.0)
      .drop("__grp")
  }

  /** Scalable deterministic shuffle: the input with a `pos` column
    * (1-based) giving each row's position in the (md5(key || salt),
    * key) total order — the same permutation `shufflePosition` defines,
    * computed distributed and fully inside the DataFrame layer (the
    * previous rdd.zipWithIndex form deserialized every row out of
    * Tungsten and back, and needed an extra count job).
    *
    * Shape: bucket = first `bucketChars` hex chars of the md5 — a PURE
    * per-row function, so no step depends on physical partitioning —
    * then pos = (sum of counts of lexicographically smaller buckets)
    * + row_number within the bucket. The bucket is a prefix of the
    * hash, so bucket-major order IS the global (hash, key) order.
    * Bucket offsets are a tiny aggregate (≤ 16^bucketChars rows)
    * broadcast-joined back; the per-bucket row_number window hashes
    * ~uniform buckets across tasks (md5 prefixes are uniform for any
    * key distribution), so no single-task bottleneck and no spill
    * risk beyond corpus/16^bucketChars rows per window partition —
    * raise `bucketChars` if that slice outgrows an executor.
    *
    * The md5-then-key sort order is strict (key breaks hash
    * collisions), so positions are unique and reproducible on any
    * cluster layout. Output rows are NOT returned physically sorted;
    * order by `pos` when materializing a curriculum.
    */
  /** Per-group quota cap (the C4/web-curation per-host rule: no
    * domain may contribute more than `cap` documents, so template
    * farms and mirror hosts can't dominate the mixture). Keeps, per
    * `group`, the `cap` rows with the SMALLEST salted portable hash
    * of `key` (key ascending on the ~2^-32 hash tie) — a
    * deterministic, partition-invariant, auditable uniform choice,
    * not "first by crawl order".
    *
    * Window face: one shuffle on `group`, per-group sort. A heavy
    * group sorts through one reducer — fine up to tens of millions of
    * rows per group; beyond that use [[capPerGroupAgg]], which keeps
    * only `cap` candidates in bounded aggregate state with map-side
    * combine (same selection, same order, no per-group sort).
    */
  def capPerGroup(df: DataFrame, group: Column, key: Column, cap: Int,
                  salt: String = ""): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val h = MinHashLsh.portableHash32(concat(key.cast("string"), lit(salt)))
    val rn = row_number().over(
      Window.partitionBy(group).orderBy(h.asc, key.asc))
    df.withColumn("__capRn", rn).filter(col("__capRn") <= cap).drop("__capRn")
  }

  /** [[capPerGroup]] in bounded aggregate state: per group keep the
    * top-`cap` ids by NEGATED hash ([[graft.functions.TopKAgg]] —
    * score desc ≡ hash asc; its id-asc tie rule matches the window
    * face), then semi-join the winners back. State is ≤ cap entries
    * per group with associative map-side partial merge, so a
    * 100M-row mirror host reduces inside each scan task instead of
    * sorting through one reducer — the skew-immune shape. Selection
    * is identical to the window face (tested); requires a non-negative
    * long-compatible `key` that UNIQUELY identifies rows (both faces
    * assume it: with duplicate keys the window face caps the count but
    * picks among equal keys arbitrarily, and this face's semi-join
    * would return EVERY row carrying a winning key — exceeding the
    * cap. Run exact dedup first, or cap on a synthesized unique id).
    */
  def capPerGroupAgg(df: DataFrame, group: Column, key: Column, cap: Int,
                     salt: String = ""): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val h = MinHashLsh.portableHash32(concat(key.cast("string"), lit(salt)))
    val winners = df
      .select(group.as("__g"), key.cast("long").as("__id"), h.as("__h"))
      .groupBy(col("__g"))
      .agg(graft.functions.TopKAgg.topK(-col("__h").cast("double"),
        col("__id"), cap).as("__top"))
      .select(col("__g"), explode(col("__top.id")).as("__win"))
    df.join(winners,
      group === col("__g") && key.cast("long") === col("__win"), "left_semi")
  }

  /** Incremental per-group quota admission — [[capPerGroup]] for an
    * ARRIVING corpus. Batch-mode capping is an unbiased re-draw over
    * the whole corpus; a crawl front door cannot re-draw (admitted
    * docs are already downstream), so the online contract is: earlier
    * batches keep their slots, and within a batch the open slots go
    * to the smallest salted hashes (same order as the batch face —
    * so a single-batch run IS the batch face). `stored` is the
    * persisted counts table (`group`, `n_admitted`); returns
    * (admitted rows, updated counts). The whole admission is one
    * batch-sized window plus one state-sized join — the corpus is
    * never rescanned, the [[graft.ops.IncrementalAgg]] maintenance
    * discipline. Run exact-dedup admission
    * ([[graft.streaming.DocStream.admitNew]]) upstream if re-crawled
    * duplicates must not consume quota.
    */
  def quotaAdmit(batch: DataFrame, stored: DataFrame, group: String,
                 key: String, cap: Int,
                 salt: String = ""): (DataFrame, DataFrame) = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val h = MinHashLsh.portableHash32(concat(col(key).cast("string"), lit(salt)))
    val rn = row_number().over(
      Window.partitionBy(col(group)).orderBy(h.asc, col(key).asc))
    val joined = batch.withColumn("__quotaRn", rn)
      .join(stored.select(col(group), col("n_admitted").as("__quotaN0")),
        Seq(group), "left")
      .withColumn("__quotaN0", coalesce(col("__quotaN0"), lit(0L)))
    val admitted = joined
      .filter(col("__quotaRn") + col("__quotaN0") <= cap)
      .drop("__quotaRn", "__quotaN0")
    val batchCounts = admitted.groupBy(col(group))
      .agg(count(lit(1)).as("__quotaAdd"))
    val newCounts = stored.join(batchCounts, Seq(group), "full_outer")
      .select(col(group),
        (coalesce(col("n_admitted"), lit(0L)) +
          coalesce(col("__quotaAdd"), lit(0L))).as("n_admitted"))
    (admitted, newCounts)
  }

  def shuffled(df: DataFrame, key: Column, salt: String = "",
               bucketChars: Int = 4): DataFrame = {
    require(bucketChars >= 1 && bucketChars <= 8, "bucketChars in [1,8]")
    val h = md5(concat(key.cast("string"), lit(salt)).cast("binary"))
    val withB = df.withColumn("__shuffle_h", h)
      .withColumn("__b", substring(col("__shuffle_h"), 1, bucketChars))
    // running offset of each bucket: single-task window, but over at
    // most 16^bucketChars tiny rows — never the corpus
    val offsets = withB.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__c")
    val rn = row_number().over(
      Window.partitionBy(col("__b")).orderBy(col("__shuffle_h").asc, key.asc))
    withB.join(broadcast(offsets), "__b")
      .withColumn("pos", col("__off") + rn)
      .drop("__b", "__off", "__shuffle_h")
  }

  /** Largest-remainder (Hamilton) allocation of an EXACT total budget
    * across strata, proportional to stratum size. [[stratifiedSample]]
    * and [[temperatureSample]] draw per-row with a rate — their output
    * size is only approximately the target; eval-set construction and
    * fixed-token-budget mixtures need the total to come out exact.
    * Entirely integer arithmetic (BIGINT products, DIV/%, a
    * remainder-ranked top-up), so the allocation is engine-portable
    * and oracle-checkable with no floating point anywhere.
    *
    * Quotas sum to exactly `budget` when `budget <= total rows`
    * (callers wanting per-stratum caps on top compose with
    * [[capPerGroup]]). Ties in the remainder rank break by stratum
    * value ascending. The allocation table is one row per stratum —
    * driver-scale by definition — so the two whole-table windows
    * (total, remainder rank) run on a single task over a tiny
    * aggregate, never the corpus.
    *
    * @return (stratum, n_rows, quota)
    */
  def allocateLargestRemainder(df: DataFrame, group: Column,
                               budget: Long): DataFrame =
    allocateOverCounts(
      df.groupBy(group.as("stratum")).agg(count(lit(1)).as("n_rows")),
      budget)

  /** [[allocateLargestRemainder]] over an EXPLICIT weight table —
    * (stratum, n_rows) where n_rows is any non-negative integer
    * weight (row counts, token counts, mixture parts). Same integer
    * arithmetic and tie rule; same stratum-sized-table caveat.
    */
  def allocateOverCounts(counts: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val one = Window.partitionBy(lit(1))
    val withTot = counts
      .withColumn("__tot", sum(col("n_rows")).over(one))
      .withColumn("__base", expr(s"($budget * n_rows) DIV __tot"))
      .withColumn("__rem", expr(s"($budget * n_rows) % __tot"))
    val leftover = lit(budget) - sum(col("__base")).over(one)
    val remRank = row_number().over(
      Window.orderBy(col("__rem").desc, col("stratum").asc))
    withTot
      .withColumn("quota",
        col("__base") + when(remRank <= leftover, 1L).otherwise(0L))
      .select(col("stratum"), col("n_rows"), col("quota"))
  }

  /** Exact-budget stratified sample: allocate with
    * [[allocateLargestRemainder]], then take the per-stratum quota
    * deterministically — smallest `md5(key || salt)` first, key-asc
    * tie break (the [[capPerGroup]] draw order, so the per-stratum
    * selection is an unbiased reproducible draw). Output carries the
    * stratum's quota for audit. One corpus-side window partitioned by
    * stratum plus a broadcast join against the tiny allocation table.
    */
  def takeStratified(df: DataFrame, group: Column, key: Column,
                     budget: Long, salt: String = ""): DataFrame = {
    require(!df.columns.contains("quota"),
      "takeStratified appends a `quota` column; input already has one")
    val alloc = allocateLargestRemainder(df, group, budget)
      .select(col("stratum").as("__allocG"), col("quota"))
    val h = md5(concat(key.cast("string"), lit(salt)).cast("binary"))
    val rn = row_number().over(
      Window.partitionBy(group).orderBy(h.asc, key.asc))
    df.withColumn("__strataRn", rn)
      .join(broadcast(alloc), group === col("__allocG"))
      .filter(col("__strataRn") <= col("quota"))
      .drop("__strataRn", "__allocG")
  }

  /** Weighted sampling WITHOUT replacement, exact for integer weights
    * (Efraimidis–Spirakis 2006): a row with weight w gets w
    * independent portable hash draws and keeps the MINIMUM; ranking
    * ascending by that min and taking k is distributionally identical
    * to the ES u^(1/w) key scheme (min of w uniforms ↔ the ES key via
    * u → 1−u and the max-of-w CDF x^w) — with hash draws standing in
    * for the uniforms, as every sampler here does. The standard
    * quality-weighted corpus subsample: "pick 10M documents, better
    * ones proportionally more often, reproducibly, no replacement".
    *
    * Scale shape: the w draws are a per-row HOF fold over
    * `sequence(1, w)` — no explode, no shuffle, codegen'd — and the
    * global top-k is orderBy+limit = TakeOrderedAndProject (per-
    * partition heaps + one k-row driver merge, never a full sort).
    * Cost is O(Σw) hash evaluations, so weights must be SMALL
    * integers — quantize upstream (e.g. a score decile, 1-10) —
    * enforced per row via raise_error at `maxWeight`. Rows with
    * weight < 1 never qualify (ES semantics: zero weight = never
    * drawn) and are filtered, not errored. Output: input columns +
    * `w` + `draw`, ordered (draw asc, key asc) — a deterministic
    * total order any engine reproduces. Gate q170.
    */
  def weightedTake(df: DataFrame, key: Column, weight: Column, k: Int,
                   salt: String = "", maxWeight: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxWeight >= 1 && maxWeight <= 65536,
      s"maxWeight in [1, 65536], got $maxWeight")
    val checked = when(weight.cast("long") > lit(maxWeight.toLong),
      raise_error(concat(
        lit(s"weightedTake: weight exceeds maxWeight=$maxWeight: "),
        weight.cast("string"))).cast("long"))
      .otherwise(weight.cast("long"))
    val drawOf = (j: Column) => MinHashLsh.portableHash32(
      concat(key.cast("string"), lit(":" + salt + ":"), j.cast("string")))
    df.withColumn("w", checked).filter(col("w") >= 1L)
      .withColumn("draw",
        aggregate(sequence(lit(1L), col("w")), lit(Long.MaxValue),
          (acc, j) => least(acc, drawOf(j))))
      .orderBy(col("draw").asc, key.asc)
      .limit(k)
  }
}
