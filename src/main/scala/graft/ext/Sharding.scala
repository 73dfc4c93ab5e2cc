package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Balanced output sharding and transfer manifests — the "write it
  * out" end of a curation pipeline. Training jobs read fixed shard
  * sets; a shard 10× heavier than its peers becomes the straggler of
  * every epoch, and a 100 TB corpus copied between stores needs a
  * cheap way to prove the copy is complete WITHOUT re-reading both
  * sides row-by-row.
  *
  * Both operators are deterministic pure functions of the data (no
  * rand(), no partition-order dependence), so shard layouts and
  * manifests are reproducible on any cluster layout — the same
  * contract the engine's [[Sampling]] decisions make.
  */
object Sharding {

  /** Snake (boustrophedon) shard assignment: rank rows by
    * `weight` DESC (ties broken by `key` ASC — a strict total order),
    * then deal rank r (0-based) into `nShards` bins serpentine-wise:
    * round r/n deals left-to-right when even, right-to-left when odd.
    * Each consecutive block of 2n ranks contributes exactly
    * (r-th + (2n-1-r)-th) weight to every shard — the classic
    * one-pass approximation of LPT balancing that needs NO sequential
    * "least-loaded bin" state, so it distributes.
    *
    * Scale shape: the global rank is computed WITHOUT a
    * single-partition window (the [[Sampling.shuffled]] discipline):
    * rows group by the high bits of the weight (`weight >> bucketShift`
    * — a monotone prefix of the sort key, so bucket-major order IS the
    * global order), per-bucket counts (a tiny aggregate, one row per
    * distinct high-bit value) turn into broadcast rank offsets, and a
    * per-bucket window assigns the within-bucket position. Raise
    * `bucketShift` if weights cluster so heavily that one bucket
    * outgrows an executor's window slice.
    *
    * Output: input columns + `w` (the weight), `rank` (1-based
    * global), `shard` ∈ [0, nShards).
    *
    * Weight contract (STRICTER since the delegation to
    * [[graft.ops.Ranks.bucketRank]]): weights must cast to a
    * NON-NEGATIVE long. NULL and negative weights RAISE; earlier
    * versions silently dropped NULL-weight rows (the bucket equi-join
    * never matched them) and mis-bucketed negatives into huge unsigned
    * buckets. Pipelines feeding such weights now fail loudly at the
    * first row — coalesce/clamp upstream if partial weights are
    * expected.
    */
  def snakeShards(df: DataFrame, key: Column, weight: Column, nShards: Int,
                  bucketShift: Int = 8): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // the ranking core (guarded long weight, high-bit buckets,
    // broadcast offsets, per-bucket window) is the shared
    // [[graft.ops.Ranks.bucketRank]] discipline — one place to fix,
    // one plan shape for every global/grouped exact rank
    val ranked = graft.ops.Ranks.bucketRank(df, Seq.empty, weight, key,
      bucketShift)
    val r0 = col("rank") - 1
    val pos = r0 % nShards
    val round = floor(r0 / lit(nShards.toDouble))
    ranked.withColumn("shard",
      when(round % 2 === 0, pos).otherwise(lit((nShards - 1).toLong) - pos))
  }

  /** Per-group transfer manifest: row count, exact total weight
    * (DECIMAL — no overflow at any corpus size), and an
    * ORDER-INVARIANT content digest: the exact DECIMAL sum of the
    * 32-bit portable md5 Horner hash ([[MinHashLsh.portableHash32]])
    * of each row's content. Addition commutes, so the digest is
    * independent of partitioning, read order, and engine — two sides
    * of a copy agree iff their manifests agree (up to adversarial
    * collisions, which a transfer-integrity check does not face).
    * One hash-aggregate scan; merges across shards by addition, so
    * manifests of incremental loads compose.
    */
  def manifest(df: DataFrame, group: Column, content: Column,
               weight: Column): DataFrame =
    df.groupBy(group.as("group")).agg(
      count(lit(1)).as("n_rows"),
      sum(weight.cast("decimal(38,0)")).as("total_weight"),
      sum(MinHashLsh.portableHash32(content).cast("decimal(38,0)"))
        .as("digest"))

  /** Incremental manifest admission: fold a NEW batch of rows into a
    * stored per-group [[manifest]] by pure addition — counts, DECIMAL
    * weight totals, and the order-invariant digest all commute, so
    *
    *   admitManifest(manifest(a), b)  ≡  manifest(a UNION ALL b)
    *
    * (pinned by gate q168 and ShardingSpec). The stored side is
    * group-cardinality (one row per shard — thousands of rows for a
    * 100 TB corpus, not billions); the batch is scanned ONCE by its
    * own manifest aggregate; the full-outer join on group is a
    * tiny-table join, so incremental loads never re-read the corpus.
    * Unlike the counted digest ledger, admission is NOT idempotent —
    * replaying a batch double-counts — so callers dedup batches
    * upstream ([[graft.streaming.DocStream.admitNew]]) or key loads;
    * [[graft.ext.Forget.retractManifest]] is the exact inverse for
    * takedowns.
    */
  def admitManifest(stored: DataFrame, newRows: DataFrame, group: Column,
                    content: Column, weight: Column): DataFrame = {
    val zero = lit(0).cast("decimal(38,0)")
    val add = manifest(newRows, group, content, weight)
      .select(col("group"), col("n_rows").as("__an"),
        col("total_weight").as("__aw"), col("digest").as("__ad"))
    stored.join(add, Seq("group"), "full_outer")
      .select(col("group"),
        (coalesce(col("n_rows"), lit(0L)) +
          coalesce(col("__an"), lit(0L))).as("n_rows"),
        (coalesce(col("total_weight"), zero) +
          coalesce(col("__aw"), zero)).as("total_weight"),
        (coalesce(col("digest"), zero) + coalesce(col("__ad"), zero))
          .as("digest"))
  }

  /** Vacuum/GC plan: stored files that no live manifest references.
    * Failed writes, superseded compactions, and takedown-retracted
    * shards all leave orphan objects behind; at 100 TB the reclaim
    * decision must be METADATA work — `files` is the object-store
    * listing (millions of rows), `referenced` the union of live
    * manifests' file lists, and one anti-join on name (hash join,
    * AQE-broadcast when the referenced list is small) yields the
    * delete set. Names referenced but absent from the listing are
    * someone else's problem (an integrity check, not GC) and fall out
    * of the anti-join for free. Output: (file, bytes, dir) per orphan;
    * [[vacuumSummary]] folds that into per-directory delete batches.
    */
  def vacuumOrphans(files: DataFrame, file: Column, bytes: Column,
                    referenced: DataFrame, ref: Column): DataFrame =
    files.select(file.as("file"), bytes.cast("long").as("bytes"))
      .join(referenced.select(ref.as("file")).distinct(), Seq("file"),
        "left_anti")
      .withColumn("dir", regexp_extract(col("file"), "^(.*)/[^/]*$", 1))

  /** Per-directory reclaim summary over [[vacuumOrphans]] output —
    * the shape object-store batch-delete calls take. */
  def vacuumSummary(orphans: DataFrame): DataFrame =
    orphans.groupBy("dir").agg(count(lit(1)).as("n_orphans"),
      sum(col("bytes")).as("reclaim_bytes"))

  /** Sorted-fill small-file compaction plan: files in `key` order (the
    * order that preserves clustering — compaction must merge ADJACENT
    * files or it destroys the sort/partition locality the layout was
    * built for), cumulative bytes, and merge group
    * `grp = floor(start_offset / targetBytes)` — each group's files
    * are exactly those whose byte range begins inside one
    * target-sized stripe, so group totals land within one max-file
    * size of the target with no sequential bin state.
    *
    * Operates on file METADATA (path, size) — millions of rows for a
    * 100 TB corpus, not billions — so the single flat cumulative-sum
    * window is deliberate: metadata scale, one reducer, exact.
    * Output: (file, bytes, cum, grp).
    */
  def compactionPlan(files: DataFrame, key: Column, bytes: Column,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    files.select(key.as("file"), bytes.cast("long").as("bytes"))
      .withColumn("cum", sum(col("bytes")).over(
        Window.orderBy(col("file"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("grp", floor((col("cum") - col("bytes")).cast("double") /
        lit(targetBytes.toDouble)))
  }
}
