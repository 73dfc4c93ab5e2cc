package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made the classic converters (`classic.ExpressionUtils`)
  * private[sql]; third-party expression libraries conventionally expose
  * them through a small object in the org.apache.spark.sql package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function into an ALREADY-RUNNING session's registry —
    * the runtime-registration twin of GraftExtensions (which covers
    * sessions built with spark.sql.extensions).
    */
  def registerFunction(spark: SparkSession,
                       name: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)

  /** AnalysisException with a plain message — the (message) constructor
    * is private[sql] in Spark 4; SQL-facing argument validation (bad
    * literal args to graft's function builders) should surface as an
    * analysis error, not a raw IllegalArgumentException.
    */
  def analysisError(message: String): AnalysisException =
    new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100", // generic pass-through message class
      messageParameters = Map("message" -> message))

  /** A releasable lineage cut with its release handle. `release()`
    * unpersists the backing RDD blocks; the frame stays CORRECT
    * afterwards (the RDD keeps its dependency chain, unlike
    * localCheckpoint, whose blocks are both unreleasable via
    * Dataset.unpersist and unrecoverable if lost) — consuming the
    * frame after release merely recomputes.
    */
  final case class CutFrame(df: Dataset[Row], release: () => Unit,
                            eagerCount: Option[Long] = None)

  /** Cut a DataFrame's lineage at the SQL layer with RELEASABLE
    * storage: materializes the physical plan's InternalRow RDD under a
    * persist and rebuilds the frame as a leaf (LogicalRDD) over it.
    *
    * Why not the alternatives, for iterative operators (connected
    * components, Lloyd rounds, LSH self-joins):
    *   - plain persist does NOT cut the logical plan — each round
    *     embeds the previous round's tree several times, so plans grow
    *     EXPONENTIALLY and a ~12-round run dies inside plan
    *     stringification before anything executes (measured; see
    *     DedupClusters);
    *   - localCheckpoint cuts lineage but its blocks ignore
    *     Dataset.unpersist and survive until session teardown, and a
    *     lost block is unrecoverable (lineage truncated).
    * This cut gives both properties: the logical plan collapses to a
    * leaf (plans stay constant-size across rounds) AND the blocks are
    * individually releasable — release the PREVIOUS round as soon as
    * the next is materialized and retention stays O(1) rounds.
    *
    * Rows are defensively copied before caching (the physical plan may
    * reuse row buffers); the cut is lazy — force it with an action (the
    * iterative loops' convergence counts do) or `eager = true`.
    */
  private val trackedCuts =
    new ThreadLocal[scala.collection.mutable.Set[Int]]

  /** Test hook: run `body` and also return the ids of every cut RDD
    * the CALLING THREAD persisted inside it. Storage assertions on a
    * SHARED SparkContext (concurrent test suites) cannot attribute
    * global persisted-RDD deltas to one invocation — this gives exact
    * ownership instead. Frames are registered at creation on the
    * calling thread, so executor-side work never races the buffer.
    */
  def trackCuts[T](body: => T): (T, Set[Int]) = {
    val buf = scala.collection.mutable.Set.empty[Int]
    val prev = trackedCuts.get
    trackedCuts.set(buf)
    try { val r = body; (r, buf.toSet) }
    finally { if (prev == null) trackedCuts.remove() else trackedCuts.set(prev) }
  }

  def persistCutFrame(df: Dataset[Row], eager: Boolean = false,
                      keepPartitioning: Boolean = false): CutFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
      .setName("graft-cut")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(trackedCuts.get).foreach(_ += rdd.id)
    // the eager materialization IS a count — carry it so callers that
    // need the row count (iterative convergence checks) don't pay a
    // second job for a number the persist already computed
    val eagerCount = if (eager) Some(rdd.count()) else None
    // keepPartitioning: rebuild the leaf WITH the physical plan's
    // output partitioning/ordering (LogicalRDD.fromDataset — the same
    // mechanism Dataset.localCheckpoint uses), so a consumer that
    // re-keys by the cut's partitioning column plans NO new Exchange.
    // Iterative trainers (HashedNgram's per-iteration doc_id
    // aggregations/joins over the features cut) otherwise re-shuffle
    // the corpus-proportional cut once per consumer per round. Plain
    // internalCreateDataFrame stays the default: a partitioning-less
    // leaf lets AQE pick fresh (possibly coalesced) partitioning,
    // which is right for one-shot barriers.
    val frame =
      if (keepPartitioning)
        classic.Dataset.ofRows(spark, execution.LogicalRDD.fromDataset(
          rdd, ds, isStreaming = false))
      else spark.internalCreateDataFrame(rdd, ds.schema)
    CutFrame(frame, () => {
      rdd.unpersist(blocking = false); ()
    }, eagerCount)
  }

  /** [[persistCutFrame]] without the handle — for one-shot barriers
    * whose blocks are released by the session-level sweep
    * (sparkContext.getPersistentRDDs.unpersist), which CAN free these
    * (and cannot free localCheckpoint blocks).
    */
  def persistCut(df: Dataset[Row]): Dataset[Row] = persistCutFrame(df).df

  /** Pin a BOUNDED-state frame's rows as a local relation (optimization
    * guide §2.4 — remove shuffles/jobs outright): trained codebooks,
    * IVF centroid tables and similar m·ksub / nlist-row results are
    * re-executed from their full plan every time a consumer broadcasts
    * or collects them (each `broadcast(book)` is its own job over the
    * corpus-aggregation subtree). Collecting ONCE at build time and
    * rebuilding the frame as a LocalRelation makes every downstream
    * broadcast a job-free LocalTableScan and every collect a no-op.
    *
    * Only for frames whose size is bounded by CONTRACT (the
    * collectBook / collectCentroids driver-state rule) — never corpus
    * -proportional data. Rows and schema are preserved exactly, so
    * consumers are bit-identical.
    */
  def pinLocalRelation(df: Dataset[Row]): Dataset[Row] = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Scale-adaptive spread for per-row-HEAVY map work (optimization
    * guide §2.5, "input skew: one huge unsplittable file ...
    * repartition immediately after the read"): local fixture tables
    * are single-row-group parquet files, so a scan is ONE partition
    * and an expensive map stage (gram explode + md5 Horner hashing,
    * shingling, tokenizer DP) serializes onto one core of the 32-core
    * box — measured 2.45 s of q188's 3.96 s total in two single-task
    * jobs. At cluster scale inputs arrive in hundreds of splits, so
    * this must be a NO-OP there: the spread fires only when the
    * frame's plan is exchange-free (a shuffle downstream already
    * partitions to config size) AND its scan parallelism is below
    * half the session's cores. Hash-repartition on the caller's key —
    * deterministic (safe under task retry, unlike rand-derived keys)
    * and sort-free (keyless round-robin pays a local sort,
    * SPARK-23207).
    *
    * Callers must be order-insensitive downstream (integer/decimal/
    * min-max aggregation grids): repartitioning changes row order, so
    * a raw IEEE double sum over the result could change bits.
    */
  def spreadForMapWork(df: Dataset[Row], key: Column): Dataset[Row] = {
    // streaming frames cannot be probed (no batch physical plan) and
    // must not be repartitioned behind the caller's back
    if (df.isStreaming) return df
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val p = ds.sparkSession.sparkContext.defaultParallelism
    val hasExchange = ds.queryExecution.executedPlan.collectFirst {
      case e: execution.exchange.ShuffleExchangeLike => e
      case a: execution.adaptive.AdaptiveSparkPlanExec => a
    }.isDefined
    // .rdd is planning-only here: an exchange-free plan is never
    // AQE-wrapped, so no stage executes
    if (hasExchange) df
    else if (ds.queryExecution.toRdd.getNumPartitions * 2 <= p)
      df.repartition(p, key)
    else df
  }
}
