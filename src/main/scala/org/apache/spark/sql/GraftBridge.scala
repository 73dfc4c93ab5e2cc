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
  final case class CutFrame(df: Dataset[Row], release: () => Unit)

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

  def persistCutFrame(df: Dataset[Row], eager: Boolean = false): CutFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val rdd = ds.queryExecution.toRdd.map(_.copy())
      .setName("graft-cut")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(trackedCuts.get).foreach(_ += rdd.id)
    if (eager) rdd.count()
    CutFrame(spark.internalCreateDataFrame(rdd, ds.schema), () => {
      rdd.unpersist(blocking = false); ()
    })
  }

  /** [[persistCutFrame]] without the handle — for one-shot barriers
    * whose blocks are released by the session-level sweep
    * (sparkContext.getPersistentRDDs.unpersist), which CAN free these
    * (and cannot free localCheckpoint blocks).
    */
  def persistCut(df: Dataset[Row]): Dataset[Row] = persistCutFrame(df).df
}
