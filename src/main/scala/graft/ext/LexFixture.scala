package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-wide MATERIALIZED premise state for the lexical-index gate
  * family (q141/q144/q145/q146/q151/q152/q154) — the q95
  * analytic-fixture precedent applied to the lexical stack.
  *
  * Those gates measure index-SERVING operators (probe, admit,
  * retract, refresh, packed serving): their documented claim is "no
  * corpus text touched", serving from state a prior build persisted.
  * But [[Bm25.buildIndex]] returns LAZY frames, so constructing the
  * premise inside the gate put a full tokenize-and-aggregate pass
  * inside every timed region — the five most expensive sf0.1 gates
  * after the CC family were all rebuilding the same premise from text
  * (r11 verdict), re-measuring q142's job (index construction, which
  * keeps its own gate) instead of their own.
  *
  * This object materializes each distinct premise ONCE per process
  * per (session, sfDir, key) — write to tmp parquet, read back — so
  * the gate's plan serves from a parquet scan of persisted state:
  * exactly the serving lifecycle the [[Bm25.LexIndex]] scaladoc
  * documents ("build once per corpus snapshot, write all three frames
  * to parquet, probe forever"). Results are byte-identical (long /
  * string / array<struct<long,long>> round-trip parquet exactly and
  * every consumer is partition-invariant), so the oracles are
  * untouched.
  *
  * The cache key includes the session identity: a test JVM that stops
  * and recreates sessions rebuilds rather than probing frames bound
  * to a dead session. First in-process access always overwrites the
  * tmp directory — state left by an earlier process (older code, or
  * an aborted run) can never leak in.
  */
object LexFixture {

  // ConcurrentHashMap.computeIfAbsent, NOT TrieMap.getOrElseUpdate
  // (ADVICE r12): the TrieMap form was not atomic — two threads racing
  // the same key could BOTH run the build, each writing
  // mode(overwrite) to the same tmp parquet root while the other's
  // returned reader frame was live. computeIfAbsent runs the build
  // under the bin lock, so exactly one build happens per key and no
  // reader ever observes a concurrent overwrite of its files.
  private val idxCache =
    new java.util.concurrent.ConcurrentHashMap[String, Bm25.LexIndex]
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  // Session identity for the key: applicationId + identityHashCode.
  // identityHashCode alone can collide across a stopped-and-recreated
  // session (the JVM may reuse the address), which would serve frames
  // bound to a dead session; the applicationId (unique per
  // SparkContext) breaks that tie.
  private def cacheKey(s: SparkSession, dir: String, key: String): String =
    s"${s.sparkContext.applicationId}@${System.identityHashCode(s)}#$dir#$key"

  private def root(cacheKey: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(cacheKey.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // repo-owned scratch, not java.io.tmpdir: a /tmp reaper deleting
    // the materialized frames mid-run killed the r14 bench's sibling
    // shuffle files (GraftSession.scratchRoot scaladoc)
    s"${graft.GraftSession.scratchRoot}/graft_lexfix_$digest"
  }

  /** Materialized [[Bm25.LexIndex]]: `build` runs once per process
    * per (session, dir, key); both frames persist to tmp parquet and
    * the returned index reads from there. The two scalars are exact
    * driver longs either way.
    */
  def index(s: SparkSession, dir: String, key: String)
           (build: => Bm25.LexIndex): Bm25.LexIndex =
    idxCache.computeIfAbsent(cacheKey(s, dir, key), ck => {
      val idx = build
      val r = root(ck)
      idx.postings.write.mode("overwrite").parquet(s"$r/postings")
      idx.docLens.write.mode("overwrite").parquet(s"$r/doclens")
      Bm25.LexIndex(s.read.parquet(s"$r/postings"),
        s.read.parquet(s"$r/doclens"), idx.nDocs, idx.totalTokens)
    })

  /** Materialized premise frame (e.g. [[Bm25.termPositions]] state)
    * under the same once-per-process contract.
    */
  def frame(s: SparkSession, dir: String, key: String)
           (build: => DataFrame): DataFrame =
    dfCache.computeIfAbsent(cacheKey(s, dir, key), ck => {
      val df = build
      val r = root(ck)
      df.write.mode("overwrite").parquet(s"$r/frame")
      s.read.parquet(s"$r/frame")
    })
}
