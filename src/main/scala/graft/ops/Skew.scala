package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives.
  *
  * AQE's skew-join split handles most runtime skew; these are for the
  * cases planned around it: hot grouping keys (one reducer receives a
  * disproportionate share of rows) and broadcast-ineligible joins with
  * a few hot keys.
  */
object Skew {

  /** Two-phase ("salted") aggregation for hot grouping keys: phase 1
    * aggregates on (key, salt) — spreading each hot key over `buckets`
    * reducers — phase 2 combines the partials per key. Correct for any
    * aggregate with an associative merge; the caller supplies both
    * phases (e.g. count → sum, sum → sum, min → min).
    *
    * The salt is row-positional (monotonically_increasing_id mod
    * buckets), NOT content-derived: a hot key whose rows are byte-
    * identical — the common skew case — would hash every row to ONE
    * bucket and defeat the mitigation entirely. Positional salt
    * spreads uniformly regardless of content; it is stable for a given
    * scan partitioning (not across arbitrary re-partitionings, which
    * aggregation correctness does not require).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                phase1: Seq[(String, Column)],   // outName -> agg expr
                phase2: String => Column          // outName -> combiner over phase-1 col
               ): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val p1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head._2.as(phase1.head._1),
        phase1.tail.map { case (n, c) => c.as(n) }: _*)
    p1.groupBy(keys.map(col): _*)
      .agg(phase2(phase1.head._1).as(phase1.head._1),
        phase1.tail.map { case (n, _) => phase2(n).as(n) }: _*)
  }

  /** Salted count per key — the common case packaged. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets,
      Seq("count" -> count(lit(1))),
      n => sum(col(n)))

  /** Salted equi-join for hot join keys: the fact side tags each row
    * with a positional salt in [0, buckets); the dimension side is
    * REPLICATED once per salt value; the join runs on (key, salt) — a
    * hot key's rows now land on `buckets` reducers instead of one.
    * Exactly the plain inner/left join's rows (the salt is join-
    * invariant bookkeeping, dropped on output).
    *
    * When to use: the dimension is too big to broadcast AND a few fact
    * keys are hot enough that AQE's skew split (which only splits the
    * oversized partitions of a sort-merge join after materialization)
    * still leaves a straggler — pre-salting spreads the key BEFORE the
    * first shuffle. Cost: dim shuffles `buckets`× its size; size
    * buckets to the skew ratio, not higher.
    *
    * Same positional-salt reasoning as [[saltedAgg]]: content-derived
    * salts collapse for byte-identical hot rows; join correctness
    * needs no cross-run stability, only that each fact row carries ONE
    * salt value.
    *
    * RETRY CAVEAT (positional mode): monotonically_increasing_id is
    * nondeterministic across recomputes — under a partial map-stage
    * retry (shuffle-fetch failure) a recomputed fact row can receive a
    * different salt than the original attempt and be routed to a
    * different reducer mid-join. Per-row output is salt-invariant, so
    * this only matters when a stage retry overlaps a running reduce —
    * routine at the 1000-executor scale this repo targets. When the
    * facts carry a UNIQUE row key (not the hot join key — a unique
    * key's hash spreads even when join-key values are byte-identical),
    * pass it as `saltKey`: the salt becomes pmod(xxhash64(saltKey),
    * buckets) — a pure function of the row, deterministic across
    * recomputes, with the same uniform spread.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner",
                 saltKey: Option[Column] = None): DataFrame = {
    require(buckets > 0)
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left joins, got $joinType")
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves '__salt'; an input already carries it — rename first")
    val salt = saltKey match {
      case Some(key) => pmod(xxhash64(key), lit(buckets.toLong))
      case None => pmod(monotonically_increasing_id(), lit(buckets.toLong))
    }
    val saltedFacts = facts.withColumn("__salt", salt)
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    saltedFacts.join(replicatedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
