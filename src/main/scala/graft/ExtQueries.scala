package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.CoreQueries.Q

/** LLM-training-pipeline extension queries (dedup, similarity, text
  * analysis) — filled in incrementally; see graft.ext.
  */
object ExtQueries {
  val all: Seq[Q] = Seq.empty
}
