package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic ×N blowup of a testdata star-schema directory, used by
  * Bench's second pass: at sf0.1 fixed per-query cost dominates
  * (BASELINE.md), so a data-proportional defect — a missed pushdown, a
  * shuffle that grew, a join that stopped broadcasting — is invisible.
  * ×10 of sf0.1 ≈ sf1 and makes growth curves measurable while the
  * driver keeps verifying correctness at the original SF.
  *
  * Shape preserved per copy: fact-table keys are offset by a
  * copy-stride so foreign keys stay consistent WITHIN a copy (the
  * star schema is replicated, not scrambled); the nation/region
  * dimensions keep a single copy, so dimension joins stay broadcast
  * size exactly as a real sf1 would. Document text is perturbed per
  * copy so near-dup structure is replicated per copy rather than
  * creating ×N exact-duplicate clusters of every document.
  *
  * Idempotent: skipped when the output's _GRAFT_BLOWUP marker already
  * records the same (source, times).
  */
object Blowup {

  private val Stride = 1000000000L

  /** fact table → long key columns offset per copy */
  private val factKeys: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val dims = Seq("nation", "region")

  /** @param tables restrict the build to these fact tables (default:
    *                all) — the ×100 tier only needs `documents`, and
    *                writing 100× of lineitem for it would dwarf the
    *                measurement itself.
    */
  def build(spark: SparkSession, srcDir: String, outDir: String, times: Int,
            tables: Set[String] = factKeys.keySet): String = {
    val marker = new java.io.File(outDir, "_GRAFT_BLOWUP")
    val stamp = s"$srcDir x$times ${tables.toSeq.sorted.mkString(",")}"
    if (marker.isFile &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath)) == stamp)
      return outDir

    def copies(name: String): DataFrame = {
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
      (0 until times).map { c =>
        val withKeys = factKeys(name).foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(c * Stride))
        }
        if (name == "documents")
          withKeys.withColumn("text", concat(col("text"), lit(s" copymark$c")))
        else withKeys
      }.reduce(_ unionAll _)
    }

    factKeys.keys.filter(tables).foreach { name =>
      copies(name).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    dims.foreach { name =>
      spark.read.parquet(s"$srcDir/$name.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    java.nio.file.Files.write(marker.toPath, stamp.getBytes)
    outDir
  }
}
