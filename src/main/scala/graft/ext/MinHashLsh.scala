package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection — the linear-shuffle
  * scale path for corpus-wide near-dedup (exact ShingleJaccard is
  * quadratic in per-shingle document frequency; this is the standard
  * 100 TB alternative).
  *
  * Pipeline (all codegen'd built-ins, no UDFs):
  *   shingle set → k minhashes (min over xxhash64(seed=h, shingle)) →
  *   b bands of r = k/b hashes → band-hash bucket join → candidate
  *   pairs → verify (signature-estimated or exact array-intersect
  *   Jaccard — candidates are few, so the exact rerank happens on
  *   in-row arrays, no explode).
  *
  * Banding math: P(candidate) = 1 - (1 - j^r)^b; with k=128, b=32, r=4
  * the S-curve crosses ~0.5 at j≈0.59.
  *
  * Determinism: hash seeds are literal ints folded into xxhash64 — the
  * same signature on any cluster, any partitioning.
  */
object MinHashLsh {

  /** k-minhash signature (array<long>) of a shingle array. */
  def signature(shingles: Column, k: Int): Column =
    array((0 until k).map(h => array_min(transform(shingles, s => xxhash64(lit(h), s)))): _*)

  /** Jaccard estimate from two signatures: fraction of agreeing slots. */
  def estimateJaccard(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") / k

  /** Near-dup pairs with estimated (and optionally exact) Jaccard.
    *
    * @param n          character-shingle width
    * @param k          minhashes (signature length)
    * @param bands      LSH bands (k % bands == 0)
    * @param threshold  min Jaccard to keep
    * @param exact      verify candidates with exact shingle-set Jaccard
    *                   (array_intersect on the pair row) instead of the
    *                   signature estimate
    */
  def nearDupPairs(df: DataFrame, id: Column, text: Column, n: Int = 3,
                   k: Int = 128, bands: Int = 32, threshold: Double = 0.7,
                   exact: Boolean = true,
                   shingler: (Column, Int) => Column = ShingleJaccard.charShingles): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands

    // Explode + k codegen'd min-aggregates instead of per-row array
    // transforms: higher-order functions (transform/aggregate) are
    // interpreted expressions outside whole-stage codegen — on a large
    // corpus the explode/agg form is several times faster and spills
    // safely. One shuffle on the doc id.
    // note: measured at sf0.1 — checkpointing this exploded frame to
    // share it between the signature and rerank branches does NOT help;
    // native shingling is cheap enough that recomputation beats
    // materialization
    val ex = df.select(id.as("__id"), explode(shingler(text, n)).as("__sh"))
    val minCols = (0 until k).map(h => min(xxhash64(lit(h), col("__sh"))).as(s"__m$h"))
    // one pass computes the signature AND (when reranking exactly) the
    // shingle set — a second explode+shuffle of the corpus would double
    // the dominant cost
    val sig = ex.groupBy("__id").agg(minCols.head, minCols.tail: _*)

    // band hash = one multi-arg xxhash64 over the band's min columns —
    // no intermediate arrays; banded rows carry (id, bandHash) only.
    val bandCols = (0 until bands).map { bd =>
      xxhash64((lit(bd) +: (bd * r until (bd + 1) * r).map(i => col(s"__m$i"))): _*)
    }
    val banded = sig.select(col("__id"), explode(array(bandCols: _*)).as("__bh"))

    val a = banded.select(col("__id").as("id1"), col("__bh"))
    val b = banded.select(col("__id").as("id2"), col("__bh"))
    // candidate pairs are tiny (two ids per row) but feed three plan
    // branches — materialize once (lazy local checkpoint) so the band
    // join does not re-execute per branch
    val cand = a.join(b, a("__bh") === b("__bh") && col("id1") < col("id2"))
      .select("id1", "id2").dropDuplicates("id1", "id2")
      .localCheckpoint(false)

    // attach payloads to the (few) surviving candidate pairs only. For
    // the exact rerank, shingle sets are aggregated ONLY for documents
    // that appear in a candidate pair (semi-join first): at corpus
    // scale the rerank payload is proportional to candidates, not to
    // the corpus.
    val scored = if (exact) {
      val candIds = cand.select(col("id1").as("__id"))
        .unionAll(cand.select(col("id2").as("__id"))).distinct()
      val sets = ex.join(candIds, Seq("__id"), "left_semi")
        .groupBy("__id").agg(collect_set(col("__sh")).as("__shs"))
      val inter = size(array_intersect(col("__sh1"), col("__sh2")))
      cand
        .join(sets.select(col("__id").as("id1"), col("__shs").as("__sh1")), "id1")
        .join(sets.select(col("__id").as("id2"), col("__shs").as("__sh2")), "id2")
        .withColumn("jaccard", inter.cast("double") /
          (size(col("__sh1")) + size(col("__sh2")) - inter))
    } else {
      val sigArr = sig.select(col("__id"),
        array((0 until k).map(i => col(s"__m$i")): _*).as("__sig"))
      cand
        .join(sigArr.select(col("__id").as("id1"), col("__sig").as("__sig1")), "id1")
        .join(sigArr.select(col("__id").as("id2"), col("__sig").as("__sig2")), "id2")
        .withColumn("jaccard", estimateJaccard(col("__sig1"), col("__sig2"), k))
    }

    scored.filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }
}
