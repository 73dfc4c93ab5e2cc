package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-ngrams VECTORS — the model-free bridge from raw text
  * into the engine's vector stack: the same portable hashed
  * unigram+bigram features the classifier trains on
  * ([[HashedNgram.features]]'s grammar and bucket hash), reshaped as
  * (a) exact integer bucket-count vectors for cross-engine-checkable
  * cosine work and (b) L2-normalized float embeddings that feed the
  * unchanged [[EmbeddingSearch]] / [[Pca]] / [[SemDedup]] machinery.
  * This is lexical cosine similarity (near-dup / same-topic at the
  * vocabulary level) with NO trained model and NO vocab table — the
  * practical first pass where no embedding model has run over the
  * corpus yet.
  *
  * Division of labor: candidate GENERATION is owned by the banded
  * sketches ([[MinHashLsh]]/[[SimHash]] — bucketed, never all-pairs);
  * this module VERIFIES a given pair table with an exact integer rule
  * (the [[Containment]] discipline at the vector level):
  * cos(a,b) ≥ num/den  ⟺  dot²·den² ≥ num²·|a|²·|b|², all terms
  * integers (counts are integers, dot ≥ 0), the boundary never
  * floats. The cross-multiplication runs in DECIMAL(38,0) — dot² can
  * exceed 2^63 for long documents.
  *
  * Scale shape: counts are one gram explode + one (doc, bucket)
  * hash aggregation (map-side combined, md5 digests — gram text never
  * shuffles past the explode) folded dense per doc; `d` is bounded to
  * 4096 because the DENSE array face is for embedding work — the
  * classifier-scale sparse face (D up to 2²¹) stays long-format in
  * [[HashedNgram]]. Pair verification is two digest-keyed equi-joins
  * + a per-row expression; nothing is all-pairs.
  */
object HashedVec {

  /** Dense integer bucket-count vectors: (doc_id, bc array<long>[d],
    * n = Σ counts, nsq = Σ counts² — both exact). Documents with no
    * kept grams produce NO row (their vector is undefined), same
    * contract as [[HashedNgram.features]].
    */
  def bucketCounts(df: DataFrame, id: Column, text: Column, d: Int): DataFrame = {
    require(d >= 2 && d <= 4096,
      s"dense d in [2, 4096] (use HashedNgram's long format beyond), got $d")
    val kt = filter(split(lower(trim(text)), "\\s+"),
      t => t.rlike("^[a-z]{3,}$"))
    val bigrams = zip_with(
      slice(kt, lit(1), greatest(size(kt) - 1, lit(0))),
      slice(kt, lit(2), greatest(size(kt) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val bk = df.select(id.as("doc_id"),
        explode(concat(kt, bigrams)).as("__g"))
      .select(col("doc_id"),
        pmod(MinHashLsh.portableHash32(col("__g")), lit(d.toLong)).as("__b"))
    val m = bk.groupBy(col("doc_id"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(map_from_arrays(collect_list(col("__b")), collect_list(col("__c")))
        .as("__m"))
    m.select(col("doc_id"),
        transform(sequence(lit(0L), lit(d - 1L)),
          j => coalesce(element_at(col("__m"), j), lit(0L))).as("bc"))
      .withColumn("n", aggregate(col("bc"), lit(0L), (a, c) => a + c))
      .withColumn("nsq", aggregate(col("bc"), lit(0L), (a, c) => a + c * c))
  }

  /** L2-normalized float embeddings for the vector stack:
    * (doc_id, vec array<float>[d]), vec_j = c_j / √(Σc²). Rows exist
    * only for documents with at least one kept gram (nsq > 0), so the
    * norm is always defined and exactly 1 up to float rounding.
    */
  def embeddings(df: DataFrame, id: Column, text: Column, d: Int): DataFrame =
    bucketCounts(df, id, text, d)
      .select(col("doc_id"),
        transform(col("bc"), c =>
          (c.cast("double") / sqrt(col("nsq").cast("double"))).cast("float"))
          .as("vec"))

  /** Exact cosine verification of a candidate pair table:
    * (id1, id2, dot, n1sq, n2sq, similar) with
    * similar ⟺ cos ≥ num/den decided by the integer
    * cross-multiplication dot²·den² ≥ num²·n1sq·n2sq in
    * DECIMAL(38,0). Pairs whose either side has no count row (no kept
    * grams) are dropped by the inner joins — an undefined vector has
    * no cosine.
    */
  def cosinePairs(pairs: DataFrame, counts: DataFrame,
                  num: Int, den: Int): DataFrame = {
    require(num >= 0 && den >= 1 && num <= den,
      s"threshold num/den must satisfy 0 <= num <= den, got $num/$den")
    val c1 = counts.select(col("doc_id").as("id1"), col("bc").as("__bc1"),
      col("nsq").as("n1sq"))
    val c2 = counts.select(col("doc_id").as("id2"), col("bc").as("__bc2"),
      col("nsq").as("n2sq"))
    pairs.select(col("id1"), col("id2"))
      .join(c1, "id1").join(c2, "id2")
      .withColumn("dot",
        aggregate(zip_with(col("__bc1"), col("__bc2"), (a, b) => a * b),
          lit(0L), (a, t) => a + t))
      .select(col("id1"), col("id2"), col("dot"), col("n1sq"), col("n2sq"),
        (col("dot").cast("decimal(38,0)") * col("dot") * lit(den.toLong * den) >=
          col("n1sq").cast("decimal(38,0)") * col("n2sq") * lit(num.toLong * num))
          .as("similar"))
  }
}
