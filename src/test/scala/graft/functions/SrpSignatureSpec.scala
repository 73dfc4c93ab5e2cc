package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class SrpSignatureSpec extends SparkTestBase {

  import spark.implicits._

  /** The composable HOF formulation the native expression replaced —
    * kept here as the parity oracle (EmbeddingSearch.srpSignature
    * shipped exactly this tree before the codegen'd rewrite).
    */
  private def hofSignature(vec: Column, bits: Int): Column = {
    def planeComponent(p: Int, d: Column): Column =
      (pmod(xxhash64(lit(p), d), lit(1000000L)).cast("double") / 1000000.0) - 0.5
    (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
  }

  test("native signature is bit-identical to the HOF formulation") {
    // deterministic pseudo-random vectors of varied dimension,
    // including negatives, tiny magnitudes, and an empty vector
    val rng = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      val dim = 1 + rng.nextInt(64)
      (i.toLong, Array.fill(dim)((rng.nextGaussian() * (i % 5 + 0.01)).toFloat))
    } :+ (999L, Array.empty[Float])
    val df = vecs.toDF("id", "v")
    for (bits <- Seq(1, 8, 62)) {
      val mismatch = df.select(
        SrpSignature($"v", bits).as("native"),
        hofSignature($"v", bits).as("hof"))
        .filter($"native" =!= $"hof")
      assert(mismatch.isEmpty, s"bits=$bits: ${mismatch.collect().mkString(",")}")
    }
  }

  test("edge semantics: null array → null; null element → 0; empty vector → 0") {
    val df = Seq(
      (1L, Option(Array[java.lang.Float](1f, null, 2f))),
      (2L, Option.empty[Array[java.lang.Float]]),
      (3L, Option(Array[java.lang.Float]()))).toDF("id", "v")
    val rows = df.select($"id", SrpSignature($"v", 8).as("s")).orderBy($"id").collect()
    assert(rows(0).getLong(1) == 0L) // null element poisons every plane
    assert(rows(1).isNullAt(1))      // null input
    assert(rows(2).getLong(1) == 0L) // empty: sequence(0,-1) null-pads the fold
    // the HOF tree agrees on the non-null rows
    val hof = df.filter($"v".isNotNull)
      .select($"id", hofSignature($"v", 8).as("s")).orderBy($"id").collect()
    assert(hof(0).getLong(1) == 0L && hof(1).getLong(1) == 0L)
  }

  test("interpreted path matches codegen path") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val at = ArrayType(FloatType, containsNull = false)
    val e = SrpSignature(BoundReference(0, at, nullable = true), 16)
    val v = Array(0.5f, -1.25f, 3f, 0.0001f)
    val interpreted = e.eval(InternalRow(ArrayData.toArrayData(v)))
    val viaDf = Seq(Tuple1(v)).toDF("v")
      .select(SrpSignature($"v", 16)).as[Long].head()
    assert(interpreted == viaDf)
  }
}
