package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkTestBase {

  import spark.implicits._

  test("dot product: ordered left fold over equal-length vectors") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(VecDot($"a", $"b").as("d")).as[Double].head()
    assert(got == 32.0)
  }

  test("mismatched lengths yield null, not a truncated product (codegen path)") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 1f)),
      (Array(1f, 2f), Array(1f, 1f))).toDF("a", "b")
    val rows = df.select(VecDot($"a", $"b").as("d")).collect()
    assert(rows(0).isNullAt(0), "3-vs-2 elements must be null, not dot of the prefix")
    assert(rows(1).getDouble(0) == 3.0)
  }

  test("mismatched lengths yield null on the interpreted path too") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val at = ArrayType(FloatType, containsNull = false)
    val e = VecDot(BoundReference(0, at, nullable = true),
      BoundReference(1, at, nullable = true))
    val bad = InternalRow(
      ArrayData.toArrayData(Array(1f, 2f, 3f)), ArrayData.toArrayData(Array(1f, 1f)))
    assert(e.eval(bad) == null)
    val ok = InternalRow(
      ArrayData.toArrayData(Array(1f, 2f)), ArrayData.toArrayData(Array(3f, 4f)))
    assert(e.eval(ok) == 11.0)
  }

  test("null input propagates null") {
    val df = Seq((Array(1f), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(VecDot($"a", $"b").as("d")).collect()(0).isNullAt(0))
  }

  test("null ELEMENT yields null — agreeing with the HOF fold the rewrite replaces") {
    val df = Seq(
      (Array[java.lang.Float](1f, null, 2f), Array[java.lang.Float](4f, 5f, 6f)),
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f)))
      .toDF("a", "b")
    val native = df.select(VecDot($"a", $"b").as("d")).collect()
    assert(native(0).isNullAt(0), "null element must poison the product, not read as 0")
    assert(native(1).getDouble(0) == 11.0)
    // the composable form agrees row for row
    val hof = df.select(aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d")).collect()
    assert(hof(0).isNullAt(0) && hof(1).getDouble(0) == 11.0)
  }
}
