package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-slot minhash signature as ONE custom aggregate.
  *
  * The composable formulation (k separate `min(mix_i(h))` aggregate
  * columns) works, but k≈64-128 distinct aggregate expressions balloon
  * the generated aggregation class — janino compilation dominates a
  * cold run, and near Spark's codegen field limits the stage falls out
  * of whole-stage codegen entirely (see SimHashAgg for the same
  * failure mode). This TypedImperativeAggregate keeps the k running
  * minima in one long[] buffer, applies the k bijective multiply-add
  * permutations of the base hash in a tight JVM loop (constants
  * precomputed once per operator), merges elementwise, and finishes to
  * array<bigint>. Planned via ObjectHashAggregate; map-side partial
  * aggregation still applies, so the shuffle carries one signature per
  * (partition, id) — not per shingle.
  *
  * Input: the 64-bit base hash of a shingle (e.g. xxhash64(shingle)).
  * Slot i applies `h * a_i + b_i` with odd `a_i` — wrapping mod-2^64
  * multiply-add, a genuine permutation of hash space (the "one hash,
  * k permutations" minhash scheme). Constants are splitmix64 of the
  * slot index: deterministic on any cluster, any partitioning.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(i => MixHash64.mulConst(i))
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(i => MixHash64.addConst(i))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val m = h * as(i) + bs(i)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
}

object MinHashAgg {
  /** Aggregate Column: k-minhash signature of a base-hash column. */
  def minhash(hashCol: Column, k: Int): Column =
    GraftBridge.column(MinHashAgg(GraftBridge.expression(hashCol), k)
      .toAggregateExpression())
}
