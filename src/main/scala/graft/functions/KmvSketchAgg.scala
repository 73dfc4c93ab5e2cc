package graft.functions

import java.util.TreeSet

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as one custom aggregate.
  *
  * Keeps the k smallest DISTINCT values of a hash column per group.
  * From the kth-smallest hash over a hash space of size M the distinct
  * count is estimated as `(k-1) * M / kth`; with fewer than k distinct
  * hashes the sketch IS the exact distinct set. This is the classic
  * mergeable distinct sketch (Bar-Yossef et al. 2002) — the same role
  * HyperLogLog plays, chosen here because its estimate is a pure
  * deterministic function of the data given the hash, so the whole
  * operator is oracle-checkable cross-engine when fed an md5-derived
  * portable hash (Spark's own approx_count_distinct HLL±, by contrast,
  * is engine-private).
  *
  * Scale design: state is a bounded TreeSet of ≤ k longs per group —
  * constant memory regardless of group size, mergeable (union, trim to
  * k), planned via ObjectHashAggregate with map-side partial
  * aggregation, so the shuffle carries one ≤ k-long sketch per
  * (partition, group), never the raw values. At 100 TB this is the
  * difference between a distinct-count that fits in memory and one
  * that shuffles every row.
  *
  * eval() returns the sorted ascending array of the ≤ k minima;
  * estimator arithmetic stays in the query layer so the oracle SQL can
  * mirror it exactly.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[java.lang.Long]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TreeSet[java.lang.Long] =
    new TreeSet[java.lang.Long]()

  private def add(buf: TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      // TreeSet ignores duplicates, so only trim when the add grew it
      if (buf.add(h) && buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: TreeSet[java.lang.Long], input: InternalRow): TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TreeSet[java.lang.Long], b2: TreeSet[java.lang.Long]): TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
}

object KmvSketchAgg {
  /** Aggregate Column: sorted array of the k smallest distinct values
    * of `hashCol` (fewer if the group has < k distinct hashes).
    */
  def kMinima(hashCol: Column, k: Int): Column =
    GraftBridge.column(KmvSketchAgg(GraftBridge.expression(hashCol), k)
      .toAggregateExpression())
}
