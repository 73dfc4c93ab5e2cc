package graft.functions

import java.util.TreeSet

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Grouped top-k as a MERGEABLE bounded aggregate — the scale
  * replacement for `row_number() OVER (PARTITION BY g ORDER BY s DESC)
  * <= k`: the window form shuffles and per-partition sorts EVERY row
  * of the fact table; this aggregate keeps a ≤ k-entry buffer per
  * group, merges map-side (ObjectHashAggregate partial agg), and
  * ships one ≤ k-entry state per (partition, group) through the
  * shuffle — "top 5 per domain" over 100 TB moves k rows per group,
  * not the corpus. (TakeOrderedAndProject covers only the GLOBAL
  * top-k; this is the grouped form.)
  *
  * Ordering is total and deterministic: score descending, id
  * ascending on ties — the exact order a SQL window mirror can
  * reproduce, which makes the operator oracle-checkable.
  *
  * eval() returns array<struct<score, id>> strongest-first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[TopKEntry]] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TreeSet[TopKEntry] =
    new TreeSet[TopKEntry](TopKEntry.weakestFirst)

  private def add(buf: TreeSet[TopKEntry], e: TopKEntry): Unit = {
    if (buf.size < k) { buf.add(e); () }
    else if (TopKEntry.weakestFirst.compare(e, buf.first()) > 0) {
      buf.add(e)
      if (buf.size > k) { buf.pollFirst(); () }
    }
  }

  override def update(buf: TreeSet[TopKEntry], input: InternalRow): TreeSet[TopKEntry] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(buf, TopKEntry(s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: TreeSet[TopKEntry], b2: TreeSet[TopKEntry]): TreeSet[TopKEntry] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: TreeSet[TopKEntry]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator() // strongest first
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.score, e.id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TreeSet[TopKEntry]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.score); bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[TopKEntry] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(TopKEntry(bb.getDouble(), bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(score = c(0), id = c(1))
}

final case class TopKEntry(score: Double, id: Long)

object TopKEntry {
  /** Total order, weakest first: lower score is weaker; on equal
    * scores the HIGHER id is weaker (so the kept set and its
    * strongest-first output order match `ORDER BY score DESC, id`).
    * Doubles compare via java.lang.Double (total order; data with
    * NaN/-0.0 subtleties should pre-normalize).
    */
  val weakestFirst: java.util.Comparator[TopKEntry] =
    new java.util.Comparator[TopKEntry] with Serializable {
      override def compare(a: TopKEntry, b: TopKEntry): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      }
    }
}

object TopKAgg {
  /** Aggregate Column: array<struct<score,id>> of the group's top k,
    * strongest first (score desc, id asc on ties).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKAgg(
      GraftBridge.expression(score), GraftBridge.expression(id), k)
      .toAggregateExpression())
}
