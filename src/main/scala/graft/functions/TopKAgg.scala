package graft.functions

import java.util.TreeMap

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
  * The buffer is a MULTISET (count-carrying TreeMap): two input rows
  * with identical (score, id) in one group are both retained, exactly
  * as the row_number() window formulation emits both — a plain
  * ordered-set buffer would silently collapse them and return fewer
  * rows than the SQL mirror for callers whose id isn't unique.
  *
  * eval() returns array<struct<score, id>> strongest-first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(TopKEntry(s.asInstanceOf[Double], i.asInstanceOf[Long]), 1, k)
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    val it = b2.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.add(e.getKey, e.getValue, k)
    }
    b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.total)
    val it = buf.entries.descendingMap().entrySet().iterator() // strongest first
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue.intValue()
      while (c > 0) {
        out(i) = InternalRow(e.getKey.score, e.getKey.id)
        i += 1; c -= 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.entries.size * 20)
    bb.putInt(buf.entries.size)
    val it = buf.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.getKey.score); bb.putLong(e.getKey.id); bb.putInt(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val e = TopKEntry(bb.getDouble(), bb.getLong())
      val c = bb.getInt()
      buf.add(e, c, k)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(score = c(0), id = c(1))
}

/** Bounded multiset of the strongest ≤ k entries: TreeMap keyed
  * weakest-first with per-entry multiplicities, plus the tracked total
  * so capacity checks are O(1). Mutation is only via [[add]], which
  * evicts the weakest entries once `total` exceeds k.
  */
final class TopKBuffer {
  val entries = new TreeMap[TopKEntry, Integer](TopKEntry.weakestFirst)
  var total: Int = 0

  /** Add `count` copies of `e`, keeping only the strongest k overall. */
  def add(e: TopKEntry, count: Int, k: Int): Unit = {
    if (total >= k && TopKEntry.weakestFirst.compare(e, entries.firstKey()) <= 0) return
    entries.merge(e, count, (a, b) => Integer.valueOf(a + b))
    total += count
    while (total > k) {
      val weakest = entries.firstEntry()
      val drop = math.min(weakest.getValue.intValue(), total - k)
      if (drop == weakest.getValue.intValue()) entries.remove(weakest.getKey)
      else entries.put(weakest.getKey, weakest.getValue - drop)
      total -= drop
    }
  }
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
