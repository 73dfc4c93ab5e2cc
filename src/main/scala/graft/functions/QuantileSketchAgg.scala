package graft.functions

import java.util.TreeMap

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Mergeable bounded quantile sketch: a bottom-k-by-hash DISTINCT
  * sample of the value column, with EXACT per-value row counts for the
  * sampled values (Gibbons' distinct sampling, the same family as
  * [[KmvSketchAgg]]).
  *
  * Why this over KLL/t-digest: those sketches' states depend on
  * compaction/merge ORDER, so two runs over different partitionings
  * produce different (if similarly-accurate) cutoffs — breaking this
  * repo's discipline that every operator be deterministic,
  * partition-invariant, and oracle-checkable. The bottom-k sample is a
  * pure function of the input MULTISET:
  *
  *   - the surviving keys are the k smallest distinct (hash, value)
  *     pairs of the union — order-insensitive by definition;
  *   - counts are exact for survivors: a key in the FINAL bottom-k is
  *     in the bottom-k of every prefix/subset that contains it (a
  *     subset's kth-smallest is ≥ the superset's), so it is never
  *     evicted mid-stream and every one of its rows is counted.
  *
  * Estimator: the sample is a uniform sample of DISTINCT values, each
  * carrying its exact multiplicity — a Horvitz-Thompson-weighted cdf.
  * The p-quantile estimate is the smallest sampled value whose
  * cumulative count reaches p × (total sampled count). Rank error is
  * O(1/√k) (sampling error) vs KLL's O(1/k) at equal state — the price
  * of determinism; k=256-1024 holds cutoff drift within a couple of
  * percentiles, measured in QuantileSketchSpec.
  *
  * Scale: state is ≤ k (hash, value, count) triples per group —
  * constant memory, ObjectHashAggregate partials, the shuffle carries
  * one ≤ k-entry sketch per (partition, group), never the metric rows.
  * Fed a PORTABLE hash (MinHashLsh.portableHash32), the whole sketch —
  * sample AND estimate — is reproducible in any engine with md5, so
  * sketch-based cutoffs are oracle-gated cross-engine (q85), not just
  * unit-tested.
  *
  * eval() returns array<struct<value double, count long>> sorted by
  * value ascending — cdf-ready; estimator arithmetic stays in the
  * query layer so oracle SQL mirrors it exactly.
  */
case class QuantileSketchAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeMap[QSketchKey, java.lang.Long]] {

  require(k >= 2, s"quantile sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("value", DoubleType, nullable = false),
      StructField("count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TreeMap[QSketchKey, java.lang.Long] =
    new TreeMap[QSketchKey, java.lang.Long](QSketchKey.ordering)

  private def add(buf: TreeMap[QSketchKey, java.lang.Long], key: QSketchKey, c: Long): Unit = {
    val present = buf.containsKey(key)
    if (present || buf.size < k ||
        QSketchKey.ordering.compare(key, buf.lastKey()) < 0) {
      buf.merge(key, c, (a, b) => java.lang.Long.valueOf(a + b))
      if (buf.size > k) { buf.pollLastEntry(); () }
    }
  }

  override def update(buf: TreeMap[QSketchKey, java.lang.Long],
                      input: InternalRow): TreeMap[QSketchKey, java.lang.Long] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      add(buf, QSketchKey(h.asInstanceOf[Long], v.asInstanceOf[Double]), 1L)
    buf
  }

  override def merge(b1: TreeMap[QSketchKey, java.lang.Long],
                     b2: TreeMap[QSketchKey, java.lang.Long]): TreeMap[QSketchKey, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(b1, e.getKey, e.getValue.longValue())
    }
    b1
  }

  override def eval(buf: TreeMap[QSketchKey, java.lang.Long]): Any = {
    // sample keys are ordered by hash; re-sort by VALUE for cdf use
    val entries = new Array[(Double, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey.value, e.getValue.longValue())
      i += 1
    }
    val sorted = entries.sortBy(_._1) // distinct values → value alone is a total order
    val out = new Array[Any](sorted.length)
    i = 0
    while (i < sorted.length) {
      out(i) = InternalRow(sorted(i)._1, sorted(i)._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TreeMap[QSketchKey, java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.hash); bb.putDouble(e.getKey.value)
      bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeMap[QSketchKey, java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      add(buf, QSketchKey(bb.getLong(), bb.getDouble()), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(hash = c(0), value = c(1))
}

/** Sample key: ordered by hash first (the sampling order), value as
  * the deterministic tiebreak for colliding hashes.
  */
final case class QSketchKey(hash: Long, value: Double)

object QSketchKey {
  val ordering: java.util.Comparator[QSketchKey] =
    new java.util.Comparator[QSketchKey] with Serializable {
      override def compare(a: QSketchKey, b: QSketchKey): Int = {
        val c = java.lang.Long.compare(a.hash, b.hash)
        if (c != 0) c else java.lang.Double.compare(a.value, b.value)
      }
    }
}

object QuantileSketchAgg {
  /** Aggregate Column: array<struct<value,count>> — the bottom-k-by-
    * hash distinct sample of `value` with exact per-value counts,
    * sorted by value ascending. Feed `hash` with a PORTABLE hash of
    * the value for cross-engine reproducibility.
    *
    * Inputs are cast here (hash→long, value→double): update() reads
    * the buffers with unchecked casts, so an int hash or a decimal
    * value column fed raw would ClassCastException at runtime —
    * casting in the public builder makes the contract type-safe for
    * any numeric input without a per-row branch in the hot path.
    */
  def sample(hash: Column, value: Column, k: Int): Column =
    GraftBridge.column(QuantileSketchAgg(
      GraftBridge.expression(hash.cast("long")),
      GraftBridge.expression(value.cast("double")), k)
      .toAggregateExpression())
}
