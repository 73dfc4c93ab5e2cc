package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as one custom
  * aggregate: a depth×width counter matrix where each input bumps one
  * counter per row. Estimates (`min` over the key's d counters) can
  * only OVER-count — collisions add, never subtract — which is the
  * property the heavy-hitter confirm pass in [[graft.ext.CountMin]]
  * relies on: sketch candidates are a superset of the true heavy
  * hitters, and an exact count over just the candidates removes the
  * false positives.
  *
  * The input is the key's PRECOMPUTED column-index array (one index
  * per sketch row, values in [0, width)), built in the query layer
  * from the portable md5-derived affine family
  * ([[graft.ext.MinHashLsh.portableHash32]] — engine-mirrorable), so
  * hashing stays codegen'd and oracle-checkable and this aggregate is
  * pure counting — the same split KmvSketchAgg uses.
  *
  * Scale design: state is a fixed depth*width long array per group —
  * constant memory regardless of input size, mergeable by element-wise
  * add, planned via ObjectHashAggregate with map-side partials, so the
  * shuffle carries one sketch per (partition, group), never the keys.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = v.asInstanceOf[ArrayData]
      require(idx.numElements() == depth,
        s"count_min: index array has ${idx.numElements()} entries, sketch depth is $depth")
      var j = 0
      while (j < depth) {
        val c = idx.getLong(j)
        require(c >= 0 && c < width, s"count_min: column $c outside [0, $width)")
        buf(j * width + c.toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c.head)
}

object CountMinAgg {
  /** Aggregate Column: the group's depth×width counter matrix,
    * flattened row-major (index j*width+c), from per-input column
    * index arrays.
    */
  def sketch(indexCol: Column, depth: Int, width: Int): Column =
    GraftBridge.column(CountMinAgg(GraftBridge.expression(indexCol), depth, width)
      .toAggregateExpression())
}
