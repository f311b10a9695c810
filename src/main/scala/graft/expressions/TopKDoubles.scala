package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native mergeable exact top-k aggregate: `graft_topk(value, k)` returns
  * the k largest doubles per group, sorted descending.
  *
  * This is the engine's `TypedImperativeAggregate` extension surface — the
  * aggregate tier below `Aggregator` (operators/VectorAgg.scala): the
  * buffer is an arbitrary JVM object (a size-bounded min-heap) that Spark
  * carries through partial aggregation, serializes into UnsafeRow bytes at
  * shuffle boundaries, and merges map-side — the same machinery the
  * built-in Datasketches aggregates (`hll_sketch_agg`, `approx_top_k`)
  * ride. Versus the window formulation (`row_number <= k`), the heap ships
  * k values per partition per group instead of sorting every row of the
  * group through a shuffle: O(n log k) work, O(groups·k) shuffle bytes —
  * at 100 TB the difference between a top-k and a global sort per key.
  *
  * Determinism: the result is the multiset of the k largest values (ties
  * keep whichever equal value entered first, but equal values are
  * indistinguishable in the output), sorted descending — identical to the
  * oracle's `row_number() ... WHERE rn <= k` projection of the value.
  */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
  with ImplicitCastInputTypes {

  require(k > 0, s"graft_topk k must be positive, got $k")

  private type Buf = java.util.PriorityQueue[java.lang.Double]

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  // AbstractDataType is private[sql]; inferred Seq[DoubleType.type] conforms.
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Double])
      if (buf.size > k) buf.poll() // evict the smallest of the k+1
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.iterator()
    while (it.hasNext) {
      b1.add(it.next())
      if (b1.size > k) b1.poll()
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val n = buf.size
    val arr = new Array[Double](n)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = arr(n - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.add(bb.getDouble); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_topk"
}

object TopKDoubles {
  /** Register `graft_topk(value, k)`; k must be an integer literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => TopKDoubles(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue),
      "built-in")
}
