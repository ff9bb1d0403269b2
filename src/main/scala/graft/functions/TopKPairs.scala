package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded distributed top-k: a TypedImperativeAggregate whose PARTIAL
  * buffers hold at most k elements, so the shuffle after map-side
  * aggregation ships k rows per group per mapper — the primitive
  * `collect_list + slice` cannot express (its partials ship the whole
  * group). Input: struct<negsim: double, neighbor_id: long>; output:
  * array of the k lexicographically-smallest structs, ascending — i.e.
  * (sim desc, id asc) when negsim = -sim. This is TakeOrdered as an
  * aggregate function, keyed per group.
  */
final case class TopKPairs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[TopKPairs.Pair]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def nullable: Boolean = false
  override def dataType: DataType = TopKPairs.OutType
  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): PriorityQueue[TopKPairs.Pair] =
    new PriorityQueue[TopKPairs.Pair](k + 1, TopKPairs.WorstFirst)

  private def offer(buf: PriorityQueue[TopKPairs.Pair], p: TopKPairs.Pair): Unit =
    if (buf.size < k) buf.offer(p)
    else if (TopKPairs.cmp(p, buf.peek()) < 0) { buf.poll(); buf.offer(p) }

  override def update(buf: PriorityQueue[TopKPairs.Pair], input: InternalRow): PriorityQueue[TopKPairs.Pair] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      offer(buf, TopKPairs.Pair(row.getDouble(0), row.getLong(1)))
    }
    buf
  }

  override def merge(buf: PriorityQueue[TopKPairs.Pair], other: PriorityQueue[TopKPairs.Pair]): PriorityQueue[TopKPairs.Pair] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: PriorityQueue[TopKPairs.Pair]): Any = {
    val arr = new Array[TopKPairs.Pair](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, TopKPairs.BestFirst)
    new GenericArrayData(arr.map(p =>
      new GenericInternalRow(Array[Any](p.negsim, p.id))): Array[Any])
  }

  override def serialize(buf: PriorityQueue[TopKPairs.Pair]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putDouble(p.negsim); bb.putLong(p.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[TopKPairs.Pair] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(TopKPairs.Pair(bb.getDouble(), bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKPairs =
    copy(child = newChild)
}

object TopKPairs {
  final case class Pair(negsim: Double, id: Long)

  /** Lexicographic (negsim, id): smaller = better = higher similarity. */
  def cmp(a: Pair, b: Pair): Int = {
    val c = java.lang.Double.compare(a.negsim, b.negsim)
    if (c != 0) c else java.lang.Long.compare(a.id, b.id)
  }
  val BestFirst: Comparator[Pair] = (a: Pair, b: Pair) => cmp(a, b)
  val WorstFirst: Comparator[Pair] = (a: Pair, b: Pair) => cmp(b, a)

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("negsim", DoubleType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false))), containsNull = false)
}
