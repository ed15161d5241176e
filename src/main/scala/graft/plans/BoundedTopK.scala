package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bounded_topk(score, id, k)` — native bounded top-k aggregate.
  *
  * Keeps the k smallest (score, id) pairs per group in a bounded
  * max-heap. Unlike `slice(sort_array(collect_list(...)))`, the PARTIAL
  * aggregation buffer is already capped at k elements, so the map-side
  * combine emits ≤ k pairs per (task, group) into the shuffle — the
  * textbook distributed top-k — instead of buffering every input row.
  * This is a `TypedImperativeAggregate` (the same machinery as Spark's
  * own collect_list/percentile), not a UDAF: it participates in
  * ObjectHashAggregate with map-side partials and binary-serialized
  * buffers.
  *
  * Output: `array<struct<s: double, n: bigint>>` sorted ascending by
  * (s, n) — element position is the (rank − 1). Null scores/ids are
  * ignored. k must be a positive integer literal.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with TernaryLike[Expression] with ExpectsInputTypes {

  /** Declared input types so analysis inserts implicit casts (float
    * score → double, int id → long) or fails with a clear error — the
    * update() asInstanceOf would otherwise throw ClassCastException at
    * runtime on a well-analyzed plan.
    */
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, LongType, IntegerType)

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"bounded_topk k must be a positive int literal, got $other")
  }

  private val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  // PriorityQueue dequeues the LARGEST under `ord` → head is the worst
  // of the kept k, the eviction candidate.
  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  private def add(q: mutable.PriorityQueue[(Double, Long)],
                  e: (Double, Long)): Unit =
    if (q.size < k) q.enqueue(e)
    else if (ord.lt(e, q.head)) { q.dequeue(); q.enqueue(e) }

  override def update(q: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(q, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    q
  }

  override def merge(q: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(q, _))
    q
  }

  override def eval(q: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(q.toArray.sorted(ord)
      .map(e => InternalRow(e._1, e._2)).toArray[Any])

  override def serialize(q: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * q.size)
    buf.putInt(q.size)
    q.foreach { case (s, n) => buf.putDouble(s); buf.putLong(n) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { add(q, (buf.getDouble, buf.getLong)); i += 1 }
    q
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", DoubleType), StructField("n", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = kExpr

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BoundedTopK =
    copy(score = newFirst, id = newSecond, kExpr = newThird)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bounded_topk"
}
