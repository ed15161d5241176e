package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `kmv_sketch(h, k)` — the k-minimum-values distinct sketch as a
  * native aggregate: keeps the k smallest DISTINCT hash values per
  * group (Bar-Yossef et al., RANDOM'02).
  *
  * Distinctness is what [[BoundedTopK]] cannot give: a KMV over a raw
  * stream must ignore re-occurrences of a value it already holds, or
  * duplicates push real minima out and the (k−1)·R/h₍ₖ₎ estimator
  * breaks. The buffer is a sorted distinct set capped at k, so —
  * like every TypedImperativeAggregate here — the map-side partial is
  * ≤ k longs, partials MERGE by set-union-then-trim (associative,
  * commutative, idempotent: the sketch algebra), and the same
  * aggregate runs unchanged as STREAMING state (update/complete
  * modes), where its merge IS the incremental maintenance.
  *
  * Output: `array<bigint>` ascending — position (k−1) is h₍ₖ₎. Null
  * inputs are ignored; k must be a positive int literal.
  */
case class KmvSketch(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with BinaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"kmv_sketch k must be a positive int literal, got $other")
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(set: mutable.TreeSet[Long], h: Long): Unit =
    if (set.size < k) set += h
    else if (h < set.last && !set.contains(h)) { set -= set.last; set += h }

  override def update(set: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val h = hash.eval(input)
    if (h != null) add(set, h.asInstanceOf[Long])
    set
  }

  override def merge(set: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(set, _))
    set
  }

  override def eval(set: mutable.TreeSet[Long]): Any =
    new GenericArrayData(set.toArray)

  override def serialize(set: mutable.TreeSet[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * set.size)
    buf.putInt(set.size)
    set.foreach(buf.putLong)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val set = createAggregationBuffer()
    var i = 0
    while (i < n) { add(set, buf.getLong); i += 1 }
    set
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def left: Expression = hash
  override def right: Expression = kExpr

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSketch =
    copy(hash = newLeft, kExpr = newRight)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_sketch"
}
