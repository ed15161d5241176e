package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** The Misra–Gries update/merge rules, shared by the [[FreqSketch]]
  * aggregate and the streaming twin
  * ([[graft.streaming.StreamingEvents.heavyHittersStream]]) so both
  * surfaces provably maintain the same state.
  */
object MisraGries {

  /** One arrival of `k` into a ≤ cap counter map. */
  def update(m: mutable.HashMap[String, Long], k: String,
             cap: Int): Unit =
    m.get(k) match {
      case Some(c) => m.update(k, c + 1)
      case None if m.size < cap => m.update(k, 1L)
      case None => // full: decrement-all round, arriving key absorbed
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (key0, c) =>
          if (c == 1L) dead += key0 else m.update(key0, c - 1)
        }
        dead.foreach(m.remove)
    }

  /** PODS'12 combine: keywise sum of `other` into `m`, then if over
    * capacity subtract the (cap+1)-th largest count and drop ≤ 0.
    */
  def merge(m: mutable.HashMap[String, Long],
            other: Iterable[(String, Long)], cap: Int): Unit = {
    other.foreach { case (k, c) =>
      m.update(k, m.getOrElse(k, 0L) + c)
    }
    if (m.size > cap) {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (cap + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      m.foreach { case (k, c) =>
        if (c - d <= 0L) dead += k else m.update(k, c - d)
      }
      dead.foreach(m.remove)
    }
  }
}

/** `freq_sketch(key, capacity)` — mergeable Misra–Gries heavy-hitters
  * summary (the deterministic frequent-items sketch; Misra & Gries
  * 1982, merge rule from Agarwal et al., "Mergeable Summaries", PODS
  * 2012). The fourth member of graft's mergeable-state family: HLL
  * (distinct), MinHash (set similarity), fixed-bin histograms
  * (quantiles) — and this for top-k frequency.
  *
  * State is ≤ capacity (key, count) counters:
  *   - seen key        → count += 1
  *   - room left       → insert (key, 1)
  *   - full, unseen    → decrement ALL counters, drop zeros (the
  *                       arriving key pays for the decrement round)
  * Merge (partial-agg combine OR offline union of persisted sketches):
  * keywise count sum, then if over capacity subtract the
  * (capacity+1)-th largest count from every counter and drop ≤ 0 —
  * the PODS'12 rule that keeps the error bound additive-safe.
  *
  * Guarantees (n = stream length, k = capacity):
  *   - every counter is a LOWER bound: cnt(x) ≤ f(x);
  *   - undercount ≤ (n − Σ counters)/(k+1) ≤ n/(k+1), so any x with
  *     f(x) > n/(k+1) is guaranteed present;
  *   - |distinct keys| ≤ capacity ⇒ no decrements ever fire and the
  *     sketch is EXACT (the regime the DuckDB-oracled query pins).
  * In the approximate regime surviving counters may depend on
  * partition boundaries (the guarantees hold for every boundary; the
  * specific survivors near the threshold don't) — oracle-gated use
  * must stay in the exact regime.
  *
  * Output: `array<struct<t: string, c: bigint>>` sorted by
  * (count desc, key asc).
  */
case class FreqSketch(
    key: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with BinaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)

  private lazy val cap: Int = capExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"freq_sketch capacity must be a positive int literal, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(m: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val k = key.eval(input)
    if (k != null)
      MisraGries.update(m, k.asInstanceOf[UTF8String].toString, cap)
    m
  }

  override def merge(m: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MisraGries.merge(m, other, cap)
    m
  }

  override def eval(m: mutable.HashMap[String, Long]): Any = {
    val sorted = m.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])
  }

  override def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = m.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 4 + entries.map(e => 4 + e._1.length + 8).sum
    val buf = ByteBuffer.allocate(size)
    buf.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      buf.putInt(kb.length); buf.put(kb); buf.putLong(c)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val kb = new Array[Byte](len)
      buf.get(kb)
      m.update(new String(kb, StandardCharsets.UTF_8), buf.getLong)
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType), StructField("c", LongType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def left: Expression = key
  override def right: Expression = capExpr

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqSketch =
    copy(key = newLeft, capExpr = newRight)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "freq_sketch"
}
