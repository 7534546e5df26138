package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped id collection for LSH-style bucket aggregation.
  *
  * `collect_list` materializes an entire bucket in one aggregation buffer
  * before any cap can apply — a 10^6-member boilerplate bucket is one
  * task's array (the hot-bucket hazard of SURVEY.md §7 hard part 3). This
  * buffer instead keeps:
  *   - `n`   — exact member count (always),
  *   - `hub` — the minimum id (always; the star-edge hub),
  *   - up to `cap + 1` member ids (beyond that, members are counted but not
  *     stored — `cap + 1` stored ids is the overflow signal).
  *
  * So no buffer — map-side partial or reduce-side final — ever holds more
  * than `cap + 1` ids, while small buckets (n <= cap) keep their complete
  * member list for all-pairs generation. Hot buckets emit star edges via a
  * join back to the membership rows (BucketedPairs) instead of ever being
  * collected.
  */
final class CappedIds(val cap: Int) {
  var n: Long = 0L
  var hub: Long = Long.MaxValue
  // singleton fast path: the overwhelming majority of buckets have exactly
  // one member — those never allocate an array (first lives in a field)
  private var first: Long = 0L
  private var ids: Array[Long] = null
  private var size: Int = 0

  private def ensure(extra: Int): Unit = {
    val want = math.min(size + extra, cap + 1)
    if (ids == null) {
      ids = new Array[Long](math.max(4, math.min(math.max(want, 2), 64)))
      if (size == 1) ids(0) = first
    } else if (want > ids.length)
      ids = java.util.Arrays.copyOf(ids, math.min(math.max(ids.length * 2, want), cap + 1))
  }

  def add(id: Long): Unit = {
    n += 1
    if (id < hub) hub = id
    if (size > cap) return
    if (size == 0 && ids == null) { first = id; size = 1 }
    else { ensure(1); if (size <= cap) { ids(size) = id; size += 1 } }
  }

  /** Merge a (count, min, kept-ids-or-null) triple; null ids = overflowed. */
  def addSlice(sliceN: Long, sliceHub: Long, sliceIds: Array[Long]): Unit = {
    n += sliceN
    if (sliceHub < hub) hub = sliceHub
    if (sliceIds == null) size = cap + 1 // upstream overflow: list unrecoverable
    else if (sliceIds.length == 1 && size == 0 && ids == null) {
      first = sliceIds(0); size = 1 // singleton-slice fast path (phase 2)
    } else {
      var i = 0
      while (i < sliceIds.length && size <= cap) {
        ensure(1); if (size <= cap) { ids(size) = sliceIds(i); size += 1 }
        i += 1
      }
      if (i < sliceIds.length) size = cap + 1
    }
  }

  def merge(o: CappedIds): Unit =
    addSlice(o.n, o.hub, if (o.overflowed) null else o.kept)

  def overflowed: Boolean = n > cap || size > cap
  def kept: Array[Long] =
    if (size == 0) Array.emptyLongArray
    else if (ids == null) Array(first)
    else java.util.Arrays.copyOf(ids, size)

  def serialize(): Array[Byte] = {
    val k = if (overflowed) Array.emptyLongArray else kept
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 1 + 4 + k.length * 8)
    bb.putLong(n).putLong(hub).put(if (overflowed) 1.toByte else 0.toByte).putInt(k.length)
    var i = 0
    while (i < k.length) { bb.putLong(k(i)); i += 1 }
    bb.array()
  }

  /** Result row: (n, hub, ids) — ids NULL when the bucket overflowed, and
    * also for n < 2 (a singleton's lone id IS its hub; skipping the array
    * saves two allocations per bucket, and singleton buckets dominate). */
  def result: InternalRow = {
    val arr = if (overflowed || n < 2) null else new GenericArrayData(kept)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, if (n == 0) null else hub, arr))
  }
}

object CappedIds {
  def deserialize(bytes: Array[Byte], cap: Int): CappedIds = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new CappedIds(cap)
    val n = bb.getLong(); val hub = bb.getLong()
    val over = bb.get() == 1.toByte
    val keptSize = bb.getInt()
    if (over) out.addSlice(n, hub, null)
    else {
      val ids = new Array[Long](keptSize)
      var i = 0
      while (i < keptSize) { ids(i) = bb.getLong(); i += 1 }
      out.addSlice(n, hub, ids)
    }
    out
  }

  val resultType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("hub", LongType, nullable = true),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = true)))
}

/** `capped_ids(id, cap)` — aggregate long ids into a CappedIds buffer.
  * Declares `LongType` input so a non-bigint id column fails at ANALYSIS
  * (with Spark's implicit cast where one exists) instead of a runtime
  * ClassCastException inside `update`. */
case class CappedIdsAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CappedIds]
    with org.apache.spark.sql.GraftExpectsLongInput {

  override def prettyName: String = "capped_ids"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = CappedIds.resultType

  override def createAggregationBuffer(): CappedIds = new CappedIds(cap)
  override def update(buf: CappedIds, input: InternalRow): CappedIds = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: CappedIds, other: CappedIds): CappedIds = { buf.merge(other); buf }
  override def eval(buf: CappedIds): Any = buf.result
  override def serialize(buf: CappedIds): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CappedIds = CappedIds.deserialize(bytes, cap)

  override def withNewMutableAggBufferOffset(o: Int): CappedIdsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedIdsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CappedIdsAgg = copy(child = c.head)
}

/** `capped_ids_merge(slice, cap)` — merge CappedIds result structs (the
  * second phase of salted collection: one slice row per (key, salt)). */
case class CappedIdsMergeAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CappedIds] {

  override def prettyName: String = "capped_ids_merge"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = CappedIds.resultType

  override def createAggregationBuffer(): CappedIds = new CappedIds(cap)
  override def update(buf: CappedIds, input: InternalRow): CappedIds = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val n = row.getLong(0)
      if (n == 1) buf.add(row.getLong(1)) // singleton slice: hub IS the id
      else if (n > 1) {
        val hub = row.getLong(1)
        val ids = if (row.isNullAt(2)) null else row.getArray(2).toLongArray()
        buf.addSlice(n, hub, ids)
      }
    }
    buf
  }
  override def merge(buf: CappedIds, other: CappedIds): CappedIds = { buf.merge(other); buf }
  override def eval(buf: CappedIds): Any = buf.result
  override def serialize(buf: CappedIds): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CappedIds = CappedIds.deserialize(bytes, cap)

  override def withNewMutableAggBufferOffset(o: Int): CappedIdsMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedIdsMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CappedIdsMergeAgg = copy(child = c.head)
}
