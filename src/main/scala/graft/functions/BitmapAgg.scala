package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Exact-distinct bitmap family — the EXACT tier of the sketch ladder
  * (KMV estimates unbounded domains in k longs; this answers the same
  * question exactly when the id domain is day-bounded, the
  * ClickHouse/Doris `bitmap` pattern): `bitset_agg(id)` folds BIGINT
  * ids into a word-indexed bitset, `bitset_count(bin)` reads one out,
  * and `bitset_union_count(bin)` RE-AGGREGATES serialized bitmaps —
  * so week/month distincts fold from day partials without ever
  * rescanning the corpus, and without the Expand duplication a
  * multi-level `count(distinct)` plans.
  *
  * Memory honesty: the buffer is O(distinct ids / 64) words per
  * group — EXACT distinct is inherently linear in the id set; use
  * this when the per-group domain is bounded (users active in a day),
  * `kmv_sketch` when it is not. Dense id spaces cost 1 bit/id; the
  * TreeMap keeps sparse spaces at 16 B per 64-id word and
  * serialization deterministic (ascending words).
  *
  * Wire format (all three agree): Int32 word count, then per word
  * (Int64 word index = id >> 6, Int64 bits). */
object Bitmaps {
  type Buf = java.util.TreeMap[java.lang.Long, java.lang.Long]

  def add(buf: Buf, v: Long): Unit = {
    val w = v >> 6
    val bit = 1L << (v & 63)
    val prev = buf.get(w)
    buf.put(w, if (prev == null) bit else prev | bit)
    ()
  }

  def union(a: Buf, b: Buf): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = a.get(e.getKey)
      a.put(e.getKey, if (prev == null) e.getValue else prev | e.getValue)
    }
    a
  }

  def unionBytes(a: Buf, bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val w = bb.getLong
      val bits = bb.getLong
      val prev = a.get(w)
      a.put(w, if (prev == null) bits else prev | bits)
      i += 1
    }
    a
  }

  def cardinality(buf: Buf): Long = {
    var c = 0L
    val it = buf.values().iterator()
    while (it.hasNext) c += java.lang.Long.bitCount(it.next())
    c
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val out = new Buf()
    unionBytes(out, bytes)
  }

  def cardinalityOfBytes(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var c = 0L
    var i = 0
    while (i < n) { bb.getLong; c += java.lang.Long.bitCount(bb.getLong); i += 1 }
    c
  }
}

/** `bitset_agg(BIGINT) -> BINARY`: exact distinct-id bitmap of a
  * group, map-side combinable; nulls skipped. */
case class BitmapAgg(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bitmaps.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitset_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"bitset_agg expects BIGINT, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Bitmaps.Buf = new Bitmaps.Buf()

  override def update(buf: Bitmaps.Buf, input: InternalRow): Bitmaps.Buf = {
    val v = child.eval(input)
    if (v != null) Bitmaps.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Bitmaps.Buf, b: Bitmaps.Buf): Bitmaps.Buf = Bitmaps.union(a, b)

  override def eval(buf: Bitmaps.Buf): Any = Bitmaps.serialize(buf)

  override def serialize(buf: Bitmaps.Buf): Array[Byte] = Bitmaps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmaps.Buf = Bitmaps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `bitset_union_count(BINARY) -> BIGINT`: second-level aggregate —
  * unions serialized bitmaps and returns the exact union cardinality.
  * The rollup tier: week/month distincts from day partials with no
  * corpus rescan and no count(distinct) Expand. */
case class BitmapUnionCountAgg(child: Expression,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bitmaps.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_union_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bitset_union_count expects BINARY, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Bitmaps.Buf = new Bitmaps.Buf()

  override def update(buf: Bitmaps.Buf, input: InternalRow): Bitmaps.Buf = {
    val v = child.eval(input)
    if (v != null) Bitmaps.unionBytes(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: Bitmaps.Buf, b: Bitmaps.Buf): Bitmaps.Buf = Bitmaps.union(a, b)

  override def eval(buf: Bitmaps.Buf): Any = Bitmaps.cardinality(buf)

  override def serialize(buf: Bitmaps.Buf): Array[Byte] = Bitmaps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmaps.Buf = Bitmaps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `bitset_overlap(BINARY, BINARY) -> BIGINT`: exact intersection
  * cardinality of two serialized bitmaps — the pairwise tier the
  * aggregate family can't express without a re-group (set algebra:
  * \|A∩B\| directly, rather than \|A\|+\|B\|−\|A∪B\| through a second
  * aggregation). Two-pointer AND-walk over the sorted wire formats,
  * O(words). CodegenFallback for the same reason as bitset_count:
  * consumed on already-reduced frames (one row per group pair), never
  * the corpus path. */
case class BitmapOverlap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bitset_overlap expects (BINARY, BINARY), got (${left.dataType}, ${right.dataType})")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ba = ByteBuffer.wrap(a.asInstanceOf[Array[Byte]])
    val bb = ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])
    val na = ba.getInt
    val nb = bb.getInt
    var i = 0
    var j = 0
    var c = 0L
    var wa = 0L; var va = 0L; var wb = 0L; var vb = 0L
    var haveA = false; var haveB = false
    while ((i < na || haveA) && (j < nb || haveB)) {
      if (!haveA) { wa = ba.getLong; va = ba.getLong; i += 1; haveA = true }
      if (!haveB) { wb = bb.getLong; vb = bb.getLong; j += 1; haveB = true }
      if (wa == wb) {
        c += java.lang.Long.bitCount(va & vb); haveA = false; haveB = false
      } else if (wa < wb) haveA = false
      else haveB = false
    }
    c
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `bitset_count(BINARY) -> BIGINT`: scalar cardinality of one
  * serialized bitmap. CodegenFallback is deliberate: this reads
  * ALREADY-AGGREGATED rows (one per group), never the corpus path, so
  * breaking whole-stage codegen on the reduced frame costs nothing. */
case class BitmapCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"bitset_count expects BINARY, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    Bitmaps.cardinalityOfBytes(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
