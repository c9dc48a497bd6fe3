package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary with capacity k: at most k
  * counters; every item with true frequency > N/(k+1) is GUARANTEED
  * present, and each stored count undercounts its item by at most
  * N/(k+1) (N = items consumed). The merge follows Agarwal et al.,
  * "Mergeable Summaries" (PODS 2012): sum counters, then if more than
  * k survive, subtract the (k+1)-th largest count from all and drop
  * the non-positive — errors ADD across merges, so the global bound
  * holds at any parallelism / merge tree shape.
  */
final class FreqSketchBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String): Unit = {
    val c = counts.getOrDefault(item, 0L)
    if (c > 0L) { counts.put(item, c + 1L); () }
    else if (counts.size < k) { counts.put(item, 1L); () }
    else {
      // classic MG overflow: decrement every counter, drop zeros
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeFrom(other: FreqSketchBuffer): Unit = {
    other.counts.forEach { (item: String, c: Long) =>
      counts.put(item, counts.getOrDefault(item, 0L) + c); ()
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - 1 - k) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
  }
}

/** Per-group Misra–Gries aggregate, registered as `freq_sketch`.
  *
  * The scale story: an exact heavy-hitters query (`groupBy(token)` →
  * filter by share) shuffles EVERY distinct key — 10⁸–10⁹ token types
  * on web-scale text — to find the few hundred that matter. This
  * aggregate reduces each input partition to ≤ k counters BEFORE the
  * exchange (ObjectHashAggregate partial mode), so the merge stage
  * moves k × partitions counters regardless of corpus size. The
  * summary's counts are merge-order-dependent (only the ±N/(k+1)
  * guarantee is stable) — consumers MUST treat it as a candidate set
  * and join back for exact counts (TextOps.d78HeavyHitters does; the
  * superset guarantee makes the verified output deterministic).
  * Output: array<struct<item, cnt>> sorted (cnt DESC, item ASC).
  */
case class FreqSketchAgg(item: Expression, kExpr: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketchBuffer] {

  lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"freq_sketch expects STRING item, got ${item.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("freq_sketch expects a literal INT k")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"freq_sketch expects k > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): FreqSketchBuffer = new FreqSketchBuffer(k)

  override def update(buf: FreqSketchBuffer, input: InternalRow): FreqSketchBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: FreqSketchBuffer, b: FreqSketchBuffer): FreqSketchBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: FreqSketchBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c))
    }.toArray[Any])
  }

  override def serialize(buf: FreqSketchBuffer): Array[Byte] = {
    var size = 4
    val it0 = buf.counts.entrySet().iterator()
    val items = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](buf.counts.size)
    while (it0.hasNext) {
      val e = it0.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items += ((b, e.getValue))
      size += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqSketchBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), kExpr = newChildren(1))
}
