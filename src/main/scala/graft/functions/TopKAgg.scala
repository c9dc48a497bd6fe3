package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) pairs under
  * (score DESC, id ASC), kept sorted best-first. Insertion is an
  * O(k) shift — k is small (ANN top-5), so this beats a heap's
  * constant factors and keeps merge a trivial ordered walk.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** (s1, id1) ranks strictly before (s2, id2)? Score desc, id asc;
    * Double.compare gives a total order (the -0.0 < 0.0 edge only
    * matters for exactly-colliding scores, where order among the
    * colliders is then fixed by id anyway for distinct scores). */
  @inline private def before(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !before(s, id, scores(n - 1), ids(n - 1))) return
    var pos = if (n == k) n - 1 else n
    // shift worse entries down to open the slot
    while (pos > 0 && before(s, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }
}

/** Per-group bounded top-k aggregate, registered as `topk_by_score`.
  *
  * The scale story (VERDICT r3 perf #5): ranking ANN candidates with
  * `row_number().over(partitionBy(query_id))` collapses the merge
  * stage to #queries tasks — every scored candidate row funnels into
  * that many partitions. As an aggregate, the map side reduces each
  * input partition to ≤ k entries per query BEFORE the exchange
  * (ObjectHashAggregate partial mode), so the merge stage sees at most
  * k × partitions tiny buffers per query instead of the full candidate
  * set. Output: array<struct<score, id>> sorted (score DESC, id ASC) —
  * posexplode downstream recovers (rank, neighbor) rows identical to
  * the window formulation.
  */
case class TopKAgg(score: Expression, id: Expression, kExpr: Expression,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"topk_by_score expects DOUBLE score, got ${score.dataType}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"topk_by_score expects BIGINT id, got ${id.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("topk_by_score expects a literal INT k")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk_by_score expects k > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData((0 until buf.n).map { i =>
      new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    // entries arrive best-first, so inserts are append-order (no shifts)
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
