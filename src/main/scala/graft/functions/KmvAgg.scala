package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** K-minimum-values distinct sketch aggregate (Bar-Yossef et al. 2002;
  * the unbiased (k−1)/U_(k) estimator of Beyer et al., SIGMOD 2007).
  *
  * Input: one NONNEGATIVE uniform hash per row (the operators feed the
  * 60-bit `conv(substring(md5(..),1,15),16,10)` value so a SQL oracle
  * can replay the exact sketch — the d22 idiom; nonnegative keeps
  * signed order = unsigned order). Buffer: the k smallest DISTINCT
  * hashes. Output: that set as an ascending array — a mergeable,
  * fixed-size set summary.
  *
  * Why an aggregate instead of the relational form (distinct →
  * per-key row_number window → rn ≤ k): the window form sorts every
  * group's FULL distinct set under |key| hot partitions — exactly the
  * c31-banned shape at corpus scale. This buffer never exceeds k
  * longs, updates are map-side combinable, and merge is a bounded
  * set-union — the 100 TB shape. Downstream set math (union sketch,
  * intersection, Jaccard, distinct estimates) is row-local array code
  * over ≤k elements.
  *
  * k is a literal (foldable) argument, like TopKAgg's. */
case class KmvAgg(child: Expression, kExpr: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch expects BIGINT, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kmv_sketch k must be a literal INT")
    else {
      // fail at analysis, not as an opaque executor NoSuchElementException
      // from buf.last() on the empty TreeSet (TopKAgg's capacity guard)
      val kv = kExpr.eval(InternalRow.empty)
      if (kv == null || kv.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("kmv_sketch k must be >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) buf.pollLast()
      ()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
