package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Hilbert-curve index of two non-negative long keys — the
  * space-filling clustering key with strictly better locality than
  * [[graft.sources.ZOrderLayout.zvalue]]'s Morton interleave:
  * consecutive Hilbert positions are ALWAYS Manhattan-distance-1
  * neighbors (Morton takes long diagonal jumps at power-of-two
  * boundaries), so a range of curve positions covers a tighter spatial
  * box and a box query prunes to fewer files (the reason newer
  * lakehouse writers — Databricks liquid clustering, Iceberg's hilbert
  * sort-order — moved past Z-order).
  *
  * The classic xy→d walk (per-level quadrant + rotate/reflect) is
  * inherently ITERATIVE with carried (x, y) state: composed as Column
  * arithmetic each level's x references the previous level's x AND y,
  * so the expression tree doubles per level — exponential in bits.
  * A native expression keeps it a constant-size tight loop inside
  * whole-stage codegen (the [[CosineSimilarity]] rationale).
  *
  * `bits` (third argument) must be a foldable int literal in [1, 31];
  * keys are taken modulo the 2^bits grid per the a30/ZOrder bucketing
  * contract (callers bucket/clamp first — out-of-range bits of a key
  * would otherwise silently alias distant cells). Sequential walk from
  * the top level, bit-identical to the reference xy2d (Hilbert 1891;
  * Warren, Hacker's Delight §16). */
case class HilbertIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def prettyName: String = "hilbert_index"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val keysOk = Seq(first, second).forall(_.dataType == LongType)
    val bitsOk = third.dataType == IntegerType && third.foldable &&
      third.eval() != null && {
        val b = third.eval().asInstanceOf[Int]; b >= 1 && b <= 31
      }
    if (keysOk && bitsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint, int literal in [1,31]), got " +
        s"${first.dataType} / ${second.dataType} / $third")
  }

  private lazy val bits: Int = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val mask = (1L << bits) - 1L
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val mask = (1L << bits) - 1L
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
