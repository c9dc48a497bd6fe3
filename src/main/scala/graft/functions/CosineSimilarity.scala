package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Base for native codegen'd folds over two float-vector columns.
  *
  * Why custom Expressions (SURVEY.md §3): the composable forms
  * (`aggregate(zip_with(a,b,*), 0d, +)`) are higher-order functions,
  * which Spark evaluates interpreted — per-row closure dispatch over
  * every element. These compile to a tight primitive loop inside
  * whole-stage codegen, the difference between scanning 100 TB of
  * vectors at memory bandwidth vs. CPU-bound on interpretation.
  *
  * Semantics:
  *  - accepts `array<float>` regardless of containsNull flags (so
  *    literal arrays compose with parquet columns).
  *  - a NULL element → NULL result, matching the HOF fold (null
  *    propagates through `zip_with` product and `aggregate` sum). The
  *    per-element null branch is only emitted into generated code when
  *    a child's type admits null elements, so literal-weight paths
  *    (LSH planes, IVF centroids) keep the branch-free loop.
  *  - mismatched lengths → NULL (corrupt input must not produce a
  *    plausible-but-wrong value; the HOF `zip_with` fold also nulls).
  *  - accumulation is sequential in array order starting from 0.0 —
  *    bit-identical to the HOF fold and to a DuckDB `list_reduce`
  *    mirror, so results are portable across engines.
  */
abstract class FloatVectorFold extends BinaryExpression {
  /** Whether any child's element type admits nulls — gates the
    * per-element null check in codegen. */
  protected def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> columns, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  // produces NULL on length mismatch even for non-null inputs
  override def nullable: Boolean = true
}

/** Native cosine similarity: dot(a,b) / (|a|·|b|).
  * Zero-norm input vectors yield NaN (0/0) — by design: NaN survives
  * into ranking as "no similarity defined" and sorts deterministically
  * (Spark and DuckDB both order NaN above all other doubles). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends FloatVectorFold {

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: the expression may occur many times in one
      // generated function (e.g. C instances under greatest())
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double xi = (double) $a.getFloat($i);
         |    double yi = (double) $b.getFloat($i);
         |    $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native dot product — the hot-path primitive for LSH hyperplane
  * signs and IVF centroid scoring (VERDICT r1 #3: the interpreted HOF
  * `dot()` must not run corpus-wide). */
case class DotProduct(left: Expression, right: Expression)
    extends FloatVectorFold {

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }" else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
