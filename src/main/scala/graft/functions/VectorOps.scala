package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen vector kernels over `array<float>` embeddings.
  * The functions.zip_with/aggregate formulation runs on the
  * interpreted higher-order-function path — one closure call per
  * element; these compile to a tight primitive loop inside
  * whole-stage codegen, which is the difference between an ANN scan
  * being compute-bound and codec-bound at corpus scale.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Mismatched lengths mean corrupt or mixed-model embeddings; a
    * silent min-length truncation would return plausible-but-wrong
    * similarities, so fail loudly instead.
    */
  protected def checkSameLength(n1: Int, n2: Int): Unit =
    if (n1 != n2) throw VectorBinaryExpression.lengthMismatch(prettyName, n1, n2)

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
}

/** Σ aᵢ·bᵢ in double precision (sequential order — matches a SQL
  * list_reduce left fold bit-for-bit).
  */
case class VecDot(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    checkSameLength(x.numElements(), y.numElements())
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      code"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw graft.functions.VectorBinaryExpression.lengthMismatch(
            "vec_dot", $n, $b.numElements());
        }
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $acc;
      """.toString
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorBinaryExpression {
  /** Shared by interpreted eval and generated code (codegen can only
    * call public static-reachable members).
    */
  def lengthMismatch(fn: String, n1: Int, n2: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"$fn: vector length mismatch ($n1 vs $n2) — corrupt or mixed-model embeddings")
}

/** cos(a,b) = a·b / (‖a‖·‖b‖), one fused pass over both arrays.
  * Zero-norm inputs (all-zero vector) are defined as cosine 0.0
  * rather than NaN, so they rank last in any top-k instead of
  * poisoning the ordering.
  */
case class VecCosine(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    checkSameLength(x.numElements(), y.numElements())
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      code"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw graft.functions.VectorBinaryExpression.lengthMismatch(
            "vec_cosine", $n, $b.numElements());
        }
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = (double) $a.getFloat($i);
          double $yv = (double) $b.getFloat($i);
          $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """.toString
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
