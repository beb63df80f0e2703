package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial (Karp-Rabin) rolling hash
  * over a string's UTF-8 bytes — h = Σ h·B + byteᵢ (mod M). Used for
  * document fingerprinting where a cheap, order-sensitive,
  * incremental hash beats md5 (SURVEY §2 #38). Implements
  * `doGenCode`, so it participates in whole-stage codegen instead of
  * falling back to interpreted eval — the preferred extension point
  * when built-in functions can't express the loop.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  /** Base/modulus chosen so h·B + 255 < 2⁶³ never overflows:
    * M = 2³¹−1 (Mersenne prime), B = 257.
    */
  final val M: Long = 2147483647L
  final val B: Long = 257L

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * B + (bytes(i) & 0xff)) % M
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      code"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = ($h * ${B}L + ($bytes[$i] & 0xff)) % ${M}L;
        }
        ${ev.value} = $h;
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-level entry point — resolves through the function
    * registry, so the session must be built with [[GraftExtensions]].
    */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)

  /** Reference implementation for specs. */
  def reference(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes("UTF-8")) h = (h * 257L + (b & 0xff)) % 2147483647L
    h
  }
}
