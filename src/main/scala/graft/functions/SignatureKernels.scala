package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native per-row signature kernels. SimHash and MinHash are
  * per-DOCUMENT functions of the token stream, but the column-API
  * formulations force them through explode + 64 aggregate columns +
  * a doc_id shuffle, because Spark's higher-order functions run
  * interpreted (one closure call per element). These kernels compute
  * the whole signature in one tight loop per row inside whole-stage
  * codegen — fingerprinting then runs at parquet-scan speed with
  * ZERO exchanges, which at 100 TB is the difference between a scan
  * and a full-corpus shuffle.
  *
  * Bit/hash derivations are identical to the aggregate forms (and so
  * to the DuckDB oracles): SimHash bit i = bit (i%4) of hex digit
  * (i/4) of the token's md5; MinHash h_i = (h1 + i·(2·h2+1)) mod
  * 2³¹−1 over two 28-bit md5-prefix halves of each distinct
  * 3-shingle (Kirsch-Mitzenmacher). Cross-checked value-for-value
  * against the aggregate paths in SimHashSpec / MinHashSpec.
  */
object SignatureKernels {

  final val M: Long = 2147483647L // 2^31-1
  final val H: Int = 64

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** hex digit j (0-based) of a digest = high/low nibble of byte j/2. */
  @inline private def nibble(d: Array[Byte], j: Int): Int =
    if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf

  /** 64-bit SimHash over the non-empty tokens of `arr` (duplicates
    * kept — SimHash weights by frequency). Empty input → fingerprint
    * 0; callers filter token-less docs, as the aggregate path drops
    * them.
    */
  def simhash64(arr: ArrayData): Long = {
    val md = md5Local.get()
    val counts = new Array[Int](H)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val tok = arr.getUTF8String(t)
        if (tok.numBytes() > 0) {
          md.reset()
          val d = md.digest(tok.getBytes)
          var i = 0
          while (i < H) {
            // bit (i%4) of hex digit (i/4)
            val bit = (nibble(d, i >> 2) >> (i & 3)) & 1
            counts(i) += (if (bit == 1) 1 else -1)
            i += 1
          }
        }
      }
      t += 1
    }
    var h = 0L
    var i = 0
    while (i < H) {
      if (counts(i) > 0) h |= (1L << i)
      i += 1
    }
    h
  }

  /** 28-bit integer from 7 hex digits of `d` starting at digit
    * `from` (0-based) — the value of `('0x' || substr(hex, from+1,
    * 7))`.
    */
  @inline private def hexPrefix(d: Array[Byte], from: Int): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 4) | nibble(d, from + j); j += 1 }
    v
  }

  /** 64-slot MinHash signature over the distinct 3-shingles of the
    * non-empty tokens of `arr`. Returns null when fewer than 3
    * tokens (no shingle exists — the aggregate path drops such docs).
    */
  def minhashSigs(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    val toks = new java.util.ArrayList[String](n0)
    var t = 0
    while (t < n0) {
      if (!arr.isNullAt(t)) {
        val tok = arr.getUTF8String(t)
        if (tok.numBytes() > 0) toks.add(tok.toString)
      }
      t += 1
    }
    val n = toks.size()
    if (n < 3) return null
    val md = md5Local.get()
    val seen = new java.util.HashSet[String]()
    val mins = new Array[Long](H)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i + 2 < n) {
      val sh = toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2)
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes("UTF-8"))
        val h1 = hexPrefix(d, 0)
        val h2 = hexPrefix(d, 8)
        val stride = 2L * h2 + 1L
        // h_k = (h1 + k·stride) mod M, computed incrementally —
        // stride < 2³⁰ and every partial stays < 2³¹ + 2³⁰ < 2⁶³
        var v = h1 % M
        var k = 0
        while (k < H) {
          if (v < mins(k)) mins(k) = v
          v = (v + stride) % M
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `simhash64(tokens array<string>) -> bigint` — see
  * [[SignatureKernels.simhash64]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.SignatureKernels.simhash64($c);".toString)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `minhash_sigs(tokens array<string>) -> array<bigint>` (null when
  * the doc has < 3 tokens) — see [[SignatureKernels.minhashSigs]].
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires ARRAY<STRING>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SignatureKernels.minhashSigs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      code"""
        org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.SignatureKernels.minhashSigs($c);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
