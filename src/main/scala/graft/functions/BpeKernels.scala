package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-encode kernel: applies a LEARNED, constant merge list
  * to one whitespace word per call, so a corpus encode is a single
  * map-side expression — the merge table rides the plan as ONE
  * reference object (the [[PqKernels]] codebook device), never a
  * per-row literal and never a join. Encoding semantics are the
  * trainer's replay: merges apply in rank order, each exhaustively
  * left-to-right non-overlapping — exactly the fold
  * [[graft.operators.Bpe.mergeAdjacent]] runs during training, so
  * train→encode round-trips bit-identically (BpeSpec pins it).
  * Algorithm per Sennrich/Haddow/Birch, "Neural machine translation
  * of rare words with subword units" (ACL 2016).
  */
object BpeKernels {

  final class Merges(val ranked: Array[(String, String)]) extends Serializable {
    /** Split into code-point symbols (Spark SQL `substring` counts
      * code points, so this matches the trainer's atomization).
      */
    private def atoms(word: String): Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }

    def encodeWord(word: String): Array[String] = {
      var syms = atoms(word)
      var r = 0
      while (r < ranked.length && syms.length >= 2) {
        val (a, b) = ranked(r)
        var changed = false
        var i = 0
        while (!changed && i < syms.length - 1) {
          changed = syms(i) == a && syms(i + 1) == b
          i += 1
        }
        if (changed) {
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              out += a + b
              j += 2
            } else {
              out += syms(j)
              j += 1
            }
          }
          syms = out.toArray
        }
        r += 1
      }
      syms
    }
  }

  /** Builder-time conversion of the constant array<array<string>>
    * merge literal ([ [left, right], ... ] in rank order).
    */
  def parseMerges(v: Any): Array[(String, String)] = {
    val outer = v.asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { i =>
      val p = outer.getArray(i)
      require(p.numElements() == 2, "bpe_encode: merges must be [left, right] pairs")
      (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
    }.toArray
  }

  def encodeArray(m: Merges, w: UTF8String): ArrayData =
    new GenericArrayData(
      m.encodeWord(w.toString).map(UTF8String.fromString(_): Any))
}

/** `bpe_encode(word, merges) -> array<string>` — merges is a
  * constant, builder-extracted like the PQ codebooks.
  */
case class BpeEncode(child: Expression, mergeSeq: Seq[(String, String)])
    extends UnaryExpression {
  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val merges = new BpeKernels.Merges(mergeSeq.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeKernels.encodeArray(merges, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges,
      classOf[BpeKernels.Merges].getName)
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.BpeKernels.encodeArray($ref, $c);".toString)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
