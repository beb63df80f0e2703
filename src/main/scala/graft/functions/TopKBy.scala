package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact bounded-buffer top-k-rows-per-group as a native Catalyst
  * aggregate — the scale path for "leaderboard per group" that the
  * ROW_NUMBER-window spelling answers by SORTING EVERY GROUP. Each
  * partition's partial buffer holds at most 2k (key, payload) pairs
  * (compacted to the top k by total order whenever it overflows), so
  * memory is O(k) per group per partition and the shuffle moves ≤ k
  * rows per (partition, group) instead of the group. Partial top-k
  * under a TOTAL order merges to the exact global top-k — a row
  * outside a partition's top-k is dominated by k rows of that same
  * partition, so it cannot enter any merged top-k — which makes this
  * EXACT, unlike the sketch-based `ss_topk`.
  *
  * SQL: `topk_by(key, payload, k)` (key BIGINT; payload BIGINT or
  * STRING; k a positive constant) → `array<struct<key, payload>>`
  * sorted (key DESC, payload ASC), length ≤ k — the same order as
  * `ROW_NUMBER() OVER (... ORDER BY key DESC, payload ASC) <= k`,
  * with string payloads compared in binary UTF-8 order exactly as
  * Spark's and DuckDB's ORDER BY compare them. Rows with a null key
  * or payload are ignored (nulls have no place in the total order).
  */
case class TopKBy(
    keyExpr: Expression,
    payloadExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBy.Buffer] {

  import TopKBy.Buffer

  private lazy val k = kExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val isString = payloadExpr.dataType == StringType

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("payload", payloadExpr.dataType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by key must be BIGINT, got ${keyExpr.dataType.sql}")
    else if (payloadExpr.dataType != LongType && payloadExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by payload must be BIGINT or STRING, got ${payloadExpr.dataType.sql}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_by k must be a constant")
    else kExpr.eval(null) match {
      case n: Number if n.intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "topk_by k must be a positive numeric constant")
    }

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv != null && pv != null) {
      // UTF8String may alias a reused scan buffer — copy
      val payload: Any =
        if (isString) pv.asInstanceOf[UTF8String].clone() else pv
      buf.rows += ((kv.asInstanceOf[Long], payload))
      if (buf.rows.length > 2 * k) buf.compact(k, isString)
    }
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    a.rows ++= b.rows
    a.compact(k, isString)
    a
  }

  override def eval(buf: Buffer): Any = {
    buf.compact(k, isString)
    new GenericArrayData(buf.rows.map { case (key, p) =>
      new GenericInternalRow(Array[Any](key, p))
    }.toArray)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    buf.compact(k, isString)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(isString)
    out.writeInt(buf.rows.length)
    buf.rows.foreach { case (key, p) =>
      out.writeLong(key)
      if (isString) {
        val b = p.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else out.writeLong(p.asInstanceOf[Long])
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val str = in.readBoolean()
    val n = in.readInt()
    val buf = new Buffer
    var i = 0
    while (i < n) {
      val key = in.readLong()
      val p: Any = if (str) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        UTF8String.fromBytes(b)
      } else in.readLong()
      buf.rows += ((key, p))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(keyExpr = newChildren(0), payloadExpr = newChildren(1),
      kExpr = newChildren(2))
  override def prettyName: String = "topk_by"
}

object TopKBy {

  /** "a ranks strictly before b" under (key desc, payload asc);
    * string payloads compare in binary UTF-8 order (UTF8String),
    * matching both engines' ORDER BY.
    */
  private def before(a: (Long, Any), b: (Long, Any),
      isString: Boolean): Boolean =
    if (a._1 != b._1) a._1 > b._1
    else if (isString)
      a._2.asInstanceOf[UTF8String].compareTo(b._2.asInstanceOf[UTF8String]) < 0
    else a._2.asInstanceOf[Long] < b._2.asInstanceOf[Long]

  class Buffer {
    val rows: ArrayBuffer[(Long, Any)] = ArrayBuffer.empty

    def compact(k: Int, isString: Boolean): Unit =
      if (rows.length > k || !isSorted(isString)) {
        val top = rows.sortWith(before(_, _, isString)).take(k)
        rows.clear(); rows ++= top
      }

    private def isSorted(isString: Boolean): Boolean = {
      var i = 1
      while (i < rows.length) {
        if (before(rows(i), rows(i - 1), isString)) return false
        i += 1
      }
      true
    }
  }
}
