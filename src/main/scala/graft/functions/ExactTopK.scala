package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StructField, StructType}

/** Exact per-group top-k as a `TypedImperativeAggregate`: keeps the k
  * LARGEST (priority, payload) pairs under the total lexicographic
  * order, emitted descending as an array of (v, id) structs.
  *
  * Relationship to the existing top-k machinery:
  *   - `plans.TopKPerKey` (the custom physical operator) wins for plain
  *     batch top-k — no aggregate buffer, no array materialization —
  *     but a physical unary node cannot run inside a streaming
  *     aggregation.
  *   - THIS aggregate is the streaming-capable spelling: associative +
  *     commutative (update folds one row, merge unions two k-bounded
  *     buffers), so Structured Streaming complete-mode keeps O(groups·k)
  *     state and every micro-batch merges partials — the same property
  *     that lets batch map-side partial aggregation move only k rows
  *     per group per partition instead of window-sorting the corpus.
  *
  * Ties on priority resolve by payload, so the result is total-order
  * deterministic and carries a FULL oracle (the row_number window
  * spelling). Buffers compact at 4k entries — amortized O(log k)/row.
  */
case class ExactTopK(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]]
    with BinaryLike[Expression] {

  require(k > 0, s"graft_topk requires k > 0, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "exact_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"exact_topk expects (bigint priority, bigint payload), got $other")
    }

  override def createAggregationBuffer()
      : mutable.ArrayBuffer[(Long, Long)] =
    new mutable.ArrayBuffer[(Long, Long)](k + 1)

  // keep the k LARGEST pairs; Ordering[(Long, Long)] is lexicographic
  private def compact(buf: mutable.ArrayBuffer[(Long, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sorted(Ordering[(Long, Long)].reverse).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val p = left.eval(input)
    val v = right.eval(input)
    if (p != null && v != null) {
      buf += ((p.asInstanceOf[Long], v.asInstanceOf[Long]))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[(Long, Long)],
      b2: mutable.ArrayBuffer[(Long, Long)])
      : mutable.ArrayBuffer[(Long, Long)] = {
    b1 ++= b2
    compact(b1)
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    compact(buf)
    new GenericArrayData(buf.sorted(Ordering[(Long, Long)].reverse)
      .take(k)
      .map { case (p, v) => new GenericInternalRow(Array[Any](p, v)) }
      .toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)])
      : Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (p, v) => out.writeLong(p); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    // fail loudly on a truncated/corrupt buffer instead of an opaque
    // EOFException mid-read (mirrors HllMergeAgg's width check)
    require(n >= 0 && bytes.length == 4 + 16 * n,
      s"ExactTopK buffer corrupt: n=$n but ${bytes.length} bytes " +
        s"(expected ${4 + 16L * n})")
    val buf = new mutable.ArrayBuffer[(Long, Long)](n + 1)
    var i = 0
    while (i < n) {
      buf += ((in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ExactTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ExactTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ExactTopK =
    copy(left = newLeft, right = newRight)
}

object ExactTopK {

  /** Column-level entry point: the k largest (priority, payload) pairs,
    * descending, as an array of (v, id) structs.
    */
  def apply(priority: Column, payload: Column, k: Int): Column =
    Bridge.column(ExactTopK(Bridge.expression(priority),
      Bridge.expression(payload), k).toAggregateExpression())
}
