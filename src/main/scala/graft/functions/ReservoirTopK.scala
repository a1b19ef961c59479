package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded k-per-group sample as a `TypedImperativeAggregate`: keeps the
  * k payloads with the SMALLEST priority seen, in priority order.
  *
  * With a uniform pseudo-random priority (md5 of the row key), "k
  * smallest priorities" IS a uniform k-without-replacement sample — the
  * classic reservoir result — but unlike a stateful reservoir it is
  * deterministic, associative, and commutative: update folds a row into
  * a k-bounded buffer, merge unions two buffers and re-truncates, so
  * map-side partial aggregation and AQE work unchanged. At 100 TB this
  * moves k rows per group per partition instead of sorting the corpus:
  * the window spelling (`row_number() <= k`) shuffles and sorts EVERY
  * row; this aggregate's shuffle volume is O(groups * k).
  *
  * Buffers compact at 4k entries (amortized O(log k) per row), ties
  * break by payload so the result is total-order deterministic.
  */
case class ReservoirTopK(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(UTF8String, Long)]]
    with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "reservoir_topk"

  // update() casts the priority to UTF8String and the payload to Long;
  // reject anything else at analysis time rather than ClassCastException
  // at runtime (the declared dataType is only honest for these inputs).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"reservoir_topk expects (string priority, bigint payload), " +
              s"got $other")
    }

  // UTF8String compares in lexicographic byte order — for md5-hex
  // priorities that matches DuckDB's VARCHAR ordering exactly
  private implicit val priorityOrdering: Ordering[UTF8String] =
    (a: UTF8String, b: UTF8String) => a.compareTo(b)

  override def createAggregationBuffer()
      : mutable.ArrayBuffer[(UTF8String, Long)] =
    new mutable.ArrayBuffer[(UTF8String, Long)](k + 1)

  private def compact(buf: mutable.ArrayBuffer[(UTF8String, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortBy(identity).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: mutable.ArrayBuffer[(UTF8String, Long)],
      input: InternalRow): mutable.ArrayBuffer[(UTF8String, Long)] = {
    val p = left.eval(input).asInstanceOf[UTF8String]
    val v = right.eval(input)
    if (p != null && v != null) {
      // clone: Spark reuses the UTF8String's backing buffer across rows
      buf += ((p.clone(), v.asInstanceOf[Long]))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[(UTF8String, Long)],
      b2: mutable.ArrayBuffer[(UTF8String, Long)])
      : mutable.ArrayBuffer[(UTF8String, Long)] = {
    b1 ++= b2
    compact(b1)
    b1
  }

  override def eval(buf: mutable.ArrayBuffer[(UTF8String, Long)]): Any = {
    compact(buf)
    new GenericArrayData(buf.sortBy(identity).take(k).map(_._2).toArray)
  }

  override def serialize(buf: mutable.ArrayBuffer[(UTF8String, Long)])
      : Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (p, v) =>
      val b = p.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.ArrayBuffer[(UTF8String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[(UTF8String, Long)](n + 1)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf += ((UTF8String.fromBytes(b), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ReservoirTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ReservoirTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ReservoirTopK =
    copy(left = newLeft, right = newRight)
}

object ReservoirTopK {

  /** Column-level entry point: payloads of the k smallest priorities,
    * in priority order.
    */
  def apply(priority: Column, payload: Column, k: Int): Column =
    Bridge.column(ReservoirTopK(Bridge.expression(priority),
      Bridge.expression(payload), k).toAggregateExpression())
}
