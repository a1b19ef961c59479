package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Fixed-width bitmap index as a `TypedImperativeAggregate` — the OLAP
  * bitmap-index primitive (segment membership per key-range bucket,
  * associative OR merge): `bitmap(pos)` collects bit positions
  * 0 <= pos < bits into a bits/8-byte buffer, partial aggregation ORs
  * buffers, and downstream set algebra (AND + popcount) runs on the
  * compact bitmaps instead of re-shuffling the key sets. At 100 TB a
  * segment-intersection question ("customers active in BOTH years")
  * moves 128 bytes per (bucket, segment) instead of the key lists —
  * and the merge is associative, so partial aggregation and AQE work
  * unchanged.
  *
  * Out-of-range positions fail LOUDLY (the round-5 convergence-loop
  * lesson: silent truncation would quietly drop members); the input
  * must be LongType (checkInputDataTypes — the round-5 ReservoirTopK
  * advice).
  */
case class BitmapAgg(child: Expression, bits: Int = 1024,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap requires a BIGINT position, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](bits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v.asInstanceOf[Long]
      if (pos < 0 || pos >= bits)
        throw new IllegalArgumentException(
          s"graft_bitmap: position $pos outside [0, $bits)")
      buf((pos >> 3).toInt) = (buf((pos >> 3).toInt) | (1 << (pos & 7)).toByte).toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : BitmapAgg = copy(child = newChild)
}

/** Bitmap set algebra, codegen'd via StaticInvoke (a static call inside
  * whole-stage codegen — no UDF serialization, no interpreted fallback).
  */
object BitmapOps {
  def cardinality(b: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < b.length) { s += java.lang.Integer.bitCount(b(i) & 0xff); i += 1 }
    s
  }

  /** Popcount of the intersection; lengths must match (same `bits`). */
  def andCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"bitmap width mismatch: ${a.length * 8} vs ${b.length * 8} bits")
    var s = 0L; var i = 0
    while (i < a.length) { s += java.lang.Integer.bitCount(a(i) & b(i) & 0xff); i += 1 }
    s
  }
}

object BitmapAgg {
  /** Column builder for the aggregate. */
  def bitmap(pos: Column, bits: Int = 1024): Column =
    Bridge.column(BitmapAgg(Bridge.expression(pos), bits)
      .toAggregateExpression())

  // returnNullable must be true with propagateNull: a null bitmap input
  // (outer-join miss) propagates to a null result, and declaring the
  // output non-nullable would hand the optimizer a lie it may fold on
  def cardinality(bm: Column): Column =
    Bridge.column(StaticInvoke(BitmapOps.getClass, LongType, "cardinality",
      Seq(Bridge.expression(bm)),
      propagateNull = true, returnNullable = true))

  def andCardinality(a: Column, b: Column): Column =
    Bridge.column(StaticInvoke(BitmapOps.getClass, LongType,
      "andCardinality",
      Seq(Bridge.expression(a), Bridge.expression(b)),
      propagateNull = true, returnNullable = true))

  /** SQL-callable registration (tests + ad-hoc SQL):
    * `graft_bitmap(pos)` or `graft_bitmap(pos, bits)` with a literal
    * width — extra arguments are rejected, never silently dropped.
    */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_bitmap", {
      case Seq(pos) => BitmapAgg(pos).toAggregateExpression()
      case Seq(pos, bits) if bits.foldable =>
        BitmapAgg(pos, bits.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_bitmap bits must be an integer literal, got $other")
        }).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"graft_bitmap expects (pos [, bits literal]), got ${args.length} args")
    })
}
