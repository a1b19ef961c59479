package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a `TypedImperativeAggregate` —
  * the custom-aggregate tier of SURVEY.md §7.4 (a "novel sketch"
  * operator): a fixed 4 KiB register buffer per group, associative
  * elementwise-max merge, so partial aggregation and AQE work unchanged
  * and a 100 TB aggregation moves 4 KiB per group per partition instead
  * of the value set. p = 12 -> 4096 registers, standard error
  * 1.04/sqrt(4096) ~= 1.6%.
  *
  * Spark ships approx_count_distinct (HLL++, with bias tables); this
  * implementation exists to demonstrate the sketch-aggregate shape
  * end-to-end — xxhash64 -> register index from the top p bits, rank =
  * leading zeros of the remainder, harmonic-mean estimate with the
  * linear-counting small-range correction. Deterministic for fixed
  * input data (seed 42), so the test suite pins both the error bound
  * and exact reproducibility; no DuckDB oracle (engine-specific hash).
  */
case class HyperLogLog(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val P = 12
  private val M = 1 << P
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - P)).toInt
      // rank of the first set bit in the remaining 64-P bits (1-based);
      // the OR'd sentinel caps the rank when those bits are all zero
      val rank =
        java.lang.Long.numberOfLeadingZeros((h << P) | (1L << (P - 1))) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.scalb(1.0, -buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / invSum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HyperLogLog =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression)
      : HyperLogLog = copy(child = newChild)
}

object HyperLogLog {
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_hll",
      args => new HyperLogLog(args(0)).toAggregateExpression())
}
