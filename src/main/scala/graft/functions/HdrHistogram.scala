package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** HDR-histogram quantile sketch as a `TypedImperativeAggregate` — the
  * mergeable-quantiles member of the sketch family (HLL for distincts,
  * Count-Min for frequencies, ReservoirTopK for samples, this for
  * percentiles). Fixed 8 KiB state per group (64 octaves x 16
  * sub-buckets of exact int64 counts), associative elementwise-sum
  * merge, so partial aggregation and AQE work unchanged and a 100 TB
  * percentile moves 8 KiB per group per partition instead of the value
  * set (q_percentile's exact sort-based form moves the values).
  *
  * Unlike t-digest/KLL this sketch is BIT-DETERMINISTIC and engine-
  * independent: a value docks at u = floor(16v) + 16, octave = floor
  * log2(u) (an integer bit op, no libm), sub-bucket = the 4 bits after
  * the leading 1 — so the bucket function is expressible in DuckDB as
  * `length(bin(u)) - 1` (the repo's floor-log2 idiom) and the query
  * carries a FULL oracle, which no randomized quantile sketch can.
  * The estimate for a quantile is the lower bound of the first bucket
  * whose cumulative count reaches ceil(q*n): relative error is bounded
  * by the sub-bucket width, 1/16 of the octave (~6%), constant
  * regardless of data scale or distribution.
  *
  * Domain: non-negative doubles below 2^58 (one octave array); null and
  * negative inputs are skipped, declared analysis-time via
  * checkInputDataTypes (the CountMin/ReservoirTopK lesson: reject wrong
  * types at analysis, not with a runtime ClassCastException).
  */
case class HdrHistogram(left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with BinaryLike[Expression] {

  private val Buckets = 64 * 16

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hdr"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) if right.foldable =>
        // fail-loudly rule (see BitmapAgg): a quantile outside (0, 1]
        // would otherwise walk the cumulative loop off the end and
        // reverse-map a nonsense bucket
        val bad = right.eval().asInstanceOf[ArrayData].toDoubleArray()
          .filterNot(q => q > 0.0 && q <= 1.0)
        if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_hdr quantiles must lie in (0, 1], got ${bad.mkString(",")}")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_hdr expects (double value, foldable array<double> " +
            s"quantiles), got $other")
    }

  private lazy val quantiles: Array[Double] =
    right.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      // out-of-domain values are skipped like nulls/negatives: past
      // 2^58 the 16x fixed-point docking saturates toLong and the eval
      // shift would overflow into a garbage (possibly negative) bucket
      if (d >= 0.0 && d < 2.8e17) {
        val u = math.floor(d * 16.0).toLong + 16L
        val hi = 63 - java.lang.Long.numberOfLeadingZeros(u)
        val sub = ((u >>> (hi - 4)) & 15L).toInt
        buf(hi * 16 + sub) += 1L
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Buckets) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < Buckets) { n += buf(i); i += 1 }
    if (n == 0L) return null
    val out = new Array[Double](quantiles.length)
    var qi = 0
    while (qi < quantiles.length) {
      // first bucket whose cumulative count reaches ceil(q*n); both
      // the ceil and the /16 are single IEEE ops the SQL twin repeats
      val target = math.max(1L, math.ceil(quantiles(qi) * n).toLong)
      var cum = 0L
      var b = 0
      var found = -1
      while (b < Buckets && found < 0) {
        cum += buf(b)
        if (cum >= target) found = b
        b += 1
      }
      val hi = found / 16
      val sub = found % 16
      out(qi) = (((16L + sub) << (hi - 4)) - 16L).toDouble / 16.0
      qi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Buckets * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](Buckets)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): HdrHistogram =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HdrHistogram =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HdrHistogram =
    copy(left = newLeft, right = newRight)
}

object HdrHistogram {
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_hdr",
      args => new HdrHistogram(args(0), args(1)).toAggregateExpression())

  /** Column-API spelling (used by the streamed twin, where no session
    * registration has happened).
    */
  def agg(value: org.apache.spark.sql.Column, qs: Seq[Double])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, lit}
    Bridge.column(HdrHistogram(Bridge.expression(value),
      Bridge.expression(array(qs.map(lit(_)): _*))).toAggregateExpression())
  }
}
