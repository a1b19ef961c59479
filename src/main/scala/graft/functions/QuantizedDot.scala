package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.sql.graft.Bridge

/** Exact fixed-point dot product of two float vectors:
  * sum_i floor(a_i * 2^20) * floor(b_i * 2^20) as int64.
  *
  * This is the hot inner loop of the similarity operators. The
  * DataFrame-API spelling (`aggregate(zip_with(...))`) builds
  * intermediate arrays and evaluates interpreted lambda expressions per
  * element; this native expression is a single fused pass with
  * whole-stage codegen (`doGenCode` emits a plain for-loop over the two
  * ArrayData buffers), which is the preference order SURVEY.md §7.4
  * prescribes when built-ins can't express the semantics efficiently.
  *
  * Semantics match the portable fixed-point policy documented in
  * [[graft.operators.Similarity]]: power-of-two scaling is exact in IEEE
  * arithmetic and floor is unambiguous, so results are bit-identical to
  * the DuckDB oracle's integer arithmetic. Overflow-safe for unit-norm
  * embeddings: |q| < 2^20, per-term < 2^40, 64 terms < 2^46.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quantized_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  @inline private def quant(f: Float): Long =
    math.floor(f.toDouble * 1048576.0).toLong

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += quant(a.getFloat(i)) * quant(b.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor($a.getFloat($i) * 1048576.0d)
         |        * (long) java.lang.Math.floor($b.getFloat($i) * 1048576.0d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QuantizedDot = copy(newLeft, newRight)
}

object QuantizedDot {
  /** Column-level entry point: `quantized_dot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))
}
