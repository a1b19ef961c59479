package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator`: emit the sliding n-grams of a token
  * array as rows — `graft_ngrams(tokens, n) -> (gram)` — completing the
  * extension triad (scalar `Expression`, `TypedImperativeAggregate`,
  * `Generator`) alongside QuantizedDot/SimHash64 and HyperLogLog.
  *
  * Implements `CollectionGenerator`, which is the tier GenerateExec can
  * compile: `doGenCode` emits one static call building the gram array
  * (direct UTF8String concatenation, no interpreted lambdas), and the
  * surrounding whole-stage-codegen loop iterates it. A plain `Generator`
  * with `CodegenFallback` would knock the entire stage out of codegen —
  * measured 3x slower than even the interpreted-HOF `transform` +
  * `explode` spelling on the documents corpus.
  *
  * `withPos = true` is the posexplode twin (r18): GenerateExec prepends
  * the 0-based gram offset as a `pos` column, exactly as `PosExplode`
  * does — the positional span pipelines (q_dedup_spans, q_contam_spans)
  * previously ran their 8/13-gram generation through an interpreted
  * transform/sequence HOF chain because the codegen generator could not
  * carry positions.
  *
  * Registered for SQL via [[NGramGenerator.register]] (generators
  * resolve through the function registry, usable in SELECT / LATERAL
  * VIEW), or used directly through the Column API entry point.
  */
case class NGramGenerator(child: Expression, n: Int,
    withPos: Boolean = false)
    extends UnaryExpression with CollectionGenerator {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override val inline: Boolean = false
  override val position: Boolean = withPos

  override def elementSchema: StructType =
    if (withPos)
      StructType(StructField("pos", IntegerType, nullable = false) ::
        StructField("gram", StringType, nullable = false) :: Nil)
    else
      StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def collectionType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_ngrams expects array<string>, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val grams = NGramGenerator.grams(arr, n)
    if (withPos)
      (0 until grams.numElements()).iterator
        .map(i => InternalRow(i, grams.getUTF8String(i)))
    else
      (0 until grams.numElements()).iterator
        .map(i => InternalRow(grams.getUTF8String(i)))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // GenerateExec's CollectionGenerator path consumes the COLLECTION
    // from this codegen and iterates it in the stage's produce loop
    // (with `position = true` it also emits the loop index, exactly as
    // for posexplode).
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val c = child.genCode(ctx)
    val out = ctx.freshName("grams")
    val arrCls = classOf[GenericArrayData].getName
    ev.copy(
      code = code"""
        |${c.code}
        |$arrCls $out = ${c.isNull}
        |  ? new $arrCls(new Object[0])
        |  : graft.functions.NGramGenerator.grams(${c.value}, $n);
        |""".stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(out, classOf[GenericArrayData]))
  }

  override protected def withNewChildInternal(
      newChild: Expression): NGramGenerator = copy(child = newChild)
}

object NGramGenerator {
  private val Space = UTF8String.fromString(" ")

  /** Build the sliding n-gram array of a token array; shared by the
    * interpreted and codegen paths.
    */
  def grams(arr: ArrayData, n: Int): GenericArrayData = {
    val count = arr.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API entry point: one output column `gram`. */
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(NGramGenerator(Bridge.expression(tokens), n))

  /** Positional entry point: two output columns `(pos, gram)`, pos
    * 0-based — posexplode semantics over the gram sequence.
    */
  def pos(tokens: Column, n: Int): Column =
    Bridge.column(NGramGenerator(Bridge.expression(tokens), n,
      withPos = true))

  /** SQL registration: `SELECT graft_ngrams(split(text, ' '), 3) ...`
    * (the n argument must be an integer literal — it shapes the plan).
    */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_ngrams", args =>
      args(1) match {
        case Literal(v: Int, IntegerType) => NGramGenerator(args(0), v)
        case other => throw new IllegalArgumentException(
          s"graft_ngrams(tokens, n): n must be an int literal, got $other")
      })
}
