package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-portable 64-bit string hash: the first 8 bytes of
  * `md5(utf8-bytes)`, big-endian, as a signed long.
  *
  * This is the cross-engine hash BASIS of the sketch family (round-11):
  * MinHash grams and SimHash tokens hash strings, and XXH64's
  * variable-length string path is impractical to reproduce in a single
  * DuckDB statement — but `md5` is bit-identical in every engine, and
  * `substr(md5(s), 1, 16)` parsed as an unsigned 64-bit integer IS this
  * value (`CAST(concat('0x', ...) AS UBIGINT)` in DuckDB). Downstream
  * mixing stays `XXH64.hashLong`, whose HUGEINT emulation
  * [[graft.operators.XxhSql]] already reproduces bit-exactly — so the
  * whole sketch pipeline (signatures, band keys, candidate sets)
  * becomes DuckDB-oracle-checkable end to end.
  *
  * Hash quality: md5's avalanche is far stronger than needed for
  * min-wise/sign-bit sketches; truncation to 64 bits keeps uniformity.
  * Cost: one md5 per gram/token — bounded by the same token pass that
  * builds the gram; ISOLATED q_dedup_minhash measured 1.00 s on the
  * md5 basis vs 0.97 s on the xxh basis at sf0.1 (in-suite numbers are
  * contention-dominated on this VM — do not read them for this).
  */
object Md5Long {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes of the string's UTF-8 encoding, big-endian. */
  def hash64(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }

  /** Column entry point, used by tests to state the oracle spelling. */
  def apply(c: Column): Column =
    Bridge.column(Md5LongExpr(Bridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "md5_long64",
      args => Md5LongExpr(args(0)))
}

/** `md5_long64(str)` as a codegen'd scalar expression. */
case class Md5LongExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_long64 expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Long.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Md5Long.hash64($a)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5LongExpr = copy(child = newChild)
}
