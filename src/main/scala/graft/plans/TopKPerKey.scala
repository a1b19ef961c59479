package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Whole-operator custom plan (SURVEY.md §7.4 tier (c)): top-k rows per
  * key as a first-class physical operator.
  *
  * The built-in spelling — `row_number() OVER (PARTITION BY k ORDER BY
  * o)` then `WHERE rn <= k` — plans as WindowExec: a full shuffle
  * followed by a FULL SORT of every partition's data, materializing and
  * ordering all N rows per key to keep k. This operator declares the
  * same clustering requirement (so Catalyst still plans the single hash
  * exchange) but replaces the sort with one streaming pass holding a
  * bounded k-element heap per key: O(N log k) comparisons, O(keys x k)
  * memory, no sort spill. At 100 TB with small k this is the difference
  * between a sort of everything and a scan.
  */
case class TopKPerKey(partitionExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

case class TopKPerKeyExec(partitionExprs: Seq[Expression],
    order: Seq[SortOrder], k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Cluster rows by key — Catalyst inserts the (single) hash exchange,
    * exactly as it would for the window spelling.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val partLocal = partitionExprs
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(partLocal, childOutput)
      val ord = RowOrdering.create(orderLocal, childOutput)
      // heap root = WORST retained row (reverse order), so a better
      // incoming row evicts it in O(log k)
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      it.foreach { row =>
        val u = row.asInstanceOf[UnsafeRow]
        val key = keyProj(u)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[UnsafeRow](kLocal + 1,
            ord.reverse.asInstanceOf[java.util.Comparator[UnsafeRow]])
          heaps.put(key.copy(), pq)
        }
        if (pq.size < kLocal) {
          pq.add(u.copy())
        } else if (ord.compare(u, pq.peek()) < 0) {
          pq.poll()
          pq.add(u.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { pq =>
        val rows = pq.toArray(Array.empty[UnsafeRow])
        java.util.Arrays.sort(rows,
          ord.asInstanceOf[java.util.Comparator[UnsafeRow]])
        rows.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(p, o, k, child) =>
      TopKPerKeyExec(p, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: rewrite the canonical top-k window spelling
  *
  * {{{ Project(cols..., Filter(rn <= k, Window([rn := row_number() over
  *     (partition by p order by o)], p, o, child))) }}}
  *
  * into [[TopKPerKey]] whenever the rank column itself is discarded by
  * the enclosing projection — the user asked for "k rows per key", not
  * for rank values, so the full per-partition sort WindowExec would do
  * is unnecessary. Tie behavior matches: row_number is arbitrary among
  * order-ties and so is the heap. Queries that keep `rn` in the output
  * are left untouched.
  */
object RowNumberTopKRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window, WindowGroupLimit}

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, _))
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, _))
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        Filter(cond, Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber, _), _)), part, order, child, _)))
        if part.nonEmpty && order.nonEmpty &&
          !projList.exists(_.references.contains(alias.toAttribute)) =>
      limitOf(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          // InferWindowGroupLimit may already have inserted a sort-based
          // group limit below the Window; the heap subsumes it
          val base = child match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case other => other
          }
          Project(projList, TopKPerKey(part, order, k, base))
        case _ => p
      }
  }
}

/** `spark.sql.extensions`-style registration
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => RowNumberTopKRewrite)
  }
}

object TopKPerKey {

  /** Imperative registration for an already-built session (the driver
    * harness constructs the SparkSession itself, so the
    * `spark.sql.extensions` config path is not available to it).
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(RowNumberTopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RowNumberTopKRewrite
    }
  }

  /** Top-k rows per key, ordered by `order` (use `.desc`/`.asc` columns;
    * bare columns default ascending).
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val sortOrder = order.map(c => Bridge.resolvableExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    Bridge.ofRows(spark,
      TopKPerKey(keys.map(Bridge.resolvableExpression), sortOrder, k,
        df.queryExecution.analyzed))
  }
}
