package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Grouped top-k — the k first rows per key under an ordering — as a
  * WHOLE-OPERATOR extension (SURVEY §4.3 tier c: custom LogicalPlan +
  * SparkStrategy + SparkPlan, injected via [[GraftExtensions]]).
  *
  * Spark's native plan for `row_number() OVER (PARTITION BY k ORDER BY
  * o) <= n` is: shuffle EVERY row on the key, SORT every post-shuffle
  * partition end-to-end, run the window, filter. 3.5+'s
  * `InferWindowGroupLimit` prunes rows *around* the sort but keeps both
  * the full-row shuffle and the sort. This operator instead keeps a
  * bounded per-key heap on the MAP side, so only ≤ k rows per key per
  * input partition reach the exchange, and the reduce side merges heaps
  * without any sort: at 100 TB with k=3 and a few million keys, the
  * shuffle ships O(keys·k·partFanIn) rows instead of O(rows) — for the
  * `grouped_topk` registry query at sf0.1 that is a 600 k-row scan
  * shuffling ~12 k rows.
  *
  * Memory contract: the map-side state is one k-row heap per distinct
  * key per input partition. The operator targets the k ≪ rows/key
  * regime (top-n-per-entity over fact tables). For key cardinalities
  * where keys·k rivals the partition's row count, the window form's
  * sort-spill path is the right tool — the same trade hash aggregation
  * makes against sort aggregation.
  *
  * Tie semantics: row_number (not rank) — exactly k rows survive per
  * key; give a total ordering (unique tie-break column) for
  * deterministic output, same as the window form.
  */
object TopKPerKey {

  /** Public API: top `k` rows per `keys` group in `order`.
    *
    * Resolution: Spark 4 Columns are lazy ColumnNode wrappers that only
    * the analyzer's converter materializes for KNOWN plan shapes — a
    * custom node would carry them unresolved into execution. So the
    * resolved Catalyst forms are harvested from throwaway `df.sort` /
    * `df.select` analyses (both wrap the SAME already-analyzed child,
    * so attribute ids line up), and the node is built fully resolved. */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val child = df.queryExecution.analyzed
    val resolvedOrder = df.sort(order: _*).queryExecution.analyzed
      .collectFirst { case s: logical.Sort => s.order }
      .getOrElse(sys.error("sort analysis produced no Sort node"))
    val resolvedKeys: Seq[Expression] =
      df.select(keys: _*).queryExecution.analyzed
        .collectFirst { case p: logical.Project => p.projectList }
        .getOrElse(sys.error("select analysis produced no Project node"))
        .map {
          case a: Attribute => a
          case al: org.apache.spark.sql.catalyst.expressions.Alias => al.child
          case e => e
        }
    PlanBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(resolvedKeys, resolvedOrder, k, child))
  }
}

/** Logical node: unresolved key/order expressions resolve against the
  * child through the analyzer's generic expression resolution. Acts as
  * an optimization barrier (generic rules don't push through unknown
  * nodes) — correct, since a filter above semantically differs from a
  * filter below a top-k. */
final case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Planner strategy: partial (map-side prune) → exchange on the keys
  * (inserted by EnsureRequirements via the final node's required
  * distribution) → final (per-key merge). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical bounded per-key top-k. Both phases run the same kernel —
  * a hash map of k-capped max-heaps keyed by the group's UnsafeRow —
  * the partial over whatever partitioning the child has, the final
  * after a hash exchange clusters each key onto one partition. */
final case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val cap = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap of the k best-so-far rows per key: head = worst kept;
      // a new row enters iff it orders strictly before the head.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](cap, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < cap) heap.add(rowProj(row).copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(rowProj(row).copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
