package org.apache.spark.sql.graftshim

import java.util.{HashMap => JHashMap, PriorityQueue => JPriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-operator top-K-per-key: the native physical form of
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`.
  *
  * Spark's window form shuffles EVERY row of every group and then sorts each
  * group in full before discarding all but k rows — on a 10^12-row corpus
  * where one hot key (a mega-domain, a boilerplate fingerprint, a celebrity
  * page) holds 10^8 rows, that single group is sorted end-to-end on one task.
  * This operator keeps a bounded k-row heap per key on the MAP side, so at
  * most k rows per key per input partition ever reach the shuffle, and the
  * reduce side merges the per-partition survivors with the same bounded heap.
  * The hot key ships k·numPartitions rows instead of 10^8 and never sorts
  * more than k at once — the same partial/final shape as a hash aggregate.
  *
  * This is the engine's custom-LogicalPlan + SparkStrategy + SparkPlan tier
  * (used only here, where composing built-ins cannot express the bounded
  * shuffle): [[TopKPerKey]] is the logical node, [[GraftTopKStrategy]] plans
  * it as partial→final [[TopKPerKeyExec]] pairs, and EnsureRequirements
  * inserts the key-clustered exchange between them from
  * `requiredChildDistribution` exactly as it does for aggregates.
  *
  * Semantics contract: `order` must be a TOTAL order (include a unique
  * tiebreak column) or ties at the k boundary are broken arbitrarily — the
  * identical caveat as the window row_number it replaces. Memory: one k-row
  * heap per distinct key per task (the hash-aggregate shape, no spill path);
  * with the shuffle partition count sized so distinct-keys-per-task × k fits
  * the executor, the operator is skew-immune by construction because NO key
  * can ever hold more than k rows in memory or in the shuffle.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {
  require(keys.nonEmpty, "TopKPerKey requires at least one key column")
  require(k >= 1, s"TopKPerKey requires k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical bounded-heap top-K. `partial = true` runs on the child's native
  * partitioning (map side); `partial = false` demands the key-clustered
  * distribution, so planning inserts one hash exchange between the pair.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String = if (partial) "GraftTopKPartial" else "GraftTopKFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput.map(a => a: Expression), childOutput)
      val ord = RowOrdering.create(sortExprs, childOutput)
      // Max-heap under `ord`: the head is the worst survivor, evicted first.
      val heapCmp = ord.reverse: java.util.Comparator[InternalRow]
      val heaps = new JHashMap[UnsafeRow, JPriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = rowProj(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new JPriorityQueue[UnsafeRow](kLocal + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.offer(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap { heap =>
        val arr = heap.toArray(new Array[UnsafeRow](heap.size))
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as the partial→final exec pair. */
object GraftTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public builder: resolves key/order columns against the frame and wraps it
  * in the custom logical node. Lives in the shim package because building a
  * DataFrame from a raw LogicalPlan (`Dataset.ofRows`) is `private[sql]`.
  */
object GraftTopK {

  /** Top-k rows per key group. `order` is (column, descending?) pairs and
    * should end with a unique tiebreak column for deterministic results.
    */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    GraftRegistration.ensure(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column '$name' not found in [${analyzed.output.map(_.name).mkString(", ")}]"))
    val sortOrders = order.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKey(keys.map(attr), sortOrders, k, analyzed))
  }
}
