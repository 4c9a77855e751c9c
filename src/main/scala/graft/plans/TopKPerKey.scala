package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native whole-operator top-k-per-key: `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`, registered through `SparkSessionExtensions`
  * (GraftExtensions) — the (c) rung of the custom-operator ladder, for
  * the engine's single hottest pattern (the reference's
  * `ROW_NUMBER() ... = 1` dedup, SURVEY §2.5).
  *
  * Semantics: for each key group, emit the first `k` rows under the
  * caller's TOTAL order (ties must be broken by the order itself — the
  * LatestPerKey contract). Row output order is unspecified, like any
  * relational operator.
  *
  * vs the window form at 100 TB: the sort+`WindowGroupLimit` plan fully
  * SORTS each partition (O(n log n) over all rows, spilling at scale)
  * before limiting; this operator keeps one bounded k-heap per key and
  * streams input once — O(n log k), memory ∝ keys×k, no sort spill.
  * Two phases, mirroring partial/final aggregation: a map-side pass
  * bounds what crosses the wire to k rows per (key, input partition),
  * then the post-shuffle pass reduces per-key candidates.
  */
object TopKPerKey {

  /** Logical node — analyzer resolves keys/order generically. */
  final case class TopKPerKeyNode(
      keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  /** Planner rule: partial (map-side) → exchange-on-keys → final. */
  final class Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(keys, order, k, child) =>
        TopKPerKeyExec(keys, order, k, partial = false,
          TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Physical: one streamed pass, one bounded k-heap per key (heap head =
    * worst retained row; replace when a better row arrives).
    */
  final case class TopKPerKeyExec(
      keys: Seq[Expression], order: Seq[SortOrder], k: Int, partial: Boolean,
      child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil
    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val schema = child.output
      val keyExprs = keys
      val sortOrder = order
      val limit = k
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, schema)
        val ord = new LazilyGeneratedOrdering(sortOrder, schema)
        // PriorityQueue dequeues the MAX under its ordering = the worst
        // retained row under the caller's order ("top" = smallest).
        val groups = new java.util.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = groups.get(key)
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            groups.put(key.copy(), heap)
          }
          if (heap.size < limit) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
        }
        scala.jdk.CollectionConverters.IteratorHasAsScala(groups.values().iterator()).asScala
          .flatMap(_.dequeueAll.reverseIterator)
      }, preservesPartitioning = true)
    }
  }

  /** DataFrame API entry: `TopKPerKey(df, keys, order, k)`. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, "topKPerKey: k must be >= 1")
    import org.apache.spark.sql.GraftSqlBridge
    val spark = df.sparkSession
    val sortOrder = order.map(GraftSqlBridge.expression(spark, _)).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyNode(keys.map(GraftSqlBridge.expression(spark, _)), sortOrder, k,
        df.queryExecution.logical))
  }
}
