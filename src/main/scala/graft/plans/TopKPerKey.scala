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

  /** Flush threshold for the PARTIAL phase's group map: when the number
    * of tracked keys exceeds this, current heaps are emitted and the map
    * cleared — correct because the final phase re-reduces, and exactly
    * the graceful degradation wanted for near-unique keys (where a
    * partial top-k cannot reduce anything anyway). Bounds memory the
    * same way partial hash aggregation's fallback does; an unbounded
    * map here would be the same flaw as an uncapped collect_list.
    */
  val PartialFlushGroups = 1 << 17

  /** Physical operator.
    *
    * Partial (map-side, any distribution): one bounded k-heap per key
    * (heap head = worst retained; replace when a better row arrives),
    * flushed whenever the map tracks more than [[PartialFlushGroups]]
    * keys — memory is bounded by min(keys, cap)×k rows.
    *
    * Final (post-shuffle): requires the child SORTED by (keys, order) —
    * EnsureRequirements plans a spillable SortExec over the
    * partial-reduced candidate set (small for reducible keys; for
    * near-unique keys this equals the stock plan's sort, never worse) —
    * then streams group-contiguous rows emitting the first k per key
    * with O(k) memory and no buffering.
    */
  final case class TopKPerKeyExec(
      keys: Seq[Expression], order: Seq[SortOrder], k: Int, partial: Boolean,
      child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil
    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      if (partial) Seq(Nil)
      else Seq(keys.map(SortOrder(_, Ascending)) ++ order)
    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val schema = child.output
      val keyExprs = keys
      val sortOrder = order
      val limit = k
      val isPartial = partial
      val flushGroups = conf.getConfString(
        "spark.graft.nativeTopK.partialFlushGroups", PartialFlushGroups.toString).toInt
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, schema)
        if (isPartial) {
          val ord = new LazilyGeneratedOrdering(sortOrder, schema)
          // Chunked heap-map: fill one map up to PartialFlushGroups
          // keys, stream its contents out, repeat. Memory is bounded to
          // one chunk regardless of key cardinality; the row that would
          // open key cap+1 is carried (copied) into the next chunk.
          new Iterator[InternalRow] {
            private var carry: InternalRow = null
            private var out: Iterator[InternalRow] = Iterator.empty
            private def process(groups: java.util.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]],
                                row: InternalRow): Boolean = {
              val key = keyProj(row)
              var heap = groups.get(key)
              if (heap == null) {
                if (groups.size() >= flushGroups) { carry = row.copy(); return false }
                heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
                groups.put(key.copy(), heap)
              }
              // heap head = MAX under the caller's order = worst retained
              if (heap.size < limit) heap.enqueue(row.copy())
              else if (ord.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row.copy())
              }
              true
            }
            private def refill(): Unit = {
              val groups = new java.util.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
              if (carry != null) { val c = carry; carry = null; process(groups, c) }
              var open = true
              while (open && iter.hasNext) open = process(groups, iter.next())
              out = scala.jdk.CollectionConverters.IteratorHasAsScala(groups.values().iterator())
                .asScala.flatMap(_.dequeueAll.reverseIterator)
            }
            override def hasNext: Boolean = {
              while (!out.hasNext && (carry != null || iter.hasNext)) refill()
              out.hasNext
            }
            override def next(): InternalRow = { hasNext; out.next() }
          }
        } else {
          // sorted input: rows of a key are contiguous and already in
          // the caller's order — emit the first k per key, O(k) memory.
          // Lazy advance: the underlying iterator may reuse row buffers,
          // so never read ahead before the consumer is done with a row.
          new Iterator[InternalRow] {
            private var current: UnsafeRow = null
            private var emitted = 0
            private var pending: InternalRow = null
            private var ready = false
            private def findNext(): Unit = {
              pending = null
              while (pending == null && iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                if (current == null || key != current) {
                  current = key.copy(); emitted = 0
                }
                if (emitted < limit) { emitted += 1; pending = row }
              }
              ready = true
            }
            override def hasNext: Boolean = { if (!ready) findNext(); pending != null }
            override def next(): InternalRow = { if (!ready) findNext(); ready = false; pending }
          }
        }
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
