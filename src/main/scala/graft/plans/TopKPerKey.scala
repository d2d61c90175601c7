package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.truncatedString
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator extension (the SURVEY §7 tier-(c) path): top-k rows per
  * key as a FIRST-CLASS physical operator instead of
  * `row_number().over(window) … WHERE rnk <= k`.
  *
  * Why a custom operator: the window formulation SORTS every partition in
  * full — O(n log n) comparisons and, at scale, spill files proportional
  * to the whole corpus — just to discard all but k rows per key. This
  * exec keeps one bounded heap of size k per key: O(n log k), no sort, no
  * spill, memory bounded by k·(groups per partition) — the same reason
  * Spark's own `TakeOrderedAndProject` exists for the global-limit case;
  * this is its per-key generalization.
  *
  * Semantics are IDENTICAL to the window form (rank 1..k in `order`, rows
  * appended with the rank column) — pinned bit-for-bit against the
  * row_number oracle in the query registry.
  */
case class TopKPerKeyNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan)
  extends UnaryNode {

  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is PRODUCED here, not consumed from the child — without this
  // CheckAnalysis reports it "missing from input"
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
  override def simpleString(maxFields: Int): String =
    s"TopKPerKey k=$k, ${truncatedString(groupExprs, "[", ", ", "]", maxFields)}"
}

case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  // complete groups must be co-located; the planner inserts the exchange
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupLocal = groupExprs
    val orderLocal = order
    val kLocal = k
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      // BaseOrdering: compare(a, b) < 0 ⇔ a ranks before b
      val ord = RowOrdering.create(orderLocal, childOutput)
      val rowOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
      // PriorityQueue head = MAX per ordering = the worst row kept
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        // look up with the projection's reused row; COPY only on first
        // sight of a key (getOrElseUpdate would allocate a copy per row)
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll drains worst → best; reverse for rank 1..k
        val best = heap.dequeueAll.reverseIterator
        best.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, (i + 1).toLong)
          outProj(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner rule mapping the logical node onto the heap exec. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.groupExprs, n.order, n.k, n.rankAttr, planLater(n.child)) :: Nil
    case _ => Nil
  }
}
