package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-group bounded-heap top-k physical operator: for each group, retain
  * the first `k` rows in `sortOrder` using a size-k heap — NO per-partition
  * sort. Spark plans `filter(row_number().over(partitionBy.orderBy) <= k)`
  * as Exchange + full Sort + WindowExec; at 100 TB that sorts every
  * partition end to end to keep k rows per key. This node needs the same
  * Exchange (groups must colocate) but replaces the sort with O(n log k)
  * heap maintenance in one pass, memory bounded by groups_in_partition × k.
  *
  * Planned as a two-phase pair, like partial aggregation: a `partial`
  * instance BELOW the exchange prunes each map partition to k rows per
  * group it sees (a superset of any global answer, for any tie choice),
  * so the shuffle moves at most k × map_partitions rows per group instead
  * of every row; the final instance re-selects and attaches the rank. */
case class BoundedTopKExec(
    partitionExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    rankAttr: Attribute,
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    maxPartialGroups: Int = 1 << 16) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      // normalize to UnsafeRow so heap copies are cheap, layout-stable
      // materializations whatever the child operator emits
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val groupProj = UnsafeProjection.create(partitionExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap by sort order: the ROOT is the worst retained row, evicted
      // when a better one arrives
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      // the partial phase caps how many groups it tracks (the partial-
      // aggregation fallback): past the cap, unseen groups' rows pass
      // through unpruned — still a superset, the final phase prunes.
      // The final phase owns its groups post-shuffle and must track all.
      val groupCap = if (partial) maxPartialGroups else Int.MaxValue
      val pruned = iter.flatMap { r =>
        val row = toUnsafe(r)
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < k) heap.enqueue(row.copy())
            else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
            Iterator.empty
          case None if heaps.size < groupCap =>
            val heap = scala.collection.mutable.PriorityQueue
              .empty[UnsafeRow](ordering.asInstanceOf[Ordering[UnsafeRow]])
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
            Iterator.empty
          case None => // untracked overflow group (partial only)
            Iterator.single(row.copy(): InternalRow)
        }
      }
      if (partial) {
        // emission order within a group is irrelevant pre-shuffle
        pruned ++ heaps.iterator.flatMap { case (_, heap) => heap.iterator }
      } else {
        val out = UnsafeProjection.create(output, childOutput :+ rankAttr)
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        // drain the (empty-by-construction) pass-through first so the
        // heaps are fully populated before ranking
        pruned ++ heaps.iterator.flatMap { case (_, heap) =>
          val sorted = heap.dequeueAll.reverse // ascending sort order
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            out(joined(row, InternalRow(i + 1)))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): BoundedTopKExec =
    copy(child = newChild)
}
