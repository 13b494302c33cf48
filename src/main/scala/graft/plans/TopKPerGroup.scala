package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, Window => LWindow, WindowGroupLimit => LWindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Bounded-heap top-k-per-group: a physical replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` idiom.
  *
  * Spark plans that idiom as Exchange → Sort(full partition) → Window →
  * Filter: every row of every group is sorted even though only k survive.
  * This operator keeps a size-k heap per group — O(n log k) with no sort
  * buffer — and emits each group's rows with their ranks. At 100 TB
  * ("top 3 documents per domain") the eliminated per-partition sort is the
  * dominant cost.
  *
  * Trade-off (documented, not hidden): heap state is #groups×k rows and
  * does not spill, whereas SortExec spills; prefer the window plan when
  * group cardinality per partition approaches row count and k is large.
  * The strategy therefore only rewrites for k ≤ maxK (default 100).
  */
case class TopKPerGroupExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  // rnAttr is produced here, not consumed — without this the node reports
  // a missing input and the planner marks the plan invalid ("!" prefix)
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val partExprs = partitionExprs
    val order = orderSpec
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = GenerateUnsafeProjection.generate(partExprs, childOutput)
      val rowProj = GenerateUnsafeProjection.generate(childOutput, childOutput)
      val ordering = RowOrdering.create(order, childOutput)
      // max-heap of the current k best rows per group (head = worst kept)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap += rowProj(row).copy()
            else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap += rowProj(row).copy()
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heap += rowProj(row).copy()
            heaps.put(key.copy(), heap)
        }
      }
      val joiner = new JoinedRow
      heaps.valuesIterator.flatMap { heap =>
        val sorted = heap.dequeueAll.reverse // ascending rank order
        sorted.iterator.zipWithIndex.map { case (r, i) =>
          joiner(r, new GenericInternalRow(Array[Any](i + 1))): InternalRow
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy matching `Filter(rn <= k, Window([rn := row_number()
  * over (partition by … order by …)], …))` — injectable via
  * `spark.experimental.extraStrategies` or `GraftExtensions`.
  */
case class TopKPerGroupStrategy(maxK: Int = 100) extends SparkStrategy {

  // the rank attribute often reaches the filter behind a cast (queries
  // project `row_number().cast("long")` before filtering), and the literal
  // correspondingly as a long — match through the WIDENING cast only: a
  // narrowing cast can overflow-wrap ranks, making the stock plan's filter
  // semantics differ from a true top-k
  private object RankAttr {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case c: Cast if c.dataType == LongType =>
        c.child match { case a: Attribute => Some(a); case _ => None }
      case _ => None
    }
  }
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case Literal(v: Long, _) if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }
  private object RankLimit {
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(RankAttr(a), IntLit(v)) => Some((a, v))
      case LessThan(RankAttr(a), IntLit(v)) => Some((a, v - 1))
      case GreaterThanOrEqual(IntLit(v), RankAttr(a)) => Some((a, v))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LFilter(RankLimit(rn, k),
        LWindow(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(partSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _))
        if k > 0 && k <= maxK && alias.toAttribute.semanticEquals(rn) &&
          orderSpec.nonEmpty =>
      // Spark's InferWindowGroupLimit may already have inserted a logical
      // WindowGroupLimit below the Window (it limits rows but still sorts
      // every partition twice). Our heap operator subsumes it — bypass so
      // the plan carries no Sort at all.
      val source = child match {
        case LWindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other => other
      }
      TopKPerGroupExec(partSpec, orderSpec, k, alias.toAttribute,
        planLater(source)) :: Nil
    case _ => Nil
  }
}
