package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.SparkSession

/** Top-k-per-group as a first-class operator: logical node + planner
  * strategy + physical exec with BOUNDED PER-GROUP HEAPS.
  *
  * The DataFrame idiom (`row_number().over(Window.partitionBy(g).orderBy(o))
  * .filter(rn <= k)`) materializes and FULLY SORTS every partition before
  * discarding all but k rows per group. At 100 TB that sort is the dominant
  * cost and can spill. This operator holds at most k rows per group in a
  * heap while streaming the partition once: memory is O(groups·k), not
  * O(rows), and nothing is sorted but the heaps themselves.
  *
  * Plan shape: requiredChildDistribution clusters by the group columns, so
  * Spark inserts exactly one hash shuffle (same as the window version);
  * everything after is a single streaming pass. Registered through
  * [[GraftExtensions]] (`injectPlannerStrategy`); built via
  * [[TopKPerGroup.apply]] on a resolved child plan.
  */
case class TopKPerGroupPlan(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupCols, schema)
      val ordering = new LazilyGeneratedOrdering(order, schema)
      // max-heap by `ordering`: the WORST currently-kept row sits at head
      val heapOrd = ordering.reverse
      val groups = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = groups.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](k + 1, heapOrd)
          groups.put(key.copy(), heap)
        }
        if (heap.size < k) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      groups.values().forEach { h => out ++= scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.{DataFrame, GraftBridge}

  /** df limited to the first `k` rows per `groupCols` under `orderCol`
    * (descending by default, group key then ascending unique tie-breakers
    * recommended for determinism). */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column '$name' not in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (name, desc) =>
      if (desc) SortOrder(attr(name), org.apache.spark.sql.catalyst.expressions.Descending)
      else SortOrder(attr(name), org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftBridge.ofRows(spark, TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed))
  }
}
