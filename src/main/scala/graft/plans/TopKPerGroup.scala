package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

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
  * MEMORY GUARD (high-cardinality groups): heap memory is capped at
  * `maxRowsInMemory` held rows per partition. On breach, the current heap
  * contents spill to a local temp file and accumulation restarts — correct
  * because per-group top-k distributes over unions: topK(A ∪ B) =
  * topK(topK(A) ∪ topK(B)). Spilled chunks are then re-passed (each pass
  * shrinks candidates toward k per group); if a pass stops making progress
  * the candidate set IS the final result size (O(groups·k), the output
  * floor), and one unbounded pass finishes the merge.
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
    maxRowsInMemory: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    maxRowsInMemory: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val kLocal = k
    val maxRows = math.max(maxRowsInMemory, kLocal + 1)
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupCols, schema)
      val toUnsafe = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val ordering = new LazilyGeneratedOrdering(order, schema)
      // max-heap by `ordering`: the WORST currently-kept row sits at head
      val heapOrd = ordering.reverse
      val numFields = schema.length

      // Spill files are tracked per task and removed by a task-completion
      // listener: deleteOnExit would grow the JVM's delete-on-exit set
      // unboundedly on long-lived executors, and a task killed mid-merge
      // (speculation, cancellation) would otherwise leak its chunks until
      // JVM exit. Successful merges also delete eagerly at EOF.
      val spillFiles = new scala.collection.mutable.ArrayBuffer[java.io.File]()
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        spillFiles.foreach(f => if (f.exists()) f.delete())
      }

      // Spill into Spark's configured scratch space, not java.io.tmpdir:
      // on a provisioned cluster the shuffle/spill disks are announced via
      // env vars and spark.local.dir is IGNORED there. Mirror Spark's own
      // Utils.getConfiguredLocalDirs precedence exactly: LOCAL_DIRS is a
      // YARN-container variable, honored ONLY when CONTAINER_ID marks this
      // JVM as a YARN container (a stray LOCAL_DIRS on any other host must
      // not redirect spills); then SPARK_EXECUTOR_DIRS, then
      // SPARK_LOCAL_DIRS (standalone), then the conf, then /tmp.
      val spillDir: java.io.File = {
        val env = org.apache.spark.SparkEnv.get
        val yarnLocalDirs =
          if (sys.env.contains("CONTAINER_ID")) sys.env.get("LOCAL_DIRS") else None
        val base = Seq(yarnLocalDirs, sys.env.get("SPARK_EXECUTOR_DIRS"),
            sys.env.get("SPARK_LOCAL_DIRS"),
            Option(env).flatMap(_.conf.getOption("spark.local.dir")))
          .flatten.headOption
          .map(_.split(",").head.trim)
          .getOrElse(System.getProperty("java.io.tmpdir"))
        val d = new java.io.File(base)
        if (d.isDirectory) d else new java.io.File(System.getProperty("java.io.tmpdir"))
      }

      def spill(rows: Iterator[InternalRow]): java.io.File = {
        val f = java.io.File.createTempFile("graft-topk-spill", ".bin", spillDir)
        spillFiles += f
        val out = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16))
        try rows.foreach { r =>
          val u = r match { case u: UnsafeRow => u; case other => toUnsafe(other) }
          val bytes = u.getBytes
          out.writeInt(bytes.length)
          out.write(bytes)
        } finally out.close()
        f
      }

      def readSpill(f: java.io.File): Iterator[InternalRow] = {
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16))
        new Iterator[InternalRow] {
          private var nextLen = readLen()
          private def readLen(): Int =
            try in.readInt() catch { case _: java.io.EOFException => in.close(); f.delete(); -1 }
          override def hasNext: Boolean = nextLen >= 0
          override def next(): InternalRow = {
            val bytes = new Array[Byte](nextLen)
            in.readFully(bytes)
            val row = new UnsafeRow(numFields)
            row.pointTo(bytes, nextLen)
            nextLen = readLen()
            row
          }
        }
      }

      /** One heap pass. Returns (survivor rows still in heaps, spill files,
        * total candidate rows retained = spilled + in-heap). */
      def pass(rows: Iterator[InternalRow], bounded: Boolean):
          (Iterator[InternalRow], Seq[java.io.File], Long) = {
        val groups = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        var held = 0L
        var retained = 0L
        val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
        def drain(): Iterator[InternalRow] = {
          val hs = new scala.collection.mutable.ArrayBuffer[java.util.PriorityQueue[InternalRow]](groups.size())
          groups.values().forEach(h => hs += h)
          hs.iterator.flatMap(h => scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala)
        }
        while (rows.hasNext) {
          val row = rows.next()
          val key = groupProj(row)
          var heap = groups.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, heapOrd)
            groups.put(key.copy(), heap)
          }
          if (heap.size < kLocal) { heap.add(row.copy()); held += 1 }
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
          if (bounded && held >= maxRows && rows.hasNext) {
            spills += spill(drain())
            groups.clear()
            retained += held
            held = 0
          }
        }
        retained += held
        (drain(), spills.toSeq, retained)
      }

      val (survivors, spills, retained0) = pass(iter, bounded = true)
      if (spills.isEmpty) survivors
      else {
        // Merge loop: re-pass the union of spilled chunks until one pass
        // fits in memory. Each pass keeps ≤ k rows per group per chunk, so
        // the candidate count shrinks geometrically toward the output size
        // O(groups·k); if a pass stops shrinking, the candidates ARE
        // output-sized and one unbounded pass (memory = result size, the
        // floor) completes the merge.
        var files = spills :+ spill(survivors)
        var lastRetained = retained0
        var result: Iterator[InternalRow] = null
        while (result == null) {
          val union = files.iterator.flatMap(readSpill)
          val (merged, newSpills, retained) = pass(union, bounded = true)
          if (newSpills.isEmpty) result = merged
          else if (retained < lastRetained) {
            files = newSpills :+ spill(merged)
            lastRetained = retained
          } else {
            val all = (newSpills :+ spill(merged)).iterator.flatMap(readSpill)
            result = pass(all, bounded = false)._1
          }
        }
        result
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, m, child) =>
      TopKPerGroupExec(g, o, k, m, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.{DataFrame, GraftBridge}

  /** Default heap-memory bound: 4M held rows per partition (~a few hundred
    * MB of UnsafeRows) before spilling to local disk. */
  val DefaultMaxRowsInMemory: Int = 4 << 20

  /** df limited to the first `k` rows per `groupCols` under `orderCol`
    * (descending by default, group key then ascending unique tie-breakers
    * recommended for determinism). */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[(String, Boolean)], k: Int,
            maxRowsInMemory: Int = DefaultMaxRowsInMemory): DataFrame = {
    // k=0 would NPE on heap.peek() inside an executor's generated
    // comparator; negative k fails in the PriorityQueue constructor —
    // both are caller errors that deserve a driver-side message
    require(k >= 1, s"TopKPerGroup requires k >= 1, got $k")
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column '$name' not in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (name, desc) =>
      if (desc) SortOrder(attr(name), org.apache.spark.sql.catalyst.expressions.Descending)
      else SortOrder(attr(name), org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), order, k, maxRowsInMemory, analyzed))
  }
}
