package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BaseOrdering, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY extension point (c)): top-k rows per
  * key under a sort order, WITHOUT sorting.
  *
  * The built-in spelling — `row_number().over(Window.partitionBy(keys)
  * .orderBy(order)) <= k` — shuffles EVERY row to its key's reducer and then
  * fully sorts each reducer partition, so at 100 TB the plan moves and sorts
  * the entire input to keep k rows per key. This operator replaces the
  * sort with bounded heaps and makes the reduction map-side:
  *
  *   1. partial [[TopKPerKeyExec]] on each input partition: one k-bounded
  *      heap per key seen — emits ≤ k rows per (key, partition), no sort,
  *      no shuffle;
  *   2. Exchange hash-partitions only those survivors by key (the shuffle
  *      shrinks from |input| to ≤ k·|keys|·partitions — usually orders of
  *      magnitude);
  *   3. final [[TopKPerKeyExec]] merges the per-partition winners with the
  *      same bounded heap.
  *
  * The same two-phase shape Spark itself uses for partial aggregation,
  * applied to an operator Catalyst only offers in sort-everything form.
  * `order` must be a TOTAL order (add a unique tiebreak column) for the
  * result to be deterministic; memory per task is O(k · distinct keys in
  * partition) — the hash-aggregate memory shape, with small k.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as final(exchange(partial(child))) — the Exchange is
  * inserted by `EnsureRequirements` from the final node's required
  * distribution. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Per-task accumulation state: one k-bounded heap per key. Shared by the
  * interpreted path (`doExecute`) and the whole-stage-codegen path (the
  * generated class holds one instance per task and calls `insertRow` /
  * `rowIterator` — both must stay public for the generated Java). */
final class TopKRowBuffer(keyProj: UnsafeProjection, ord: BaseOrdering, k: Int) {
  // Per key: a max-heap under the sort order (head = worst kept row) so a
  // better row evicts the head in O(log k).
  private val worstFirst = ord.reversed()
  private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

  def insertRow(row: InternalRow): Unit = {
    val key = keyProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
      heaps.put(key.copy(), heap)
    }
    if (heap.size < k) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll()
      heap.add(row.copy())
    }
  }

  def iterator: Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
  }

  def rowIterator(): java.util.Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    iterator.asJava
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan)
  extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String = if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  // Like SortExec: doConsume only uses the packed UnsafeRow (row.code), so
  // the framework must not ALSO pre-evaluate the input variables — with a
  // fused join chain below, that double emission redeclares the join-side
  // locals ("Redefinition of local variable" CompileException) and the whole
  // stage silently falls back to interpreted execution.
  override def usedInputs: AttributeSet = AttributeSet.empty

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** Called from the generated class's init (via the plan reference object,
    * like SortExec.createSorter) — one buffer per task. */
  def createBuffer(): TopKRowBuffer =
    new TopKRowBuffer(UnsafeProjection.create(keys, child.output),
      GenerateOrdering.generate(order, child.output), k)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val schema = child.output
    child.execute().mapPartitions { iter =>
      val buf = new TopKRowBuffer(UnsafeProjection.create(keyExprs, schema),
        GenerateOrdering.generate(sortOrder, schema), kLocal)
      while (iter.hasNext) buf.insertRow(iter.next())
      buf.iterator
    }
  }

  // ---- whole-stage codegen (SortExec's blocking-operator pattern) ----
  //
  // Consume side: the child's generated pipeline (scan/filter/project, or
  // the shuffle's InputAdapter) feeds rows straight into this task's
  // TopKRowBuffer — no iterator boundary, no extra row materialization
  // beyond the insert copy the heap needs anyway. Produce side: once input
  // is exhausted, the surviving rows stream to the parent's generated code.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  private var bufferVariable: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needInput = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "needTopKInput",
      v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("plan", this)
    bufferVariable = ctx.addMutableState(classOf[TopKRowBuffer].getName, "topKBuffer",
      v => s"$v = $thisPlan.createBuffer();", forceInline = true)
    val outputIter = ctx.addMutableState(
      "java.util.Iterator<org.apache.spark.sql.catalyst.InternalRow>", "topKOutputIter",
      forceInline = true)
    val addInputName = ctx.freshName("addTopKInput")
    val addInput = ctx.addNewFunction(addInputName,
      s"""
         |private void $addInputName() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topKOutputRow")
    s"""
       |if ($needInput) {
       |  $addInput();
       |  $outputIter = $bufferVariable.rowIterator();
       |  $needInput = false;
       |}
       |while ($limitNotReachedCond $outputIter.hasNext()) {
       |  org.apache.spark.sql.catalyst.InternalRow $outputRow =
       |    (org.apache.spark.sql.catalyst.InternalRow) $outputIter.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$bufferVariable.insertRow((org.apache.spark.sql.catalyst.InternalRow) ${row.value});
     """.stripMargin

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
