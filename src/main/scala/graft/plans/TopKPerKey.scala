package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BaseOrdering, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator extension, preference (c) of the survey's custom-op
  * ladder: a logical node + planner strategy + physical operator for
  * BOUNDED TOP-K PER KEY, registered through `SparkSessionExtensions`
  * (see [[graft.GraftExtensions]]).
  *
  * Why a physical operator and not the built-ins: the declarative
  * spelling (`row_number() OVER (PARTITION BY k ORDER BY v) <= K`)
  * plans as Exchange → Sort → Window → Filter — the sort materializes
  * and orders EVERY row of every partition before the filter throws
  * all but K·|keys| of them away. At 100 TB that sort (and its spill)
  * is the whole cost of the query. The typed-Aggregator form
  * (`operators.BoundedTopK`) fixes the asymptotics but carries its
  * rows through an object-typed aggregation buffer. This operator
  * keeps the exchange and replaces sort+window+filter with one
  * streaming pass holding a K-bounded binary heap per key: memory
  * O(|keys in partition| · K) rows, time O(n log K), no sort, no
  * spill, rows stay `UnsafeRow` end to end.
  *
  * Determinism contract: `order` must be a TOTAL order (callers pass a
  * unique tiebreak column last) — then the retained set is unique and
  * engine-independent, which is what lets a SQL window oracle certify
  * the operator.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  require(keys.nonEmpty,
    "grouping keys must be non-empty (for a GLOBAL top-k use orderBy + " +
      "limit, which Spark already plans as TakeOrderedAndProject)")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] to [[TopKPerKeyExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` so it composes with
  * Catalyst's own strategies (everything below the node is planned by
  * `planLater`, i.e. by the full built-in planner). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** The per-partition heap state, shared verbatim by the interpreted
  * path ([[TopKPerKeyExec.doExecute]]) and the generated one (the
  * whole-stage-codegen consume side calls [[insert]], the produce
  * side drains [[rowIterator]]) — one implementation so the two
  * execution paths cannot diverge. Max-heap per key: dequeue()/head
  * give the row sorting LAST among the retained — the eviction
  * candidate. Only RETAINED rows are copied (the incoming row's
  * buffer is transient in both paths). */
final class TopKHeaps(
    keyProj: UnsafeProjection,
    ord: BaseOrdering,
    k: Int) {

  private val heapOrd: Ordering[InternalRow] =
    (a: InternalRow, b: InternalRow) => ord.compare(a, b)
  private val heaps =
    mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]

  def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    heaps.get(key) match {
      case Some(heap) =>
        if (heap.size < k) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      case None =>
        val heap = mutable.PriorityQueue.empty[InternalRow](heapOrd)
        heap += row.copy()
        heaps.put(key.copy(), heap)
    }
  }

  def numGroups: Long = heaps.size.toLong

  def iterator: Iterator[InternalRow] = heaps.valuesIterator.flatMap(_.iterator)

  /** Java view for generated code (all retained rows are the
    * UnsafeRow copies [[insert]] made). */
  def rowIterator: java.util.Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    iterator.asJava
  }
}

/** One streaming pass per partition over hash-clustered input: a
  * K-bounded max-heap per key (heap head = worst retained row; a new
  * row replaces it iff it sorts strictly earlier). `ClusteredDistribution`
  * makes `EnsureRequirements` insert the key exchange — the same
  * shuffle the window form pays — so the saving is exactly the sort.
  *
  * Participates in WHOLE-STAGE CODEGEN as a blocking operator (the
  * `SortExec` pattern): the consume side inlines into the upstream
  * pipeline (rows flow straight from the shuffle read into
  * [[TopKHeaps.insert]] with no iterator boundary), and the produce
  * side opens the downstream pipeline iterating the retained rows —
  * so the operator fuses with both neighbors instead of fencing them
  * into separate interpreted stages. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"))

  /** Per-partition heap state; called from both execution paths (the
    * generated code via the plan reference object). */
  def createHeaps(): TopKHeaps = new TopKHeaps(
    UnsafeProjection.create(keys, child.output),
    // codegen'd comparator (interpreted fallback) over the sort exprs
    RowOrdering.create(order, child.output),
    k)

  override protected def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val groups = longMetric("numGroups")
    child.execute().mapPartitions({ iter =>
      val heaps = createHeaps()
      iter.foreach(heaps.insert)
      groups += heaps.numGroups
      heaps.iterator.map { r => outRows += 1; r }
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen (SortExec's blocking-operator shape) ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // the operator consumes whole rows, never individual child columns
  // — defer all column evaluation to the row projection consume builds
  override def usedInputs: AttributeSet = AttributeSet(Seq.empty)

  /** Name of the generated heap field, created in [[doProduce]] and
    * referenced by [[doConsume]] (which codegen always calls after
    * produce has run on this operator). */
  private var heapsVariable: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needToProcess = ctx.addMutableState(
      CodeGenerator.JAVA_BOOLEAN, "needToInsertTopK", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("plan", this)
    heapsVariable = ctx.addMutableState(
      classOf[TopKHeaps].getName, "topKHeaps", forceInline = true)
    val outputIter = ctx.addMutableState(
      "java.util.Iterator<InternalRow>", "topKOutputIter", forceInline = true)
    val addToHeaps = ctx.addNewFunction("addToTopKHeaps",
      s"""
         |private void addToTopKHeaps() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topKOutputRow")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val numGroups = metricTerm(ctx, "numGroups")
    s"""
       |if ($needToProcess) {
       |  $heapsVariable = $thisPlan.createHeaps();
       |  $addToHeaps();
       |  $numGroups.add($heapsVariable.numGroups());
       |  $outputIter = $heapsVariable.rowIterator();
       |  $needToProcess = false;
       |}
       |while ($limitNotReachedCond $outputIter.hasNext()) {
       |  UnsafeRow $outputRow = (UnsafeRow) $outputIter.next();
       |  $numOutput.add(1);
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$heapsVariable.insert((UnsafeRow) ${row.value});
     """.stripMargin
}

/** User-facing surface + the census query certifying the operator. */
object TopKPerKey {

  /** Top `k` rows per `keys` group under `order` — `order` is a list of
    * (column, ascending) pairs and MUST end in a unique tiebreak for a
    * deterministic result set. */
  def topKPerKey(df: DataFrame, keys: Seq[String],
                 order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftDatasetBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(attr), sortOrders, k, analyzed))
  }

  import org.apache.spark.sql.SparkSession
  import graft.Tables

  /** Per-user top-3 events by value — the ~10⁴-key twin of the 5-key
    * `topk_per_group` Aggregator query, run through the custom
    * physical operator. Same window-SQL oracle form as that query. */
  def topkPerKeyExec(spark: SparkSession, dir: String): DataFrame =
    topKPerKey(
      Tables.load(spark, dir, "events")
        .select("user_id", "event_id", "value"),
      keys = Seq("user_id"),
      order = Seq("value" -> false, "event_id" -> true),
      k = 3)

  /** The SAME query written the way a SQL user writes it — the
    * row_number window idiom, verbatim. [[TopKWindowRewrite]] detects
    * the shape in the optimizer and swaps in [[TopKPerKeyNode]], so
    * the DECLARATIVE text executes on the heap operator (plan-pinned
    * in TopKPerKeySpec) while the oracle runs the identical SQL. */
  val topkWindowSql: String =
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY value DESC, event_id) AS rn
      |  FROM events) t
      |WHERE rn <= 3""".stripMargin

  def topkWindowAuto(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(topkWindowSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_per_key_exec" -> (topkPerKeyExec _),
    "topk_window_auto" -> (topkWindowAuto _))

  val oracles: Map[String, String] = Map(
    "topk_per_key_exec" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3""".stripMargin,
    "topk_window_auto" -> topkWindowSql)
}
