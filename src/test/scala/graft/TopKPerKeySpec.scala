package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey

/** The custom physical operator (logical node + strategy + exec,
  * `plans/TopKPerKey.scala`): result parity with the window form,
  * plan shape (no sort, no window, one key exchange), and the
  * eviction logic on crafted ties. */
class TopKPerKeySpec extends AnyFunSuite with SharedSpark {

  test("topk_per_key_exec equals the row_number window form on events") {
    val df = TopKPerKey.topkPerKeyExec(spark, sfDir)
    val mine = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Tables.load(spark, sfDir, "events").createOrReplaceTempView("events")
    // rule off, or the reference window query would itself be
    // rewritten onto the operator under test
    spark.conf.set(plans.TopKWindowRewrite.EnabledKey, "false")
    val oracle = try spark.sql(TopKPerKey.oracles("topk_per_key_exec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    finally spark.conf.set(plans.TopKWindowRewrite.EnabledKey, "true")
    assert(mine.nonEmpty, "operator returned no rows")
    assert(mine == oracle,
      s"mismatch: only-mine=${(mine -- oracle).take(3)} only-oracle=${(oracle -- mine).take(3)}")
  }

  test("plan: TopKPerKeyExec after one key exchange, no sort, no window") {
    val p = TopKPerKey.topkPerKeyExec(spark, sfDir)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("TopKPerKey "), s"custom operator not planned:\n$p")
    assert(!p.contains("Window"), s"fell back to a window:\n$p")
    assert(!p.contains("Sort"), s"the whole point is no sort:\n$p")
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nEx == 1, s"expected exactly the key exchange, got $nEx:\n$p")
  }

  test("k-bounded eviction keeps exactly the first k under the total order") {
    import spark.implicits._
    // key "a": values 5,5,3,1 with ids breaking the 5-tie; k=2 keeps
    // both 5s (ids 2 then 7 — id ascends within equal values)
    val df = Seq(
      ("a", 7L, 5.0), ("a", 2L, 5.0), ("a", 9L, 3.0), ("a", 1L, 1.0),
      ("b", 4L, 2.0)
    ).toDF("k", "id", "v")
    val got = TopKPerKey.topKPerKey(df, Seq("k"),
        Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L), ("a", 7L), ("b", 4L)), s"got $got")
  }

  test("randomized parity with the window form (tie-heavy, several k)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // value domain of 8 forces heavy ties; ids unique -> total order
    val rows = (0 until 2000).map { id =>
      (rnd.nextInt(53).toString, id.toLong, (rnd.nextInt(8) * 0.5))
    }
    val df = rows.toDF("k", "id", "v").repartition(5)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    Seq(1, 3, 10).foreach { k =>
      val mine = TopKPerKey.topKPerKey(df, Seq("k"),
          Seq("v" -> false, "id" -> true), k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val ref = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(mine == ref, s"k=$k: only-mine=${(mine -- ref).take(3)} " +
        s"only-ref=${(ref -- mine).take(3)}")
    }
  }

  test("TopKWindowRewrite: the declarative window idiom runs on the heap operator") {
    val p = TopKPerKey.topkWindowAuto(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey "), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window") && !p.contains("Sort"),
      s"window machinery survived the rewrite:\n$p")
  }

  test("TopKWindowRewrite preserves semantics: equals the rule-off run") {
    val on = TopKPerKey.topkWindowAuto(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    spark.conf.set(plans.TopKWindowRewrite.EnabledKey, "false")
    try {
      val off = TopKPerKey.topkWindowAuto(spark, sfDir)
      val offPlan = off.queryExecution.executedPlan.toString
      assert(!offPlan.contains("TopKPerKey "), s"rule fired while disabled:\n$offPlan")
      assert(off.collect().map(_.toString).sorted.toSeq == on,
        "rule-off result differs")
    } finally spark.conf.set(plans.TopKWindowRewrite.EnabledKey, "true")
  }

  test("TopKWindowRewrite leaves rank() and kept-rn queries alone") {
    import spark.implicits._
    Tables.load(spark, sfDir, "events").createOrReplaceTempView("events")
    // rank() keeps ALL tied rows at the boundary — not heap semantics
    val rankPlan = spark.sql(
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |         rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS rn
        |  FROM events) t WHERE rn <= 3""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!rankPlan.contains("TopKPerKey "), s"fired on rank():\n$rankPlan")
    // rn survives the projection -> the window must actually run
    val keptPlan = spark.sql(
      """SELECT user_id, event_id, rn FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) t WHERE rn <= 3""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!keptPlan.contains("TopKPerKey "), s"fired with rn in output:\n$keptPlan")
  }

  test("TopKWindowRewrite handles every supported comparison spelling") {
    Tables.load(spark, sfDir, "events").createOrReplaceTempView("events")
    def planOf(pred: String): String = spark.sql(
      s"""SELECT user_id, event_id FROM (
         |  SELECT user_id, event_id,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY value DESC, event_id) AS rn
         |  FROM events) t WHERE $pred""".stripMargin)
      .queryExecution.executedPlan.toString
    Seq("rn <= 3", "rn < 4", "rn = 1", "4 > rn", "3 >= rn").foreach { pred =>
      assert(planOf(pred).contains("TopKPerKey "), s"did not fire on: $pred")
    }
    // a zero/negative limit must not reach the operator (Spark folds
    // the always-false filter away first; either way, no fire)
    Seq("rn <= 0", "rn < 1").foreach { pred =>
      assert(!planOf(pred).contains("TopKPerKey "), s"fired on: $pred")
    }
    // Int.MinValue strict compare: `v - 1` would wrap to Int.MaxValue
    // and turn the always-false filter into a keep-everything top-k —
    // the guarded decrement must leave the plan alone and the query
    // must return zero rows
    val minPred = s"rn < ${Int.MinValue}"
    assert(!planOf(minPred).contains("TopKPerKey "), s"fired on: $minPred")
    val nMin = spark.sql(
      s"""SELECT user_id, event_id FROM (
         |  SELECT user_id, event_id,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY value DESC, event_id) AS rn
         |  FROM events) t WHERE $minPred""".stripMargin).count()
    assert(nMin == 0, s"always-false filter returned $nMin rows")
  }

  test("TopKWindowRewrite binds an absorbed WindowGroupLimit's own limit") {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, CurrentRow, Expression, LessThanOrEqual, Literal, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window, WindowGroupLimit}
    import graft.plans.{TopKPerKeyNode, TopKWindowRewrite}
    import spark.implicits._
    // hand-built plan carrying a group limit TIGHTER than the filter's
    // K (stock Spark never builds one — InferWindowGroupLimit uses the
    // filter's K — but the rule must not assume that): absorb must
    // bind min(limit, k), not k
    val child = Seq(("a", 1L, 3.0), ("a", 2L, 2.0), ("a", 3L, 1.0))
      .toDF("k", "id", "v").queryExecution.analyzed
    val kAttr = child.output.find(_.name == "k").get
    val idAttr = child.output.find(_.name == "id").get
    val part = Seq(kAttr: Expression)
    val ord = Seq(SortOrder(idAttr, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val rnAlias = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(part, ord, frame)), "rn")()
    val plan = Project(child.output,
      Filter(LessThanOrEqual(rnAlias.toAttribute, Literal(3)),
        Window(Seq(rnAlias), part, ord,
          WindowGroupLimit(part, ord, RowNumber(), 2, child), None)))
    val rewritten = TopKWindowRewrite(plan)
    val ks = rewritten.collect { case n: TopKPerKeyNode => n.k }
    assert(ks == Seq(2), s"expected heap bound min(2,3)=2, got $ks in:\n$rewritten")
  }

  test("whole-stage codegen fuses the operator (no fence) and runs compiled") {
    // fallback=false turns a Janino failure into an exception instead
    // of a silent interpreted fallback — this test proves the
    // GENERATED path actually compiles and runs, not just plans
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val qe = TopKPerKey.topkPerKeyExec(spark, sfDir).queryExecution
      // materialize THIS query execution first (df.count() would build
      // its own): AQE assigns codegen stages when it finalizes, so the
      // pre-execution plan string carries no spans
      assert(qe.toRdd.count() > 0, "compiled run returned no rows")
      val p = qe.executedPlan.toString
      // `*(n) TopKPerKey` = inside a WholeStageCodegen span; a plain
      // `+- TopKPerKey` line would be the r7 codegen fence
      assert("\\*\\(\\d+\\) TopKPerKey ".r.findFirstIn(p).isDefined,
        s"operator not fused into a codegen span:\n$p")
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("codegen and interpreted paths return identical results") {
    def run(): Set[(Long, Long, Double)] =
      TopKPerKey.topkPerKeyExec(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val compiled = try run()
      finally spark.conf.set("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(compiled == interpreted,
      s"paths diverge: only-compiled=${(compiled -- interpreted).take(3)} " +
        s"only-interpreted=${(interpreted -- compiled).take(3)}")
  }

  test("operator composes with downstream transforms") {
    val df = TopKPerKey.topkPerKeyExec(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val bad = df.filter(col("n") > 3).count()
    assert(bad == 0, s"$bad users retained more than k rows")
  }
}
