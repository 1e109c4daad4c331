package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.scalatest.funsuite.AnyFunSuite

/** Vectorized-reader audit (VERDICT r7 #7): every parquet scan in
  * every declared query must use the columnar (vectorized) parquet
  * reader. A silent fallback to the row-based reader — classically
  * triggered by nested/array columns when
  * `spark.sql.parquet.enableNestedColumnVectorizedReader` is off —
  * multiplies scan CPU several-fold at 100 TB without changing any
  * result, so it would never be caught by the correctness gate. The
  * known risk here is the `embeddings.vec array<float>` column.
  *
  * Non-parquet sources (the CSV/JSON/Avro/text/binaryFile round-trip
  * queries) are out of scope: those formats have no vectorized reader
  * in Spark, and each such query exists precisely to certify that
  * format — their scans are ignored rather than waived.
  *
  * Waivers: none. If a future query legitimately cannot vectorize its
  * scan, add it to `waived` WITH the reason, and mirror the entry in
  * SCALING.md.
  */
class VectorizedScanSpec extends AnyFunSuite with SharedSpark {

  private val waived: Map[String, String] = Map.empty

  /** All file scans in the plan, including those hiding inside
    * subquery expressions (scalar subqueries, DPP filters). The audit
    * runs with AQE off: the reader choice is made at scan planning and
    * is AQE-independent, while the adaptive wrapper both hides
    * subtrees from `collect` and (pre-execution) still carries
    * LOGICAL subquery plans that `subqueries` cannot cast. */
  private def parquetScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val nodes = p.collect { case n => n }
    val here = nodes.collect {
      case s: FileSourceScanExec
        if s.relation.fileFormat.isInstanceOf[ParquetFileFormat] => s
    }
    here ++ nodes.flatMap(_.subqueries).flatMap(parquetScans)
  }

  private def noAqe[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("every declared query's parquet scans are vectorized") { noAqe {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if waived.contains(name) => Nil
      case (name, fn) =>
        parquetScans(fn(spark, sfDir).queryExecution.executedPlan)
          .filterNot(_.supportsColumnar)
          .map(s => s"$name: row-based parquet scan of " +
            s"schema=${s.requiredSchema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"non-vectorized parquet scans (fix or waive in SCALING.md):\n${offenders.mkString("\n")}")
  } }

  test("the embeddings array<float> scan itself vectorizes") { noAqe {
    // the audit above would catch a regression wherever it appears;
    // this pins the root cause directly so a failure names the knob
    // (spark.sql.parquet.enableNestedColumnVectorizedReader)
    val scans = parquetScans(
      Tables.load(spark, sfDir, "embeddings").queryExecution.executedPlan)
    assert(scans.nonEmpty && scans.forall(_.supportsColumnar),
      "embeddings scan fell back to the row-based reader — nested-column " +
        "vectorization is off or the schema stopped qualifying")
  } }
}
