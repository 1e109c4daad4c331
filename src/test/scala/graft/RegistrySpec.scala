package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wiring guard for the driver contract: every declared query must
  * execute on the smoke scale factor, every oracle key must name a
  * query, and no output may carry duplicate or empty column names
  * (the driver's compare sorts columns by name — duplicates would
  * silently corrupt the hash). */
class RegistrySpec extends AnyFunSuite with SharedSpark {

  test("every oracleSql key names a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all declared queries execute at sf0.001 with sane schemas") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val cols = df.columns.toSeq
        val problems = Seq(
          if (cols.isEmpty) Some("no columns") else None,
          if (cols.distinct.length != cols.length) Some(s"duplicate columns: $cols") else None,
          if (cols.exists(_.trim.isEmpty)) Some("empty column name") else None
        ).flatten
        df.count() // force full execution
        problems.map(p => s"$name: $p")
      } catch {
        case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
