package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // builder-side iteration aid: comma-separated query-name filter;
    // the driver never sets it, so its runs dump every query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // refresh oracle_sql.json without recomputing the parquet dumps —
    // for oracle-SQL-only edits the engine results are unchanged, so
    // a full re-dump would be 30+ min of identical parquet
    val sqlOnly = sys.env.get("SPARK_GRAFT_SQL_ONLY").contains("1")
    // Guard the sqlOnly shortcut (r13 advice): the mode re-certifies
    // PRE-EXISTING parquet dumps against fresh oracle SQL, which is
    // only sound while the engine code that produced the dumps is
    // unchanged. A full dump stamps the dir with the git HEAD (plus a
    // dirty marker); sqlOnly refuses on a DIFFERENT head — stale
    // engine output must not be silently certified — unless
    // SPARK_GRAFT_SQL_ONLY_FORCE=1. Same-head-but-dirty only warns:
    // the intended flow (edit oracle SQL uncommitted, refresh) is
    // dirty on both sides, and the dirt being oracle-SQL-only is
    // exactly what the operator is asserting by setting the flag.
    def gitStamp: String = {
      import scala.sys.process._
      val cwd = new java.io.File(".")
      val head = try Process(Seq("git", "rev-parse", "HEAD"), cwd).!!.trim
      catch { case _: Throwable => "unknown" }
      val dirty = try Process(
        Seq("git", "status", "--porcelain", "--", "src/main"), cwd).!!.trim.nonEmpty
      catch { case _: Throwable => false }
      if (dirty) s"$head-dirty" else head
    }
    val stampPath = Paths.get(s"$outDir/engine_stamp.txt")
    if (sqlOnly) {
      val old = if (Files.exists(stampPath)) Files.readString(stampPath).trim else ""
      val cur = gitStamp
      if (old.takeWhile(_ != '-') != cur.takeWhile(_ != '-')) {
        System.err.println(
          s"[verify] SQL_ONLY stamp mismatch: dump dir is '$old', HEAD is '$cur' — " +
            "the parquet dumps may predate an engine change.")
        if (!sys.env.get("SPARK_GRAFT_SQL_ONLY_FORCE").contains("1"))
          sys.exit(2)
        System.err.println("[verify] proceeding under SPARK_GRAFT_SQL_ONLY_FORCE=1")
      } else if (old != cur)
        System.err.println(
          s"[verify] SQL_ONLY: stamp '$old' vs '$cur' — same head, dirty tree; " +
            "sound only if the uncommitted edits are oracle-SQL-only.")
    }
    val spark = Sessions.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    (if (sqlOnly) Map.empty[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] else SparkEntry.queries)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce folds the query's
      // final stage into ONE task, which at sf10 serialized a whole
      // pair-bound verify join onto a single core (measured: 23 min
      // on one thread); the explicit shuffle keeps the computation
      // parallel and only the write runs single-task
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // A FILTERED run merges its entries over any existing
    // oracle_sql.json instead of clobbering the full census with the
    // subset (the r14 sf3 re-dump footgun: "re-dump the 3 ENOSPC'd
    // queries" must not shrink the gate's 192-query oracle file to 3).
    // The merge keeps only the existing file's KEY SET (which queries
    // have dumps in this dir); SQL TEXT always comes from the current
    // code, and keys no longer in SparkEntry.oracleSql are dropped —
    // a renamed/removed query must not persist forever, and an
    // oracle-SQL edit to a non-filtered query must not be silently
    // re-certified from the old file (r14 advice). Jackson rides
    // Spark's own classpath, so the read-back needs no new dependency.
    val jsonPath = Paths.get(s"$outDir/oracle_sql.json")
    val fresh = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
    val merged =
      if (only.isDefined && Files.exists(jsonPath)) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(Files.readString(jsonPath))
        val existingKeys = scala.collection.mutable.LinkedHashSet.empty[String]
        node.fieldNames().forEachRemaining(k => existingKeys += k)
        (existingKeys.filter(SparkEntry.oracleSql.contains) ++ fresh.keys)
          .map(k => k -> SparkEntry.oracleSql(k)).toMap
      } else fresh
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(jsonPath, json)
    // stamp AFTER a successful full dump (a partial/crashed dump never
    // carries a stamp, so sqlOnly on top of one fails the guard);
    // filtered (SPARK_GRAFT_ONLY) dumps keep any existing stamp only
    // if the head matches — otherwise the dir is mixed-head and the
    // stamp must not vouch for it
    if (!sqlOnly && only.isEmpty) Files.writeString(stampPath, gitStamp)
    else if (!sqlOnly && Files.exists(stampPath)
             && Files.readString(stampPath).trim != gitStamp)
      Files.delete(stampPath)
    spark.stop()
  }
}
