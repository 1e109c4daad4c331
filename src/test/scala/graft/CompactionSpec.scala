package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-files compaction — the standing maintenance job every
  * partitioned 100 TB lake needs: streaming/incremental ingest leaves
  * thousands of tiny files per partition (each costing a task, a
  * footer read, and namenode/liststatus pressure), and compaction
  * rewrites them into few bounded-size files without changing a row.
  * The engine expresses it as read → repartition(target) with
  * maxRecordsPerFile as the size ceiling → write; this spec pins both
  * directions of the contract: the file count actually drops, and the
  * data round-trips exactly (count + content checksum). */
class CompactionSpec extends AnyFunSuite with SharedSpark {

  test("compaction rewrites a fragmented table into bounded files, row-identical") {
    val base = Files.createTempDirectory("graft_compact").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

    // simulate incremental ingest: 64 splits of a small table
    ev.repartition(64).write.mode("overwrite").parquet(s"$base/fragmented")
    def dataFiles(dir: String): Array[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val nFrag = dataFiles(s"$base/fragmented").length
    assert(nFrag >= 32, s"fixture not fragmented: $nFrag files")

    // the compaction job: bounded file count AND bounded file size
    spark.read.parquet(s"$base/fragmented")
      .repartition(2)
      .write.option("maxRecordsPerFile", 100000)
      .mode("overwrite").parquet(s"$base/compacted")
    val nComp = dataFiles(s"$base/compacted").length
    assert(nComp <= 4, s"compaction left $nComp files")

    // not one row gained, lost, or altered
    def fingerprint(dir: String): (Long, Long) = {
      import spark.implicits._
      spark.read.parquet(dir)
        .agg(count(lit(1)), sum(crc32(concat_ws("|",
          col("event_id"), col("user_id"), col("event_type"),
          col("value").cast("string")))))
        .as[(Long, Long)].head()
    }
    assert(fingerprint(s"$base/compacted") == fingerprint(s"$base/fragmented"))
  }
}
