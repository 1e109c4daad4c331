package graft.legacy

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter for the reference's on-disk format: line-oriented
  * `key \t value` text files in a directory (FIXTURES.md §A).
  *
  * Reference behavior reproduced:
  *  - every regular file in the directory is read EXCEPT names
  *    containing `~` (editor-backup skip,
  *    `worker/WorkerServlet.java:512-529`) — enforced with an
  *    `input_file_name()` filter, Catalyst-evaluable and glob-free;
  *  - a line is split on tabs and only fields 0 and 1 survive —
  *    `line.split("\t")[0]` / `[1]` at `worker/MapThread.java:50-51`
  *    silently drops any third-and-later fields;
  *  - the reference THROWS on a tabless line
  *    (ArrayIndexOutOfBoundsException, undefined behavior) — we drop
  *    such lines instead, the one deliberate divergence (documented in
  *    SURVEY.md §1);
  *  - writes are `key \t value \r\n` (`job/WordCountContext.java:162`)
  *    while reads accept both LF and CRLF (the checked-in `one.txt`
  *    sample is LF-terminated).
  */
object TsvDataset {

  /** Read a directory (or file, or glob) of legacy KV lines. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), "\t", -1)
    spark.read.text(path)
      // the reference skips editor-backup files — file NAMES containing
      // ~ (a ~ in a parent directory must not drop everything, so test
      // only the last path segment)
      .filter(!element_at(split(input_file_name(), "/"), -1).contains("~"))
      // tolerate CRLF: the text reader splits on \n, leaving a trailing \r
      .select(regexp_replace(col("value"), "\r$", "").as("value"))
      .filter(col("value").contains("\t"))
      .select(parts.getItem(0).as("key"), parts.getItem(1).as("value"))
  }

  /** Write in the reference's byte format (`key\tvalue\r\n`). */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat_ws("\t", col("key"), col("value")).as("value"))
      .write.mode("overwrite").option("lineSep", "\r\n").text(path)
}
