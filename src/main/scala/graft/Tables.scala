package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table registry over the driver-generated parquet test tables
  * (`TESTDATA.md`): one parquet file per table under `$dir/`.
  *
  * This replaces the reference's only source — a directory of local TSV
  * text files scanned line-by-line
  * (`src/edu/upenn/cis455/mapreduce/worker/WorkerServlet.java:510-530`) —
  * with columnar parquet scans so Catalyst can push filters and prune
  * columns at the source. The legacy TSV format itself is supported via
  * [[graft.legacy.TsvDataset]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Engine contract: `events.ts` is epoch NANOS as LONG. The driver's
    * generator has emitted the column both as parquet TIMESTAMP(NANOS)
    * (which `spark.sql.legacy.parquet.nanosAsLong` already surfaces as
    * that long) and as timestamp[us] (a real TimestampType/NTZ column),
    * so normalize at the load boundary instead of per query. The DuckDB
    * oracles are precision-agnostic (`epoch_us(ts)` reads either file).
    * Session time zone is pinned UTC, so the NTZ→TZ cast is the
    * identity on the underlying instant.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
}
