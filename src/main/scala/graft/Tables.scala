package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
