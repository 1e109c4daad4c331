package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's declared queries (name → DataFrame builder
  * over a scale-factor directory) and their DuckDB oracle SQL. A query
  * appears in `oracleSql` only when its result is deterministically
  * hash-comparable across Spark and DuckDB (see module Scaladocs for the
  * determinism measures: DECIMAL sums, explicit rounding, md5-based
  * hashing shared by both engines).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (operators.WordCount.queries, operators.WordCount.oracles),
    (operators.Relational.queries, operators.Relational.oracles),
    (operators.Partitioning.queries, operators.Partitioning.oracles),
    (operators.Scalars.queries, operators.Scalars.oracles),
    (operators.SqlSurface.queries, operators.SqlSurface.oracles),
    (operators.TemporalJoins.queries, operators.TemporalJoins.oracles),
    (operators.Behavioral.queries, operators.Behavioral.oracles),
    (operators.Skew.queries, operators.Skew.oracles),
    (operators.Bucketed.queries, operators.Bucketed.oracles),
    (operators.MergeUpsert.queries, operators.MergeUpsert.oracles),
    (operators.PageRank.queries, operators.PageRank.oracles),
    (operators.ZOrder.queries, operators.ZOrder.oracles),
    (plans.TopKPerKey.queries, plans.TopKPerKey.oracles),
    (sources.OrcSource.queries, sources.OrcSource.oracles),
    (sources.AvroSource.queries, sources.AvroSource.oracles),
    (sources.CsvJsonSource.queries, sources.CsvJsonSource.oracles),
    (sources.PartitionedParquetSource.queries, sources.PartitionedParquetSource.oracles),
    (text.TextAnalysis.queries, text.TextAnalysis.oracles),
    (text.CorpusOps.queries, text.CorpusOps.oracles),
    (dedup.Dedup.queries, dedup.Dedup.oracles),
    (dedup.BandIndex.queries, dedup.BandIndex.oracles),
    (streaming.IngestDedup.queries, streaming.IngestDedup.oracles),
    (similarity.Similarity.queries, similarity.Similarity.oracles),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.WordCount.total(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
