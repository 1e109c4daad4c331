package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{IndexStore, Tables}
import graft.operators.ConnectedComponents

/** The PERSISTED form of the near-dup machinery's standing state —
  * minhash band index and CC labels written once to fingerprint-keyed
  * parquet ([[graft.IndexStore]]) and read back by every later
  * session, closing the gap between the module docstrings' 100 TB
  * posture ("corpus bands are a standing index read from storage, not
  * recomputed") and what the code did through round 8 (per-session
  * memos, rebuilt from the corpus every session).
  *
  * Three queries ride the store:
  *
  *  - `minhash_incremental_indexed` — the daily-ingest shape done the
  *    way production runs it on day 2: the incoming batch (odd
  *    doc_ids) runs the 32-hash signature kernel over ITSELF only and
  *    joins the STORED corpus band index; no corpus-side signature
  *    pass exists anywhere in the plan (the spec pins one
  *    MapPartitions kernel vs the unindexed query's two — BandIndexSpec). Results are
  *    identical to `minhash_incremental` by construction — same
  *    oracle SQL.
  *  - `index_refresh` — the write path: merge a change batch's bands
  *    into the standing index with upsert semantics (re-ingested
  *    doc_ids' old bands dropped via anti-join, batch bands
  *    appended — the `merge_upsert_orders` pattern), publish the
  *    refreshed artifact, and report per-band index stats read back
  *    FROM THE WRITTEN COPY — any loss in the write/read cycle
  *    mismatches the oracle, which recomputes bands over all docs
  *    from scratch.
  *  - `neardup_clusters_indexed` — cluster labels from the stored CC
  *    label artifact instead of re-running label propagation; the
  *    oracle is `neardup_clusters`'s recursive-CTE fixpoint, so the
  *    stored labels are re-certified against a from-scratch
  *    resolution on every gate run.
  *
  * Reference analog: the worker's spool directories are the only
  * cross-job persistent state in the reference
  * (`worker/WorkerServlet.java:283-302`); this module is that idea as
  * content-addressed columnar artifacts.
  */
object BandIndex {

  /** Batch/corpus split shared with [[Dedup.minhashIncremental]]:
    * odd doc_ids are the incoming batch, even the standing corpus. */
  private def corpusFilter = col("doc_id") % 2 === 0
  private def batchFilter = col("doc_id") % 2 === 1

  /** The standing corpus band index — (doc_id, band, sig) for the
    * corpus half — built once per corpus content-fingerprint and read
    * from parquet ever after (across sessions and JVMs). */
  def standingBands(spark: SparkSession, dir: String): DataFrame =
    IndexStore.getOrBuild(spark, dir, "documents", "minhash_bands") {
      Dedup.bandsOf(Dedup.minhashSignaturesOf(spark,
        Dedup.cachedDocShingles(spark, dir).filter(corpusFilter)))
    }

  /** Stored CC labels of the minhash near-dup pair graph — (id, label)
    * with label = min member id, the artifact `neardup_clusters` and
    * training-set selection resolve per session today. */
  def storedComponents(spark: SparkSession, dir: String): DataFrame =
    IndexStore.getOrBuild(spark, dir, "documents", "neardup_cc_labels") {
      ConnectedComponents.resolve(
        Dedup.cachedMinhashPairs(spark, dir).select("d1", "d2"), "d1", "d2")
    }

  /** Bands of the incoming batch — the ONLY signature-kernel pass in
    * the indexed queries' plans. */
  private def batchBands(spark: SparkSession, dir: String): DataFrame =
    Dedup.bandsOf(Dedup.minhashSignaturesOf(spark,
      Dedup.cachedDocShingles(spark, dir).filter(batchFilter)))

  /** [[Dedup.minhashIncremental]] against the STORED index: batch
    * bands join the standing artifact's buckets, candidates verify
    * with the shared merge-pinned exact-Jaccard stage, and a batch doc
    * is accepted iff nothing verifies at ≥ 0.5. The corpus side
    * contributes a parquet FileScan — no 32-hash pass, which is the
    * entire point of persisting the index. */
  def minhashIncrementalIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.cachedDocShingles(spark, dir)
    val batch = batchBands(spark, dir)
      .select(col("doc_id").as("dn"), col("band"), col("sig"))
    val corpus = standingBands(spark, dir)
      .select(col("doc_id").as("dc"), col("band"), col("sig"))
    val cand = batch.join(corpus, Seq("band", "sig"))
      .select("dn", "dc").distinct()
    val jac = col("c").cast("double") /
      (col("n1") + col("n2") - col("c")).cast("double")
    val matched = Dedup.verifiedIntersections(docs, cand, "dn", "dc")
      .filter(jac >= 0.5)
      .select(col("dn").as("doc_id")).distinct()
    Tables.load(spark, dir, "documents")
      .filter(batchFilter)
      .select("doc_id")
      .join(matched, Seq("doc_id"), "left_anti")
  }

  /** The refresh's upsert rule, isolated for the unit spec: any stored
    * bands for doc_ids present in the batch are dropped (a re-ingested
    * doc's OLD signature must not survive beside its new one), then
    * the batch's bands append. */
  private[graft] def mergeBands(stored: DataFrame, batch: DataFrame): DataFrame =
    stored
      .join(batch.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .unionByName(batch)

  /** Merge the change batch's bands into the standing index (upsert:
    * anti-join drops any stored bands for re-ingested doc_ids, then
    * the batch's bands append), publish the refreshed artifact as a
    * versioned parquet directory, and report per-band stats READ BACK
    * from the written copy. The oracle recomputes every band over all
    * documents from scratch, so the merge semantics AND the
    * write/read cycle are both under the hash. */
  def indexRefresh(spark: SparkSession, dir: String): DataFrame = {
    val stored = standingBands(spark, dir)
    val batch = batchBands(spark, dir)
    val refreshed = mergeBands(stored, batch)
    IndexStore.writeVersioned(spark, dir, "documents",
        "minhash_bands_refreshed", refreshed)
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_entries"),
        countDistinct("sig").as("n_buckets"),
        countDistinct("doc_id").as("n_docs"))
  }

  /** [[Dedup.neardupClusters]] over the stored label artifact — the
    * session that ANSWERS cluster queries is rarely the session that
    * RESOLVED them; this is the read path. */
  def neardupClustersIndexed(spark: SparkSession, dir: String): DataFrame = {
    val comp = storedComponents(spark, dir)
    val sizes = comp.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .join(broadcast(sizes), "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "minhash_incremental_indexed" -> (minhashIncrementalIndexed _),
    "index_refresh" -> (indexRefresh _),
    "neardup_clusters_indexed" -> (neardupClustersIndexed _))

  val oracles: Map[String, String] = Map(
    // identical to minhash_incremental by construction: the stored
    // index is byte-equal to recomputed corpus bands
    "minhash_incremental_indexed" -> Dedup.oracles("minhash_incremental"),
    "index_refresh" ->
      s"""WITH ${Dedup.sigBandsCtes}
         |SELECT band, count(*) AS n_entries,
         |       count(DISTINCT bsig) AS n_buckets,
         |       count(DISTINCT doc_id) AS n_docs
         |FROM bands GROUP BY band""".stripMargin,
    "neardup_clusters_indexed" -> Dedup.oracles("neardup_clusters"))
}
