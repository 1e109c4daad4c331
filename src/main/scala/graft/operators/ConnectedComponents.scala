package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list, in pure DataFrame
  * algebra (no graph library): iterative min-label propagation.
  *
  * Every node starts labeled with its own id; each round replaces a
  * node's label with the min of its own and its neighbors' labels; at
  * the fixpoint every node carries the MIN id of its component — which
  * doubles as the deterministic survivor election for dedup (min-doc_id
  * per near-dup cluster), so no separate election pass is needed.
  *
  * Scale design:
  *  - each round is one join (edges ⋈ labels on src) + one min-aggregate
  *    — both shuffle on the same key domain, nothing quadratic;
  *  - labels decrease monotonically, so convergence is detected by an
  *    exact DECIMAL(38,0) label-sum (order-independent, overflow-free)
  *    going flat — one tiny aggregate per round, no driver-side diff;
  *  - rounds needed = component DIAMETER. Near-dup clusters are
  *    near-cliques (diameter ~1-2), so this converges in 2-3 rounds; a
  *    general 100 TB graph with long chains would swap the body for the
  *    alternating large-star/small-star algorithm (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC'14) which
  *    converges in O(log n) rounds on the same join/agg primitives;
  *  - each round ends in an EAGER `localCheckpoint`, which both
  *    materializes the labels and TRUNCATES the logical plan. The
  *    truncation is load-bearing, not hygiene: `next` references
  *    `labels` twice (union branch + propagation join), so without it
  *    the plan DOUBLES per round — at diameter ~8 the explain string
  *    AQE renders per plan update is already hundreds of MB and OOMs
  *    the driver (caught by the random-graph spec). With the
  *    checkpoint every round starts from a constant-size LogicalRDD.
  *    On a real cluster, pass `checkpointDir` to swap
  *    `localCheckpoint` (lost on executor failure) for reliable
  *    `checkpoint` against shared storage — same truncation,
  *    failure-tolerant. The swap is a parameter, not an edit.
  *
  * Fails loudly (IllegalStateException) if `maxIters` rounds pass
  * without convergence — a silently-unconverged labeling would be
  * WRONG, not just slow.
  */
object ConnectedComponents {

  /** @param edges     two-column frame of undirected edges
    * @param srcCol    left endpoint column name
    * @param dstCol    right endpoint column name
    * @param maxIters  loud-failure bound on propagation rounds
    * @param checkpointDir when set, per-round truncation uses RELIABLE
    *                  `checkpoint` into this (shared-storage) path —
    *                  the cluster-grade mode that survives executor
    *                  loss; when None, `localCheckpoint` (executor
    *                  blocks — right for local[k] and fastest).
    *                  Hygiene (round-4 advice): the session's global
    *                  checkpoint dir is restored on exit (even to
    *                  None), so the override never leaks to other
    *                  users of a shared session; and each round's
    *                  checkpoint files are deleted as soon as the next
    *                  round is materialized, so a long run holds at
    *                  most two round snapshots in shared storage, not
    *                  one per round. Only the RETURNED frame's files
    *                  survive — callers own that cleanup (or rely on
    *                  `spark.cleaner.referenceTracking
    *                  .cleanCheckpoints`).
    * @return columns (id, label): one row per distinct node in
    *         `edges`, label = min node id of its component. The
    *         returned frame is checkpointed (materialized); callers
    *         own the unpersist.
    */
  def resolve(edges: DataFrame, srcCol: String, dstCol: String,
              maxIters: Int = 50,
              checkpointDir: Option[String] = None): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // scoped override of the GLOBAL checkpoint dir — remember the
    // session's own setting so it can be put back (even when it was
    // unset) once resolution finishes
    val priorDir = org.apache.spark.graft.CheckpointDirAccessor.get(sc)
    checkpointDir.foreach(sc.setCheckpointDir)
    // eager checkpoint, not persist: truncates the logical plan each
    // round (see object Scaladoc — the plan doubles per round
    // otherwise) AND materializes the frame in one move
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)

    // reliable-mode rounds leave one ReliableCheckpointRDD directory
    // each; delete a superseded round's files as soon as its successor
    // is materialized (the fs handle comes from the frame's own conf)
    def dropCheckpointFiles(df: DataFrame): Unit =
      if (checkpointDir.isDefined) df.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.getCheckpointFile.foreach { f =>
            val p = new org.apache.hadoop.fs.Path(f)
            val fs = p.getFileSystem(sc.hadoopConfiguration)
            fs.delete(p, true)
          }
        case _ => ()
      }

    try {
      val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      // symmetrize once; both propagation sides read this frame each round
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)

      var labels = truncate(sym.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
      var prevSum: Option[java.math.BigDecimal] = None
      var iter = 0
      while (iter < maxIters) {
        val prop = sym.join(labels, sym("src") === labels("id"))
          .select(sym("dst").as("id"), labels("label"))
        val next = truncate(labels.select("id", "label").union(prop)
          .groupBy("id").agg(min("label").as("label")))
        // null sum <=> empty node set: trivially converged
        val s = Option(next.agg(sum(col("label").cast(DecimalType(38, 0))))
          .head().getDecimal(0))
        val converged = s.isEmpty ||
          prevSum.exists(_.compareTo(s.get) == 0)
        if (converged) {
          next.unpersist() // fixpoint: next == labels elementwise
          dropCheckpointFiles(next)
          sym.unpersist()
          return labels
        }
        labels.unpersist()
        dropCheckpointFiles(labels) // next is materialized; round N files done
        labels = next
        prevSum = s
        iter += 1
      }
      sym.unpersist()
      labels.unpersist()
      dropCheckpointFiles(labels)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds")
    } finally
      org.apache.spark.graft.CheckpointDirAccessor.restore(sc, priorDir)
  }
}
