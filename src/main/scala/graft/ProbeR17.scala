package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-17 scratch probe (not part of the driver contract): job/stage/
  * task census per query — measurement for OPTIMIZATION_r17.md. */
object ProbeR17 {
  class JobCounter extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); starts.put(j.jobId, j.time); ()
    }
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val s = starts.remove(j.jobId)
      if (s != 0L) { durations.add(j.time - s); () }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    def snap: (Long, Long, Long) = { Thread.sleep(300); (jobs.get, stages.get, tasks.get) }
    def drainDurations(): Seq[Long] = {
      val b = Seq.newBuilder[Long]
      var d: java.lang.Long = durations.poll()
      while (d != null) { b += d.longValue(); d = durations.poll() }
      b.result()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val jc = new JobCounter
    spark.sparkContext.addSparkListener(jc)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Tables.load(spark, sfDir, "region").groupBy("r_name").count().collect()
    } catch { case _: Throwable => () }

    sys.env.get("SPARK_GRAFT_PROBE_SHUFFLE_PARTS").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      println(s"PROBE shuffle.partitions=$p")
    }
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "neardup_clusters_slice", "neardup_clusters_indexed_slice", "ann_recall")
    for (n <- names; rep <- 1 to 3) {
      val fn = SparkEntry.queries(n)
      val before = jc.snap
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val after = jc.snap
      val durs = jc.drainDurations().sorted.reverse
      println(f"CENSUS $n%-32s rep=$rep sec=$secs%6.2f jobs=${after._1 - before._1}%4d stages=${after._2 - before._2}%4d tasks=${after._3 - before._3}%6d jobSum=${durs.sum}%6d ms top=${durs.take(12).mkString(",")}")
    }
    spark.stop()
  }
}
