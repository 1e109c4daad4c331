package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    // the canonical config — extensions included, so queries that need
    // an injected strategy/rule (topk_per_key_exec, range_join_auto)
    // profile the same plans the driver sees
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // "topk-compare": the custom physical operator vs the window
    // spelling of the same top-3-per-user query (the sort the
    // operator exists to delete). Three honest arms: the TRUE
    // sort+window plan (rewrite disabled — otherwise TopKWindowRewrite
    // silently moves it onto the heap operator and both arms measure
    // the same thing), the heap operator with whole-stage codegen off
    // (the round-7 codegen-fenced form), and the fused codegen form.
    if (args.sameElements(Array("topk-compare"))) {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(spark, dir, "events")
        .select("user_id", "event_id", "value")
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      def withConf(key: String, v: String)(body: => Unit): Unit = {
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, v)
        try body
        finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      }
      (1 to 3).foreach { r =>
        withConf(plans.TopKWindowRewrite.EnabledKey, "false") {
          time(s"window-rank#$r")(
            ev.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
              .drop("rn").queryExecution.toRdd.count())
        }
        withConf("spark.sql.codegen.wholeStage", "false") {
          time(s"topk-exec-fence#$r")(
            plans.TopKPerKey.topkPerKeyExec(spark, dir)
              .queryExecution.toRdd.count())
        }
        time(s"topk-exec-fused#$r")(
          plans.TopKPerKey.topkPerKeyExec(spark, dir)
            .queryExecution.toRdd.count())
      }
      spark.stop()
      return
    }

    // "train-ab": time IVF centroid training at the production sampled
    // stride vs the pre-sampling every=1 full-corpus form — the direct
    // measurement behind the round-12 sampled-training claim. Fresh
    // training both arms (no artifact read); the sampled arm runs
    // FIRST so the unsampled arm, not it, inherits any page-cache
    // warmth.
    if (args.sameElements(Array("train-ab"))) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val every = similarity.Similarity.trainEvery(n)
      time(s"ivf-train sampled (every=$every)") {
        similarity.Similarity.trainIvfCentroidsWithTrace(spark, dir,
          Some(every))._1.length.toLong
      }
      time("ivf-train full (every=1)") {
        similarity.Similarity.trainIvfCentroidsWithTrace(spark, dir,
          Some(1L))._1.length.toLong
      }
      spark.stop()
      return
    }

    // "explain:<name>": print the formatted physical plan of a declared
    // query (no execution) — the broadcast/exchange audit tool
    if (args.length == 1 && args(0).startsWith("explain:")) {
      val n = args(0).stripPrefix("explain:")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
      spark.stop()
      return
    }

    // with args: time the named declared queries (3 reps each) and exit;
    // per-rep shuffle records beside the time make session-memo hits
    // visible (rep#1 pays the materialization, reps 2-3 read the memo)
    if (args.nonEmpty) {
      val counters = new RecordCounterListener
      spark.sparkContext.addSparkListener(counters)
      args.foreach { n =>
        (1 to 3).foreach { r =>
          val before = counters.settled
          time(s"$n#$r")(
            SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count())
          val after = counters.settled
          println(s"[scratch]   in=${after._1 - before._1} shuffle=${after._2 - before._2}")
        }
      }
      spark.stop()
      return
    }

    val docs = dedup.Dedup.docShingles(spark, dir)
    time("shingles")(docs.count())
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode")(ex.count())
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    time("self-join+group")(inter.count())
    time("full ngram_jaccard")(dedup.Dedup.ngramJaccard(spark, dir).count())
    time("minhash sigs")(dedup.Dedup.minhashSignatures(spark, dir).count())
    time("full minhash")(dedup.Dedup.minhashNeardup(spark, dir).count())
    time("simhash")(dedup.Dedup.simhash(spark, dir).count())
    time("embedding_neardup")(dedup.Dedup.embeddingNeardup(spark, dir).count())
    spark.stop()
  }
}
