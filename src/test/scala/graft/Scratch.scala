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

    // "hier-solo": the two-level quantizer's PRODUCTION-regime row
    // (n past HierCellThreshold·TargetCellSize, where the flat arm
    // would cost n·C for no information the vec_sf100 A/B and the
    // S=1 equivalence spec don't already give): fresh hier train +
    // full-corpus assignment + probe recall@K vs exact.
    if (args.sameElements(Array("hier-solo"))) {
      import spark.implicits._
      val sim = similarity.Similarity
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val c = sim.cellsFor(n)
      println(s"[scratch] n=$n cells=$c super=${sim.superCountFor(c)} " +
        s"(production path at this SF: ${if (sim.useHier(c)) "HIER" else "flat"})")
      var sup: Array[Array[Double]] = null
      var groups: Array[Array[Array[Double]]] = null
      var hierAssign: org.apache.spark.sql.DataFrame = null
      time("hier train (sample)") {
        val t = sim.trainIvfCentroidsHier(spark, dir)
        sup = t._1; groups = t._2; groups.map(_.length.toLong).sum
      }
      time("hier assign n·(√C+C/√C)") {
        hierAssign = sim.ivfAssignHierOf(spark, dir, sup, groups)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        hierAssign.count()
      }
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      val cents = groups.flatten
      val probes = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < sim.NumProbes)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect()
      val probeCells = probes.map { case (p, v) =>
        val nv = math.sqrt(dot(v, v))
        p -> cents.zipWithIndex.map { case (cv, j) =>
          (dot(v, cv) / (nv * math.sqrt(dot(cv, cv))), j)
        }.sortBy(t => (-t._1, t._2)).take(sim.IvfProbeCells).map(_._2.toLong).toSet
      }.toMap
      val wanted = probeCells.values.flatten.toSet.toSeq
      val members = hierAssign.filter(col("cid").isin(wanted: _*))
        .select(col("vec_id").cast("long"), col("cid"))
        .as[(Long, Long)].collect()
      val vecsById = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id").isin(members.map(_._1).toSeq: _*))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().toMap
      val exact = sim.similarTopk(spark, dir)
        .select("probe_id", "neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1).map { case (p, xs) =>
          p -> xs.map(_._2).toSet
        }
      var hit = 0; var tot = 0
      probes.foreach { case (p, pv) =>
        val npv = math.sqrt(dot(pv, pv))
        val cand = members.filter(m =>
            m._1 != p && probeCells(p).contains(m._2))
          .map(_._1).distinct
        val top = cand.map { id =>
          val v = vecsById(id)
          (dot(pv, v) / (npv * math.sqrt(dot(v, v))), id)
        }.sortBy(t => (-t._1, t._2)).take(sim.K).map(_._2).toSet
        val ex = exact.getOrElse(p, Set.empty)
        hit += ex.count(top.contains); tot += ex.size
      }
      println(f"[scratch] hier probe recall@${sim.K}: ${hit.toDouble / math.max(1, tot)}%.4f")
      spark.stop()
      return
    }

    // "hier-ab": flat vs two-level coarse quantizer at the current SF —
    // fresh train + full-corpus assignment timed per arm (hier first so
    // the flat arm inherits any page-cache warmth, biasing AGAINST the
    // claim), then assignment agreement and probe recall@K for both
    // (the round-12 verdict #3 A/B row). Recall uses the production
    // probe-cell election (IvfProbeCells best cells per probe) over
    // each arm's own centroids/assignments, vs the exact top-K.
    if (args.sameElements(Array("hier-ab"))) {
      import spark.implicits._
      val sim = similarity.Similarity
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val c = sim.cellsFor(n)
      println(s"[scratch] n=$n cells=$c super=${sim.superCountFor(c)} " +
        s"(production path at this SF: ${if (sim.useHier(c)) "HIER" else "flat"})")
      var sup: Array[Array[Double]] = null
      var groups: Array[Array[Array[Double]]] = null
      var hierAssign: org.apache.spark.sql.DataFrame = null
      time("hier train (sample)") {
        val t = sim.trainIvfCentroidsHier(spark, dir)
        sup = t._1; groups = t._2; groups.map(_.length.toLong).sum
      }
      time("hier assign n·(√C+C/√C)") {
        hierAssign = sim.ivfAssignHierOf(spark, dir, sup, groups)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        hierAssign.count()
      }
      var flatCents: Array[Array[Double]] = null
      var flatAssign: org.apache.spark.sql.DataFrame = null
      time("flat train (sample)") {
        flatCents = sim.trainIvfCentroidsWithTrace(spark, dir)._1
        flatCents.length.toLong
      }
      time("flat assign n·C") {
        flatAssign = sim.assignToCentroids(spark,
            spark.read.parquet(s"$dir/embeddings.parquet")
              .select(col("vec_id").as("id"),
                col("embedding").cast("array<double>").as("v")),
            flatCents)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        flatAssign.count()
      }
      // probe recall@K per arm: elect IvfProbeCells cells per probe
      // against the arm's centroids, search only those cells' members
      def recall(cents: Array[Array[Double]],
                 assign: org.apache.spark.sql.DataFrame,
                 idCol: String): Double = {
        def dot(a: Array[Double], b: Array[Double]) =
          a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
        val probes = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") < sim.NumProbes)
          .select(col("vec_id"), col("embedding").cast("array<double>"))
          .as[(Long, Array[Double])].collect()
        val probeCells = probes.map { case (p, v) =>
          val nv = math.sqrt(dot(v, v))
          p -> cents.zipWithIndex.map { case (cv, j) =>
            (dot(v, cv) / (nv * math.sqrt(dot(cv, cv))), j)
          }.sortBy(t => (-t._1, t._2)).take(sim.IvfProbeCells).map(_._2.toLong).toSet
        }.toMap
        val wanted = probeCells.values.flatten.toSet.toSeq
        val members = assign.filter(col("cid").isin(wanted: _*))
          .select(col(idCol).cast("long"), col("cid"))
          .as[(Long, Long)].collect()
        val vecsById = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id").isin(members.map(_._1).toSeq: _*))
          .select(col("vec_id"), col("embedding").cast("array<double>"))
          .as[(Long, Array[Double])].collect().toMap
        val exact = sim.similarTopk(spark, dir)
          .select("probe_id", "neighbor_id")
          .as[(Long, Long)].collect().groupBy(_._1).map { case (p, xs) =>
            p -> xs.map(_._2).toSet
          }
        var hit = 0; var tot = 0
        probes.foreach { case (p, pv) =>
          val npv = math.sqrt(dot(pv, pv))
          val cand = members.filter(m =>
              m._1 != p && probeCells(p).contains(m._2))
            .map(_._1).distinct
          val top = cand.map { id =>
            val v = vecsById(id)
            (dot(pv, v) / (npv * math.sqrt(dot(v, v))), id)
          }.sortBy(t => (-t._1, t._2)).take(sim.K).map(_._2).toSet
          val ex = exact.getOrElse(p, Set.empty)
          hit += ex.count(top.contains); tot += ex.size
        }
        hit.toDouble / math.max(1, tot)
      }
      val hierR = recall(groups.flatten, hierAssign, "vec_id")
      val flatR = recall(flatCents, flatAssign, "id")
      val agree = hierAssign.select(col("vec_id"), col("cid").as("hc"))
        .join(flatAssign.select(col("id").as("vec_id"), col("cid").as("fc")),
          Seq("vec_id"))
        .select(avg((col("hc") === col("fc")).cast("double")))
        .as[Double].head()
      println(f"[scratch] recall@${sim.K}: flat=$flatR%.4f hier=$hierR%.4f  " +
        f"assignment agreement=$agree%.4f")
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
