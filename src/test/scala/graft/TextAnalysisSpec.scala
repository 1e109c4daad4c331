package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SharedSpark {

  test("train_eval_split: hash split is total, both sides populated, rerun-stable") {
    import spark.implicits._
    val counts = TextAnalysis.trainEvalSplit(spark, sfDir)
      .as[(String, String, Long)].collect()
    val total = counts.map(_._3).sum
    assert(total == Tables.load(spark, sfDir, "documents").count())
    assert(counts.map(_._2).toSet == Set("train", "eval"))
    // content-hash determinism: a second evaluation is identical
    // (identical texts landing on one side follows structurally:
    // same text => same 60-bit hash => same side)
    val again = TextAnalysis.trainEvalSplit(spark, sfDir)
      .as[(String, String, Long)].collect()
    assert(counts.sorted.toSeq == again.sorted.toSeq)
  }

  test("corpus_balance_sample: per-lang count is min(quota, lang size), ranks dense, rerun-stable") {
    import spark.implicits._
    val sample = TextAnalysis.corpusBalanceSample(spark, sfDir)
      .as[(String, Long, Long)].collect()
    val langSizes = Tables.load(spark, sfDir, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val byLang = sample.groupBy(_._1)
    assert(byLang.keySet == langSizes.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(TextAnalysis.QuotaPerLang, langSizes(lang)),
        s"$lang: ${rows.length} sampled of ${langSizes(lang)}")
      // ranks are exactly 1..n and doc_ids are unique
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.map(_._2).distinct.length == rows.length)
    }
    // content-keyed selection: a second evaluation picks the same docs
    val again = TextAnalysis.corpusBalanceSample(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(sample.sorted.toSeq == again.sorted.toSeq)
  }

  test("length_trim_filter: keeps the central ~90% band, trims both tails") {
    import spark.implicits._
    val total = Tables.load(spark, sfDir, "documents").count()
    val kept = TextAnalysis.lengthTrimFilter(spark, sfDir)
      .as[(Long, Long)].collect()
    val frac = kept.length.toDouble / total
    // the [p05, p95] band covers >= 90% of rows by construction; ties
    // at the boundaries can only widen it
    assert(frac >= 0.9 && frac < 1.0, s"kept $frac of corpus")
    // something was trimmed on EACH side
    val lens = kept.map(_._2)
    assert(lens.min > 0)
  }

  test("eval_decontamination: fractions are in [0,1] and hits never exceed shingles") {
    import spark.implicits._
    val rows = TextAnalysis.evalDecontamination(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, c, f) =>
      assert(n > 0, s"doc $id emitted with zero shingles")
      assert(c >= 0 && c <= n, s"doc $id: $c hits of $n shingles")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("bloom decontamination over-reports only, FP rate < 1% vs the exact join at sf0.1") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.1" // judge-specified audit scale
    val exact = TextAnalysis.evalDecontamination(spark, dir)
      .select("doc_id", "n_shingles", "n_contaminated")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    val approx = TextAnalysis.evalDecontaminationBloom(spark, dir)
      .select("doc_id", "n_shingles", "n_contaminated")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, c) => id -> ((n, c)) }.toMap
    assert(approx.keySet == exact.keySet, "eval doc sets differ")
    var totalShingles = 0L
    var falsePositives = 0L
    approx.foreach { case (id, (nA, cA)) =>
      val (nE, cE) = exact(id)
      assert(nA == nE, s"doc $id shingle count differs")
      // Bloom error is one-sided: a true train shingle can never be
      // missed, so approximate hits may only exceed the exact hits
      assert(cA >= cE, s"doc $id: bloom under-reported ($cA < $cE)")
      totalShingles += nA
      falsePositives += cA - cE
    }
    assert(totalShingles > 0)
    val fpRate = falsePositives.toDouble / totalShingles
    assert(fpRate < 0.01, f"bloom FP rate $fpRate%.4f >= 1%%")
  }

  test("bloom probe is a native expression (no UDF node) and the memoized repeat is bit-identical") {
    import spark.implicits._
    val first = TextAnalysis.evalDecontaminationBloom(spark, sfDir)
    val plan = first.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_probe"), "native probe expression missing from plan")
    assert(!plan.toLowerCase.contains("udf"), "boxed UDF survived in the probe plan")
    val a = first.as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val b = TextAnalysis.evalDecontaminationBloom(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b), "memoized second invocation diverged from the first")
  }

  test("inverted index: df bounds, deterministic postings, PMI count inequalities") {
    import spark.implicits._
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    val idx = TextAnalysis.invertedIndex(spark, sfDir)
      .as[(String, Long, String)].collect()
    assert(idx.nonEmpty)
    idx.foreach { case (term, df, fp) =>
      assert(term.nonEmpty && df >= 1 && df <= nDocs, s"df out of bounds for $term")
      assert(fp.length == 32, s"postings fingerprint not md5-shaped for $term")
    }
    val again = TextAnalysis.invertedIndex(spark, sfDir)
      .as[(String, Long, String)].collect()
    assert(again.sorted.toSeq == idx.sorted.toSeq, "posting fingerprints not rerun-stable")

    val pmi = TextAnalysis.cooccurrencePmi(spark, sfDir)
      .select("c_ab", "c_a", "c_b", "pmi_num", "pmi_den")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(pmi.length == TextAnalysis.PmiTopK)
    pmi.foreach { case (cab, ca, cb, num, den) =>
      // every bigram occurrence is also an occurrence of each word
      assert(cab <= ca && cab <= cb, "pair count exceeds a unigram count")
      assert(num > 0 && den == ca * cb)
    }
  }

  test("winnowing: window bounds, short-doc truncation, dup detection by density") {
    import spark.implicits._
    // doc 1: 4 tokens -> 2 grams < w -> ONE truncated window -> 1 fp;
    // doc 2: all-identical grams -> every window min is the same hash;
    // doc 3: 20 distinct tokens -> 18 grams, 15 windows, 1..15 fps
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "x x x x x x x x x x"),
      (3L, (1 to 20).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprintsOf(spark, docs)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((8L, 1L)))
    val (n3, s3) = got(3L)
    assert(n3 == 18L && s3 >= 1L && s3 <= 15L)
    // real corpus: counts bounded by the winnowing guarantees
    val real = TextAnalysis.winnowFingerprints(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(real.nonEmpty)
    real.foreach { case (_, n, s) =>
      assert(s >= 1 && s <= math.max(1, n - (TextAnalysis.WinnowW - 1)))
    }
  }

  test("text_pii_scrub: augmented docs carry exactly one email and one url") {
    import spark.implicits._
    val rows = TextAnalysis.textPiiScrub(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (id, nEmail, nUrl, _) =>
      if (id % 3 == 0) {
        assert(nEmail == 1, s"doc $id: expected 1 synthesized email, got $nEmail")
        assert(nUrl == 1, s"doc $id: expected 1 synthesized url, got $nUrl")
      } else {
        assert(nEmail == 0 && nUrl == 0, s"doc $id: clean text matched PII")
      }
    }
  }

  test("quality_classifier_score: bounds hold and the model broadcast stays broadcast") {
    // plan string from an unexecuted frame — post-collect, AQE's
    // toString repeats the pre-/post-adaptive plans and double-counts
    val p = TextAnalysis.qualityClassifierScore(spark, sfDir)
      .queryExecution.executedPlan.toString
    val rows = TextAnalysis.qualityClassifierScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_accepted") <= r.getAs[Long]("n_docs"),
        s"accepted exceeds docs: $r")
      assert(r.getAs[Double]("min_score") <= r.getAs[Double]("max_score"),
        s"score bracket inverted: $r")
    }
    // the full corpus must be covered (no doc in this testdata is empty)
    val total = graft.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // the model joins as a broadcast, never an exchange of the corpus
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"model frame must broadcast:\n$p")
    val nHash = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nHash == 1, s"expected only the final per-source exchange, got $nHash:\n$p")
  }

  test("lm_doc_likelihood plan: cardinality-gated model join — broadcast under " +
    "the threshold, sort-merge above, identical results") {
    // this corpus's bigram model is far under LmBroadcastMaxRows, so
    // the shipping query must broadcast (scoped to the small-model
    // regime — the gate exists because a web-scale model must NOT)
    val p = TextAnalysis.lmDocLikelihood(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"small model must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected sort-merge join:\n$p")
    // force the big-model regime: threshold 0 → the hint must be
    // merge, the plan free of a model broadcast, and the results
    // byte-identical to the broadcast regime
    val big = TextAnalysis.lmDocLikelihoodImpl(spark, sfDir, 0L)
    val pBig = big.queryExecution.executedPlan.toString
    assert(pBig.contains("SortMergeJoin"), s"big-model regime must merge:\n$pBig")
    val a = TextAnalysis.lmDocLikelihood(spark, sfDir).collect()
      .map(_.toSeq).sortBy(_.toString)
    val b = big.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq, "join-strategy regimes disagree on results")
  }

  test("corpus_pipeline_funnel: monotone stages, raw = corpus, stage 4 = the selection query") {
    import spark.implicits._
    val f = TextAnalysis.corpusPipelineFunnel(spark, sfDir)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(f.map(_._2).toSeq ==
      Seq("raw", "exact_dedup", "neardup_dedup", "quality", "decontaminated"))
    // every stage only removes docs/tokens
    for (w <- f.sliding(2); Array(a, b) = w) {
      assert(b._3 <= a._3, s"stage ${b._2} grew docs")
      assert(b._4 <= a._4, s"stage ${b._2} grew tokens")
    }
    assert(f.head._3 == Tables.load(spark, sfDir, "documents").count())
    // cross-query consistency: the funnel's quality stage IS the
    // training_set_select_neardup membership
    assert(f(3)._3 == TextAnalysis.trainingSetSelectNeardup(spark, sfDir).count())
  }

  test("corpus_rejection_ledger: one row per doc; stage counts reconcile with the funnel") {
    import spark.implicits._
    val ledger = TextAnalysis.corpusRejectionLedger(spark, sfDir)
      .as[(Long, String, String)].collect()
    assert(ledger.length == Tables.load(spark, sfDir, "documents").count())
    assert(ledger.map(_._1).distinct.length == ledger.length, "doc_id not unique")
    val funnel = TextAnalysis.corpusPipelineFunnel(spark, sfDir)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    def surviving(stages: String*) =
      ledger.count(r => !stages.contains(r._2)).toLong
    // funnel stage k = docs NOT removed by any stage up to k
    assert(surviving("exact_dedup") == funnel("exact_dedup"))
    assert(surviving("exact_dedup", "neardup_dedup") == funnel("neardup_dedup"))
    assert(surviving("exact_dedup", "neardup_dedup", "quality") == funnel("quality"))
    assert(ledger.count(_._2 == "accepted").toLong == funnel("decontaminated"))
    // reasons are stage-consistent
    val reasonsByStage = ledger.groupBy(_._2).view
      .mapValues(_.map(_._3).toSet).toMap
    assert(reasonsByStage.get("exact_dedup").forall(_ == Set("duplicate_text")))
    assert(reasonsByStage.get("quality")
      .forall(_.subsetOf(Set("too_short", "low_quality_score"))))
    assert(reasonsByStage.get("holdout").forall(_ == Set("eval_split")))
    assert(reasonsByStage("accepted") == Set("accepted"))
    assert(ledger.count(_._2 == "accepted") > 0, "pipeline accepted nothing")
  }

  test("lm_doc_likelihood: hand-computed fixed-point bigram LM scores") {
    import spark.implicits._
    // bigram counts: (a,b)×2, (a,c)×1 → prefix a: 3
    // q(a,b) = 2_000_000 div 3 = 666666; q(a,c) = 333333
    val docs = Seq(
      (1L, "a b"),  // one bigram (a,b)  → score 666666
      (2L, "a b"),
      (3L, "a c"),  // one bigram (a,c)  → score 333333
      (4L, "x"))    // no bigrams → absent
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.lmDocLikelihood(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 666666L), (2L, 1L, 666666L), (3L, 1L, 333333L)))
  }

  test("train_eval_split_neardup: no verified near-dup pair ever crosses the split") {
    import spark.implicits._
    val assign = graft.text.TextAnalysis.neardupSplitAssign(spark, sfDir)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val docs = Tables.load(spark, sfDir, "documents")
    assert(assign.size == docs.count())
    assert(assign.values.toSet.subsetOf(Set("train", "eval")))
    // the structural guarantee: both endpoints of every verified
    // near-dup pair share a cluster, hence a side
    val pairs = graft.dedup.Dedup.cachedMinhashPairs(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus has no near-dup pairs; spec is vacuous")
    pairs.foreach { case (a, b) =>
      assert(assign(a) == assign(b), s"pair ($a,$b) crosses the split")
    }
    // and the census the query reports is this assignment's census
    val census = graft.text.TextAnalysis.trainEvalSplitNeardup(spark, sfDir)
      .as[(String, String, Long)].collect().map(r => r._3).sum
    assert(census == assign.size)
  }
}
