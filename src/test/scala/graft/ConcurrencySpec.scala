package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Multi-tenant correctness (round-9 verdict #6): the session-scoped
  * memos' `computeIfAbsent` + persist pattern under real racing
  * threads, and result equality between concurrent and serial runs of
  * the same queries. BenchConcurrent measures the throughput side;
  * this spec pins the correctness side at test SF. */
class ConcurrencySpec extends AnyFunSuite with SharedSpark {

  private def inThreads[A](n: Int)(body: Int => A): Seq[A] = {
    val out = new ConcurrentLinkedQueue[A]()
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until n).map { i =>
      new Thread(() => {
        try out.add(body(i))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(errs.isEmpty, s"worker threads threw: ${errs.asScala.map(_.toString)}")
    out.asScala.toSeq
  }

  test("racing memo builds: 4 threads hit cold caches, all get identical pair lists") {
    import spark.implicits._
    // drop this session's memos so all four threads race the SAME
    // computeIfAbsent on a cold cache
    Dedup.clearCaches(spark)
    val results = inThreads(4) { _ =>
      Dedup.cachedMinhashPairs(spark, sfDir)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    }
    assert(results.nonEmpty)
    assert(results.forall(_ == results.head),
      "racing builders returned different pair lists")
  }

  test("4 concurrent streams of mixed queries equal their serial results") {
    // memo-heavy + join-heavy + kernel queries, the mix a multi-tenant
    // session serves; FAIR pool labels exercise per-thread scheduling
    val picks = Seq("minhash_neardup", "neardup_clusters", "lm_doc_likelihood",
      "tfidf_top_terms", "wordcount_total", "join_orders_customers",
      "similar_ann_ivf", "dedup_exact")
    val serial = picks.map { n =>
      n -> SparkEntry.queries(n)(spark, sfDir).collect()
        .map(_.toSeq.toString).sorted.toSeq
    }.toMap
    val concurrent = inThreads(4) { i =>
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"t$i")
      picks.zipWithIndex.collect { case (n, j) if j % 4 == i => n }.map { n =>
        n -> SparkEntry.queries(n)(spark, sfDir).collect()
          .map(_.toSeq.toString).sorted.toSeq
      }
    }.flatten.toMap
    for ((n, rows) <- concurrent)
      assert(rows == serial(n), s"$n diverged under concurrency")
  }
}
