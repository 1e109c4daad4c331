package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

class DedupSpec extends AnyFunSuite with SharedSpark {

  test("shingles: distinct word 3-grams, empties dropped, short docs empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),       // a|b|c, b|c|d
      (2L, "a  b c"),        // double space -> a|b|c
      (3L, "x y"),           // too short -> []
      (4L, "a b a b a b")    // repeats collapse to 2 distinct
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a|b|c", "b|c|d"))
    assert(got(2L) == Seq("a|b|c"))
    assert(got(3L) == Seq.empty)
    assert(got(4L).sorted == Seq("a|b|a", "b|a|b"))
  }

  test("shingleSet (Scala) == shingles (Column) on the real corpus") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val viaColumn = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val viaScala = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.shingleSet(t).toSeq }.toMap
    assert(viaScala == viaColumn)
  }

  test("minhash LSH finds exactly the exact-jaccard pairs on the fixture") {
    import spark.implicits._
    // sf0.001 documents include injected near-dups; LSH recall at
    // j≈0.98 with 8 bands of 4 is 1 - (1-j^4)^8 ≈ 1 - 1e-9
    val exact = Dedup.ngramJaccard(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNeardup(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(exact.nonEmpty, "fixture should contain injected near-dups")
  }

  test("simhash: near-dup docs have small hamming distance, others large") {
    import spark.implicits._
    val sh = Dedup.simhash(spark, sfDir).as[(Long, Long)].collect().toMap
    val pairs = Dedup.ngramJaccard(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dupDists = pairs.map { case (a, b) => hamming(sh(a), sh(b)) }
    // near-dups (j >= 0.98) should be within a few bits of each other
    assert(dupDists.max <= 15, s"dup hamming distances: ${dupDists.toSeq}")
    // random doc pairs should be far apart on average
    val ids = sh.keys.toSeq.sorted.take(40)
    val rand = for (a <- ids; b <- ids if a < b && !pairs.contains((a, b)))
      yield hamming(sh(a), sh(b))
    assert(rand.sum.toDouble / rand.size > 15.0)
  }

  test("dedup_exact survivor count never exceeds doc count and is stable") {
    import spark.implicits._
    val survivors = Dedup.dedupExact(spark, sfDir)
      .agg(sum("n_survivors")).as[Long].head()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(survivors == docs.select("text").distinct().count())
  }

  test("embedding_neardup is symmetric-free (d1 < d2) and thresholded") {
    import spark.implicits._
    val rows = Dedup.embeddingNeardup(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, s) => a < b && s >= 0.35 - 1e-9 })
  }
}
