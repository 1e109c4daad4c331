package graft

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Partitioning

class PartitioningSpec extends AnyFunSuite with SharedSpark {

  /** Independent oracle: the reference's Java math transcribed afresh
    * (hash as unsigned 160-bit int, times N, integer-divide by 2^160-1 —
    * WordCountContext.java:26-27,87-91,140-147). */
  private def oracle(key: String, n: Int): Int = {
    val d = MessageDigest.getInstance("SHA-1")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    val h = new BigInteger(1, d)
    val max = BigInteger.valueOf(2).pow(160).subtract(BigInteger.ONE)
    h.multiply(BigInteger.valueOf(n.toLong)).divide(max).intValue()
  }

  private val rnd = new Random(42)
  private def randomKeys(n: Int): Seq[String] =
    Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString) ++
      Seq("", " ", "\t", "the", "é漢字", "a" * 1000)

  test("legacyPartition matches the reference formula on arbitrary keys") {
    for (key <- randomKeys(500); n <- Seq(1, 2, 3, 4, 7, 16, 100))
      assert(Partitioning.legacyPartition(key, n) == oracle(key, n),
        s"key=${key.take(20)} n=$n")
  }

  test("partition ids are in range, deterministic, roughly uniform") {
    val keys = randomKeys(2000)
    val parts = keys.map(Partitioning.legacyPartition(_, 4))
    assert(parts.forall(p => p >= 0 && p < 4))
    assert(parts == keys.map(Partitioning.legacyPartition(_, 4)))
    val counts = parts.groupBy(identity).view.mapValues(_.size)
    assert(counts.values.forall(c => c > keys.size / 8),
      s"suspiciously skewed: $counts")
  }

  test("LegacyPartitionExpr (codegen) agrees with the udf and driver math") {
    import spark.implicits._
    val keys = randomKeys(300)
    val df = keys.toDF("key")
    val viaExpr = df.select(
      graft.functions.LegacyPartitionExpr.legacy_partition(
        org.apache.spark.sql.functions.col("key"), 7)).as[Int].collect()
    val viaUdf = df.select(
      Partitioning.legacyPartitionUdf(7)(
        org.apache.spark.sql.functions.col("key"))).as[Int].collect()
    val viaDriver = keys.map(Partitioning.legacyPartition(_, 7))
    assert(viaExpr.toSeq == viaDriver)
    assert(viaUdf.toSeq == viaDriver)
  }

  test("partition_histogram covers all event rows") {
    import spark.implicits._
    val hist = Partitioning.partitionHistogram(spark, sfDir)
      .as[(Int, Long)].collect()
    val total = Tables.load(spark, sfDir, "events").count()
    assert(hist.map(_._2).sum == total)
    assert(hist.forall { case (p, _) => p >= 0 && p < 4 })
  }
}
