package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // with args: time the named declared queries (3 reps each) and exit
    if (args.nonEmpty) {
      args.foreach { n =>
        (1 to 3).foreach { r =>
          time(s"$n#$r")(
            SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count())
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
