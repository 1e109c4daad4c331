package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordCount

class WordCountSpec extends AnyFunSuite with SharedSpark {

  test("linefreq <= total everywhere; same word set (SURVEY.md §2b Q3)") {
    import spark.implicits._
    val total = WordCount.total(spark, sfDir).as[(String, Long)].collect().toMap
    val lf = WordCount.linefreq(spark, sfDir).as[(String, Long)].collect().toMap
    assert(total.keySet == lf.keySet)
    lf.foreach { case (w, f) =>
      assert(f <= total(w), s"linefreq($w)=$f > total=${total(w)}")
    }
    // the quirk must be observable: some word repeats within some row
    assert(lf.exists { case (w, f) => f < total(w) },
      "fixture should contain within-line repeats, else Q3 quirk untested")
  }

  test("single-space tokenization drops empty tokens, keeps punctuation") {
    import spark.implicits._
    val df = Seq((1L, "a  b a"), (2L, "  "), (3L, "x,y x,y")).toDF("doc_id", "text")
    df.createOrReplaceTempView("tok_fixture")
    val toks = df.select(org.apache.spark.sql.functions.explode(
      WordCount.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .as[String].collect().sorted.toSeq
    assert(toks == Seq("a", "a", "b", "x,y", "x,y"))
  }
}
