package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.legacy.{GraftJob, JobRunner, WordCountJob}
import graft.operators.WordCount

class JobRunnerSpec extends AnyFunSuite with SharedSpark {

  test("WordCountJob via JobRunner reproduces the declarative linefreq query") {
    import spark.implicits._
    val input = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("string").as("key"), col("text").as("value"))
    val legacy = JobRunner.run(spark, input, WordCountJob)
      .select(col("key").as("word"), col("value").cast("long").as("linefreq"))
      .as[(String, Long)].collect().sorted

    val declarative = WordCount.linefreq(spark, sfDir)
      .as[(String, Long)].collect().sorted

    assert(legacy.toSeq == declarative.toSeq)
  }

  test("reduce sees values sorted ascending (external-sort parity)") {
    import spark.implicits._
    val input = Seq(("k", "b"), ("k", "a"), ("k", "c"), ("j", "2"), ("j", "1"))
      .toDF("key", "value")
    val job = new GraftJob {
      def map(k: String, v: String, emit: (String, String) => Unit): Unit = emit(k, v)
      def reduce(k: String, vs: Seq[String], emit: (String, String) => Unit): Unit =
        emit(k, vs.mkString("|"))
    }
    val got = JobRunner.run(spark, input, job)
      .as[(String, String)].collect().toMap
    assert(got == Map("k" -> "a|b|c", "j" -> "1|2"))
  }

  test("map can emit zero or many pairs (Context.java:17 contract)") {
    import spark.implicits._
    val input = Seq(("1", "keep"), ("2", "drop"), ("3", "dup")).toDF("key", "value")
    val job = new GraftJob {
      def map(k: String, v: String, emit: (String, String) => Unit): Unit = v match {
        case "drop" => ()
        case "dup"  => emit(v, "x"); emit(v, "y")
        case other  => emit(other, "z")
      }
      def reduce(k: String, vs: Seq[String], emit: (String, String) => Unit): Unit =
        emit(k, vs.length.toString)
    }
    val got = JobRunner.run(spark, input, job).as[(String, String)].collect().toMap
    assert(got == Map("keep" -> "1", "dup" -> "2"))
  }
}
