package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.legacy.TsvDataset

class LegacySpec extends AnyFunSuite with SharedSpark {

  test("TSV round-trip preserves pairs and writes CRLF bytes") {
    import spark.implicits._
    val pairs = Seq(("is", "1"), ("life", "1"), ("a b", "x y"), ("", "empty-key"))
    val dir = Files.createTempDirectory("tsv").toString
    TsvDataset.write(pairs.toDF("key", "value"), dir)

    val back = TsvDataset.read(spark, dir).as[(String, String)].collect().sorted
    assert(back.toSeq == pairs.sorted)

    val part = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.contains("part-") && !p.endsWith(".crc")).head
    val bytes = Files.readAllBytes(Paths.get(part))
    val text = new String(bytes, "UTF-8")
    assert(text.contains("\r\n"), "reference writes CRLF (WordCountContext.java:162)")
  }

  test("multi-tab lines keep only fields 0 and 1 (MapThread.java:50-51)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tsv").toString
    Files.writeString(Paths.get(dir, "in.txt"), "a\tb\tc\nk\tv\nnotab\n")
    val got = TsvDataset.read(spark, dir).as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("a", "b"), ("k", "v")))
  }

  test("directory scan skips ~ backup files (WorkerServlet.java:512-529)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tsv").toString
    Files.writeString(Paths.get(dir, "in.txt"), "k\tv\n")
    Files.writeString(Paths.get(dir, "in.txt~"), "backup\tstale\n")
    val got = TsvDataset.read(spark, dir).as[(String, String)].collect().toSeq
    assert(got == Seq(("k", "v")))
  }

  test("end-to-end legacy pipeline on the reference's own fixture: " +
      "one.txt -> JobRunner(WordCountJob) -> reference reduce semantics") {
    import spark.implicits._
    val ref = "/root/reference/one.txt"
    assume(Files.exists(Paths.get(ref)))
    // one.txt is map-phase OUTPUT (word \t 1 per line); running the
    // reduce semantics over it means: per word, the COUNT of lines
    // (values.length — WordCount.java:51), not the sum
    val expected = scala.io.Source.fromFile(ref).getLines()
      .filter(_.contains("\t")).map(_.split("\t")(0)).toSeq
      .groupBy(identity).map { case (w, ls) => (w, ls.size.toString) }
    val input = graft.legacy.TsvDataset.read(spark, ref)
    val job = new graft.legacy.GraftJob {
      def map(k: String, v: String, emit: (String, String) => Unit): Unit =
        emit(k, v) // identity map: one.txt pairs are already partials
      def reduce(k: String, vs: Seq[String], emit: (String, String) => Unit): Unit =
        emit(k, vs.length.toString) // WordCount.java:51
    }
    val got = graft.legacy.JobRunner.run(spark, input, job)
      .as[(String, String)].collect().toMap
    assert(got == expected)
  }

  test("reads the reference's LF-terminated one.txt fixture format") {
    val ref = "/root/reference/one.txt"
    assume(Files.exists(Paths.get(ref)))
    val df = TsvDataset.read(spark, ref)
    assert(df.count() > 0)
    assert(df.filter(col("value") =!= "1").count() == 0,
      "one.txt values are all the literal partial count 1")
  }
}
