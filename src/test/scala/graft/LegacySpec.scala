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

  test("reads the reference's LF-terminated one.txt fixture format") {
    val ref = "/root/reference/one.txt"
    assume(Files.exists(Paths.get(ref)))
    val df = TsvDataset.read(spark, ref)
    assert(df.count() > 0)
    assert(df.filter(col("value") =!= "1").count() == 0,
      "one.txt values are all the literal partial count 1")
  }
}
