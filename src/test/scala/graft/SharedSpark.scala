package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local session for all suites (getOrCreate reuses the
  * singleton; never stopped so suites can run in any order). */
trait SharedSpark { this: Suite =>
  lazy val spark: SparkSession = SharedSpark.session
  val sfDir = "/root/testdata/sf0.001"

  /** The sf1 scale corpus, when generated on this machine — the same
    * dir convention the benches use (`tools/gen_sf.py` writes to
    * `/tmp/graft_data/sf1`; `SPARK_GRAFT_SF1_DIR` overrides). Specs
    * that need the honest-occupancy regime `assume` on this instead of
    * hard-coding a path (the round-10 silently-canceled-spec fix). */
  def sf1Dir: Option[String] =
    (sys.env.get("SPARK_GRAFT_SF1_DIR").toSeq ++
      Seq("/tmp/graft_data/sf1", "/root/repo/testdata/sf1"))
      .find(d => new java.io.File(s"$d/embeddings.parquet").exists())
}

object SharedSpark {
  lazy val session: SparkSession = {
    // the canonical engine config (incl. GraftExtensions so SQL-path
    // tests can call legacy_partition / dot_product)
    val s = Sessions.builder("local[4]", 4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
