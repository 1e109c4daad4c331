package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/classloading startup costs otherwise
    // land entirely on whichever query happens to run first (~4 s)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Tables.load(spark, sfDir, "region").groupBy("r_name").count().collect()
    } catch { case _: Throwable => () }
    // Force FULL materialization of every declared column: a bare
    // .count() lets Catalyst prune all unreferenced columns, so
    // projection-only queries (string_funcs, doc_fingerprint, ...) would
    // time a pruned row count instead of the declared work.
    // queryExecution.toRdd produces the final UnsafeRows with every
    // output column evaluated; count() just drains that iterator.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
