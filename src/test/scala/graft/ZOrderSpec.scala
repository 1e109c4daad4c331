package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite with SharedSpark {

  test("every coarse Z-cell pins both dimensions to a 16-value band") {
    val cells = ZOrder.zorderCellStats(spark, sfDir).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 16, s"u not localized: $r") // max_u - min_u
      assert(r.getLong(5) - r.getLong(4) < 16, s"v not localized: $r") // max_v - min_v
    }
  }

  test("z-ordered files prune a v-band query; a u-sorted layout cannot") {
    val grid = ZOrder.zGrid(spark, sfDir)
    val base = Files.createTempDirectory("graft_zorder").toString
    grid.repartitionByRange(16, col("z")).write.mode("overwrite")
      .parquet(s"$base/zorder")
    grid.repartitionByRange(16, col("u")).write.mode("overwrite")
      .parquet(s"$base/linear")

    // files whose [min_v, max_v] extent intersects the band v ∈ [64, 79]
    // — the file-skipping decision a min/max-stats reader makes
    def filesHit(dir: String): (Long, Long) = {
      val stats: DataFrame = spark.read.parquet(dir)
        .select(col("v"), col("_metadata.file_path").as("f"))
        .groupBy("f").agg(min("v").as("lo"), max("v").as("hi"))
      (stats.count(), stats.filter(col("hi") >= 64 && col("lo") <= 79).count())
    }
    val (zTotal, zHit) = filesHit(s"$base/zorder")
    val (uTotal, uHit) = filesHit(s"$base/linear")
    // the u-sorted layout spreads every v across every file: zero skip
    assert(uHit == uTotal, s"linear layout unexpectedly pruned: $uHit/$uTotal")
    // the z-order layout confines the band to a fraction of the files
    assert(zHit < uHit, s"z-order layout did not prune: $zHit/$zTotal vs $uHit/$uTotal")
    assert(zHit <= zTotal / 2, s"z-order pruning too weak: $zHit/$zTotal")
  }
}
