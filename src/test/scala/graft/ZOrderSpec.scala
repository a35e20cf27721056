package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout: key bit math, box-scan correctness, and the partition
  * pruning the layout exists for. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("column zkey matches the Scala reference on exhaustive small inputs") {
    val rows = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zkey(col("x"), col("y"), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === ZOrder.zkeyLong(x, y, 5), s"mismatch at ($x, $y)")
    }
    // the z-curve is a bijection on the grid
    assert(got.map(_._3).distinct.length === rows.length)
  }

  test("box scan over a z-layout equals the naive filter and prunes partitions") {
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    val df = (0L until 4096L).map(i => (i, (i * 37) % 256, (i * 91) % 256))
      .toDF("id", "x", "y")
    ZOrder.layoutWrite(df, dir, "x", "y", bits = 8, coarseBits = 3)

    val (x1, x2, y1, y2) = (40L, 70L, 100L, 130L)
    val scan = ZOrder.boxScan(spark, dir, "x", "y", 8, 3, x1, x2, y1, y2)
    val expect = df.filter(col("x").between(x1, x2) && col("y").between(y1, y2))
      .select("id").as[Long].collect().sorted.toSeq
    assert(scan.select("id").as[Long].collect().sorted.toSeq === expect)

    // the scan must carry a partition filter on zcell and actually select
    // fewer partitions than the full grid
    val scans = scan.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a file scan")
    assert(scans.head.partitionFilters.nonEmpty,
      "covering-cell isin must reach the scan as a partition filter")
    val selected = scans.head.selectedPartitions.partitionCount
    val total = spark.read.parquet(dir).select("zcell").distinct().count()
    assert(selected < total,
      s"box covering $selected of $total cells should prune the layout")
    // a 31x31 box on a 256-grid with 8x8 cells covers at most 4 cells
    assert(selected <= ZOrder.coveringCells(x1, x2, y1, y2, 8, 3).length)
  }

  test("Layout.compact merges small files losslessly without a shuffle") {
    val tmp = Files.createTempDirectory("compact").toString
    val df = (0L until 1000L).map(i => (i, s"row-$i")).toDF("id", "v")
    df.repartition(32).write.parquet(s"$tmp/frag")
    val (before, after) = operators.Layout.compact(spark, s"$tmp/frag", s"$tmp/out", 3)
    assert(before >= 32 && after <= 3, s"expected 32+ -> <=3 files, got $before -> $after")
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() === 1000)
    assert(out.as[(Long, String)].collect().sortBy(_._1).toSeq ===
      (0L until 1000L).map(i => (i, s"row-$i")))
    // coalesce is a NARROW dependency: the compaction plan must not shuffle
    val plan = spark.read.parquet(s"$tmp/frag").coalesce(3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction must not shuffle:\n$plan")
  }

  test("coveringCells is exact on cell-aligned boxes") {
    // one full cell: exactly one covering cell
    assert(ZOrder.coveringCells(32, 63, 64, 95, 8, 3).length === 1)
    // full grid: all 64 cells
    assert(ZOrder.coveringCells(0, 255, 0, 255, 8, 3).length === 64)
  }

  test("Layout.overwritePartitions backfills ONE partition, leaves the rest") {
    val tmp = Files.createTempDirectory("dynpart").toString
    Seq((1L, "a", "old-a"), (2L, "b", "old-b"), (3L, "c", "old-c"))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(s"$tmp/t")
    // backfill day=b only; STATIC overwrite would truncate a and c too
    operators.Layout.overwritePartitions(
      Seq((20L, "b", "new-b"), (21L, "b", "new-b2")).toDF("id", "day", "v"),
      s"$tmp/t", "day")
    val after = spark.read.parquet(s"$tmp/t")
      .select("id", "day", "v").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(after === Seq((1L, "a", "old-a"), (3L, "c", "old-c"),
      (20L, "b", "new-b"), (21L, "b", "new-b2")))
  }
}
