package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering layout — multi-dimensional data skipping.
  *
  * A 100 TB table filtered on TWO dimensions cannot be range-partitioned
  * to serve both: sorting by x scatters y. Interleaving the bits of both
  * keys puts rows close in (x, y) close on the z-curve, so a layout
  * partitioned/sorted by the z-key keeps box queries local in BOTH
  * dimensions — the clustering scheme behind Delta/Iceberg `ZORDER BY`,
  * here as plain Spark primitives: the key is a shift/or expression
  * column (whole-stage-codegen'd, no UDF), the layout is
  * `partitionBy(zcell)`, and a box scan prunes partitions via an `isin`
  * over the cells the box covers (computed from the box BOUNDS alone —
  * pure driver arithmetic, no data action).
  *
  * Cell enumeration is the conservative cover of the coarse grid — the
  * classic BIGMIN refinement only tightens mid-range z-jumps, which a
  * coarse-cell cover sidesteps entirely: cells are coarse exactly so
  * their count stays small (≤ 4^coarseBits total, far fewer for a tight
  * box) while row groups within a cell stay z-sorted for parquet min/max
  * skipping on the fine key.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * result bit 2i carries x's bit i, bit 2i+1 carries y's bit i. Pure
    * shift/and/or composition — codegen-friendly. */
  def zkey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in 1..31")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[zkey]] — one definition of the bit math per engine,
    * assembled from the same loop. */
  def zkeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Scala reference for tests/driver-side cell enumeration. */
  def zkeyLong(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  /** Coarse grid cell: the z-key of the top `coarseBits` of each
    * dimension — the partition key of the layout. */
  def cell(x: Column, y: Column, bits: Int, coarseBits: Int): Column = {
    require(coarseBits >= 1 && coarseBits <= bits, "need 1 <= coarseBits <= bits")
    zkey(shiftright(x, bits - coarseBits), shiftright(y, bits - coarseBits),
      coarseBits)
  }

  /** Write `df` z-clustered on (`xCol`, `yCol`): directory-partitioned by
    * the coarse cell, rows within each cell sorted by the fine z-key so
    * parquet row-group min/max statistics skip within cells too.
    * One shuffle (the repartition by cell); the per-partition sort is
    * spill-safe. */
  def layoutWrite(df: DataFrame, path: String, xCol: String, yCol: String,
                  bits: Int, coarseBits: Int): Unit =
    df.withColumn("zcell", cell(col(xCol), col(yCol), bits, coarseBits))
      .withColumn("zfine", zkey(col(xCol), col(yCol), bits))
      .repartition(col("zcell"))
      .sortWithinPartitions(col("zcell"), col("zfine"))
      .write.partitionBy("zcell").mode("overwrite").parquet(path)

  /** Cells intersecting the box `[x1..x2] × [y1..y2]` — pure arithmetic
    * on the bounds (the coarse grid is at most 2^coarseBits per side, and
    * a tight box covers a handful of cells). */
  def coveringCells(x1: Long, x2: Long, y1: Long, y2: Long,
                    bits: Int, coarseBits: Int): Seq[Long] = {
    val s = bits - coarseBits
    (for {
      cx <- (x1 >> s) to (x2 >> s)
      cy <- (y1 >> s) to (y2 >> s)
    } yield zkeyLong(cx, cy, coarseBits)).distinct.sorted
  }

  /** Box query over a [[layoutWrite]] layout: partition pruning via the
    * covering-cell `isin` (visible as PartitionFilters in the scan), then
    * the exact predicate. Reads only the box's cells no matter how large
    * the table is. */
  def boxScan(spark: SparkSession, path: String, xCol: String, yCol: String,
              bits: Int, coarseBits: Int,
              x1: Long, x2: Long, y1: Long, y2: Long): DataFrame = {
    val cells = coveringCells(x1, x2, y1, y2, bits, coarseBits)
    spark.read.parquet(path)
      .filter(col("zcell").isin(cells: _*))
      .filter(col(xCol).between(x1, x2) && col(yCol).between(y1, y2))
  }
}
