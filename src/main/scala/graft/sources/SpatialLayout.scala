package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout for spatial tables — the
  * write-side locality optimization a 100 TB geo lake runs so that
  * bbox-filtered scans (q49's shape; the reference's STAC spatial-extent
  * queries, `check_stac_metadata` bbox fields) prune most files and row
  * groups instead of reading the whole table.
  *
  * Sorting by the bit-interleaved curve value clusters 2-D-nearby points
  * into the same output files, so every file's (lon, lat) min/max
  * envelope — exactly the statistics parquet footers already carry — is
  * TIGHT. A bbox predicate then eliminates whole files/row groups at
  * planning/scan time; with a linear (lon-major) layout each file spans
  * the full lat range and nothing prunes.
  *
  * Everything here is built from codegen'd built-in bitwise functions —
  * a fixed mask/shift expression tree, no UDF, no custom Expression — so
  * the z computation runs at scan speed inside whole-stage codegen, and
  * the layout write is one range-shuffle + per-partition sort (exactly a
  * cluster-scale `repartitionByRange().sortWithinPartitions()`).
  */
object SpatialLayout {

  /** Morton z-value of a (lon, lat) point at `bits` precision per
    * dimension (default 16 → a 32-bit curve). Coordinates quantize to
    * `[0, 2^bits)` over the full lon/lat domain, then interleave via the
    * classic magic-number bit-spreading ladder (each step doubles the gap
    * between occupied bit positions): lon takes the even bits, lat the
    * odd.
    */
  def zValue(lon: Column, lat: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, s"zValue bits out of range: $bits")
    val cells = 1L << bits
    def quant(c: Column, lo: Double, hi: Double): Column =
      least(
        greatest(floor((c - lit(lo)) / lit(hi - lo) * lit(cells.toDouble)), lit(0.0)),
        lit((cells - 1).toDouble)).cast("long")
    def spread(c: Column): Column = {
      val m1 = c.bitwiseAND(lit(0xFFFFL))
      val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FFL))
      val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x33333333L))
      m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(quant(lon, -180.0, 180.0))
      .bitwiseOR(shiftleft(spread(quant(lat, -90.0, 90.0)), 1))
  }

  /** Rewrite `df` as `files` parquet files clustered along the z-curve:
    * one range shuffle on the z-value (contiguous curve segments per
    * output partition — range, not hash, so files tile the curve) and a
    * per-partition sort. The helper column never reaches the written
    * schema.
    */
  def writeZOrdered(
      df: DataFrame, lon: Column, lat: Column, path: String, files: Int): Unit = {
    require(files >= 1, s"writeZOrdered files out of range: $files")
    df.withColumn("__graft_z", zValue(lon, lat))
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
