package graft

import java.nio.file.Files

import graft.sources.SpatialLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sources/SpatialLayout — z-order clustering for spatial scans. Pins the
  * Morton encoding against an independent bit-by-bit recomputation and
  * proves the layout property that justifies the write: per-file spatial
  * envelopes shrink by an order of magnitude vs an unclustered layout.
  */
class SpatialLayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  // ~6000 deterministic points (the customer table's 150 rows at sf0.001
  // are too sparse to measure file-envelope geometry): q48's coordinate
  // derivation keyed on the lineitem row identity
  private def points = {
    val t = Tables(spark, sf)
    t.lineitem.select(
      expr("l_orderkey * 10 + l_linenumber").as("k"),
      expr("CAST(((l_orderkey * 10 + l_linenumber) * 7919) % 360000 AS DOUBLE) / 1000 - 180").as("lon"),
      expr("CAST(((l_orderkey * 10 + l_linenumber) * 104729) % 170000 AS DOUBLE) / 1000 - 85").as("lat"))
  }

  test("zValue matches an independent bit-interleave recomputation") {
    def spreadRef(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).sum
    val rows = points
      .withColumn("z", SpatialLayout.zValue(col("lon"), col("lat")))
      .select(col("lon"), col("lat"), col("z"))
      .limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lon, lat, z) = (r.getDouble(0), r.getDouble(1), r.getLong(2))
      def quant(v: Double, lo: Double, hi: Double): Long =
        math.min(math.max(math.floor((v - lo) / (hi - lo) * 65536.0), 0.0), 65535.0).toLong
      val expected = spreadRef(quant(lon, -180, 180)) | (spreadRef(quant(lat, -90, 90)) << 1)
      assert(z == expected, s"($lon, $lat): z=$z expected=$expected")
    }
  }

  test("z-ordered layout tightens per-file spatial envelopes by >=4x") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    // enough files that each covers a compact curve segment — at 8 files a
    // segment spans half a quadrant and the tightening ratio sits right at
    // the assertion boundary (3.1×); 16 is still ~90 rows/file here
    val nFiles = 16
    // unclustered baseline: the same range-partition + sort machinery but
    // keyed on insertion order (k), so file count and sizes match and ONLY
    // the clustering key differs
    points.repartitionByRange(nFiles, col("k"))
      .sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(s"$dir/linear")
    SpatialLayout.writeZOrdered(points, col("lon"), col("lat"), s"$dir/zorder", nFiles)

    def meanEnvelopeArea(path: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(
          (max(col("lon")) - min(col("lon"))).as("dlon"),
          (max(col("lat")) - min(col("lat"))).as("dlat"))
        .select(avg(col("dlon") * col("dlat")))
        .collect()(0).getDouble(0)
      perFile
    }
    val linear = meanEnvelopeArea(s"$dir/linear")
    val z = meanEnvelopeArea(s"$dir/zorder")
    assert(z * 4 <= linear, s"z-order envelope $z not <= 1/4 of linear $linear")
    // same rows both layouts
    assert(
      spark.read.parquet(s"$dir/zorder").count() ==
        spark.read.parquet(s"$dir/linear").count())
  }

  test("a bbox read over the z-ordered layout touches a minority of files") {
    val dir = Files.createTempDirectory("graft-zorder-prune").toString
    SpatialLayout.writeZOrdered(points, col("lon"), col("lat"), s"$dir/z", 32)
    val all = spark.read.parquet(s"$dir/z")
    val nTotalFiles = all.select(input_file_name()).distinct().count()
    // files whose envelope intersects the q49 bbox — the set a
    // stats-pruning reader must actually open
    val touching = all
      .groupBy(input_file_name())
      .agg(
        min(col("lon")).as("lo_lon"), max(col("lon")).as("hi_lon"),
        min(col("lat")).as("lo_lat"), max(col("lat")).as("hi_lat"))
      .filter(
        col("hi_lon") >= -30.0 && col("lo_lon") <= 30.0 &&
          col("hi_lat") >= -20.0 && col("lo_lat") <= 40.0)
      .count()
    assert(touching * 2 <= nTotalFiles,
      s"bbox touches $touching of $nTotalFiles z-ordered files — no pruning win")
  }
}
