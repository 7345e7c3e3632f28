package graft

import graft.sources.IvfIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent IVF coarse-quantizer index (sources.IvfIndex): frozen
  * centroids + LSM assignment chain through the CAS protocol, q74 reading
  * the stored artifact, and batch-append assignment proven bit-identical
  * to the family's integer nearest-centroid rule.
  */
class IvfIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ivfidx").toString

  test("q74 over the stored index is byte-identical to the derived run") {
    val dir = tmp()
    val (a, c) = operators.Similarity.corpusQuantizer(Tables(spark, sf))
    IvfIndex.init(spark, dir, a, c)
    def rows() = SparkEntry.queries("q74_ivf_multiprobe")(spark, sf).collect().toSeq
    val direct = rows()
    spark.conf.set("graft.ivf.index", dir)
    try assert(rows() == direct, "index-backed q74 diverges from the derived run")
    finally spark.conf.unset("graft.ivf.index")
  }

  test("append assigns new vectors to the true nearest frozen centroid, cost ∝ batch") {
    val dir = tmp()
    val t = Tables(spark, sf)
    val ids = t.embeddings.select(col("vec_id")).collect().map(_.getLong(0)).sorted
    val (baseIds, newIds) = ids.splitAt(ids.length * 4 / 5)
    val baseT = t.embeddings.filter(col("vec_id").isin(baseIds: _*))
    // quantizer trained on the base slice only (its labels + centroids)
    val baseEv = baseT
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("v").cast("double") * 1000).cast("long").as("q"))
    val cent = baseEv.groupBy(col("label").as("clabel"), col("dim").as("cdim"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
    IvfIndex.init(spark, dir, baseEv.select(col("vec_id"), col("label")).distinct(), cent)
    val v1 = IvfIndex.currentVersion(spark, dir).get

    val newEv = t.embeddings.filter(col("vec_id").isin(newIds: _*))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        floor(col("v").cast("double") * 1000).cast("long").as("q"))
    val st = IvfIndex.append(spark, dir, newEv)
    assert(st.version == v1 + 1 && st.kind == "delta")
    assert(st.newAssigned == newIds.length.toLong)
    assert(st.totalAssigned == ids.length.toLong)

    // scalar recomputation of the integer nearest-centroid rule
    val cents = cent.collect()
      .map(r => ((r.getAs[Number]("clabel").intValue, r.getAs[Number]("cdim").intValue),
        (r.getLong(2), r.getLong(3))))
      .toMap
    val labels = cents.keys.map(_._1).toSet.toSeq.sorted
    val newQ = newEv.collect()
      .map(r => (r.getLong(0), r.getAs[Number]("dim").intValue, r.getLong(2)))
      .groupBy(_._1)
    val expected = newQ.map { case (vid, rs) =>
      val best = labels.map { l =>
        val num = rs.map { case (_, d, q) =>
          val (sq, cnt) = cents((l, d)); val diff = q * cnt - sq; diff * diff
        }.sum
        val cnt = cents((l, rs.head._2))._2
        (num.toDouble / (cnt * cnt), l)
      }.min
      vid -> best._2
    }
    val got = IvfIndex.assign(spark, dir).filter(col("vec_id").isin(newIds: _*))
      .collect().map(r => r.getLong(0) -> r.getAs[Number]("label").intValue).toMap
    assert(got == expected, "append assignment diverges from the scalar nearest-centroid rule")

    // idempotent: re-appending the same batch publishes NO version
    val again = IvfIndex.append(spark, dir, newEv)
    assert(again.version == st.version)

    // compact folds to one base, view unchanged, centroids still readable
    val before = IvfIndex.assign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").intValue)).toSet
    val cst = IvfIndex.compact(spark, dir)
    assert(cst.kind == "base")
    val after = IvfIndex.assign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("label").intValue)).toSet
    assert(after == before, "compaction changed the assignment view")
    assert(IvfIndex.centroids(spark, dir).count() > 0)
    assert(IvfIndex.storeK(spark, dir) == labels.length.toLong)
  }

  test("concurrent appends: exactly one writer claims a version slot, losers are loud and clean") {
    // the DedupIndex race fixed this round (a pre-commit visibility check
    // fired on a legitimate concurrent winner) lived in exactly this code
    // shape — pin the contract here too
    val dir = tmp()
    val t = Tables(spark, sf)
    def ev(pred: org.apache.spark.sql.Column) = t.embeddings.filter(pred)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        floor(col("v").cast("double") * 1000).cast("long").as("q"))
    val baseT = t.embeddings.filter(col("vec_id") < 100)
    val baseEv = baseT
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("v").cast("double") * 1000).cast("long").as("q"))
    val cent = baseEv.groupBy(col("label").as("clabel"), col("dim").as("cdim"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
    IvfIndex.init(spark, dir, baseEv.select(col("vec_id"), col("label")).distinct(), cent)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext = scala.concurrent.ExecutionContext.global
    val results = Await.result(
      Future.sequence(Seq(
        ev(col("vec_id") >= 100 && col("vec_id") < 300),
        ev(col("vec_id") >= 300)).map(b => Future {
        try Right(IvfIndex.append(spark, dir, b))
        catch { case e: IllegalStateException => Left(e) }
      })), 5.minutes)
    assert(results.exists(_.isRight), "no appender succeeded")
    results.collect { case Left(e) => e }.foreach(e =>
      assert(e.getMessage.contains("NOT published"), s"loser must be loud: $e"))
    val staging = new org.apache.hadoop.fs.Path(dir, "_staging")
    val f = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftover = if (f.exists(staging)) f.listStatus(staging).length else 0
    assert(leftover == 0, s"$leftover staged dirs left behind")
    IvfIndex.assign(spark, dir).count() // chain readable
  }
}
