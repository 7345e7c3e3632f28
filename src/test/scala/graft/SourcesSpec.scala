package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.H — source/sink round trips: partitioned parquet, csv,
  * json, and partition pruning on read.
  */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_src").toString

  test("partitioned parquet write + partition-pruned read") {
    val dir = tmp()
    val docs = Tables(spark, sf).documents
    docs.write.partitionBy("lang").mode("overwrite").parquet(s"$dir/docs")
    val back = spark.read.parquet(s"$dir/docs")
    assert(back.count() == docs.count())
    val en = back.filter(col("lang") === "en")
    // partition pruning: the physical plan must carry the partition filter
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), s"no partition pruning in:\n$plan")
    assert(en.count() == docs.filter(col("lang") === "en").count())
  }

  test("csv round trip preserves rows and schema-on-read works") {
    val dir = tmp()
    val cust = Tables(spark, sf).customer
    cust.write.option("header", "true").mode("overwrite").csv(s"$dir/cust")
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$dir/cust")
    assert(back.count() == cust.count())
    assert(back.columns.sorted.sameElements(cust.columns.sorted))
  }

  test("json round trip preserves rows") {
    val dir = tmp()
    val nation = Tables(spark, sf).nation
    nation.write.mode("overwrite").json(s"$dir/nation")
    val back = spark.read.json(s"$dir/nation")
    assert(back.count() == nation.count())
  }

  test("orc round trip preserves rows and pushes filters") {
    val dir = tmp()
    val orders = Tables(spark, sf).orders
    orders.write.mode("overwrite").orc(s"$dir/orders")
    val back = spark.read.orc(s"$dir/orders")
    assert(back.count() == orders.count())
    assert(back.columns.sorted.sameElements(orders.columns.sorted))
    // ORC scans push predicates just like parquet — the format is not a
    // second-class citizen at scale
    val plan = back.filter(col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_totalprice"), plan)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), plan)
  }

  test("parquet scan pushes filters and prunes columns") {
    val df = Tables(spark, sf).lineitem
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }

  test("streaming file sink writes exactly-once parquet with a checkpoint") {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("graft_sink_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    // seed the source directory with one batch of files
    Tables(spark, sf).documents
      .select(col("doc_id"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema("doc_id BIGINT, source STRING, n_chars BIGINT")
      .parquet(in)
      .withColumn("tokens", expr("CAST((n_chars + 3) div 4 AS BIGINT)"))
    val q = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val written = spark.read.parquet(outDir)
    assert(written.count() == 500)
    assert(written.columns.contains("tokens"))
    // restart over the same checkpoint: no new data → no duplicate rows
    val q2 = stream.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() == 500, "checkpoint replay duplicated rows")
  }

  test("DSv2 synth source plans pushed doc_id ranges and prunes columns") {
    def synth(rows: Long, parts: Int) = spark.read
      .format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()
    // full read: row count and schema
    val full = synth(1000, 4)
    assert(full.count() == 1000L)
    assert(full.schema == graft.sources.SynthSource.schema)
    // range pushdown narrows the PLANNED partitions (never generates the
    // excluded ids): the filter is consumed by the scan, not re-evaluated
    val ranged = synth(1000, 4).filter(col("doc_id") >= 600 && col("doc_id") < 700)
    assert(ranged.count() == 100L)
    val rplan = ranged.queryExecution.executedPlan.toString
    assert(rplan.contains("range=[600,700)"), rplan)
    assert(rplan.contains("GreaterThanOrEqual(doc_id,600)"), rplan)
    // column pruning reaches the generator: a doc_id-only scan reads a
    // one-column schema
    val pruned = synth(1000, 4).select(col("doc_id"))
    val pplan = pruned.queryExecution.executedPlan.toString
    assert(pplan.contains("cols=doc_id ") || pplan.contains("cols=doc_id"), pplan)
    // determinism: two reads of an overlapping range agree row-for-row
    val a = synth(1000, 4).filter(col("doc_id") < 50).collect().map(_.toString).sorted
    val b = synth(500, 2).filter(col("doc_id") < 50).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // n_chars is consistent with the generated text
    synth(100, 2).collect().foreach { r =>
      assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length.toLong)
    }
    // partition planning honors the option and clamps to the range
    val scan1 = synth(1000, 8).rdd.getNumPartitions
    assert(scan1 == 8, s"planned $scan1 partitions")
    val scan2 = synth(3, 8).rdd.getNumPartitions
    assert(scan2 == 3, s"planned $scan2 partitions for a 3-row table")
    // a non-doc_id filter is declined by the scan and still evaluated
    assert(synth(200, 2).filter(col("lang") === "en").collect().forall(_.getString(2) == "en"))
  }

  test("DSv2 synth source shards: key-grouped self-join plans shuffle-free (SPJ)") {
    // the connector half of the r16 bucketing ask: with option("shards", k)
    // every InputPartition carries ONE shard value (HasPartitionKey) and
    // the scan reports KeyGroupedPartitioning(identity(shard), k) — two
    // reads joined on (doc_id, shard) co-locate by reported partition
    // values and plan ZERO exchanges (storage-partitioned join)
    def synth() = spark.read
      .format("graft.sources.SynthSource")
      .option("rows", "1000").option("shards", "4")
      .load()
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // shard IS doc_id mod k, and every id appears exactly once
      val base = synth()
      assert(base.schema.fieldNames.last == "shard")
      assert(base.count() == 1000L)
      assert(base.collect().forall(r =>
        r.getAs[Int]("shard") == (r.getAs[Long]("doc_id") % 4).toInt))
      assert(base.rdd.getNumPartitions == 4)
      val j = synth().as("a").join(
        synth().as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.shard") === col("b.shard"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"SPJ self-join still shuffles:\n$plan")
      assert(j.count() == 1000L)
      // filter pushdown composes with the stripes: the narrowed range
      // still yields one partition per shard with correct membership
      val ranged = synth().filter(col("doc_id") >= 100 && col("doc_id") < 200)
      assert(ranged.count() == 100L)
      assert(ranged.collect().forall(r =>
        r.getAs[Int]("shard") == (r.getAs[Long]("doc_id") % 4).toInt))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("DSv2 catalog bucket transform: self-join on doc_id ALONE plans shuffle-free (SPJ)") {
    // the bucket-transform half of storage-partitioned joins, which only
    // a CATALOG can carry: Spark resolves the table's bucket(n, doc_id)
    // partition transform through the table's own FunctionCatalog, so
    // two reads of graft.synth_*_b8 co-locate by reported bucket values
    // and a join on the RAW key — no helper shard column in the join
    // condition — plans zero exchanges
    val confs = Seq(
      "spark.sql.catalog.graft" -> classOf[graft.sources.GraftCatalog].getName,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val base = spark.table("graft.synth_1000_b8")
      assert(base.schema == graft.sources.SynthSource.schema) // no shard column
      assert(base.count() == 1000L)
      assert(base.rdd.getNumPartitions == 8)
      val j = base.as("a").join(spark.table("graft.synth_1000_b8").as("b"),
        col("a.doc_id") === col("b.doc_id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucket-transform SPJ still shuffles:\n$plan")
      assert(j.count() == 1000L)
      // pushdown composes: a doc_id range narrows every bucket's stripe
      val ranged = base.filter(col("doc_id") >= 100 && col("doc_id") < 300)
      assert(ranged.count() == 200L)
      assert(ranged.queryExecution.executedPlan.toString.contains("range=[100,300)"))
      // rows are the same generator output as the path-based read
      val viaPath = spark.read.format("graft.sources.SynthSource")
        .option("rows", "1000").load().collect().map(_.toString).sorted
      assert(base.collect().map(_.toString).sorted.sameElements(viaPath))
      // the catalog is a read-only resolver
      intercept[Exception] { spark.sql("DROP TABLE graft.synth_1000_b8") }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("DSv2 synth source plans limit/offset-bounded partitions; declined TopN stays above") {
    def synth() = spark.read
      .format("graft.sources.SynthSource")
      .option("rows", "1000").option("partitions", "4")
      .load()
    // LIMIT k: the scan itself is k-bounded — the planned range shrinks
    val lim = synth().limit(7)
    assert(lim.queryExecution.executedPlan.toString.contains("range=[0,7)"),
      lim.queryExecution.executedPlan.toString)
    assert(lim.count() == 7L)
    // OFFSET m composes: [m, m+k)
    val lo = synth().offset(2).limit(3)
    assert(lo.queryExecution.executedPlan.toString.contains("range=[2,5)"),
      lo.queryExecution.executedPlan.toString)
    assert(lo.collect().map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(2L, 3L, 4L)))
    // TopN on ascending doc_id IS the generated order: accepted as a
    // k-bounded range (Spark's TakeOrdered still merges above — partial)
    val topAsc = synth().orderBy(col("doc_id")).limit(5)
    assert(topAsc.queryExecution.executedPlan.toString.contains("range=[0,5)"),
      topAsc.queryExecution.executedPlan.toString)
    assert(topAsc.collect().map(_.getAs[Long]("doc_id")).sameElements(Array(0L, 1L, 2L, 3L, 4L)))
    // any other ordering is DECLINED: the scan stays unbounded and the
    // TopN evaluates above it
    val topDesc = synth().orderBy(col("doc_id").desc).limit(5)
    val dplan = topDesc.queryExecution.executedPlan.toString
    assert(dplan.contains("range=[0,1000)"), dplan)
    assert(dplan.contains("TakeOrderedAndProject"), dplan)
    assert(topDesc.collect().map(_.getAs[Long]("doc_id"))
      .sameElements(Array(999L, 998L, 997L, 996L, 995L)))
  }

  test("DSv2 synth source runtime filtering prunes row generation (dynamic pruning)") {
    import spark.implicits._
    // a selective dim filtered on the join key: dynamic partition pruning
    // plans a runtime IN filter against the synth scan's filterAttributes;
    // at execution the scan re-plans its range AND installs the exact
    // allow-set, so rows outside the dim's keys are never GENERATED —
    // pinned via the JVM-wide generation counter, not just the plan string
    val dim = (900L until 920L).map(i => (i, "k")).toDF("id", "tag")
    val dimPath = java.nio.file.Files.createTempDirectory("graft_synth_dim").toString
    dim.write.mode("overwrite").parquet(dimPath)
    def synth() = spark.read
      .format("graft.sources.SynthSource")
      .option("rows", "100000").option("partitions", "8")
      .load()
    val saved = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    // the synth side reports no stats, so make the planner's benefit
    // estimate permissive enough to insert the pruning subquery
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000000")
    try {
      val joined = synth().join(
        spark.read.parquet(dimPath).filter(col("tag") === "k"),
        col("doc_id") === col("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), s"no runtime filter planned:\n$plan")
      graft.sources.SynthSource.rowsGenerated.reset()
      assert(joined.count() == 20L)
      val generated = graft.sources.SynthSource.rowsGenerated.sum()
      assert(generated <= 1000L,
        s"runtime filter did not reach execution: generated $generated of 100000 ids")
    } finally saved match {
      case Some(v) =>
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", v)
      case None =>
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }

  test("DSv2 synth micro-batch stream: bounded offsets, exactly-once across restart") {
    // offsets are doc_id positions; a batch is the (start, end] id range;
    // rows are pure functions of id — so checkpointed offsets + the file
    // sink's commit log give exactly-once totals across a stop/restart
    val ckpt = java.nio.file.Files.createTempDirectory("graft_synth_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_synth_out").toString
    def stream() = spark.readStream
      .format("graft.sources.SynthSource")
      .option("rows", "50000").option("rowsPerBatch", "12000").option("partitions", "3")
      .load()
    // first run: default trigger, stop after the first progress lands —
    // some of the range is committed, the rest remains for the restart
    val q1 = stream().writeStream
      .format("parquet").option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (q1.recentProgress.length < 2 && System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop(); q1.awaitTermination(60000)
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst > 0L, "first run committed nothing")
    // restart from the checkpoint: AvailableNow drains the remainder
    val q2 = stream().writeStream
      .format("parquet").option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val rows = spark.read.parquet(outDir)
    assert(rows.count() == 50000L, s"restart lost or duplicated rows: ${rows.count()}")
    assert(rows.select(col("doc_id")).distinct().count() == 50000L, "duplicate doc_ids")
    // replayed rows are byte-identical to a batch read of the same range
    val batch = spark.read.format("graft.sources.SynthSource")
      .option("rows", "50000").option("partitions", "4").load()
    assert(rows.exceptAll(batch).isEmpty && batch.exceptAll(rows).isEmpty,
      "streamed rows diverge from the batch generator")
  }

  test("DSv2 synth source answers COUNT/MIN/MAX from planning metadata (aggregate pushdown)") {
    // SupportsPushDownAggregates, complete pushdown: the scan returns the
    // aggregate VALUES as closed forms of the planned [lo, hi) range —
    // one partition, one row, zero generated rows; the footer-read
    // analogue for the generator. Composes with filter pushdown: the
    // range narrows FIRST, then the aggregates answer over it.
    def synth(rows: Long) = spark.read
      .format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("partitions", "8")
      .load()
    val agg = synth(100000)
      .filter(col("doc_id") >= 1000 && col("doc_id") < 50000)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates:"), s"aggregates not pushed:\n$plan")
    val row = agg.head()
    assert(row.getLong(0) == 49000L && row.getLong(1) == 1000L && row.getLong(2) == 49999L)
    // the aggregate source runs as ONE planned partition (no row generation
    // to parallelize over)
    assert(plan.contains("range=[1000,50000)"), plan)
    // empty range: count 0, NULL min/max — the zero-row aggregate contract
    val empty = synth(100)
      .filter(col("doc_id") >= 500)
      .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
      .head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
    // a grouped or unanswerable aggregate is DECLINED and computed above
    // an ordinary row scan — values must match the pushed-down world
    val grouped = synth(1000).groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("PushedAggregates:"))
    assert(grouped.collect().map(_.getLong(1)).sum == 1000L)
    val sums = synth(1000).agg(sum(col("n_chars")))
    assert(!sums.queryExecution.executedPlan.toString.contains("PushedAggregates:"))
    assert(sums.head().getLong(0) > 0L)
    // the CORRECTNESS edge: with a residual (declined) filter, the engine
    // must NOT push the aggregate — our closed forms answer over the
    // whole planned range and would silently overcount. Spark's pushdown
    // rule only offers aggregates once every filter is consumed by the
    // scan; pin that contract AND the value.
    val resid = synth(1000).filter(col("lang") === "en").agg(count(lit(1)).as("n"))
    assert(!resid.queryExecution.executedPlan.toString.contains("PushedAggregates:"),
      "aggregate pushed past a residual filter — closed forms would overcount")
    val direct = synth(1000).collect().count(_.getAs[String]("lang") == "en").toLong
    assert(resid.head().getLong(0) == direct && direct > 0L)
  }

  test("DSv2 catalog time travel: option(version) pins an immutable snapshot in the plan") {
    import spark.implicits._
    import graft.sources.CatalogStore
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString
    def readV(v: Option[Long]) = {
      val r = spark.read.format("graft.sources.CatalogSnapshotSource").option("path", dir)
      v.fold(r)(x => r.option("version", x.toString)).load()
    }
    val v1 = (0L until 20L).map(k => (k, s"t$k", 1)).toDF("dataset_key", "title", "revision")
    CatalogStore.init(spark, dir, v1)
    // upsert publishes v=2 (10 revision bumps)
    CatalogStore.upsert(spark, dir,
      (0L until 10L).map(k => (k, s"t$k-v2", 2)).toDF("dataset_key", "title", "revision"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // VERSION AS OF 1 still serves the pre-upsert catalog, immutably
    val asOf1 = readV(Some(1L))
    assert(rows(asOf1) == rows(v1.toDF()))
    assert(asOf1.queryExecution.executedPlan.toString.contains("v=1"),
      "pinned version not a plan fact")
    // no version option → the CURRENT published snapshot
    val cur = readV(None)
    assert(rows(cur) == rows(CatalogStore.read(spark, dir)
      .select(col("dataset_key"), col("title"), col("revision"))))
    assert(rows(cur) != rows(asOf1))
    assert(cur.queryExecution.executedPlan.toString.contains("v=2"))
    // column pruning reaches the driver materialization
    val pruned = readV(Some(1L)).select(col("dataset_key"))
    assert(pruned.queryExecution.executedPlan.toString.contains("cols=dataset_key"))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == (0L until 20L).toSeq)
    // a never-published version is refused at planning
    intercept[Exception] { readV(Some(9L)).collect() }
    // the q-entry: store-backed q68 (base through the pinned snapshot)
    // answers row-identically to the derived path — unchanged oracle
    val derived = SparkEntry.queries("q68_dataset_upsert")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val qdir = java.nio.file.Files.createTempDirectory("graft_tt_q68").toString
    CatalogStore.init(spark, qdir, graft.operators.CatalogOps.catalogBase(Tables(spark, sf)))
    spark.conf.set("graft.catalog.store", qdir)
    try {
      val stored = SparkEntry.queries("q68_dataset_upsert")(spark, sf)
      assert(stored.queryExecution.executedPlan.toString.contains("graft_catalog_snapshot"),
        "store-backed q68 did not read through the snapshot source")
      assert(stored.collect().map(_.toString).sorted.toSeq == derived,
        "store-backed q68 diverges from derived")
    } finally spark.conf.unset("graft.catalog.store")
  }

  test("DSv2 versioned sink publishes CAS-committed TSV snapshots") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vsink").toString
    def write(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("graft.sources.VersionedSink")
        .option("path", dir).mode("append").save()
    // first write -> v=1, marker present, rows readable back as TSV
    write(Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x").repartition(2))
    assert(graft.sources.VersionedSink.latestVersion(spark, dir) == 1L)
    assert(new java.io.File(s"$dir/v=1/_COMMITTED").exists())
    val back = spark.read.option("sep", "\t")
      .schema("id LONG, name STRING, x DOUBLE").csv(s"$dir/v=1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == Set((1L, "a", 1.5), (2L, "b", 2.5)))
    // payload holds exactly one part per task plus the marker
    val files = new java.io.File(s"$dir/v=1").listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("part-")) == 2, files.mkString(","))
    // concurrent writes serialize in-JVM onto consecutive versions
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec = scala.concurrent.ExecutionContext.global
    val fs = (1 to 2).map { k =>
      Future(write(Seq((k.toLong, s"w$k", k.toDouble)).toDF("id", "name", "x")))
    }
    fs.foreach(Await.result(_, 120.seconds))
    assert(graft.sources.VersionedSink.latestVersion(spark, dir) == 3L)
    (2L to 3L).foreach { v =>
      assert(new java.io.File(s"$dir/v=$v/_COMMITTED").exists(), s"v=$v")
    }
    // staging fully drained after commits
    val staging = new java.io.File(s"$dir/_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty)
    // every committed version's rows survive independently (snapshots,
    // not appends-in-place)
    val all = (1L to 3L).map { v =>
      spark.read.option("sep", "\t").schema("id LONG, name STRING, x DOUBLE")
        .csv(s"$dir/v=$v").count()
    }
    assert(all.sum == 4L, all.mkString(","))
  }

  test("DSv2 versioned sink publishes under the conditional-put committer too") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vsink_cond").toString
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.cas.committer", "conditional")
    try {
      Seq((7L, "c", 0.5)).toDF("id", "name", "x")
        .write.format("graft.sources.VersionedSink")
        .option("path", dir).mode("append").save()
      assert(graft.sources.VersionedSink.latestVersion(spark, dir) == 1L)
      // the conditional committer's claim file lives inside the version
      assert(new java.io.File(s"$dir/v=1/_CLAIM").exists())
      assert(new java.io.File(s"$dir/v=1/_COMMITTED").exists())
    } finally hc.unset("graft.cas.committer")
  }

  test("versioned sink rejects raw TSV delimiters instead of corrupting rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vsink_esc").toString
    val e = intercept[org.apache.spark.SparkException] {
      Seq((1L, "bad\tvalue")).toDF("id", "name")
        .write.format("graft.sources.VersionedSink")
        .option("path", dir).mode("append").save()
    }
    assert(e.getMessage.contains("tab/newline") ||
      Option(e.getCause).exists(_.getMessage.contains("tab/newline")))
    // nothing published, staging aborted clean
    assert(graft.sources.VersionedSink.latestVersion(spark, dir) == 0L)
  }
}

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("decodeAll runs the codec partition-parallel with real schema") {
    val out = operators.Multimodal.decodeAll(spark, sf).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.byte_len > 0 && r.width >= 16 && r.height >= 16))
    assert(out.map(_.media_type).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("resizePlan fits the target box, preserves aspect, never upscales") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // wide, tall, tiny (no-op), and exactly-at-box payloads
    val blobs = Seq(
      (1L, png(100, 20), "image"), (2L, png(20, 100), "image"),
      (3L, png(10, 10), "image"), (4L, png(64, 64), "image"))
      .toDF("doc_id", "payload", "media_type")
    val out = operators.Multimodal.resizePlan(blobs, 64, 64).collect().sortBy(_.doc_id).toSeq
    out.foreach { r =>
      assert(r.dst_w <= 64 && r.dst_h <= 64, s"doc ${r.doc_id} exceeds the box: $r")
      assert(r.dst_w >= 1 && r.dst_h >= 1)
      assert(r.scale_e6 <= 1000000L, s"doc ${r.doc_id} upscaled: $r")
      // aspect preserved within the 1px rounding of the SHORT side
      val expShort = math.round(
        math.min(r.src_w, r.src_h).toDouble * r.scale_e6 / 1e6)
      assert(math.abs(math.min(r.dst_w, r.dst_h) - expShort) <= 1)
    }
    val byId = out.map(r => r.doc_id -> r).toMap
    assert(byId(1L).dst_w == 64 && byId(1L).dst_h == 13 && byId(1L).resample)
    assert(byId(2L).dst_w == 13 && byId(2L).dst_h == 64 && byId(2L).resample)
    assert(byId(3L).dst_w == 10 && byId(3L).dst_h == 10 && !byId(3L).resample)
    assert(byId(4L).dst_w == 64 && byId(4L).dst_h == 64 && !byId(4L).resample)
    assert(byId(3L).scale_e6 == 1000000L && byId(1L).scale_e6 == 640000L)
  }

  test("real PNG payloads decode to their true pixel dimensions via javax.imageio") {
    import spark.implicits._
    // synthesize real PNGs in-test: doc_id N is an (N+1)×(2N+3) image —
    // dimensions the deterministic fallback could never produce together
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val blobs = (1L to 8L)
      .map(i => (i, png(i.toInt + 1, 2 * i.toInt + 3), "image"))
      .toDF("doc_id", "payload", "media_type")
    val out = operators.Multimodal.decodeBlobs(blobs).collect().sortBy(_.doc_id)
    out.foreach { r =>
      assert(r.width == r.doc_id + 1, s"doc ${r.doc_id}: width ${r.width}")
      assert(r.height == 2 * r.doc_id + 3, s"doc ${r.doc_id}: height ${r.height}")
      assert(r.byte_len > 8, "a real PNG is bigger than its magic")
    }
    // and a non-image payload in the same frame takes the deterministic path
    val mixed = Seq((20L, "just text".getBytes("UTF-8"), "audio"))
      .toDF("doc_id", "payload", "media_type")
    val fallback = operators.Multimodal.decodeBlobs(mixed).head()
    assert(fallback.width == 16L + (20L % 16) * 8 && fallback.height == 16L + ((20L / 16) % 16) * 8)
  }

  test("binaryFile source feeds real image files through the decode chain") {
    import spark.implicits._
    // the actual multimodal INGEST path: media files on disk → Spark's
    // binaryFile source (path, length, content) → blob frame → codec.
    // binaryFile never loads all files in one task; content is a regular
    // binary column, so decodeBlobs composes unchanged.
    val dir = java.nio.file.Files.createTempDirectory("graft_blobs")
    try {
      (1 to 4).foreach { i =>
        val img = new java.awt.image.BufferedImage(
          10 * i, 5 * i, java.awt.image.BufferedImage.TYPE_INT_RGB)
        javax.imageio.ImageIO.write(img, "png", dir.resolve(s"asset_$i.png").toFile)
      }
      val blobs = spark.read.format("binaryFile").load(dir.toString)
        .select(
          regexp_extract(col("path"), "asset_(\\d+)\\.png", 1).cast("long").as("doc_id"),
          col("content").as("payload"),
          lit("image").as("media_type"))
      val out = operators.Multimodal.decodeBlobs(blobs).collect().sortBy(_.doc_id)
      assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 3L, 4L))
      out.foreach { r =>
        assert(r.width == 10 * r.doc_id && r.height == 5 * r.doc_id,
          s"asset ${r.doc_id}: ${r.width}x${r.height}")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("a corrupt payload that passes the magic sniff falls back instead of failing the job") {
    import spark.implicits._
    // valid PNG magic, garbage body: ImageIO readers throw on these (not
    // always IOException — CMM/IndexOutOfBounds/IllegalArgument too); the
    // codec must degrade to the deterministic derivation, never propagate
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      Array.fill[Byte](64)(0x5A)
    def png9 = {
      val img = new java.awt.image.BufferedImage(9, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // cut INSIDE the IHDR header (width survives, height doesn't): the
    // header parse itself must fail → fallback
    val midHeader = png9.take(20)
    val blobs = Seq((3L, corrupt, "image"), (4L, midHeader, "image"))
      .toDF("doc_id", "payload", "media_type")
    val out = operators.Multimodal.decodeBlobs(blobs).collect().sortBy(_.doc_id)
    assert(out.length == 2)
    out.foreach(r =>
      assert(r.width == 16L + (r.doc_id % 16) * 8 && r.height == 16L + ((r.doc_id / 16) % 16) * 8,
        s"doc ${r.doc_id} did not take the fallback: $r"))
    // cut AFTER the header (body gone): the header-only reader still
    // recovers the true dimensions — dims cost O(header), not O(pixels)
    val bodyGone = Seq((5L, png9.take(33), "image")).toDF("doc_id", "payload", "media_type")
    val dims = operators.Multimodal.decodeBlobs(bodyGone).head()
    assert(dims.width == 9L && dims.height == 9L, s"header-only read failed: $dims")
  }

}
