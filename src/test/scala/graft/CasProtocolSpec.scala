package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

import graft.sources.{CasProtocol, CatalogStore, ConditionalPutCommitter, RenameCommitter, SlotBlockedException, VersionCommitter}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The committer seam under a hostile filesystem (SURVEY §2.H): the
  * rename committer DOUBLE-PUBLISHES on an object-store-like filesystem
  * whose rename merges instead of claiming — proving the hazard is real —
  * while the conditional-put committer admits exactly one writer on the
  * very same filesystem. Plus the staging-sweep guarantee when the
  * marker probe itself throws, and a real store running end-to-end under
  * the conditional committer.
  */
class CasProtocolSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val conf = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.nonatomic.impl", classOf[NonAtomicFileSystem].getName)
    c.set("fs.AbstractFileSystem.nonatomic.impl", classOf[NonAtomicAbstractFs].getName)
    c
  }

  private def nonatomicDir(): String =
    "nonatomic://" + java.nio.file.Files.createTempDirectory("graft_cas").toString + "/store"

  private def fsOf(dir: String): FileSystem = new Path(dir).getFileSystem(conf)

  /** A staged payload the way every store shapes one: data file(s) plus
    * the `_COMMITTED` marker at the staging root.
    */
  private def stage(f: FileSystem, dir: String, tag: String): Path = {
    val p = new Path(dir, s"_staging/v1-$tag-${java.util.UUID.randomUUID()}")
    f.mkdirs(p)
    def put(name: String, body: String): Unit = {
      val out = f.create(new Path(p, name), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    put(s"part-$tag", s"payload of writer $tag")
    put("_COMMITTED", s"""{"writer":"$tag"}""")
    p
  }

  private def filesIn(f: FileSystem, p: Path): Set[String] = {
    if (!f.exists(p)) return Set.empty
    val it = f.listFiles(p, true)
    val buf = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) buf += it.next().getPath.getName
    buf.toSet
  }

  /** Run `claim` for writer A on its own thread with its own lock (a
    * second "JVM"), returning (thread, observed-failure slot).
    */
  private def writerA(
      committer: VersionCommitter, dir: String, staging: Path, dst: Path,
      committed: () => Boolean): (Thread, AtomicReference[Option[Throwable]]) = {
    val failed = new AtomicReference[Option[Throwable]](None)
    val t = new Thread(() =>
      try CasProtocol.claimWith(
        committer, spark, dir, staging, dst, 1L, new Object, committed, "writer A")
      catch { case t: Throwable => failed.set(Some(t)) })
    t.start()
    (t, failed)
  }

  test("HAZARD PROOF: the rename committer double-publishes when rename is a non-atomic merge") {
    val dir = nonatomicDir()
    val f = fsOf(dir)
    val v1 = new Path(dir, "v=1")
    def committed(): Boolean = f.exists(new Path(v1, "_COMMITTED"))
    val stA = stage(f, dir, "A")
    val stB = stage(f, dir, "B")
    val first = new AtomicBoolean(true)
    val aInside = new CountDownLatch(1)
    val releaseA = new CountDownLatch(1)
    // freeze writer A at the top of its "rename" — mid-LIST, before any
    // object copies — exactly where a second JVM's claim would interleave
    NonAtomicFsHooks.beforeRenameCopy = _ =>
      if (first.getAndSet(false)) {
        aInside.countDown()
        releaseA.await(30, TimeUnit.SECONDS)
        ()
      }
    try {
      val (tA, aFailed) = writerA(RenameCommitter, dir, stA, v1, () => committed())
      assert(aInside.await(30, TimeUnit.SECONDS), "writer A never reached its rename")
      // writer B runs its ENTIRE claim while A is mid-rename: B sees no
      // marker, its merge-rename "succeeds", B is published
      CasProtocol.claimWith(
        RenameCommitter, spark, dir, stB, v1, 1L, new Object, () => committed(), "writer B")
      assert(committed(), "writer B should have published")
      releaseA.countDown()
      tA.join(30000)
      // THE HAZARD: A's rename merged into B's committed version and
      // reported success — BOTH writers believe they published v=1, and
      // the slot now interleaves two payloads (B's manifest no longer
      // describes what readers will scan)
      assert(aFailed.get().isEmpty,
        s"on this filesystem the rename committer should NOT detect the race, got ${aFailed.get()}")
      val got = filesIn(f, v1)
      assert(got.contains("part-A") && got.contains("part-B"),
        s"expected both writers' payloads interleaved in v=1, got $got")
    } finally NonAtomicFsHooks.reset()
  }

  test("conditional-put committer admits exactly one writer on the same non-atomic filesystem") {
    val dir = nonatomicDir()
    val f = fsOf(dir)
    val v1 = new Path(dir, "v=1")
    def committed(): Boolean = f.exists(new Path(v1, "_COMMITTED"))
    val stA = stage(f, dir, "A")
    val stB = stage(f, dir, "B")
    val first = new AtomicBoolean(true)
    val aInside = new CountDownLatch(1)
    val releaseA = new CountDownLatch(1)
    // freeze writer A at the door of its conditional put — AFTER its
    // dst-exists precheck passed, the widest possible race window
    NonAtomicFsHooks.beforeExclusiveCreate = p =>
      if (p.getName == "_CLAIM" && first.getAndSet(false)) {
        aInside.countDown()
        releaseA.await(30, TimeUnit.SECONDS)
        ()
      }
    try {
      val (tA, aFailed) = writerA(ConditionalPutCommitter, dir, stA, v1, () => committed())
      assert(aInside.await(30, TimeUnit.SECONDS), "writer A never reached its conditional put")
      CasProtocol.claimWith(
        ConditionalPutCommitter, spark, dir, stB, v1, 1L, new Object, () => committed(), "writer B")
      assert(committed(), "writer B should have published")
      releaseA.countDown()
      tA.join(30000)
      // exactly one winner: A's conditional put lost atomically and it
      // failed LOUDLY as a lost race (not a blocked slot — B's marker is
      // already visible on the re-check)
      val aErr = aFailed.get()
      assert(aErr.isDefined, "writer A must lose on this committer")
      assert(!aErr.get.isInstanceOf[SlotBlockedException] &&
        aErr.get.isInstanceOf[IllegalStateException] &&
        aErr.get.getMessage.contains("concurrent writer committed"), s"unexpected loss shape: $aErr")
      val got = filesIn(f, v1)
      assert(got.contains("part-B") && !got.contains("part-A"),
        s"v=1 must hold ONLY the winner's payload, got $got")
      assert(got.contains("_CLAIM") && got.contains("_COMMITTED"))
      assert(!f.exists(stA), "loser's staging must be swept")
      assert(filesIn(f, new Path(dir, "_staging")).isEmpty, "winner's staging must be swept")
    } finally NonAtomicFsHooks.reset()
  }

  test("conditional-put committer: marker lands, debris blocks, repair unblocks") {
    val dir = nonatomicDir()
    val f = fsOf(dir)
    val v1 = new Path(dir, "v=1")
    def committedV(v: Long): Boolean = f.exists(new Path(s"$dir/v=$v", "_COMMITTED"))
    CasProtocol.claimWith(
      ConditionalPutCommitter, spark, dir, stage(f, dir, "A"), v1, 1L, new Object,
      () => committedV(1), "init")
    assert(committedV(1))
    // a second claim of the same version loses at the pre-check, staging swept
    val stLate = stage(f, dir, "L")
    val e = intercept[IllegalStateException] {
      CasProtocol.claimWith(
        ConditionalPutCommitter, spark, dir, stLate, v1, 1L, new Object,
        () => committedV(1), "late")
    }
    assert(e.getMessage.contains("concurrent writer committed") && !f.exists(stLate))
    // claim-less, marker-less debris in the v=2 slot blocks BY TYPE…
    val v2 = new Path(dir, "v=2")
    f.mkdirs(v2)
    val junk = f.create(new Path(v2, "stray-file"), true); junk.write(1); junk.close()
    val st2 = stage(f, dir, "B")
    intercept[SlotBlockedException] {
      CasProtocol.claimWith(
        ConditionalPutCommitter, spark, dir, st2, v2, 2L, new Object,
        () => committedV(2), "blocked")
    }
    assert(!f.exists(st2))
    // …and the standard quiesced repair clears it without touching v=1
    val swept = CasProtocol.repair(spark, dir, committedV)
    assert(swept.exists(_.endsWith("v=2")) && committedV(1))
    CasProtocol.claimWith(
      ConditionalPutCommitter, spark, dir, stage(f, dir, "C"), v2, 2L, new Object,
      () => committedV(2), "retry")
    assert(committedV(2) && filesIn(f, v2).contains("part-C"))
  }

  test("a throwing committed() probe still sweeps the staged dir (r14 ADVICE: no leak until repair)") {
    val dir = nonatomicDir()
    val f = fsOf(dir)
    val v1 = new Path(dir, "v=1")
    // path 1: the PRE-check throws (unparseable marker is corruption, not leniency)
    val st1 = stage(f, dir, "P")
    val boom = intercept[IllegalStateException] {
      CasProtocol.claimWith(
        RenameCommitter, spark, dir, st1, v1, 1L, new Object,
        () => throw new IllegalStateException("marker unreadable"), "pre")
    }
    assert(boom.getMessage == "marker unreadable" && !f.exists(st1))
    // path 2: the rename fails AND the re-read probe throws — the exact
    // r14 ADVICE site; the diagnosis must surface with staging swept
    val st2 = stage(f, dir, "Q")
    NonAtomicFsHooks.beforeRenameCopy = _ => throw new java.io.IOException("injected rename failure")
    try {
      val probes = new java.util.concurrent.atomic.AtomicInteger(0)
      val boom2 = intercept[IllegalStateException] {
        CasProtocol.claimWith(
          RenameCommitter, spark, dir, st2, v1, 1L, new Object,
          () => if (probes.getAndIncrement() == 0) false
                else throw new IllegalStateException("marker unreadable on re-read"), "post")
      }
      assert(boom2.getMessage == "marker unreadable on re-read" && !f.exists(st2))
    } finally NonAtomicFsHooks.reset()
  }

  test("CatalogStore runs end-to-end under the conditional-put committer (graft.cas.committer)") {
    import spark.implicits._
    conf.set("graft.cas.committer", "conditional")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_cas_cat").toString
      CatalogStore.init(spark, dir,
        (0L until 6L).map(k => (k, s"title_$k", 1)).toDF("dataset_key", "title", "revision"))
      val up = CatalogStore.upsert(spark, dir,
        Seq((2L, "title_2b", 2), (97L, "title_97", 1)).toDF("dataset_key", "title", "revision"))
      assert(up.version == 2L && up.inserted == 1L && up.updated == 1L)
      // protocol files are invisible to parquet; the manifest verification
      // in readVersion passes because the payload landed byte-identical
      val back = CatalogStore.read(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(back(2L) == "title_2b" && back(97L) == "title_97" && back.size == 7)
      val f = fsOf(dir)
      assert(f.exists(new Path(s"$dir/v=2", "_CLAIM")), "conditional committer must have claimed")
      // replay idempotence unchanged under this committer
      val replay = CatalogStore.upsert(spark, dir,
        Seq((2L, "title_2b", 2)).toDF("dataset_key", "title", "revision"))
      assert(replay.version == 2L && replay.inserted + replay.updated == 0)
    } finally conf.unset("graft.cas.committer")
  }

  test("FreqStore's count-merge LSM chain runs end-to-end under the conditional-put committer") {
    import spark.implicits._
    import graft.sources.FreqStore
    conf.set("graft.cas.committer", "conditional")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_cas_freq").toString
      val docs = Seq(
        (1L, "s", "alpha beta alpha"), (2L, "s", "beta gamma"), (3L, "s", "gamma alpha"))
        .toDF("doc_id", "source", "text")
      FreqStore.init(spark, dir, docs.filter($"doc_id" === 1L))
      FreqStore.append(spark, dir, docs.filter($"doc_id" === 2L), tag = Some("b2"))
      // replayed tag: marker-scan no-op under this committer too
      FreqStore.append(spark, dir, docs.filter($"doc_id" === 2L), tag = Some("b2"))
      FreqStore.append(spark, dir, docs.filter($"doc_id" === 3L))
      def view(): Map[String, Long] = FreqStore.frequencies(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(view() == Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 2L))
      assert(FreqStore.listVersions(spark, dir) == Seq(1L, 2L, 3L))
      // compaction publishes through the same conditional claim and
      // preserves the merged view
      FreqStore.compact(spark, dir)
      assert(view() == Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 2L))
      assert(FreqStore.totalDocs(spark, dir) == 3L)
      // every committed version dir carries the conditional claim file
      val f = fsOf(dir)
      FreqStore.listVersions(spark, dir).foreach { v =>
        assert(f.exists(new Path(s"$dir/v=$v", "_CLAIM")), s"v=$v missing _CLAIM")
      }
    } finally conf.unset("graft.cas.committer")
  }

  test("committer selection: rename by default on local paths, conf override wins, junk rejected") {
    val local = java.nio.file.Files.createTempDirectory("graft_cas_sel").toString
    assert(CasProtocol.committerFor(spark, local) eq RenameCommitter)
    conf.set("graft.cas.committer", "conditional")
    try assert(CasProtocol.committerFor(spark, local) eq ConditionalPutCommitter)
    finally conf.unset("graft.cas.committer")
    conf.set("graft.cas.committer", "sometimes")
    try intercept[IllegalArgumentException](CasProtocol.committerFor(spark, local))
    finally conf.unset("graft.cas.committer")
  }
}
