package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent per-day HLL sketch ledger — the MERGEABLE-AGGREGATE store a
  * 100 TB analytics deployment keeps so "distinct users over any date
  * range" never re-scans raw events: one Apache DataSketches HLL sketch
  * per epoch day (Spark's `hll_sketch_agg` family, the public
  * `datasketches-java` wire format), unioned at read time with
  * `hll_union_agg` over exactly the days a query asks for. The sketch is
  * the only aggregate in the suite whose PARTIAL STATE is the stored
  * artifact — counts (FreqStore) re-add, HLL registers re-MAX, which is
  * what makes a day ledger answer arbitrary windows without a raw pass.
  *
  * Determinism contract: an HLL sketch's REGISTER/COUPON SET is a pure
  * function of the hashed value set (updates are max/set-union —
  * insertion- and merge-order-independent), so every ESTIMATE read off
  * this store is deterministic for a given day's user set even though
  * the serialized byte layout may vary with aggregation order. Consumers
  * therefore compare estimates, never sketch bytes (HllStoreSpec pins
  * union-of-days ≡ direct-sketch-of-range at the estimate level).
  *
  * Storage discipline is [[IvfIndex]]'s exactly: v=1 base, appends
  * publish ONLY complete NEW days (a day already in the ledger is frozen
  * — re-sending it anti-joins away; daily ledgers append whole closed
  * days, never partial updates), reads union the newest base with later
  * deltas, `compact` folds the chain. Every publish stages, reads back a
  * manifest count, and claims its version slot through the shared
  * [[CasProtocol]] committer seam.
  */
object HllStore {

  final case class HllStoreStats(version: Long, kind: String, newDays: Long, totalDays: Long)

  private val Marker = "_COMMITTED"
  private val metaCache = new java.util.concurrent.ConcurrentHashMap[String, Meta]()
  private val commitLock = new Object

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionPath(dir: String, v: Long) = s"$dir/v=$v"

  private final case class Meta(kind: String, nd: Long, corpus: String)

  private def readBody(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(
      Iterator.continually(in.read()).takeWhile(_ != -1).map(_.toByte).toArray, "UTF-8")
    finally in.close()
  }

  private def invalidateMetaCache(dir: String): Unit =
    metaCache.keySet.removeIf(_.startsWith(s"$dir|"))

  private def readMeta(f: FileSystem, dir: String, v: Long): Option[Meta] = {
    val cached = metaCache.get(s"$dir|$v")
    if (cached != null) return Some(cached)
    val out = readMetaUncached(f, dir, v)
    out.foreach(m => metaCache.put(s"$dir|$v", m))
    out
  }

  private def readMetaUncached(f: FileSystem, dir: String, v: Long): Option[Meta] = {
    val p = new Path(versionPath(dir, v), Marker)
    if (!f.exists(p)) return None
    parseMarker(readBody(f, p)).orElse(
      throw new IllegalStateException(
        s"committed marker at $p is unreadable — store format migrated or marker " +
          "corrupt; refusing to treat the version as uncommitted (repair would reap " +
          "committed data). Restore the marker or rebuild the store at a fresh path."))
  }

  /** ONE marker grammar for every reader — the staged-marker checks in
    * append/compact parse with this exact regex instead of substring
    * probes (a `contains("\"nd\":5")` false-passes on a staged 55; r16
    * advice), so "unchanged ledger" is compared nd == nd, never
    * prefix == prefix.
    */
  private def parseMarker(body: String): Option[Meta] = {
    val m = """\{"kind":"(base|delta)","nd":(\d+),"corpus":"([^"]*)"\}""".r
    body.trim match {
      case m(kind, nd, corpus) => Some(Meta(kind, nd.toLong, corpus))
      case _ => None
    }
  }

  def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir))) return Seq.empty
    f.listStatus(new Path(dir)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
      .filter(v => readMeta(f, dir, v).isDefined)
      .sorted
  }

  def currentVersion(spark: SparkSession, dir: String): Option[Long] =
    listVersions(spark, dir).lastOption

  private def readChain(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val vs = listVersions(spark, dir)
    require(vs.nonEmpty, s"no HLL store at $dir")
    val lastBase = vs.filter(v => readMeta(f, dir, v).get.kind == "base").lastOption
    vs.filter(v => lastBase.forall(v >= _))
  }

  /** The (day, sk) ledger view — one committed sketch per epoch day.
    *
    * `expectCorpus` is the read-time provenance check (r16 advice —
    * FreqStore's family-validation discipline): a consumer that knows
    * which corpus it is querying passes the tag its store MUST have been
    * built from, and a ledger built from a different corpus/SF fails
    * loudly here instead of silently inner-joining wrong estimates into
    * the answer.
    */
  def sketches(
      spark: SparkSession, dir: String, expectCorpus: Option[String] = None): DataFrame = {
    val chain = readChain(spark, dir)
    expectCorpus.foreach { want =>
      val f = fs(spark, dir)
      val have = readMeta(f, dir, chain.head).get.corpus
      require(have == want,
        s"HLL ledger at $dir was built from corpus '$have' but the query reads " +
          s"corpus '$want' — refusing to merge sketches across corpora")
    }
    chain
      .map(v => spark.read.parquet(s"${versionPath(dir, v)}/sketches"))
      .reduce(_.unionByName(_))
  }

  /** Per-(epoch-day) HLL sketch of the ATTRIBUTED user set — the one
    * definition both the store build and any in-query derivation use
    * (one expression, no drift; null users carry no identity to count).
    * Input must hold `ts` (timestamp) and `user_id`.
    */
  def daySketches(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))

  private def stage(
      spark: SparkSession, dir: String, v: Long, kind: String, sk: DataFrame,
      corpus: String): Path = {
    require(!corpus.contains("\"") && !corpus.contains("\\"),
      s"corpus tag must be quote/backslash-free (it is embedded in the marker JSON): $corpus")
    val staging = new Path(dir, s"_staging/v$v-${java.util.UUID.randomUUID()}")
    sk.write.mode("overwrite").parquet(s"$staging/sketches")
    val nd = spark.read.parquet(s"$staging/sketches").count()
    val out = fs(spark, dir).create(new Path(staging, Marker), false)
    try out.write(s"""{"kind":"$kind","nd":$nd,"corpus":"$corpus"}""".getBytes("UTF-8"))
    finally out.close()
    staging
  }

  /** Parse a STAGED (not yet committed) marker — exact-equality checks in
    * append/compact read through this, never substring probes.
    */
  private def stagedMeta(f: FileSystem, staging: Path): Meta =
    parseMarker(readBody(f, new Path(staging, Marker))).getOrElse(
      throw new IllegalStateException(s"staged marker at $staging unreadable"))

  private def commit(spark: SparkSession, dir: String, staging: Path, v: Long): Unit =
    CasProtocol.claim(
      spark, dir, staging, new Path(versionPath(dir, v)), v, commitLock,
      () => readMetaUncached(fs(spark, dir), dir, v).isDefined, "sketch ledger update")

  /** Quiesced-writers crash-debris cleanup — [[CasProtocol.repair]]. */
  def repair(spark: SparkSession, dir: String): Seq[String] = {
    invalidateMetaCache(dir)
    CasProtocol.repair(spark, dir, v => readMetaUncached(fs(spark, dir), dir, v).isDefined)
  }

  private def stats(spark: SparkSession, dir: String, v: Long): HllStoreStats = {
    val f = fs(spark, dir)
    val m = readMeta(f, dir, v).get
    val total = readChain(spark, dir).map(cv => readMeta(f, dir, cv).get.nd).sum
    HllStoreStats(v, m.kind, m.nd, total)
  }

  /** The corpus tag the ledger at `dir` was built from. */
  def corpus(spark: SparkSession, dir: String): String = {
    val chain = readChain(spark, dir)
    readMeta(fs(spark, dir), dir, chain.head).get.corpus
  }

  /** Build v=1 from an events frame. Fails if already initialized.
    * `corpus` names the event corpus (e.g. the source dir) — recorded in
    * the marker and enforced on provenance-checked reads and appends.
    */
  def init(
      spark: SparkSession, dir: String, events: DataFrame, corpus: String): HllStoreStats = {
    invalidateMetaCache(dir)
    require(currentVersion(spark, dir).isEmpty, s"HLL store at $dir already initialized")
    commit(spark, dir, stage(spark, dir, 1L, "base", daySketches(events), corpus), 1L)
    stats(spark, dir, 1L)
  }

  /** Append a batch of complete NEW days: days already in the ledger are
    * frozen and anti-join away (idempotent re-send); an empty remainder
    * publishes nothing. The batch must carry the ledger's corpus tag —
    * mixing corpora in one ledger is refused, not averaged.
    */
  def append(
      spark: SparkSession, dir: String, events: DataFrame, corpus: String): HllStoreStats = {
    val cur = currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no HLL store at $dir — init first"))
    val have = this.corpus(spark, dir)
    require(have == corpus,
      s"HLL ledger at $dir holds corpus '$have'; refusing to append batch tagged '$corpus'")
    val fresh = daySketches(events)
      .join(sketches(spark, dir).select(col("day")), Seq("day"), "left_anti")
    val staging = stage(spark, dir, cur + 1, "delta", fresh, corpus)
    val f = fs(spark, dir)
    if (stagedMeta(f, staging).nd == 0L) {
      f.delete(staging, true)
      stats(spark, dir, cur)
    } else {
      commit(spark, dir, staging, cur + 1)
      stats(spark, dir, cur + 1)
    }
  }

  /** Fold the chain into one base, proving the day set unchanged before
    * anything publishes.
    */
  def compact(spark: SparkSession, dir: String): HllStoreStats = {
    val cur = currentVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no HLL store at $dir"))
    if (readChain(spark, dir).size <= 1) return stats(spark, dir, cur)
    val before = stats(spark, dir, cur)
    val staging =
      stage(spark, dir, cur + 1, "base", sketches(spark, dir), corpus(spark, dir))
    val f = fs(spark, dir)
    // exact day-count equality via the shared marker grammar — the r16
    // substring probe false-passed whenever the staged count had the
    // expected count as a decimal prefix (5 matched 55)
    val stagedDays = stagedMeta(f, staging).nd
    if (stagedDays != before.totalDays) {
      f.delete(staging, true)
      throw new IllegalStateException(
        s"compaction would CHANGE the ledger view (expected ${before.totalDays} days, " +
          s"staged $stagedDays) — aborted")
    }
    commit(spark, dir, staging, cur + 1)
    stats(spark, dir, cur + 1)
  }
}
