package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent corpus count store — the precomputed keyed count tables the
  * frequency/collocation/leakage consumers otherwise re-derive from the
  * corpus in-query (the one corpus-scale shuffle every one of them pays).
  * A real lake computes each table ONCE per ingested batch and maintains
  * it; with the store, a consumer reads a vocab-scale relation and never
  * touches the token stream.
  *
  * One count-merge LSM mechanism, four FAMILIES (the keyed table the
  * store maintains, pinned in the v=1 marker exactly like DedupIndex's
  * band count — an append can never silently mix families):
  *   - [[Unigram]]  (token, n): q76/q121/q130/q136's frequency table.
  *   - [[Bigram]]   (w1, w2, n): q77/q97/q139/q151/q159's adjacent-pair table.
  *   - [[WindowSrc]] (wh, source, n): per K-token window hash and source,
  *     the distinct documents carrying it — the train/corpus window stats
  *     q120/q122/q143/q146 probe (K pinned in the family name).
  *   - [[WindowDoc]] (wh, source, doc_id, n): the finest window relation
  *     (per-document occurrence counts) — serves q113's occurrence-
  *     weighted audit directly, serves every WindowSrc consumer through a
  *     group-size rollup, and projects frozen-slice WindowSrc stores
  *     without a corpus re-explode ([[initWinSrcProjection]]).
  *
  * Same LSM/CAS discipline as [[DedupIndex]]/[[IvfIndex]], but with
  * COUNT-MERGE semantics instead of set-union: counts are additive, so an
  * append commits the arriving batch's OWN count table verbatim as a
  * delta — no anti-join probe of the base at all, cost is purely
  * ∝ |batch| — and the read view is `groupBy(keys).sum` over the
  * base+delta chain. Compaction folds the chain back into one base; the
  * additive invariant (total occurrences are merge-invariant) is checked
  * from the staged manifest before anything publishes, CatalogStore's
  * rule. Every publish rides the same stage → read-back manifest → atomic
  * no-overwrite rename CAS; of two racing writers exactly one wins and
  * the loser fails loudly with nothing written.
  *
  * Semantics contract: the store tracks the ACCEPTED ingest stream —
  * appending the same documents twice doubles their counts, exactly as
  * re-ingesting them into the corpus would; dedup belongs upstream
  * (q107 / [[DedupIndex]]). That contract is also what makes the
  * WindowSrc family's per-(wh, source) doc counts and the `nd` doc
  * totals exact: each document arrives once, so per-batch distinct-doc
  * counts sum to the global distinct count.
  *
  * Reference anchor: geostore stores per-file metadata at import time
  * (`check_files_checksums` reads precomputed multihashes) instead of
  * re-deriving it per query — this is that discipline applied to the
  * corpus count tables.
  */
object FreqStore {

  /** A count family: which keyed count table the store maintains. The
    * `derive` is byte-for-byte the fragment its consumers build in-query
    * (same tokenizer split, same guards), so store-backed ≡ derived is a
    * join-key identity, not an approximation.
    */
  sealed trait Family {
    def name: String
    def keyCols: Seq[String]
    /** The pre-aggregation occurrence relation: doc_id + the family's key
      * columns, one row per counted occurrence. init/append persist it
      * ONCE so the count table and the `nd` doc count (distinct
      * contributing docs — [[totalDocs]] sums it; WindowSrc consumers
      * need it exact) both come from a single corpus pass.
      */
    def rows(docs: DataFrame): DataFrame
    /** The (keys..., n) count table over [[rows]]. */
    def aggregate(pos: DataFrame): DataFrame
    /** One-shot convenience (two passes); the store itself goes through
      * rows→persist→aggregate instead.
      */
    final def derive(docs: DataFrame): DataFrame = aggregate(rows(docs))
  }

  /** (token, n) unigram occurrences — the q76-family aggregate (same
    * space split, same empty-token filter).
    */
  case object Unigram extends Family {
    val name = "unigram"
    val keyCols = Seq("token")
    def rows(docs: DataFrame): DataFrame =
      docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
    def aggregate(pos: DataFrame): DataFrame =
      pos.groupBy(col("token")).agg(count(lit(1)).as("n"))
  }

  /** (w1, w2, n) adjacent word-pair occurrences — q77/q97/q139/q151/q159's pair
    * table verbatim: ≥2-words guard (Spark's sequence(1, 0) descends),
    * pairs over the RAW word array, empty-member pairs dropped after.
    */
  case object Bigram extends Family {
    val name = "bigram"
    val keyCols = Seq("w1", "w2")
    def rows(docs: DataFrame): DataFrame =
      docs
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 2)
        .select(
          col("doc_id"),
          explode(
            expr(
              """transform(sequence(1, size(words) - 1),
                |  i -> struct(element_at(words, i) AS w1, element_at(words, i + 1) AS w2))"""
                .stripMargin)).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
    def aggregate(pos: DataFrame): DataFrame =
      pos.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
  }

  /** (wh, source, n) — per K-token window hash (q113's kernel, K pinned
    * in the family name) and source, the DISTINCT documents carrying it
    * within the batch; cross-batch sums are exact distinct-doc counts
    * under the ingest-once contract. Σn over sources per wh is the train
    * document frequency q146 weights by; the key set per wh is the
    * source-membership set q122/q143 collect; distinct wh is the window
    * set q120 probes.
    */
  final case class WindowSrc(k: Int) extends Family {
    require(k >= 2 && k <= 64, s"windowK out of range: $k")
    val name = s"winsrc:$k"
    val keyCols = Seq("wh", "source")
    def rows(docs: DataFrame): DataFrame =
      docs
        .select(
          col("doc_id"), col("source"),
          explode(graft.operators.Dedup.windowHashes(k)).as("wh"))
    def aggregate(pos: DataFrame): DataFrame =
      pos.groupBy(col("wh"), col("source"))
        .agg(countDistinct(col("doc_id")).as("n"))
  }

  /** (wh, source, doc_id, n) — the FINEST window relation: per K-token
    * window hash, source, and document, the occurrence count within the
    * document. Strictly finer than [[WindowSrc]]: doc_id is a key here,
    * so WindowSrc's per-(wh, source) distinct-doc count is simply the
    * GROUP SIZE of this relation — [[initWinSrcProjection]] materializes
    * that rollup (optionally doc-filtered, e.g. the frozen-train slice)
    * without re-exploding any corpus. It is also the only family that
    * can serve q113's repeated-substring audit, which needs occurrence
    * counts AND doc attribution, not doc counts.
    *
    * The trade: WindowDoc storage is token-scale (≈ one row per distinct
    * (wh, doc)) where WindowSrc is window-vocabulary-scale. A lake
    * maintains either the compact per-consumer rollups, or this one
    * finer store plus projected rollups where consumers need repeated
    * vocab-scale reads.
    */
  final case class WindowDoc(k: Int) extends Family {
    require(k >= 2 && k <= 64, s"windowK out of range: $k")
    val name = s"windoc:$k"
    val keyCols = Seq("wh", "source", "doc_id")
    def rows(docs: DataFrame): DataFrame =
      docs
        .select(
          col("doc_id"), col("source"),
          explode(graft.operators.Dedup.windowHashes(k)).as("wh"))
    def aggregate(pos: DataFrame): DataFrame =
      pos.groupBy(col("wh"), col("source"), col("doc_id"))
        .agg(count(lit(1)).as("n"))
  }

  private def familyOf(name: String): Family = name match {
    case "unigram"                    => Unigram
    case "bigram"                     => Bigram
    case s if s.startsWith("winsrc:") => WindowSrc(s.stripPrefix("winsrc:").toInt)
    case s if s.startsWith("windoc:") => WindowDoc(s.stripPrefix("windoc:").toInt)
    case other => throw new IllegalStateException(s"unknown FreqStore family: $other")
  }

  final case class FreqStats(
      version: Long, kind: String, family: String,
      newTokens: Long, newVocab: Long, newDocs: Long,
      totalTokens: Long, totalDocs: Long)

  private val Marker = "_COMMITTED"
  // Committed markers are IMMUTABLE (versions are never rewritten, only
  // created or deleted whole, and no code path queries a deleted version
  // — every consumer iterates a fresh directory listing first), so
  // successful marker reads memoize forever. Without this, every
  // append/read re-fetches O(chain) marker files per operation — real
  // round-trips on an object store.
  // SCOPE OF THE ASSUMPTION (read APIs inherit it): the cache is per-JVM
  // and invalidated only by THIS JVM's init/gc/repair — if another
  // process deletes and re-initializes the store at the same path, reads
  // here can serve the previous incarnation's Meta for reused version
  // numbers. That is the documented single-writer / no-out-of-band-
  // deletion contract; the COMMIT predicate always re-reads uncached, so
  // publishes are safe regardless. A caller that must observe a foreign
  // re-init should route it through this JVM's init/repair.
  private val metaCache = new java.util.concurrent.ConcurrentHashMap[String, Meta]()
  private val commitLock = new Object

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionPath(dir: String, v: Long) = s"$dir/v=$v"

  private final case class Meta(
      kind: String, family: String, nt: Long, nv: Long, nd: Long, tag: Option[String])

  private val MetaRe =
    ("""\{"kind":"(base|delta)","family":"([a-z0-9:]+)","nt":(\d+),"nv":(\d+),"nd":(\d+)""" +
      """(?:,"tag":"([^"]*)")?\}""").r
  // Pre-family marker format (the store's original unigram-only era:
  // {"kind","nt","nv"}). Accepted on READ so an existing store doesn't
  // silently vanish — and, fatally, get its committed versions reaped by
  // repair() as "debris" — after the format gained family/nd. A legacy
  // marker pins family=unigram (the only family that era could hold) and
  // an UNKNOWN doc count ([[NdUnknown]]): reads work, doc-count APIs and
  // mutations fail loudly instead of silently summing a wrong nd.
  private val LegacyMetaRe =
    ("""\{"kind":"(base|delta)","nt":(\d+),"nv":(\d+)""" +
      """(?:,"tag":"([^"]*)")?\}""").r
  private val NdUnknown = -1L

  // drop every cached marker under `dir` — init/gc/repair call this so a
  // deleted-and-recreated store (or reclaimed versions) can never be
  // served from a previous incarnation's metadata
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
    val in = f.open(p)
    val body =
      try new String(
        Iterator.continually(in.read()).takeWhile(_ != -1).map(_.toByte).toArray, "UTF-8")
      finally in.close()
    body.trim match {
      case MetaRe(kind, fam, nt, nv, nd, tag) =>
        Some(Meta(kind, fam, nt.toLong, nv.toLong, nd.toLong, Option(tag)))
      case LegacyMetaRe(kind, nt, nv, tag) =>
        Some(Meta(kind, "unigram", nt.toLong, nv.toLong, NdUnknown, Option(tag)))
      case _ =>
        // present-but-unparseable is CORRUPTION OR MIGRATION, never
        // absence: treating it as uncommitted hides the version from
        // listVersions and turns repair() into a committed-data reaper
        throw new IllegalStateException(
          s"committed marker at $p is unreadable — store format migrated or marker " +
            "corrupt; refusing to treat the version as uncommitted (repair would reap " +
            "committed data). Restore the marker or rebuild the store at a fresh path.")
    }
  }

  /** Committed versions ascending — marker presence IS publication. */
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

  /** The family this store was built at (pinned at init). */
  def storeFamily(spark: SparkSession, dir: String): Family = {
    val f = fs(spark, dir)
    familyOf(readMeta(f, dir, listVersions(spark, dir).headOption.getOrElse(
      throw new IllegalStateException(s"no count store at $dir"))).get.family)
  }

  private def readChain(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val vs = listVersions(spark, dir)
    require(vs.nonEmpty, s"no count store at $dir")
    val lastBase = vs.filter(v => readMeta(f, dir, v).get.kind == "base").lastOption
    vs.filter(v => lastBase.forall(v >= _))
  }

  /** The current merged count view (columns = family keys + `n`) — the
    * base+delta chain count-merged. One vocab-scale aggregate over at
    * most |chain| stored relations; compact to keep |chain| small.
    */
  def counts(spark: SparkSession, dir: String): DataFrame =
    rawCounts(spark, dir)
      .groupBy(storeFamily(spark, dir).keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** The UN-merged chain rows (same columns as [[counts]], but a key may
    * appear once per chain version). For a consumer whose downstream
    * aggregates are all ADDITIVE in `n` or distinct-based over key
    * columns — q113's Σn totals and countDistinct doc attribution — this
    * is sufficient and skips the merge shuffle entirely; a plan that
    * consumes the relation in several branches would otherwise pay the
    * full key-wide merge aggregate once PER BRANCH (subtree differences
    * from join-key null filters defeat AQE exchange reuse). Anything
    * keyed on per-key totals (thresholds, group sizes) must use
    * [[counts]].
    */
  def rawCounts(spark: SparkSession, dir: String): DataFrame =
    readChain(spark, dir)
      .map(v => spark.read.parquet(s"${versionPath(dir, v)}/freq"))
      .reduce(_.unionByName(_))

  /** The unigram view (`token`, `n`) — fails loudly on a non-unigram
    * store instead of serving a foreign count family.
    */
  def frequencies(spark: SparkSession, dir: String): DataFrame = {
    val fam = storeFamily(spark, dir)
    require(fam == Unigram,
      s"count store at $dir holds family '${fam.name}', not unigram — wrong store")
    counts(spark, dir)
  }

  /** Total distinct contributing documents across the chain (Σ marker
    * `nd`) — exact under the ingest-once contract; q146's n_train.
    */
  def totalDocs(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val nds = readChain(spark, dir).map(v => readMeta(f, dir, v).get.nd)
    require(nds.forall(_ != NdUnknown),
      s"count store at $dir has legacy (pre-family) markers with no doc counts — " +
        "totalDocs would be wrong; rebuild the store at a fresh path")
    nds.sum
  }

  /** Mutations and doc-count stats need every marker's `nd`; a legacy
    * (pre-family) chain serves reads only — appending to it would poison
    * every later total with the unknown sentinel.
    */
  // takes the caller's already-listed versions — a fresh listVersions
  // here would add one directory-LIST round-trip per mutation on an
  // object store just to re-derive what the caller fetched (the meta
  // reads themselves are memoized, so they cost nothing)
  private def requireModern(spark: SparkSession, dir: String, vs: Seq[Long]): Unit = {
    val f = fs(spark, dir)
    require(
      vs.forall(v => readMeta(f, dir, v).get.nd != NdUnknown),
      s"count store at $dir has legacy (pre-family) markers — read-only; " +
        "rebuild the store at a fresh path to mutate it")
  }

  // the tag lands verbatim in the marker JSON: restrict it to a
  // quote/backslash-free charset or the committed marker would be
  // unparseable — the version would vanish from listVersions and
  // repair() would reap committed data as debris
  private[graft] def requireValidTag(tg: String): Unit =
    require(tg.nonEmpty && tg.length <= 128 && tg.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || "._:-".contains(c)),
      s"append tag must be 1..128 chars of [A-Za-z0-9._:-]: '$tg'")

  /** Whether any committed version carries `tg` — the batch-replay
    * idempotence probe shared by [[append]] and
    * [[appendWinSrcProjection]] (a marker scan; metas are memoized).
    */
  private def tagApplied(spark: SparkSession, dir: String, tg: String): Boolean = {
    val f = fs(spark, dir)
    listVersions(spark, dir).exists(v => readMeta(f, dir, v).get.tag.contains(tg))
  }

  private def stage(
      spark: SparkSession, dir: String, v: Long, kind: String, fam: Family,
      freq: DataFrame, nd: Long, tag: Option[String] = None): Path = {
    val staging = new Path(dir, s"_staging/v$v-${java.util.UUID.randomUUID()}")
    freq.write.mode("overwrite").parquet(s"$staging/freq")
    // manifest read BACK from the staged files — certifying what landed
    val staged = spark.read.parquet(s"$staging/freq")
    val row = staged.agg(
      coalesce(sum(col("n")), lit(0L)).as("nt"), count(lit(1)).as("nv")).head()
    val (nt, nv) = (row.getLong(0), row.getLong(1))
    val out = fs(spark, dir).create(new Path(staging, Marker), false)
    val tagField = tag.map(t => s""","tag":"$t"""").getOrElse("")
    try out.write(
      s"""{"kind":"$kind","family":"${fam.name}","nt":$nt,"nv":$nv,"nd":$nd$tagField}"""
        .getBytes("UTF-8"))
    finally out.close()
    staging
  }

  private def stagedMeta(spark: SparkSession, dir: String, staging: Path): Meta = {
    val in = fs(spark, dir).open(new Path(staging, Marker))
    val body =
      try new String(
        Iterator.continually(in.read()).takeWhile(_ != -1).map(_.toByte).toArray, "UTF-8")
      finally in.close()
    body.trim match {
      case MetaRe(kind, fam, nt, nv, nd, tag) =>
        Meta(kind, fam, nt.toLong, nv.toLong, nd.toLong, Option(tag))
      case other => throw new IllegalStateException(s"unreadable staged marker: $other")
    }
  }

  // CAS claim + debris repair: the shared protocol ([[CasProtocol]] —
  // one implementation of the no-overwrite claim and its TOCTOU-safe
  // failure handling for all four versioned stores)
  private def commit(spark: SparkSession, dir: String, staging: Path, v: Long): Unit =
    CasProtocol.claim(
      spark, dir, staging, new Path(versionPath(dir, v)), v, commitLock,
      // the claim predicate must RE-READ the marker (CasProtocol's
      // contract) — the memoized readMeta would serve a stale positive
      // after an out-of-band store deletion at the same path
      () => readMetaUncached(fs(spark, dir), dir, v).isDefined, "count update")

  /** Quiesced-writers crash-debris cleanup — [[CasProtocol.repair]]. */
  def repair(spark: SparkSession, dir: String): Seq[String] = {
    invalidateMetaCache(dir)
    CasProtocol.repair(spark, dir, v => readMetaUncached(fs(spark, dir), dir, v).isDefined)
  }

  private def stats(spark: SparkSession, dir: String, v: Long): FreqStats = {
    val f = fs(spark, dir)
    val m = readMeta(f, dir, v).get
    val chain = readChain(spark, dir)
    val totalN = chain.map(cv => readMeta(f, dir, cv).get.nt).sum
    val totalD = chain.map(cv => readMeta(f, dir, cv).get.nd).sum
    FreqStats(v, m.kind, m.family, m.nt, m.nv, m.nd, totalN, totalD)
  }

  /** Build v=1 (a base) from the curated corpus. Fails if initialized. */
  // one corpus pass per publish: the family's occurrence relation is
  // persisted so the count table and the nd doc count both read it
  private def stageOnePass(
      spark: SparkSession, dir: String, v: Long, kind: String, fam: Family,
      docs: DataFrame, tag: Option[String]): (Path, Long) = {
    val pos = fam.rows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nd = pos.agg(countDistinct(col("doc_id"))).head().getLong(0)
      (stage(spark, dir, v, kind, fam, fam.aggregate(pos), nd, tag), nd)
    } finally pos.unpersist()
  }

  def init(
      spark: SparkSession, dir: String, docs: DataFrame,
      family: Family = Unigram): FreqStats = {
    invalidateMetaCache(dir)
    require(currentVersion(spark, dir).isEmpty, s"count store at $dir already initialized")
    val (staging, _) = stageOnePass(spark, dir, 1L, "base", family, docs, None)
    commit(spark, dir, staging, 1L)
    stats(spark, dir, 1L)
  }

  /** Materialize a [[WindowSrc]] store as a PROJECTION of a committed
    * [[WindowDoc]] store's current view, optionally doc-filtered (e.g.
    * [[graft.operators.Dedup.leakTrainSlice]] for the frozen-train leak
    * store). Because doc_id is a key of the finer relation, the
    * per-(wh, source) distinct-doc count is the group SIZE — one
    * store-scale aggregate, no corpus re-explode; `nd` (the doc total
    * q146's n_train reads from markers) is the filtered view's distinct
    * doc count. The projection is a snapshot of the source store's
    * current chain; it stays maintainable afterwards through ordinary
    * [[append]]s of (sliced) batches, exactly like an init-from-docs
    * store — BuildStoresSpec pins projection ≡ from-docs equivalence.
    */
  def initWinSrcProjection(
      spark: SparkSession, dir: String, windocDir: String,
      docFilter: DataFrame => DataFrame = identity): FreqStats = {
    invalidateMetaCache(dir)
    require(currentVersion(spark, dir).isEmpty, s"count store at $dir already initialized")
    val k = storeFamily(spark, windocDir) match {
      case WindowDoc(wk) => wk
      case other => throw new IllegalArgumentException(
        s"projection source at $windocDir holds family '${other.name}', not windoc")
    }
    val rel = docFilter(counts(spark, windocDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nd = rel.agg(countDistinct(col("doc_id"))).head().getLong(0)
      val proj = rel.groupBy(col("wh"), col("source")).agg(count(lit(1)).as("n"))
      val staging = stage(spark, dir, 1L, "base", WindowSrc(k), proj, nd)
      commit(spark, dir, staging, 1L)
      stats(spark, dir, 1L)
    } finally rel.unpersist()
  }

  /** Incremental projection maintenance — [[initWinSrcProjection]]'s
    * per-batch analog: append to a [[WindowSrc]] projection store the
    * rollup of its SOURCE [[WindowDoc]] store's version tagged `tag`
    * (the batch an ingest pipeline just appended there), doc-filtered
    * the same way the projection was built. The batch's window explode
    * already happened once, in the source append — this reads the
    * committed delta back (batch-token-scale rows, no corpus touch) and
    * pays one batch-scale rollup, so maintaining windoc + its train
    * projection costs ONE explode per batch, not two.
    *
    * Idempotence: if THIS store already carries `tag`, no-op (the
    * replay contract [[append]] documents). If the SOURCE has no
    * version with `tag`, the source append was itself a no-op (a
    * window-less batch — the filtered slice is a subset, so there is
    * nothing to project) and nothing publishes. That no-op is
    * indistinguishable from a tagged source version a too-eager [[gc]]
    * already dropped — which is why gc's contract forbids running it
    * between a batch's source append and its projection append and
    * requires `keepHistory >= 1` on a projection source.
    */
  def appendWinSrcProjection(
      spark: SparkSession, dir: String, windocDir: String, tag: String,
      docFilter: DataFrame => DataFrame = identity): FreqStats = {
    requireValidTag(tag)
    val allVs = listVersions(spark, dir)
    val cur = allVs.lastOption.getOrElse(
      throw new IllegalStateException(s"no count store at $dir — init first"))
    requireModern(spark, dir, allVs)
    val k = storeFamily(spark, dir) match {
      case WindowSrc(wk) => wk
      case other => throw new IllegalArgumentException(
        s"projection target at $dir holds family '${other.name}', not winsrc")
    }
    storeFamily(spark, windocDir) match {
      case WindowDoc(wk) => require(wk == k,
        s"projection source at $windocDir was built at windowK=$wk, target pins $k — rebuild")
      case other => throw new IllegalArgumentException(
        s"projection source at $windocDir holds family '${other.name}', not windoc")
    }
    if (tagApplied(spark, dir, tag)) return stats(spark, dir, cur)
    val fSrc = fs(spark, windocDir)
    listVersions(spark, windocDir)
      .find(v => readMeta(fSrc, windocDir, v).get.tag.contains(tag)) match {
      case None => stats(spark, dir, cur)
      case Some(srcV) =>
        val delta = docFilter(spark.read.parquet(s"${versionPath(windocDir, srcV)}/freq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nd = delta.agg(countDistinct(col("doc_id"))).head().getLong(0)
          // doc_id is a key of the finer relation, so the per-(wh,
          // source) distinct-doc count is the group SIZE — same rollup
          // as the init-time projection
          val proj = delta.groupBy(col("wh"), col("source")).agg(count(lit(1)).as("n"))
          val staging = stage(spark, dir, cur + 1, "delta", WindowSrc(k), proj, nd, Some(tag))
          if (stagedMeta(spark, dir, staging).nt == 0L) {
            fs(spark, dir).delete(staging, true)
            stats(spark, dir, cur)
          } else {
            commit(spark, dir, staging, cur + 1)
            stats(spark, dir, cur + 1)
          }
        } finally delta.unpersist()
    }
  }

  /** Incremental maintenance: commit the arriving batch's own count
    * table as a delta. Counts merge additively on read, so no probe of
    * the base happens at all — cost is purely ∝ |batch|. A batch with no
    * counted rows is a no-op (no version published).
    */
  def append(
      spark: SparkSession, dir: String, batch: DataFrame,
      tag: Option[String] = None): FreqStats = {
    val allVs = listVersions(spark, dir)
    val cur = allVs.lastOption.getOrElse(
      throw new IllegalStateException(s"no count store at $dir — init first"))
    requireModern(spark, dir, allVs)
    // Exactly-once under batch REPLAY (count-merge is NOT naturally
    // idempotent the way DedupIndex's set-union is): a caller that tags
    // each append with its batch id makes the tag the idempotence key —
    // an already-committed tag means this exact batch's counts are
    // already in the chain, so the replay is a no-op.
    tag.foreach { tg =>
      requireValidTag(tg)
      if (tagApplied(spark, dir, tg)) return stats(spark, dir, cur)
    }
    val fam = storeFamily(spark, dir)
    val (staging, _) = stageOnePass(spark, dir, cur + 1, "delta", fam, batch, tag)
    if (stagedMeta(spark, dir, staging).nt == 0L) {
      fs(spark, dir).delete(staging, true) // nothing new: no version
      stats(spark, dir, cur)
    } else {
      commit(spark, dir, staging, cur + 1)
      stats(spark, dir, cur + 1)
    }
  }

  /** Maintenance policy: fold the chain once it exceeds `maxChain`
    * versions — what ingest applies after appends so read fan-in stays
    * bounded as batches accumulate (an unbounded delta chain turns every
    * read into a |batches|-way union at 100 TB). Content-preserving by
    * compact's invariant; safe under crash-replay (a replayed compact of
    * an already-short chain is a no-op).
    */
  def compactIfNeeded(spark: SparkSession, dir: String, maxChain: Int = 8): FreqStats = {
    require(maxChain >= 2, s"maxChain must be >= 2: $maxChain")
    val allVs = listVersions(spark, dir)
    val cur = allVs.lastOption.getOrElse(
      throw new IllegalStateException(s"no count store at $dir"))
    requireModern(spark, dir, allVs)
    if (readChain(spark, dir).size > maxChain) compact(spark, dir)
    else stats(spark, dir, cur)
  }

  /** Drop published versions that are no longer in the read chain
    * (history strictly before the newest base), keeping the most recent
    * `keepHistory` of them for forensics. Never touches the chain, so
    * reads are unaffected; returns the dropped versions. The storage
    * analog of CatalogStore's retention GC.
    *
    * Replay-idempotence caveat: append TAGS live in version markers, so
    * GC'ing a tagged version forgets that its batch was applied. Keep
    * `keepHistory` at least as deep as the ingest replay horizon. For
    * Structured Streaming appends that is ONLY the in-flight batch,
    * whose delta is by definition still in the read chain — so the
    * default is safe for a plain append-maintained store. It is NOT
    * safe for a WindowDoc store that feeds `trainProjections`
    * ([[appendWinSrcProjection]]): the in-flight batch's tagged delta
    * can leave the read chain at the same batch's compactIfNeeded while
    * the projection append is still pending across a crash — gc'ing it
    * then turns the replayed projection into a silent no-op that
    * permanently under-counts the projection store. With projections
    * configured, run gc only between batches (like the reference runs
    * maintenance) and keep `keepHistory >= 1`. An explicit external
    * re-send protocol needs a deeper history still.
    */
  def gc(spark: SparkSession, dir: String, keepHistory: Int = 0): Seq[Long] = {
    require(keepHistory >= 0, s"keepHistory must be >= 0: $keepHistory")
    val f = fs(spark, dir)
    val chain = readChain(spark, dir).toSet
    val doomed = listVersions(spark, dir).filterNot(chain).dropRight(keepHistory)
    doomed.foreach(v => f.delete(new Path(versionPath(dir, v)), true))
    doomed.foreach(v => metaCache.remove(s"$dir|$v"))
    doomed
  }

  /** Fold the base+delta chain into one base version. The additive
    * invariant is checked before publish: total occurrences are
    * merge-invariant, so the staged Σn must equal the chain's manifest
    * sum or nothing publishes. Earlier versions stay readable history.
    */
  def compact(spark: SparkSession, dir: String): FreqStats = {
    val allVs = listVersions(spark, dir)
    val cur = allVs.lastOption.getOrElse(
      throw new IllegalStateException(s"no count store at $dir"))
    requireModern(spark, dir, allVs)
    if (readChain(spark, dir).size <= 1) return stats(spark, dir, cur)
    val fam = storeFamily(spark, dir)
    val before = stats(spark, dir, cur)
    val staging = stage(
      spark, dir, cur + 1, "base", fam, counts(spark, dir), before.totalDocs)
    val staged = stagedMeta(spark, dir, staging)
    if (staged.nt != before.totalTokens) {
      fs(spark, dir).delete(staging, true)
      throw new IllegalStateException(
        s"compaction would CHANGE the view (chain Σn=${before.totalTokens}, " +
          s"staged Σn=${staged.nt}) — aborted")
    }
    commit(spark, dir, staging, cur + 1)
    stats(spark, dir, cur + 1)
  }
}
