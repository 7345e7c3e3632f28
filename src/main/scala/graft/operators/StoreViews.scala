package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-cached reads of the persistent count stores.
  *
  * Every store consumer reads `FreqStore.counts` — the chain count-merge
  * — and most consume it in SEVERAL plan branches (q139 reads the pair
  * table four ways: support-filtered pairs, both marginals, the scalar
  * total). Column pruning and join-key null filters make those subtrees
  * differ, so AQE exchange reuse does NOT collapse them: each branch
  * pays its own vocab-scale merge shuffle, and every query pays them
  * again. Under the session-artifact gate (`graft.lsh.cache` — the same
  * conf that shares the LSH pair relation and the eval window stream,
  * i.e. "this session is a maintained-lake audit session") the merged
  * view is materialized ONCE per (application, store, VERSION) and every
  * branch of every consumer reads the persisted relation instead.
  *
  * Staleness contract (r15): cache keys carry the store's latest
  * COMMITTED version, observed from the marker listing at each view
  * access — so an append from ANOTHER process invalidates automatically:
  * the next access observes the new version, derives a fresh view, and
  * evicts the superseded one from executor memory. In-JVM mutators keep
  * their eager invalidation ([[clear]] is wired into
  * `Dedup.clearPairCache` and ImportPipeline's MAINTAIN step) — that
  * path also drops the DERIVED session relations (LSH pairs, eval
  * windows), which no store version key can cover. One observation per
  * access = one metadata listing; all branches of a query share the one
  * DataFrame that access returned, so a query never reads two versions.
  * Conf off → every call derives fresh, nothing is cached — the
  * correctness gate's path.
  */
private[graft] object StoreViews {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cacheOn(spark: SparkSession): Boolean =
    spark.conf.get("graft.lsh.cache", "false").toBoolean

  /** `build`'s result, persisted and memoized per (application, tag,
    * store dir, latest committed version) when the session-artifact gate
    * is on; derived fresh when off. Superseded-version entries for the
    * same (tag, dir) are unpersisted on observation — a cross-JVM append
    * must not strand the old view in executor memory.
    */
  def cachedForStore(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    if (!cacheOn(spark)) build
    else {
      val v = graft.sources.FreqStore.currentVersion(spark, dir).getOrElse(0L)
      val prefix = s"${spark.sparkContext.applicationId}|$tag|$dir|"
      val key = s"${prefix}v=$v"
      cache.forEach { (k, df) =>
        if (k.startsWith(prefix) && k != key) {
          cache.remove(k)
          df.unpersist()
          ()
        }
      }
      cache.computeIfAbsent(
        key, _ => build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** The store's merged count view ([[graft.sources.FreqStore.counts]]),
    * session-cached per committed version.
    */
  def counts(spark: SparkSession, dir: String): DataFrame =
    cachedForStore(spark, dir, "counts")(graft.sources.FreqStore.counts(spark, dir))

  /** Unpersist and forget every cached view — required when turning the
    * gate off mid-session (persist registers the fragment in Spark's
    * CacheManager, so even conf-off runs would silently read it). After
    * an IN-JVM store mutation this is eager hygiene; cross-JVM appends
    * are covered by the version key alone.
    */
  def clear(): Unit = {
    cache.forEach((_, df) => { df.unpersist(); () })
    cache.clear()
  }
}
