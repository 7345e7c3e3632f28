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
  * view is materialized ONCE per (application, store) and every branch
  * of every consumer reads the persisted relation instead.
  *
  * Contract: the cache assumes the stores are FROZEN between
  * mutations. [[clear]] is wired into [[Dedup.clearPairCache]] (the
  * specs' session reset) AND into ImportPipeline's MAINTAIN step, so
  * the one legitimate in-session store mutator invalidates the views
  * after every accepted batch — a session that both ingests and audits
  * never serves a pre-batch view. Conf off → every call derives fresh,
  * nothing is cached — the correctness gate's path.
  */
private[graft] object StoreViews {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def cacheOn(spark: SparkSession): Boolean =
    spark.conf.get("graft.lsh.cache", "false").toBoolean

  /** `build`'s result, persisted and memoized per (application, key)
    * when the session-artifact gate is on; derived fresh when off.
    */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    if (!cacheOn(spark)) build
    else cache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$key",
      _ => build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The store's merged count view ([[graft.sources.FreqStore.counts]]),
    * session-cached.
    */
  def counts(spark: SparkSession, dir: String): DataFrame =
    cached(spark, s"counts|$dir")(graft.sources.FreqStore.counts(spark, dir))

  /** Unpersist and forget every cached view — required when turning the
    * gate off mid-session (persist registers the fragment in Spark's
    * CacheManager, so even conf-off runs would silently read it) or
    * after mutating a store.
    */
  def clear(): Unit = {
    cache.forEach((_, df) => { df.unpersist(); () })
    cache.clear()
  }
}
