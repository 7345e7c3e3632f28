package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.G — Structured Streaming operator semantics, proven on
  * batch plans. The identical transformations run as `readStream` plans in
  * `graft.streaming` (see StreamingSpec): Spark's unified Dataset API means
  * the logical plan here IS the streaming plan minus watermark bookkeeping.
  */
object StreamingOps extends QueryModule {

  /** Tumbling 15-minute window aggregation — the batch twin of
    * `withWatermark("ts","10 minutes").groupBy(window($"ts","15 minutes"))`.
    */
  private def q46(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "15 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n_events"), col("n_users"), col("total_value"))
      .orderBy(col("window_start"))

  /** Sliding (hopping) window aggregation — the OVERLAPPING-window class
    * q46's tumbling windows leave unproven (new r16): per 2-hour window
    * sliding every 30 minutes, event count, distinct users, and
    * e2-quantized total value. Spark's `window(ts, "2 hours", "30
    * minutes")` assigns each event to windowDuration/slideDuration = 4
    * epoch-aligned windows natively (the streaming form is the same plan
    * under a watermark — StreamingSpec drives it on a MemoryStream; state
    * is bounded by watermark + windowDuration exactly as the batch
    * explode is bounded by the factor 4).
    *
    * Numeric discipline: value quantizes half-up to e2 longs PER ROW
    * before the sum (q141's rule — a double Σ's addition order is
    * engine-internal); counts are exact.
    *
    * Scale shape: the window assignment is a map-side 4× explode (a
    * constant factor, not a join); ONE shuffle on the window key carries
    * count + sum, and the distinct-user count rides the same exchange
    * via Spark's Expand rewrite; output is |span|/slide + 3 rows.
    */
  private def q216(t: Tables): DataFrame =
    t.events
      .withColumn("value_e2", expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .groupBy(window(col("ts"), "2 hours", "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value_e2")).as("total_value_e2"))
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n_events"), col("n_users"), col("total_value_e2"))
      .orderBy(col("window_start"))

  /** Streaming dedup (`dropDuplicates` within a watermark) batch twin:
    * keep the earliest event per (user, type, minute) — deterministic
    * keep-first via row_number, exactly what the state store does.
    */
  private def q47(t: Tables): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), col("minute_start"))
      .orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("minute_start", window(col("ts"), "1 minute").getField("start"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
      .orderBy(col("event_type"))
  }

  /** Stream-stream interval join batch twin: purchases attributed to a
    * prior click by the same user within 30 minutes — the
    * `clicks.withWatermark ⋈ purchases.withWatermark ON user AND p.ts
    * BETWEEN c.ts AND c.ts + 30 min` plan (state bounded by the watermark
    * exactly like the range predicate bounds this join). Equi-key user_id
    * carries the shuffle; the time predicate evaluates inside the join, so
    * pair work is per-user-bounded, never cross-user. The streaming form
    * runs in `StreamingSpec` on two MemoryStreams.
    */
  private def q73(t: Tables): DataFrame = {
    val clicks = t.events
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), unix_micros(col("ts")).as("c_us"))
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"),
        col("value"))
    clicks
      .join(
        purchases,
        col("user_id") === col("p_user") &&
          col("p_us") >= col("c_us") &&
          col("p_us") <= col("c_us") + 1800L * 1000000L)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_purchases"),
        round(sum(col("value")), 2).as("attr_value"))
      .orderBy(col("user_id"))
  }

  /** Unattributed-click audit — the batch twin of the stream-stream LEFT
    * OUTER join's null side (new r16; StreamingSpec's "unmatched clicks
    * after watermark eviction" drives the streaming form): q73 counts the
    * attributed pairs, this the clicks with NO same-user purchase in the
    * 30-minute window — the rows the outer join emits with a null right
    * side once the watermark proves none can arrive. Per user: clicks,
    * unattributed clicks, and the e4 unattributed share. Probed: 1983 of
    * 2006 clicks unattributed at sf0.01 — both classes populated.
    *
    * Spark-first the null side IS a left-anti join (same equi-key +
    * range condition, no pair fan-out at all); the per-user rollup left-
    * joins back onto the all-clicks census so a fully-attributed user
    * still reports 0. Equi-key user_id carries both shuffles; pair work
    * is per-user-bounded exactly like q73.
    */
  private def q217(t: Tables): DataFrame = {
    // q153's null scope (r16 review): a null-user click can never match
    // any purchase, so without the filter it would surface as a
    // null-keyed output row whose sort position differs across engines
    val clicks = t.events
      .filter(col("event_type") === "click" && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id").as("click_id"), unix_micros(col("ts")).as("c_us"))
    val purchases = t.events
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"))
    val unattributed = clicks
      .join(
        purchases,
        col("user_id") === col("p_user") &&
          col("p_us") >= col("c_us") &&
          col("p_us") <= col("c_us") + 1800L * 1000000L,
        "left_anti")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_unattributed"))
      .withColumnRenamed("user_id", "u_user")
    clicks
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .join(unattributed, col("user_id") === col("u_user"), "left")
      .select(
        col("user_id"), col("n_clicks"),
        coalesce(col("n_unattributed"), lit(0L)).as("n_unattributed"))
      .withColumn(
        "unattr_e4",
        expr("(2 * 10000 * n_unattributed + n_clicks) DIV (2 * n_clicks)"))
      .orderBy(col("user_id"))
  }

  /** Per-user value high-water marks — the batch twin of the
    * streaming/HighWater `transformWithState` component (new r16; the
    * same pairing Sessionize↔q20 uses): an event is a RECORD when its
    * value strictly exceeds every prior value of that user in (ts,
    * event_id) order — the running-max state the StatefulProcessor
    * keeps as one double per user. Per user: events, records, e4
    * record share, and the e2-quantized final maximum. The prefix
    * maximum is the exact frame `ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING` — value comparisons are raw-double ORDER tests (no
    * arithmetic), deterministic in both engines; only the reported
    * maximum quantizes.
    *
    * Scale shape: ONE user_id shuffle carries the prefix window and the
    * rollup reuses the key; output is |users| rows.
    */
  private def q225(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_max", max(col("value")).over(w))
      .withColumn(
        "is_record",
        when(col("prev_max").isNull || col("value") > col("prev_max"), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("is_record")).as("n_records"),
        expr("CAST(floor(max(value) * 100 + 0.5) AS BIGINT)").as("final_max_e2"))
      .withColumn(
        "record_share_e4",
        expr("(2 * 10000 * n_records + n_events) DIV (2 * n_events)"))
      .select(
        col("user_id"), col("n_events"), col("n_records"),
        col("record_share_e4"), col("final_max_e2"))
      .orderBy(col("user_id"))
  }

  /** Watermark late-data accounting — the batch reconstruction of what a
    * `withWatermark("ts", "10 minutes")` pipeline drops. Micro-batches are
    * hourly windows of arrival time (a map-side bucket — no global
    * ordering anywhere); the watermark before
    * each batch is the running max event time over all PRIOR batches minus
    * the 10-minute delay — exactly Spark's micro-batch watermark rule. The
    * per-batch maxima aggregate narrowly (|batches| rows), the running max
    * is a window over that tiny relation, and the flags broadcast back, so
    * the event stream itself is scanned once and shuffled once into the
    * 15-minute-window rollup.
    */
  private def q83(t: Tables): DataFrame = {
    val DelayUs = 600L * 1000000L
    // the synthetic arrival log: event time plus a deterministic hash
    // jitter of up to ~32 min, so a realistic fraction of events arrives
    // out of order (the raw event_id order is time-sorted — nothing would
    // ever be late). Micro-batches are hourly windows of ARRIVAL time —
    // a pure map-side bucket, no global ordering anywhere, so the batch
    // assignment parallelizes like any other scan work at 100 TB.
    val ev = t.events
      .select(col("event_id"), col("ts"), unix_micros(col("ts")).as("us"))
      // reduce BEFORE multiplying: event_id * bigconstant would overflow
      // Long past ~3.5e9 events (Spark wraps, DuckDB errors); 53 is
      // coprime to 97 so this is still a full permutation of 0..96
      .withColumn("arrival_us", col("us") + expr("((event_id % 97) * 53 + 17) % 97") * 20000000L)
      .withColumn("batch", expr("arrival_us div 3600000000"))
    val batchMax = ev.groupBy(col("batch")).agg(max(col("us")).as("bmax"))
    val wmW = Window.orderBy(col("batch")).rowsBetween(Window.unboundedPreceding, -1)
    val wm = batchMax.withColumn("wm_us", max(col("bmax")).over(wmW) - DelayUs)
    ev.join(broadcast(wm.select(col("batch"), col("wm_us"))), Seq("batch"))
      .withColumn("late", col("wm_us").isNotNull && col("us") < col("wm_us"))
      .groupBy(window(col("ts"), "15 minutes").getField("start").as("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("late").cast("long")).as("n_late"),
        (count(lit(1)) - sum(col("late").cast("long"))).as("n_on_time"))
      .orderBy(col("window_start"))
  }

  /** Native session-window aggregation (r16 wave 3 — Spark's
    * `session_window` state-store operator, the gap-sessionizer q20
    * builds by hand with lag+cumsum and `streaming/Sessionize.scala`
    * builds with flatMapGroupsWithState; this is the declarative form
    * the engine plans natively in BOTH batch and streaming): per user,
    * 4-hour-gap sessions rolled up to session count, events, the
    * largest session, the longest session duration, and total value.
    * The batch twin of `withWatermark("ts", …).groupBy(
    * session_window($"ts", "4 hours"), $"user_id")` — StreamingSpec
    * drives the same plan on a MemoryStream. Gap choice is
    * corpus-probed: median inter-event gap is ~7 h at every SF, so 4 h
    * yields real multi-event sessions (~1.45 events/session), not one
    * session per event.
    *
    * Boundary semantics (both engines): an event extends the session
    * iff its gap from the previous event is STRICTLY under the 4-hour
    * gap (Spark's session end is exclusive); the oracle's cumsum
    * sessionizer opens on gap_us >= 14400·10⁶ over raw microseconds —
    * no calendar truncation anywhere. Durations are integer µs → DIV.
    * Scale shape: one shuffle on user_id carries the session-window
    * agg (state bounded by the watermark in the streaming form); the
    * per-user rollup reuses the same key.
    */
  private def q198(t: Tables): DataFrame =
    t.events
      .filter(col("user_id").isNotNull)
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(
        count(lit(1)).as("n_ev"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"),
        sum(col("value")).as("v"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("max_session_events"),
        expr("max(dur_us) DIV 1000000").as("max_session_dur_s"),
        round(sum(col("v")), 2).as("total_value"))
      .orderBy(col("user_id"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_stream_sessions" -> ((s, d) => q198(Tables(s, d))),
    "q46_stream_tumbling" -> ((s, d) => q46(Tables(s, d))),
    "q216_stream_sliding" -> ((s, d) => q216(Tables(s, d))),
    "q217_unattributed_clicks" -> ((s, d) => q217(Tables(s, d))),
    "q225_high_water" -> ((s, d) => q225(Tables(s, d))),
    "q47_stream_dedup" -> ((s, d) => q47(Tables(s, d))),
    "q73_stream_join" -> ((s, d) => q73(Tables(s, d))),
    "q83_late_data" -> ((s, d) => q83(Tables(s, d)))
  )

  override def oracleSql: Map[String, String] = Map(
    "q198_stream_sessions" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS us, value FROM events
        | WHERE user_id IS NOT NULL),
        | g AS (
        | SELECT user_id, us, value,
        |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |   OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 14400000000
        |   THEN 1 ELSE 0 END AS ns
        | FROM e),
        | s AS (
        | SELECT user_id, us, value,
        |  sum(ns) OVER (PARTITION BY user_id ORDER BY us
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM g),
        | ses AS (
        | SELECT user_id, sid, count(*) AS n_ev,
        |  max(us) - min(us) AS dur_us, sum(value) AS v
        | FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        | CAST(sum(n_ev) AS BIGINT) AS n_events,
        | CAST(max(n_ev) AS BIGINT) AS max_session_events,
        | CAST(max(dur_us) // 1000000 AS BIGINT) AS max_session_dur_s,
        | round(sum(v), 2) AS total_value
        |FROM ses GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q225_high_water" ->
      """WITH e AS (
        | SELECT user_id, value,
        |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        | FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, count(*) AS n_events,
        | CAST(sum(CASE WHEN prev_max IS NULL OR value > prev_max THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_records,
        | CAST((2 * 10000 * sum(CASE WHEN prev_max IS NULL OR value > prev_max
        |   THEN 1 ELSE 0 END) + count(*)) // (2 * count(*)) AS BIGINT) AS record_share_e4,
        | CAST(floor(max(value) * 100 + 0.5) AS BIGINT) AS final_max_e2
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q217_unattributed_clicks" ->
      """WITH c AS (
        | SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        | FROM events WHERE event_type = 'click' AND user_id IS NOT NULL),
        | p AS (
        | SELECT user_id AS p_user, epoch_us(ts) AS p_us
        | FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        | ua AS (
        | SELECT user_id, count(*) AS n_unattributed
        | FROM c WHERE NOT EXISTS (
        |  SELECT 1 FROM p WHERE p_user = c.user_id
        |   AND p_us >= c_us AND p_us <= c_us + 1800 * 1000000)
        | GROUP BY user_id),
        | ac AS (SELECT user_id, count(*) AS n_clicks FROM c GROUP BY user_id)
        |SELECT ac.user_id, n_clicks,
        | CAST(COALESCE(n_unattributed, 0) AS BIGINT) AS n_unattributed,
        | CAST((2 * 10000 * COALESCE(n_unattributed, 0) + n_clicks)
        |  // (2 * n_clicks) AS BIGINT) AS unattr_e4
        |FROM ac LEFT JOIN ua ON ua.user_id = ac.user_id
        |ORDER BY ac.user_id""".stripMargin,
    "q216_stream_sliding" ->
      """WITH x AS (
        | SELECT time_bucket(INTERVAL '30 minutes', ts) - j * INTERVAL '30 minutes' AS ws,
        |  user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_e2
        | FROM events, unnest([0, 1, 2, 3]) AS t(j))
        |SELECT ws AS window_start, ws + INTERVAL '2 hours' AS window_end,
        | count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        | CAST(sum(value_e2) AS BIGINT) AS total_value_e2
        |FROM x GROUP BY 1, 2 ORDER BY window_start""".stripMargin,
    "q46_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
        | count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        | round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start""".stripMargin,
    "q47_stream_dedup" ->
      """WITH d AS (
        | SELECT event_type,
        |  row_number() OVER (PARTITION BY user_id, event_type, time_bucket(INTERVAL '1 minute', ts)
        |                     ORDER BY ts, event_id) AS rn
        | FROM events)
        |SELECT event_type, count(*) AS n_unique FROM d WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q73_stream_join" ->
      """WITH c AS (
        | SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        | FROM events WHERE event_type = 'click'),
        | p AS (
        | SELECT user_id AS p_user, event_id AS purchase_id, epoch_us(ts) AS p_us, value
        | FROM events WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS n_pairs,
        | count(DISTINCT purchase_id) AS n_purchases,
        | round(sum(value), 2) AS attr_value
        |FROM c JOIN p ON user_id = p_user
        | AND p_us >= c_us AND p_us <= c_us + 1800 * 1000000
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q83_late_data" ->
      """WITH ev AS (
        | SELECT event_id, ts, epoch_us(ts) AS us,
        |  (epoch_us(ts) + (((event_id % 97) * 53 + 17) % 97) * 20000000) // 3600000000 AS batch
        | FROM events),
        | bm AS (SELECT batch, max(us) AS bmax FROM ev GROUP BY batch),
        | wm AS (
        | SELECT batch,
        |  max(bmax) OVER (ORDER BY batch ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |   - 600 * 1000000 AS wm_us
        | FROM bm),
        | f AS (
        | SELECT ev.ts, (wm.wm_us IS NOT NULL AND ev.us < wm.wm_us) AS late
        | FROM ev JOIN wm ON ev.batch = wm.batch)
        |SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | count(*) AS n_events,
        | CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        | CAST(count(*) - sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time
        |FROM f GROUP BY 1 ORDER BY window_start""".stripMargin
  )
}
