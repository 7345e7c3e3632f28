package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.B — the linz/geostore data-lake semantics, Spark-first.
  *
  * Mapping (SURVEY §4): `documents.source` ≡ dataset id, documents ≡ the
  * dataset's assets, `events` ≡ the version/status log. Each operator cites
  * the reference module whose behavior it re-expresses.
  */
object Lake extends QueryModule {

  private def ts(s: String) = to_timestamp(lit(s))

  /** Dataset catalog listing w/ stats — reference `datasets/list.py` +
    * `datasets_model.py` (title-indexed scan). A pure partial-agg groupBy:
    * shuffles |datasets| rows, never the asset rows.
    */
  private def q21(t: Tables): DataFrame =
    t.documents
      .groupBy(col("source").as("dataset_id"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_chars")).as("total_bytes"),
        min(col("doc_id")).as("first_asset"),
        max(col("doc_id")).as("last_asset"))
      .orderBy(col("dataset_id"))

  /** `current_dataset_version` pointer — reference
    * `dataset_versions/create.py:datasets_model` (latest ULID wins). ULID
    * time-ordering ≡ (ts, event_id) ordering here; argmax via row_number
    * so ties resolve deterministically.
    */
  private def q22(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id").as("dataset_id"),
        col("event_id").as("current_version"),
        unix_micros(col("ts")).as("created_us"))
      .orderBy(col("dataset_id"))
  }

  /** Multihash checksum verification — reference
    * `check_files_checksums/utils.py:27` (get_multihash_digest dispatches
    * on the multihash prefix byte: 0x12 ⇒ sha2-256, 0x13 ⇒ sha2-512) +
    * `utils.py:89-110` (validate_url_multihash). Expected multihashes are
    * synthesized per asset (`1220`+sha256 / `1340`+sha512, alternating by
    * doc_id, deterministic corruption at doc_id % 25 == 0 so both match
    * and mismatch paths execute on both algorithms); verification decodes
    * the prefix and computes the dispatched digest. Both hashes run
    * codegen'd (sha2) next to the scan — no shuffle at all. The driver's
    * DuckDB has no sha512, so the oracle checks sha256 digests exactly and
    * the sha512 branch structurally (prefix, algo, digest length, valid);
    * `LakeSpec` pins Spark's sha2(·,512) to java.security.MessageDigest.
    */
  private def q23(t: Tables): DataFrame = {
    val body = when(col("doc_id") % 25 === 0, concat(col("text"), lit("X"))).otherwise(col("text"))
    val base = t.documents.select(
      col("doc_id"),
      col("text"),
      when(col("doc_id") % 2 === 0, concat(lit("1220"), sha2(body, 256)))
        .otherwise(concat(lit("1340"), sha2(body, 512)))
        .as("expected"))
    base
      .withColumn(
        "computed",
        when(substring(col("expected"), 1, 2) === "12", concat(lit("1220"), sha2(col("text"), 256)))
          .when(substring(col("expected"), 1, 2) === "13", concat(lit("1340"), sha2(col("text"), 512))))
      .select(
        col("doc_id"),
        when(substring(col("expected"), 1, 2) === "12", lit("sha2-256"))
          .otherwise(lit("sha2-512"))
          .as("algo"),
        when(substring(col("expected"), 1, 2) === "12", col("computed")).as("digest256"),
        length(col("computed")).as("multihash_len"),
        (col("computed") === col("expected")).as("valid"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-size batch assignment — reference `content_iterator/task.py:9`
    * (MAX_ITERATION_SIZE pagination). One shuffle on dataset_id; batch ids
    * derived with integer math (never a double).
    */
  private def q24(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    t.documents
      .select(col("source"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr("CAST((rn - 1) div 25 AS BIGINT)"))
      .groupBy(col("source").as("dataset_id"), col("batch_id"))
      .agg(count(lit(1)).as("n_items"), min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("dataset_id"), col("batch_id"))
  }

  /** Validation summary rollup — reference `validation_summary/task.py`
    * (success = no check failed). bool_and is a partial-aggregable
    * reduction, so the rollup is one narrow shuffle.
    */
  private def q25(t: Tables): DataFrame =
    t.documents
      .groupBy(col("source").as("dataset_id"))
      .agg(
        expr("bool_and(n_chars = length(text))").as("sizes_ok"),
        expr("bool_and(n_chars >= 60)").as("min_size_ok"),
        sum(when(col("n_chars") < 60, 1L).otherwise(0L)).as("n_too_small"),
        count(lit(1)).as("n_checked"))
      .orderBy(col("dataset_id"))

  /** Import manifest generation — reference `import_dataset/task.py`
    * (S3 batch-copy manifest rows, source key → target key). Pure
    * projection: stays in one codegen stage with the scan.
    */
  private def q26(t: Tables): DataFrame =
    t.documents
      .select(
        col("doc_id"),
        concat(lit("s3://src-bucket/"), col("source"), lit("/"), col("doc_id").cast("string"))
          .as("source_key"),
        concat(lit("datasets/"), col("source"), lit("/"), col("doc_id").cast("string"), lit(".json"))
          .as("target_key"),
        col("n_chars").as("size"))
      .orderBy(col("doc_id"))

  /** Catalog tree walk — reference `check_stac_metadata/utils.py`
    * (catalog→collection→item traversal w/ depth). The fixed-depth STAC
    * hierarchy maps to level-wise joins unioned with depth labels; dims
    * broadcast so each level is shuffle-free.
    */
  private def q27(t: Tables): DataFrame = {
    val roots = t.region.select(
      lit(0).as("depth"),
      col("r_regionkey").cast("long").as("node_id"),
      col("r_name").as("name"),
      lit(null).cast("long").as("parent_id"))
    val collections = t.nation
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(
        lit(1).as("depth"),
        col("n_nationkey").cast("long").as("node_id"),
        col("n_name").as("name"),
        col("r_regionkey").cast("long").as("parent_id"))
    val items = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(
        lit(2).as("depth"),
        col("c_custkey").as("node_id"),
        col("c_name").as("name"),
        col("n_nationkey").cast("long").as("parent_id"))
    roots.unionAll(collections).unionAll(items).orderBy(col("depth"), col("node_id"))
  }

  /** Per-dataset asset inventory — reference `processing_assets_model.py`
    * (asset counts/sizes by type).
    */
  private def q28(t: Tables): DataFrame =
    t.documents
      .groupBy(col("source").as("dataset_id"), col("lang").as("asset_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("bytes"),
        round(avg(col("n_chars")), 2).as("avg_bytes"))
      .orderBy(col("dataset_id"), col("asset_type"))

  /** Version diff — reference `dataset_versions/` + `import_dataset/`
    * (assets added/removed between consecutive versions). Set differences
    * as anti-join EXCEPTs, labeled and unioned.
    */
  private def q29(t: Tables): DataFrame = {
    def custs(lo: String, hi: String) =
      t.orders
        .filter(col("o_orderdate") >= ts(lo) && col("o_orderdate") < ts(hi))
        .select(col("o_custkey").as("custkey"))
        .distinct()
    val v1 = custs("1996-01-01 00:00:00", "1997-01-01 00:00:00")
    val v2 = custs("1997-01-01 00:00:00", "1998-01-01 00:00:00")
    v2.except(v1)
      .select(lit("added").as("change"), col("custkey"))
      .unionAll(v1.except(v2).select(lit("removed").as("change"), col("custkey")))
      .orderBy(col("change"), col("custkey"))
  }

  /** Import status join — reference `import_status/get.py` +
    * `upload_status/` (one status row per dataset version from step
    * state + validation + upload counters). The three aspects derive from
    * the version log: latest step state (argmax), error counts, and
    * asset-upload progress — joined on the dataset key, dims broadcast.
    */
  private def q57(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val stepState = t.events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").as("dataset_id"), col("event_type").as("step_state"))
    val counters = t.events
      .groupBy(col("user_id").as("dataset_id"))
      .agg(
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_uploads"),
        count(lit(1)).as("n_events"))
    counters
      .join(stepState, Seq("dataset_id"))
      .withColumn(
        "status",
        // rate, not count: a count threshold would flip with scale factor
        when(col("n_errors") > col("n_events") * 0.2, "FAILED")
          .when(col("step_state") === "purchase", "COMPLETE")
          .otherwise("IN_PROGRESS"))
      .select(col("dataset_id"), col("step_state"), col("n_errors"), col("n_uploads"),
        col("n_events"), col("status"))
      .orderBy(col("dataset_id"))
  }

  /** Root-catalog merge — reference `populate_catalog/task.py` (add child
    * links for new datasets, keep existing, no duplicates). Existing =
    * catalog rows already linked; incoming = current dataset listing;
    * merge = union-distinct with a provenance flag (append-if-absent).
    */
  private def q58(t: Tables): DataFrame = {
    val existing = t.documents
      .filter(col("source").like("src1%"))
      .select(col("source").as("child_id"))
      .distinct()
    val incoming = t.documents.select(col("source").as("child_id")).distinct()
    existing
      .withColumn("provenance", lit("existing"))
      .unionAll(
        incoming.join(existing, Seq("child_id"), "left_anti").withColumn("provenance", lit("added")))
      .orderBy(col("child_id"))
  }

  /** STAC-document schema validation — reference
    * `check_stac_metadata/stac_validators.py` (jsonschema checks per
    * document: required property present, typed, in range). Runs as pure
    * JSON-path expressions next to the scan; per-type failure-class
    * counts roll up map-side (the validation_results shape).
    */
  private def q66(t: Tables): DataFrame =
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when(col("k").isNotNull && col("k") >= 80, 1L).otherwise(0L)).as("n_out_of_range"),
        sum(when(col("k").isNotNull && col("k") < 80, 1L).otherwise(0L)).as("n_valid"))
      .orderBy(col("event_type"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_stac_validation" -> ((s, d) => q66(Tables(s, d))),
    "q57_import_status" -> ((s, d) => q57(Tables(s, d))),
    "q58_catalog_merge" -> ((s, d) => q58(Tables(s, d))),
    "q21_dataset_list" -> ((s, d) => q21(Tables(s, d))),
    "q22_current_versions" -> ((s, d) => q22(Tables(s, d))),
    "q23_checksum_validate" -> ((s, d) => q23(Tables(s, d))),
    "q24_content_batches" -> ((s, d) => q24(Tables(s, d))),
    "q25_validation_summary" -> ((s, d) => q25(Tables(s, d))),
    "q26_import_manifest" -> ((s, d) => q26(Tables(s, d))),
    "q27_catalog_tree" -> ((s, d) => q27(Tables(s, d))),
    "q28_asset_inventory" -> ((s, d) => q28(Tables(s, d))),
    "q29_version_diff" -> ((s, d) => q29(Tables(s, d)))
  )

  override def oracleSql: Map[String, String] = Map(
    "q66_stac_validation" ->
      """WITH j AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(*) AS n_docs,
        | CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        | CAST(sum(CASE WHEN k IS NOT NULL AND k >= 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_range,
        | CAST(sum(CASE WHEN k IS NOT NULL AND k < 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q57_import_status" ->
      """WITH latest AS (
        | SELECT user_id AS dataset_id, event_type AS step_state FROM (
        |  SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1),
        | counters AS (
        | SELECT user_id AS dataset_id,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_uploads,
        |  count(*) AS n_events
        | FROM events GROUP BY user_id)
        |SELECT c.dataset_id, step_state, n_errors, n_uploads, n_events,
        | CASE WHEN n_errors > n_events * 0.2 THEN 'FAILED'
        |      WHEN step_state = 'purchase' THEN 'COMPLETE'
        |      ELSE 'IN_PROGRESS' END AS status
        |FROM counters c JOIN latest l ON c.dataset_id = l.dataset_id
        |ORDER BY c.dataset_id""".stripMargin,
    "q58_catalog_merge" ->
      """WITH existing AS (SELECT DISTINCT source AS child_id FROM documents WHERE source LIKE 'src1%'),
        | incoming AS (SELECT DISTINCT source AS child_id FROM documents)
        |SELECT child_id, 'existing' AS provenance FROM existing
        |UNION ALL
        |SELECT child_id, 'added' AS provenance FROM incoming
        |WHERE child_id NOT IN (SELECT child_id FROM existing)
        |ORDER BY child_id""".stripMargin,
    "q21_dataset_list" ->
      """SELECT source AS dataset_id, count(*) AS n_assets,
        | CAST(sum(n_chars) AS BIGINT) AS total_bytes,
        | min(doc_id) AS first_asset, max(doc_id) AS last_asset
        |FROM documents GROUP BY source ORDER BY dataset_id""".stripMargin,
    "q22_current_versions" ->
      """SELECT user_id AS dataset_id, event_id AS current_version, epoch_us(ts) AS created_us
        |FROM (SELECT user_id, event_id, ts,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1
        |ORDER BY dataset_id""".stripMargin,
    "q23_checksum_validate" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'sha2-256' ELSE 'sha2-512' END AS algo,
        | CASE WHEN doc_id % 2 = 0 THEN '1220' || sha256(text) ELSE NULL END AS digest256,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 68 ELSE 132 END AS INTEGER) AS multihash_len,
        | CASE WHEN doc_id % 2 = 0 THEN
        |   sha256(text) = (CASE WHEN doc_id % 25 = 0 THEN sha256(text || 'X') ELSE sha256(text) END)
        | ELSE doc_id % 25 <> 0 END AS valid
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q24_content_batches" ->
      """WITH b AS (
        | SELECT source, doc_id,
        |  CAST((row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 25 AS BIGINT) AS batch_id
        | FROM documents)
        |SELECT source AS dataset_id, batch_id, count(*) AS n_items,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM b GROUP BY source, batch_id ORDER BY dataset_id, batch_id""".stripMargin,
    "q25_validation_summary" ->
      """SELECT source AS dataset_id,
        | bool_and(n_chars = length(text)) AS sizes_ok,
        | bool_and(n_chars >= 60) AS min_size_ok,
        | CAST(sum(CASE WHEN n_chars < 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_too_small,
        | count(*) AS n_checked
        |FROM documents GROUP BY source ORDER BY dataset_id""".stripMargin,
    "q26_import_manifest" ->
      """SELECT doc_id,
        | 's3://src-bucket/' || source || '/' || CAST(doc_id AS VARCHAR) AS source_key,
        | 'datasets/' || source || '/' || CAST(doc_id AS VARCHAR) || '.json' AS target_key,
        | n_chars AS size
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q27_catalog_tree" ->
      """SELECT 0 AS depth, CAST(r_regionkey AS BIGINT) AS node_id, r_name AS name,
        |  CAST(NULL AS BIGINT) AS parent_id FROM region
        |UNION ALL
        |SELECT 1, CAST(n_nationkey AS BIGINT), n_name, CAST(r_regionkey AS BIGINT)
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |UNION ALL
        |SELECT 2, c_custkey, c_name, CAST(n_nationkey AS BIGINT)
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY depth, node_id""".stripMargin,
    "q28_asset_inventory" ->
      """SELECT source AS dataset_id, lang AS asset_type, count(*) AS n,
        | CAST(sum(n_chars) AS BIGINT) AS bytes, round(avg(n_chars),2) AS avg_bytes
        |FROM documents GROUP BY source, lang ORDER BY dataset_id, asset_type""".stripMargin,
    "q29_version_diff" ->
      """WITH v1 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
        | v2 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT 'added' AS change, custkey FROM (SELECT custkey FROM v2 EXCEPT SELECT custkey FROM v1)
        |UNION ALL
        |SELECT 'removed' AS change, custkey FROM (SELECT custkey FROM v1 EXCEPT SELECT custkey FROM v2)
        |ORDER BY change, custkey""".stripMargin
  )
}
