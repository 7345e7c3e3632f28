package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-fidelity `ref` integration: the actual STAC 1.0.0 item
  * json-schema is a TREE — `item-spec/json-schema/item.json` `$ref`s
  * `basics.json`, `datetime.json`, `instrument.json`, `licensing.json`
  * and `provider.json`, which the reference resolves through a local
  * RefResolver store (`check_stac_metadata/stac_validators.py:45-103`
  * registers each file in a FileObjectStore and validates against the
  * composed schema). This spec vendors that file tree as rule-store
  * fixtures (one JSONL per schema file, one `ref` row per `$ref`) and
  * proves the file-`ref` path composes them: the closure loads, relative
  * refs resolve against the including file, each leaf file's keywords
  * fire on the exact doc strides that violate them, and a ref cycle
  * fails loudly.
  */
class StacRefTreeSpec extends AnyFunSuite {
  import SparkTestSession._

  // one JSONL rule store per real STAC 1.0.0 schema file; rule content
  // mirrors each file's Draft7 demands (stac-spec item-spec/json-schema)
  private val tree: Map[String, String] = Map(
    // item.json: core item keywords + allOf over the sibling schemas
    // (rendered as ref rows, resolved relative to this file's directory)
    "item.jsonl" ->
      """{"rule_id":1,"field":"id","kind":"required","arg":""}
        |{"rule_id":2,"field":"stac_version","kind":"required","arg":""}
        |{"rule_id":3,"field":"stac_version","kind":"enum","arg":"1.0.0"}
        |{"rule_id":4,"field":"type","kind":"enum","arg":"Catalog|Collection|Feature"}
        |{"rule_id":90,"field":"","kind":"ref","arg":"basics.jsonl"}
        |{"rule_id":91,"field":"","kind":"ref","arg":"datetime.jsonl"}
        |{"rule_id":92,"field":"","kind":"ref","arg":"instrument.jsonl"}
        |{"rule_id":93,"field":"","kind":"ref","arg":"licensing.jsonl"}
        |{"rule_id":94,"field":"","kind":"ref","arg":"provider.jsonl"}""".stripMargin,
    // basics.json: title/description strings (description required at
    // catalog/collection level in the composed catalog-spec)
    "basics.jsonl" ->
      """{"rule_id":10,"field":"description","kind":"required","arg":"","applies_to":"Catalog|Collection"}
        |{"rule_id":11,"field":"description","kind":"min_length","arg":"1","applies_to":"Catalog|Collection"}""".stripMargin,
    // datetime.json: properties.datetime, RFC 3339 date-time
    "datetime.jsonl" ->
      """{"rule_id":20,"field":"properties.datetime","kind":"format","arg":"date-time","applies_to":"Feature"}""".stripMargin,
    // instrument.json: gsd is a number with exclusiveMinimum 0
    "instrument.jsonl" ->
      """{"rule_id":30,"field":"properties.gsd","kind":"type_number","arg":"","applies_to":"Feature"}
        |{"rule_id":31,"field":"properties.gsd","kind":"minimum","arg":"0","applies_to":"Feature"}""".stripMargin,
    // licensing.json: license is an SPDX-ish token (absent field ⇒
    // vacuous pass, Draft7's skip semantics — the synthetic docs carry none)
    "licensing.jsonl" ->
      """{"rule_id":40,"field":"properties.license","kind":"pattern","arg":"^[0-9A-Za-z_.+-]+$","applies_to":"Feature"}""".stripMargin,
    // provider.json: provider urls, when present, are uris (same vacuity)
    "provider.jsonl" ->
      """{"rule_id":50,"field":"properties.providers[#].url","kind":"items_pattern","arg":"^https?://","applies_to":"Feature"}""".stripMargin)

  private def writeTree(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stac_tree")
    tree.foreach { case (name, body) =>
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    }
    dir.toString
  }

  test("the vendored STAC 1.0.0 item schema tree loads through file-refs and validates") {
    val dir = writeTree()
    spark.conf.set("graft.stac.rulesPath", s"$dir/item.jsonl")
    try {
      val rules = graft.operators.Lake.loadRules(spark)
      // the closure holds every leaf file's rules, none of the ref rows
      assert(rules.map(_.id).toSet ==
        Set(1, 2, 3, 4, 10, 11, 20, 30, 31, 40, 50),
        s"resolved closure: ${rules.map(_.id).sorted}")
      assert(rules.forall(_.kind != "ref"))
      // the composed validator fires each leaf's keywords on the strides
      // that violate them (stacDocJson's deterministic fault injection)
      val v = SparkEntry.queries("q87_schema_validate")(spark, sf)
        .filter(col("n_violations") > 0)
        .select(col("rule_id"), col("n_violations"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(v.contains(1), "id-required (item.json) never fired")      // %23 stride
      assert(v.contains(20), "date-time (datetime.json) never fired")   // %17 stride
      assert(v.contains(30), "gsd type (instrument.json) never fired")  // %19 stride
      assert(v.contains(31), "gsd minimum (instrument.json) never fired") // %29 stride
      assert(!v.contains(40), "license rule fired with no license field — vacuity broken")
      assert(!v.contains(50), "provider rule fired with no providers — vacuity broken")
    } finally spark.conf.unset("graft.stac.rulesPath")
  }

  test("a $ref cycle in the schema tree fails loudly at load, like RefResolver would") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stac_cycle")
    java.nio.file.Files.write(dir.resolve("a.jsonl"),
      """{"rule_id":1,"field":"","kind":"ref","arg":"b.jsonl"}""".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.jsonl"),
      """{"rule_id":2,"field":"","kind":"ref","arg":"a.jsonl"}""".getBytes("UTF-8"))
    spark.conf.set("graft.stac.rulesPath", s"$dir/a.jsonl")
    try {
      val e = intercept[IllegalArgumentException](graft.operators.Lake.loadRules(spark))
      assert(e.getMessage.contains("cycle"))
    } finally spark.conf.unset("graft.stac.rulesPath")
  }
}
