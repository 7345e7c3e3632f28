package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the catalog-maintenance operators (q67–q70)
  * and the round-3 pipeline additions (q71, q72) — properties the DuckDB
  * hash compare can't express (BFS structure, merge idempotence, redaction
  * completeness).
  */
class CatalogOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("catalog walk visits each node once, at a BFS-consistent depth") {
    val rows = SparkEntry.queries("q67_catalog_walk")(spark, sf).collect()
    val depth = rows.map(r => r.getAs[Long]("node_id") -> r.getAs[Int]("depth")).toMap
    assert(depth.size == rows.length, "a node was visited twice")
    assert(depth(0L) == 0)
    // tree children must sit exactly one level below their parent unless a
    // back-edge reached them earlier (min-depth semantics)
    depth.foreach { case (id, d) =>
      if (id != 0L) {
        val parent = (id - 1) / 2
        assert(depth.contains(parent), s"node $id reachable but parent $parent not visited")
        assert(d <= depth(parent) + 1, s"node $id depth $d vs parent depth ${depth(parent)}")
      }
    }
    // the cycle back-edges (i -> parent) must not duplicate or deepen anything
    assert(rows.length == 500, "every document node is reachable in the binary-tree graph")
  }

  test("recursive-CTE path rollup matches a parent-chain recomputation and plans as UnionLoop") {
    val df = SparkEntry.queries("q240_recursive_paths")(spark, sf)
    // engine-mechanism pin: the recursion must reach the native recursive-CTE
    // plan (UnionLoop), not a driver loop or a silent non-recursive rewrite
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoop"), s"recursive CTE not planned as UnionLoop:\n${plan.take(1500)}")
    // independent recomputation: path mass via the explicit ancestor chain
    val chars = Tables(spark, sf).documents
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    def pathChars(id: Long): Long =
      if (id == 0L) chars(0L) else chars(id) + pathChars((id - 1) / 2)
    def depth(id: Long): Int = if (id == 0L) 0 else 1 + depth((id - 1) / 2)
    val expect = chars.keys.toSeq
      .map(id => depth(id) -> pathChars(id))
      .groupBy(_._1)
      .map { case (d, xs) =>
        d -> ((xs.length.toLong, xs.map(_._2).min, xs.map(_._2).sum, xs.map(_._2).max))
      }
    val got = df.collect().map { r =>
      r.getAs[Int]("depth") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("min_path_chars"),
          r.getAs[Long]("total_path_chars"), r.getAs[Long]("max_path_chars")))
    }.toMap
    assert(got == expect, s"rollup mismatch: got $got\nexpect $expect")
    // every document is reached exactly once (tree coverage, no dup walks)
    assert(got.values.map(_._1).sum == chars.size.toLong)
  }

  test("upsert output has unique keys and classifies actions correctly") {
    val rows = SparkEntry.queries("q68_dataset_upsert")(spark, sf).collect()
    val keys = rows.map(_.getAs[Long]("dataset_key"))
    assert(keys.distinct.length == keys.length, "merge emitted a duplicate key")
    rows.foreach { r =>
      val k = r.getAs[Long]("dataset_key")
      val action = r.getAs[String]("action")
      val rev = r.getAs[Int]("revision")
      if (k < 0) assert(action == "inserted" && rev == 1)
      else if (k % 3 == 0) assert(action == "updated" && rev == 2, s"key $k: $action rev $rev")
      else assert(action == "unchanged" && rev == 1)
    }
  }

  test("href rewrite drops self links, basenames hrefs, redirects root") {
    val rows = SparkEntry.queries("q69_href_rewrite")(spark, sf).collect()
    assert(rows.forall(_.getAs[String]("rel") != "self"))
    rows.foreach { r =>
      val href = r.getAs[String]("href")
      r.getAs[String]("rel") match {
        case "root" => assert(href == "../catalog.json")
        case _ => assert(!href.contains("/") && href.endsWith(".json"), s"not a basename: $href")
      }
    }
  }

  test("status notifications fire exactly on state changes") {
    val rows = SparkEntry.queries("q70_status_notify")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("from_state") != r.getAs[String]("to_state"))
      assert(r.getAs[String]("message").contains(r.getAs[String]("to_state")))
    }
  }

  test("k-means step assigns every vector exactly once to a valid cluster") {
    val rows = SparkEntry.queries("q71_kmeans_step")(spark, sf).collect()
    val labels = Tables(spark, sf).embeddings
      .select(col("label")).distinct().collect()
      .map(_.getAs[Number](0).longValue).toSet
    assert(rows.map(_.getAs[Number]("vec_id").longValue).distinct.length == rows.length)
    assert(rows.forall(r => labels.contains(r.getAs[Number]("new_label").longValue)))
    // a refinement step of a reasonable initial assignment keeps most
    // points (sanity: the step is a refinement, not a shuffle of labels)
    val kept = rows.count(r =>
      r.getAs[Number]("old_label").longValue == r.getAs[Number]("new_label").longValue)
    assert(kept > 0, "no vector kept its cluster — metric is broken")
  }

  test("retention GC keeps exactly the newest 3 versions per dataset") {
    val t = Tables(spark, sf)
    val rows = SparkEntry.queries("q85_retention_gc")(spark, sf).collect()
    val versionsPerDataset = t.events.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reported = rows.map(r => r.getAs[Long]("dataset_id") -> r.getAs[Long]("n_gc_versions")).toMap
    versionsPerDataset.foreach { case (ds, n) =>
      if (n > 3) assert(reported.get(ds).contains(n - 3), s"dataset $ds: $n versions")
      else assert(!reported.contains(ds), s"dataset $ds with $n versions must not GC")
    }
  }

  test("schema-driven STAC validation checks every doc against every rule") {
    val t = Tables(spark, sf)
    val nDocs = t.documents.count()
    val rows = SparkEntry.queries("q87_schema_validate")(spark, sf).collect()
    assert(rows.length == 15, "one row per schema rule")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == nDocs, s"rule ${r.getAs[Int]("rule_id")} skipped docs")
      val v = r.getAs[Long]("n_violations")
      assert(v >= 0 && v < nDocs, s"rule ${r.getAs[Int]("rule_id")}")
      if (v > 0) assert(!r.isNullAt(r.fieldIndex("first_bad_doc")))
    }
    // every injected failure stride fires: all 15 rules catch something
    // (incl. the nested-array items_pattern, the duplicate-key stride, the
    // malformed-datetime stride through the format checker, the
    // insecure-mirror stride through `contains`, and the %47 "extra" key
    // through BOTH open-key arms — the closed-set additional_properties
    // rule and the name-regex property_names rule)
    assert(rows.count(_.getAs[Long]("n_violations") > 0) == 15)
  }

  test("additional_properties is true Draft7 closed-object: per-scope, depth-exact, vacuous on malformed") {
    // jsonschema semantics pinned engine-side (the oracle twin only sees
    // top-level json_keys): the scope's DIRECT children are checked, keys
    // nested deeper or inside array elements belong to THEIR scope, and
    // a malformed doc is the parse check's concern
    val rules = Seq(
      graft.operators.Lake.Rule(1, "", "additional_properties", "id|properties|links"),
      graft.operators.Lake.Rule(2, "properties", "additional_properties", "datetime|gsd"),
      // the name-regex twin keyword, scoped to the same nested object
      graft.operators.Lake.Rule(3, "properties", "property_names", "^[a-z_]+$"))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"id":"a","properties":{"datetime":"x","gsd":1}}"""),       // clean
      (2L, """{"id":"a","extra":1}"""),                                    // root extra → rule 1
      (3L, """{"id":"a","properties":{"datetime":"x","rogue":2}}"""),      // nested extra → rule 2 only (name "rogue" is regex-legal)
      (4L, """{"id":"a","properties":{"datetime":{"deep":1}}}"""),         // depth-2 key is properties.datetime's scope, not properties'
      (5L, """{"links":[{"href":"h","rel":"r"}]}"""),                      // array-element keys never leak to root
      (6L, """not json at all"""),                                         // malformed: vacuous
      (7L, """{"id":"a","id":"b"}"""),                                     // duplicate ALLOWED key is no_dup_keys' concern, not this rule's
      (8L, """{"id":"a","properties":{"Datetime":"x"}}""")                 // bad NAME: fails the regex arm AND the closed set
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("violated") === 1)
      .select("doc_id", "rule_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rule_id"))).toSet
    assert(got == Set((2L, 1), (3L, 2), (8L, 2), (8L, 3)), s"got $got")
  }

  test("items_pattern is true Draft7: EVERY element checked, values never split on ';'") {
    // jsonschema semantics pinned directly (not via the oracle, which could
    // share a defect): `items` applies to every array element, an element
    // missing the sub-field is vacuous, and element VALUES are opaque — a
    // legal ';' (valid in URIs) must not fragment them
    val rules = Seq(
      graft.operators.Lake.Rule(1, "links[#].href", "items_pattern", "^https://ok[.]example[.]com/.*$"))
    val docs = spark.createDataFrame(Seq(
      // 6 links, ONLY the 6th bad — beyond any fixed probe bound
      (1L, """{"links":[{"href":"https://ok.example.com/1"},{"href":"https://ok.example.com/2"},
             {"href":"https://ok.example.com/3"},{"href":"https://ok.example.com/4"},
             {"href":"https://ok.example.com/5"},{"href":"http://BAD.example.com/6"}]}"""
        .replaceAll("\n\\s*", "")),
      // conforming href CONTAINING ';' (path params are legal URI syntax)
      (2L, """{"links":[{"href":"https://ok.example.com/a;jsessionid=1;x=2"}]}"""),
      // element without the sub-field is vacuous for that element
      (3L, """{"links":[{"rel":"self"},{"href":"https://ok.example.com/b"}]}"""),
      // absent array, empty array, non-array: all vacuous per Draft7
      (4L, """{"id":"no-links"}"""),
      (5L, """{"links":[]}"""),
      (6L, """{"links":"not-an-array"}""")
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .select("doc_id", "violated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("violated")).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0, 6L -> 0), s"got $got")
  }

  test("applies_to scopes a rule to its document type, like the reference's per-type validators") {
    // the reference composes one validator per STAC type and dispatches on
    // the document's `type` (stac_validators.py:90-103, utils.py:191): a
    // Collection-only `license required` rule must NOT flag Items
    val rules = Seq(
      graft.operators.Lake.Rule(1, "license", "required", "", appliesTo = "Collection"),
      graft.operators.Lake.Rule(2, "id", "required", ""))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"type":"Collection","id":"c1"}"""),          // scoped rule fires
      (2L, """{"type":"Feature","id":"i1"}"""),             // out of scope: clean
      (3L, """{"type":"Collection","id":"c2","license":"MIT"}"""), // in scope, satisfied
      (4L, """{"id":"untyped"}"""),                          // no type: scoped rule skips
      (5L, """{"type":"Feature"}""")                         // unscoped rule still fires
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("violated") === 1)
      .select("doc_id", "rule_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rule_id"))).toSet
    assert(got == Set((1L, 1), (5L, 2)), s"got $got")
  }

  test("one_of accepts exactly one of two document shapes, like Draft7 oneOf branches") {
    // the reference's schemas compose oneOf branches for alternative
    // document shapes (stac_validators.py:87-103): here a doc must be
    // EITHER a Collection carrying license+extent (rules 1,2) OR a
    // Feature carrying geometry (rule 3) — never both, never neither
    val rules = Seq(
      graft.operators.Lake.Rule(1, "license", "required", ""),
      graft.operators.Lake.Rule(2, "extent", "required", ""),
      graft.operators.Lake.Rule(3, "geometry", "required", ""),
      graft.operators.Lake.Rule(10, "", "one_of", "1,2|3"))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"license":"MIT","extent":[1]}"""),            // branch 1 only: passes
      (2L, """{"geometry":{"type":"Point"}}"""),              // branch 2 only: passes
      (3L, """{"license":"MIT"}"""),                          // half of branch 1: violated
      (4L, """{"license":"MIT","extent":[1],"geometry":{}}"""), // BOTH branches: violated (oneOf, not anyOf)
      (5L, """{"id":"bare"}""")                                // neither: violated
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("rule_id") === 10)
      .select("doc_id", "violated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("violated")).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1), s"got $got")

    // a scoped composite skips out-of-scope docs entirely
    val scoped = rules.init :+
      graft.operators.Lake.Rule(10, "", "one_of", "1,2|3", appliesTo = "Collection")
    val doc = Seq((6L, """{"type":"Feature","id":"bare"}""")) // would violate if in scope
    val g2 = graft.operators.Lake.stacViolations(
      spark.createDataFrame(doc).toDF("doc_id", "j"), scoped)
      .filter(col("rule_id") === 10).select("violated").collect().map(_.getInt(0)).toSeq
    assert(g2 == Seq(0))

    // a branch member that is not a leaf rule id fails loudly at plan time
    val bad = Seq(graft.operators.Lake.Rule(1, "", "one_of", "99"))
    val e = intercept[IllegalArgumentException](
      graft.operators.Lake.stacViolations(spark.createDataFrame(doc).toDF("doc_id", "j"), bad))
    assert(e.getMessage.contains("not a known rule id"))
  }

  test("any_of and all_of complete Draft7's applicators over the same branch groups") {
    val rules = Seq(
      graft.operators.Lake.Rule(1, "license", "required", ""),
      graft.operators.Lake.Rule(2, "geometry", "required", ""),
      graft.operators.Lake.Rule(20, "", "any_of", "1|2"),
      graft.operators.Lake.Rule(21, "", "all_of", "1|2"))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"license":"MIT","geometry":{}}"""), // both: any_of ok, all_of ok
      (2L, """{"license":"MIT"}"""),               // one: any_of ok, all_of violated
      (3L, """{"id":"bare"}""")                    // neither: both violated
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("rule_id") >= 20)
      .select("doc_id", "rule_id", "violated").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rule_id")) -> r.getAs[Int]("violated"))
      .toMap
    assert(got == Map(
      (1L, 20) -> 0, (1L, 21) -> 0,
      (2L, 20) -> 0, (2L, 21) -> 1,
      (3L, 20) -> 1, (3L, 21) -> 1), s"got $got")
  }

  test("format checker: date-time rejects calendar-impossible dates regex can't; uri checks scheme") {
    // the reference attaches jsonschema's FormatChecker to its validators
    // (stac_validators.py:88-89) — format goes beyond pattern: a
    // shape-perfect Feb 30 must fail
    val rules = Seq(
      graft.operators.Lake.Rule(1, "dt", "format", "date-time"),
      graft.operators.Lake.Rule(2, "href", "format", "uri"))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"dt":"2024-01-05T00:00:00Z","href":"https://x.example/a"}"""), // both fine
      (2L, """{"dt":"2024-02-30T00:00:00Z"}"""), // shape-valid, calendar-impossible
      (3L, """{"dt":"2024-01-05"}"""),           // castable but not RFC3339 date-time
      (4L, """{"href":"not a uri"}"""),
      (5L, """{"id":"no-fields"}""")             // absent fields pass vacuously
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("violated") === 1)
      .select("doc_id", "rule_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rule_id"))).toSet
    assert(got == Set((2L, 1), (3L, 1), (4L, 2)), s"got $got")

    // unknown format names fail loudly at plan time
    val bad = Seq(graft.operators.Lake.Rule(1, "dt", "format", "ipv6"))
    val e = intercept[IllegalArgumentException](
      graft.operators.Lake.stacViolations(docs, bad))
    assert(e.getMessage.contains("unknown format"))
  }

  test("no_dup_keys flags a repeated key at ANY depth, like the reference's object_pairs_hook") {
    // the reference rejects duplicate object names at parse time via an
    // object_pairs_hook that fires at every nesting level
    // (check_stac_metadata/utils.py:297-314) because json.load — like any
    // JSON-path extractor — silently keeps one of the pair
    val rules = Seq(graft.operators.Lake.Rule(1, "", "no_dup_keys", ""))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"id":"a","id":"b"}"""),                    // top-level repeat: flagged
      (2L, """{"id":"a","type":"Feature"}"""),            // clean: passes
      (3L, """{"id":"a","nested":{"k":1,"k":2}}"""),      // nested repeat: flagged
      (4L, """not json"""),                                // malformed: the parse check's job
      (5L, """[1,2]"""),                                   // non-object: vacuous
      (6L, """{"a":{"k":1},"b":{"k":2}}"""),               // same key in SIBLING scopes: clean
      (7L, """{"links":[{"href":"x","href":"y"}]}"""),     // repeat inside an array element: flagged
      (8L, """{"links":[{"href":"x"},{"href":"y"}]}""")    // same key across array elements: clean
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .select("doc_id", "violated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("violated")).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 0,
      6L -> 0, 7L -> 1, 8L -> 0), s"got $got")
  }

  test("min_items / min_length / max_length: the STAC specs' size keywords, vacuous off-type") {
    // STAC item-spec bounds bbox with minItems and LINZ fields carry
    // length bounds — Draft7 size keywords apply only to their own type
    // (a non-array skips minItems, a non-string length reads its JSON text)
    val rules = Seq(
      graft.operators.Lake.Rule(1, "bbox", "min_items", "4"),
      graft.operators.Lake.Rule(2, "title", "min_length", "3"),
      graft.operators.Lake.Rule(3, "title", "max_length", "8"))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"bbox":[1,2,3,4],"title":"okay"}"""),   // all pass
      (2L, """{"bbox":[1,2],"title":"ab"}"""),          // short array AND short string
      (3L, """{"bbox":"not-an-array","title":"waaaaay too long"}"""), // minItems vacuous; maxLength fires
      (4L, """{"id":"none"}""")                          // absent fields: all vacuous
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("violated") === 1)
      .select("doc_id", "rule_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rule_id"))).toSet
    assert(got == Set((2L, 1), (2L, 2), (3L, 3)), s"got $got")
  }

  test("applicators NEST to arbitrary depth: oneOf over anyOf over not, cycles refused") {
    // Draft7 schemas compose applicators recursively; here a doc must be
    // EITHER (license OR extent, i.e. anyOf) present-AND-geometry-free
    // (not:{required:[geometry]}) — a 3-level tree: one_of( any_of, not )
    // branches compose at the top level
    val rules = Seq(
      graft.operators.Lake.Rule(1, "license", "required", ""),
      graft.operators.Lake.Rule(2, "extent", "required", ""),
      graft.operators.Lake.Rule(3, "geometry", "required", ""),
      graft.operators.Lake.Rule(10, "", "any_of", "1|2"),   // license OR extent
      graft.operators.Lake.Rule(11, "", "not", "3"),        // geometry FORBIDDEN
      graft.operators.Lake.Rule(12, "", "all_of", "10,11")) // both sub-applicators
    val docs = spark.createDataFrame(Seq(
      (1L, """{"license":"MIT"}"""),                    // anyOf ok, no geometry: passes
      (2L, """{"extent":[1],"geometry":{}}"""),          // anyOf ok but geometry present: violated
      (3L, """{"id":"bare"}"""),                         // anyOf fails: violated
      (4L, """{"license":"MIT","extent":[1]}""")         // both anyOf members, clean: passes
    )).toDF("doc_id", "j")
    val got = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("rule_id") === 12)
      .select("doc_id", "violated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("violated")).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0), s"got $got")

    // nested composites are ordinary rows: the inner applicators report too
    val inner = graft.operators.Lake.stacViolations(docs, rules)
      .filter(col("rule_id") === 11 && col("doc_id") === 2L)
      .select("violated").collect().map(_.getInt(0)).toSeq
    assert(inner == Seq(1))

    // a reference cycle fails loudly at plan time, naming the loop
    val cyclic = Seq(
      graft.operators.Lake.Rule(1, "license", "required", ""),
      graft.operators.Lake.Rule(20, "", "any_of", "21"),
      graft.operators.Lake.Rule(21, "", "all_of", "20"))
    val e = intercept[IllegalArgumentException](
      graft.operators.Lake.stacViolations(docs, cyclic))
    assert(e.getMessage.contains("cycle"), e.getMessage)
    // and so does self-reference
    val selfRef = Seq(graft.operators.Lake.Rule(30, "", "not", "30"))
    val e2 = intercept[IllegalArgumentException](
      graft.operators.Lake.stacViolations(docs, selfRef))
    assert(e2.getMessage.contains("cannot reference itself"), e2.getMessage)
  }

  test("contains and not complete the Draft7 applicators: array existential + schema inversion") {
    // contains: at least one links href must be on the canonical host —
    // Draft7 `contains` fails an empty array, skips a missing one
    val rules = Seq(
      graft.operators.Lake.Rule(1, "links[#].href", "contains", "^https://ok[.]example[.]com/.*$"),
      graft.operators.Lake.Rule(2, "deprecated", "required", ""),
      // Draft7 `not: {required: [deprecated]}` — the field is FORBIDDEN
      graft.operators.Lake.Rule(30, "", "not", "2"))
    val docs = spark.createDataFrame(Seq(
      (1L, """{"links":[{"href":"http://other/1"},{"href":"https://ok.example.com/2"}]}"""), // one match: passes
      (2L, """{"links":[{"href":"http://other/1"}]}"""),   // no match: violated
      (3L, """{"links":[]}"""),                            // empty array: violated (Draft7)
      (4L, """{"id":"no-links"}"""),                       // missing array: vacuous
      (5L, """{"deprecated":true,"links":[{"href":"https://ok.example.com/a"}]}"""), // not-rule fires
      (6L, """{"links":[{"href":"https://ok.example.com/a"}]}""")                    // clean of both
    )).toDF("doc_id", "j")
    val flags = graft.operators.Lake.stacViolations(docs, rules)
    val contains = flags.filter(col("rule_id") === 1)
      .select("doc_id", "violated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("violated")).toMap
    assert(contains == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 0, 6L -> 0), s"contains: $contains")
    val notRule = flags.filter(col("rule_id") === 30)
      .select("doc_id", "violated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("violated")).toMap
    assert(notRule == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 1, 6L -> 0), s"not: $notRule")
  }

  test("4-column rules files (no applies_to) load with the apply-to-all default") {
    val dir = java.nio.file.Files.createTempDirectory("stac-4col").toFile
    try {
      java.nio.file.Files.writeString(new java.io.File(dir, "legacy.jsonl").toPath,
        """{"rule_id": 1, "field": "license", "kind": "required", "arg": ""}
          |{"rule_id": 2, "field": "id", "kind": "required", "arg": "", "applies_to": "Feature"}
          |""".stripMargin)
      spark.conf.set("graft.stac.rulesPath", s"${dir.getAbsolutePath}/legacy.jsonl")
      val loaded = graft.operators.Lake.loadRules(spark)
      assert(loaded == Seq(
        graft.operators.Lake.Rule(1, "license", "required", "", appliesTo = ""),
        graft.operators.Lake.Rule(2, "id", "required", "", appliesTo = "Feature")))
      // and the full q87 plan still runs green over the loaded store
      assert(SparkEntry.queries("q87_schema_validate")(spark, sf).count() == 2)
    } finally {
      spark.conf.unset("graft.stac.rulesPath")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("validation rules are data: a rules file swaps the rule set with no recompile") {
    val dir = java.nio.file.Files.createTempDirectory("stac-rules").toFile
    try {
      val f = new java.io.File(dir, "rules.jsonl")
      // one brand-new rule (license required) plus a re-parameterized
      // pattern — neither exists in the compiled-in defaults
      java.nio.file.Files.writeString(f.toPath,
        """{"rule_id": 1, "field": "license", "kind": "required", "arg": ""}
          |{"rule_id": 2, "field": "type", "kind": "enum", "arg": "Feature"}
          |{"rule_id": 3, "field": "links[#].href", "kind": "items_pattern", "arg": "^https://.*$"}
          |""".stripMargin)
      spark.conf.set("graft.stac.rulesPath", f.getAbsolutePath)
      val rows = SparkEntry.queries("q87_schema_validate")(spark, sf)
        .collect().map(r => r.getAs[Int]("rule_id") ->
          (r.getAs[String]("field"), r.getAs[Long]("n_violations"))).toMap
      assert(rows.size == 3, "the rules file REPLACES the built-in relation")
      assert(rows(1)._1 == "license")
      // no doc carries a license field -> the new rule flags every doc
      val nDocs = Tables(spark, sf).documents.count()
      assert(rows(1)._2 == nDocs)
      // enum narrowed to Feature-only: strictly more violations than the
      // default three-value enum produces
      assert(rows(2)._2 > 0)
      // scheme-only href pattern: the http:// stride still fails, so the
      // items keyword class is honored through the file path too
      assert(rows(3)._2 > 0)
    } finally {
      spark.conf.unset("graft.stac.rulesPath")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("a ref rule splices another rules file in at load time; cycles fail loudly") {
    // the reference's RefResolver shape (stac_validators.py:1-60): a STAC
    // schema $refs a shared core schema in the same store — here a root
    // rules file pulls in a common fragment by relative path
    val dir = java.nio.file.Files.createTempDirectory("stac-ref").toFile
    try {
      java.nio.file.Files.writeString(new java.io.File(dir, "core.jsonl").toPath,
        """{"rule_id": 101, "field": "id", "kind": "required", "arg": ""}
          |{"rule_id": 102, "field": "stac_version", "kind": "enum", "arg": "1.0.0"}
          |""".stripMargin)
      java.nio.file.Files.writeString(new java.io.File(dir, "root.jsonl").toPath,
        """{"rule_id": 1, "field": "license", "kind": "required", "arg": ""}
          |{"rule_id": 2, "field": "", "kind": "ref", "arg": "core.jsonl"}
          |""".stripMargin)
      spark.conf.set("graft.stac.rulesPath", s"${dir.getAbsolutePath}/root.jsonl")
      val rows = SparkEntry.queries("q87_schema_validate")(spark, sf)
        .collect().map(r => r.getAs[Int]("rule_id") -> r.getAs[String]("field")).toMap
      // composed store: the root's own rule plus BOTH included rules, the
      // ref row itself resolved away
      assert(rows == Map(1 -> "license", 101 -> "id", 102 -> "stac_version"))

      // a cycle across files is a load-time error, not a hang
      java.nio.file.Files.writeString(new java.io.File(dir, "a.jsonl").toPath,
        """{"rule_id": 1, "field": "", "kind": "ref", "arg": "b.jsonl"}""" + "\n")
      java.nio.file.Files.writeString(new java.io.File(dir, "b.jsonl").toPath,
        """{"rule_id": 2, "field": "", "kind": "ref", "arg": "a.jsonl"}""" + "\n")
      spark.conf.set("graft.stac.rulesPath", s"${dir.getAbsolutePath}/a.jsonl")
      val e = intercept[IllegalArgumentException](
        SparkEntry.queries("q87_schema_validate")(spark, sf).collect())
      assert(e.getMessage.contains("cycle"))

      // duplicate ids across the closure fail loudly (a silent shadow would
      // mis-attribute violations)
      java.nio.file.Files.writeString(new java.io.File(dir, "dup.jsonl").toPath,
        """{"rule_id": 101, "field": "type", "kind": "required", "arg": ""}
          |{"rule_id": 3, "field": "", "kind": "ref", "arg": "core.jsonl"}
          |""".stripMargin)
      spark.conf.set("graft.stac.rulesPath", s"${dir.getAbsolutePath}/dup.jsonl")
      val d = intercept[IllegalArgumentException](
        SparkEntry.queries("q87_schema_validate")(spark, sf).collect())
      assert(d.getMessage.contains("duplicate rule_id"))
    } finally {
      spark.conf.unset("graft.stac.rulesPath")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("latest-schema-version resolution picks the semver max and ignores non-versions") {
    val rows = SparkEntry.queries("q88_latest_schema_version")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // an extension whose candidates are all non-versions keeps its row
      // with a null latest (both engines: Spark null aggregate, oracle
      // LEFT JOIN) — on this corpus every source has real versions
      if (r.getAs[Long]("n_versions") > 0)
        assert(r.getAs[String]("latest_version").matches("[0-9]+\\.[0-9]+\\.[0-9]+"))
      else assert(r.isNullAt(r.fieldIndex("latest_version")))
      assert(r.getAs[Long]("n_versions") >= 0 && r.getAs[Long]("n_ignored") >= 0)
    }
    assert(rows.forall(_.getAs[Long]("n_versions") > 0), "corpus fixture: all sources have versions")
  }

  test("PII scrub redacts every injected email, phone, and URL") {
    val rows = SparkEntry.queries("q72_pii_scrub")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 1 && r.getAs[Int]("n_phones") == 1 && r.getAs[Int]("n_urls") == 1)
      val s = r.getAs[String]("scrubbed")
      assert(!s.contains("@") && !s.contains("+1-555") && !s.contains("https://"))
      assert(s.contains("<EMAIL>") && s.contains("<PHONE>") && s.contains("<URL>"))
    }
  }
}
