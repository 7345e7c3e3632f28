package graft

import graft.functions.{GraftFunctions, SimHashImpl}
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("simhash64: near-identical texts land within small hamming distance") {
    val a = SimHashImpl.compute(UTF8String.fromString("the quick brown fox jumps over the lazy dog"))
    val b = SimHashImpl.compute(UTF8String.fromString("the quick brown fox jumps over the lazy cat"))
    val c = SimHashImpl.compute(UTF8String.fromString("completely different content entirely unrelated"))
    assert(SimHashImpl.hamming(a, b) < SimHashImpl.hamming(a, c))
    assert(SimHashImpl.compute(UTF8String.fromString("  spaced   out  ")) ==
      SimHashImpl.compute(UTF8String.fromString("spaced out")))
  }

  test("simhash64 edge semantics: null for zero tokens, UTF-8 bytes hashed") {
    import spark.implicits._
    // zero-token docs drop out of blocking (null), matching the oracle's
    // WHERE w <> '' — not 0L, which would bucket every empty doc together
    assert(SimHashImpl.computeOrNull(UTF8String.fromString("")) == null)
    assert(SimHashImpl.computeOrNull(UTF8String.fromString("   ")) == null)
    val viaColumn = Seq("", "   ", "café").toDF("text")
      .select(GraftFunctions.simhash64(col("text")).as("sh")).collect()
    assert(viaColumn(0).isNullAt(0) && viaColumn(1).isNullAt(0))
    // a single token's simhash IS its FNV-1a-64 over UTF-8 BYTES (majority
    // of one vote); 'café' = 63 61 66 c3 a9 — the value below is the
    // byte-fold, distinct from a code-point fold, pinning oracle parity
    assert(viaColumn(2).getLong(0) == 5253592154431032713L)
  }

  test("simhash64 Column API runs under codegen over the documents table") {
    val df = Tables(spark, sf).documents
      .select(col("doc_id"), GraftFunctions.simhash64(col("text")).as("sh"))
    val rows = df.collect()
    assert(rows.length == 500)
    // interpreted eval must agree with the codegen'd column
    val doc0 = Tables(spark, sf).documents.filter(col("doc_id") === 0).collect()(0).getAs[String]("text")
    val expected = SimHashImpl.compute(UTF8String.fromString(doc0))
    assert(rows.find(_.getLong(0) == 0L).get.getAs[Long]("sh") == expected)
  }

  test("cosine_sim native kernel matches the HOF double formula") {
    val e = Tables(spark, sf).embeddings.limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val both = a.crossJoin(b).filter(col("ia") < col("ib"))
      .withColumn("native", GraftFunctions.cosine_sim(col("va"), col("vb")))
      .withColumn("vda", expr("transform(va, x -> CAST(x AS DOUBLE))"))
      .withColumn("vdb", expr("transform(vb, x -> CAST(x AS DOUBLE))"))
      .withColumn("dot", expr("aggregate(zip_with(vda, vdb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
      .withColumn("na", expr("sqrt(aggregate(vda, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"))
      .withColumn("nb", expr("sqrt(aggregate(vdb, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"))
      .withColumn("hof", col("dot") / (col("na") * col("nb")))
    val bad = both.filter(col("native") =!= col("hof")).count()
    assert(bad == 0, s"$bad pairs differ between native kernel and HOF formula")
  }

  test("SQL registration exposes simhash64 and cosine_sim") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT simhash64('a b c') AS sh, cosine_sim(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS cs").collect()(0)
    assert(r.getAs[Long]("sh") == SimHashImpl.compute(UTF8String.fromString("a b c")))
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
  }

  test("minhash_sigs/shingle_set/byte_histogram kernels: SQL surface + edges") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT minhash_sigs('a b c d', 4) AS mh, shingle_set('a b c a b c') AS sh,
        |byte_histogram('aA !') AS bh, minhash_sigs('x y', 4) AS mh_null""".stripMargin).collect()(0)
    assert(r.getSeq[Long](r.fieldIndex("mh")).length == 4)
    // repeated shingles collapse; first-occurrence order
    assert(r.getSeq[String](r.fieldIndex("sh")).toList == List("a b c", "b c a", "c a b"))
    // 'a'→bin6, 'A'→bin4, ' ' and '!'→bin2
    val bh = r.getSeq[Long](r.fieldIndex("bh"))
    assert(bh(6) == 1 && bh(4) == 1 && bh(2) == 2 && bh.sum == 4)
    // <3 tokens → null, not an error
    assert(r.isNullAt(r.fieldIndex("mh_null")))
  }

  test("minhash kernel equals the generated-arithmetic pipeline on real docs") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf).documents
    val shingleExpr =
      """transform(sequence(1, size(split(text, ' ')) - 2),
        |  i -> concat(element_at(split(text, ' '), i), ' ',
        |              element_at(split(text, ' '), i + 1), ' ',
        |              element_at(split(text, ' '), i + 2)))""".stripMargin
    def hexval(c: String) =
      s"(CASE WHEN ascii($c) >= 97 THEN ascii($c) - 87 ELSE ascii($c) - 48 END)"
    val hexint = (1 to 8)
      .map(p => s"CAST(${hexval(s"substr(m, $p, 1)")} AS BIGINT) * ${1L << ((8 - p) * 4)}")
      .mkString("(", " + ", ")")
    val sigs = (0 until 8)
      .map(b => s"array_min(transform(hashes, h -> ((h * ${2 * b + 1} + ${7919 * b}) % 2147483647)))")
      .mkString("array(", ", ", ")")
    val bad = docs
      .withColumn("hashes", expr(s"transform(transform($shingleExpr, s -> md5(s)), m -> $hexint)"))
      .select(
        GraftFunctions.minhash_sigs(col("text"), 8).as("k"),
        expr(sigs).as("e"))
      .filter(col("k") =!= col("e"))
      .count()
    assert(bad == 0, s"$bad docs differ between kernel and expression pipeline")
  }

  test("subword kernel: maximal munch over the merge vocab") {
    def n(s: String): Long = graft.functions.SubwordKernel.count(UTF8String.fromString(s))
    assert(n("") == 0)
    assert(n("   ") == 0) // whitespace is never a token
    assert(n("xyz") == 3) // no merges → per-char tokens
    assert(n("the") == 1) // trigram merge
    assert(n("thee") == 2) // "the"+"e": longest match wins at position 0
    assert(n("ing") == 1) // trigram beats "in"+"g"
    assert(n("nthe") == 2) // "nt"+"he": no trigram at 0, bigram, then bigram
    assert(n("a b") == 2) // merges never cross a space
  }

  test("subword kernel equals the oracle's regex closed form on the corpus") {
    // the DuckDB oracle reproduces maximal munch as longest-first regex
    // alternation replace; the same formula in Spark must agree with the
    // native kernel on every document, or the oracle mirror is a lie
    val alt = graft.functions.SubwordKernel.regexAlternation
    val bad = Tables(spark, sf).documents
      .withColumn("k", graft.functions.GraftFunctions.subword_count(col("text")))
      .withColumn(
        "r",
        length(regexp_replace(col("text"), alt, "#"))
          - (length(col("text")) - length(regexp_replace(col("text"), " ", ""))))
      .filter(col("k") =!= col("r"))
      .count()
    assert(bad == 0)
  }

  test("subword kernel equals the regex closed form on randomized inputs") {
    // seeded fuzz over a harsher alphabet than the corpus: dense merge
    // collisions ('t','h','e','i','n','g'), spaces, and non-ascii chars
    // (must be single-char tokens — the packed-int lookup guards them)
    val rnd = new scala.util.Random(42)
    // code-point alphabet incl. an astral char (surrogate pair) — one token
    val alphabet = "thein gersatox éß日 😀".codePoints().toArray
    val pat = java.util.regex.Pattern.compile(graft.functions.SubwordKernel.regexAlternation)
    (1 to 2000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(
        Character.toChars(alphabet(rnd.nextInt(alphabet.length))).mkString).mkString
      val after = pat.matcher(s).replaceAll("#")
      // expected counts CODE POINTS (the engines' length() semantics)
      val expected = after.codePoints().filter(_ != ' ').count()
      val got = graft.functions.SubwordKernel.count(UTF8String.fromString(s))
      assert(got == expected, s"input '$s': kernel $got vs regex $expected")
    }
  }

  test("json_key_paths: randomized trees flag a dup IFF one was injected; metachar keys never collide") {
    import org.apache.spark.unsafe.types.UTF8String
    def hasDup(json: String): Option[Boolean] =
      Option(graft.functions.JsonKeyPathsKernel.keyPaths(UTF8String.fromString(json))).map { a =>
        val ps = (0 until a.numElements()).map(a.getUTF8String(_).toString)
        ps.size > ps.distinct.size
      }

    // adversarial keys whose literal text mimics path syntax: the kernel's
    // segment escaping must keep them distinct from REAL nesting
    assert(hasDup("""{"a.b":1,"a":{"b":2}}""").contains(false))
    assert(hasDup("""{"x[0]":1,"x":[{"0":1}]}""").contains(false))
    assert(hasDup("""{"a.b":1,"a.b":2}""").contains(true))
    assert(hasDup("""{"a":{"b":1,"b":2}}""").contains(true))

    // seeded fuzz: random trees with at most ONE injected duplicate, so
    // the construction itself is the oracle
    val rnd = new scala.util.Random(7)
    val pool = Seq("id", "a.b", "a", "b", "k[0]", "k", "links", "x\\y", "properties", "0")
    def quote(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    var injected = false
    def genVal(depth: Int): String = rnd.nextInt(4) match {
      case 0 if depth < 4 => genObj(depth + 1)
      case 1 if depth < 4 =>
        (0 until rnd.nextInt(3)).map(_ => genVal(depth + 1)).mkString("[", ",", "]")
      case 2 => rnd.nextInt(100).toString
      case _ => quote(pool(rnd.nextInt(pool.size)))
    }
    def genObj(depth: Int): String = {
      val keys = rnd.shuffle(pool).take(1 + rnd.nextInt(4))
      val fields = scala.collection.mutable.ArrayBuffer.empty[String]
      keys.foreach { k =>
        fields += s"${quote(k)}:${genVal(depth)}"
        if (!injected && rnd.nextDouble() < 0.08) {
          fields += s"${quote(k)}:${genVal(depth)}" // the one duplicate
          injected = true
        }
      }
      fields.mkString("{", ",", "}")
    }
    (1 to 1500).foreach { i =>
      injected = false
      val json = genObj(0)
      val got = hasDup(json)
      assert(got.contains(injected), s"trial $i: injected=$injected got=$got doc=$json")
    }
  }

  test("VARIANT type: parse_json round-trips events.props, variant_get extracts typed values") {
    // the Spark 4 semi-structured surface a 100 TB lake stores open-schema
    // payloads in: parse once into the binary VARIANT encoding, extract
    // typed paths at query time WITHOUT a declared schema — the engine
    // alternative to q51's from_json-with-schema path. Pinned: the column
    // really is VariantType (not a silent string passthrough), typed
    // extraction agrees with the schema'd JSON path on the whole corpus,
    // and malformed input routes through try_parse_json as NULL instead
    // of failing the batch.
    val t = Tables(spark, sf)
    val v = t.events.select(col("event_id"), parse_json(col("props")).as("pv"))
    assert(v.schema("pv").dataType.typeName == "variant",
      s"parse_json did not produce a VARIANT column: ${v.schema("pv").dataType}")
    val got = v
      .select(col("event_id"), expr("variant_get(pv, '$.k', 'bigint')").as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = t.events
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
    // a missing path is NULL, not an error
    val missing = v.select(expr("variant_get(pv, '$.absent', 'bigint')").as("m"))
      .filter(col("m").isNotNull).count()
    assert(missing == 0L)
    // malformed payloads: try_parse_json yields NULL, parse_json throws
    val bad = spark.sql("SELECT try_parse_json('{not json') AS b")
      .filter(col("b").isNotNull).count()
    assert(bad == 0L)
    intercept[Exception] {
      spark.sql("SELECT parse_json('{not json') AS b").collect()
    }
  }

  test("GraftExtensions injects functions into a fresh session") {
    val old = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val got = s2.sql("SELECT simhash64('x y z') AS sh").collect()(0).getAs[Long]("sh")
      assert(got == SimHashImpl.compute(UTF8String.fromString("x y z")))
    } finally {
      SparkSession.clearActiveSession()
      old.foreach { s => SparkSession.setDefaultSession(s); SparkSession.setActiveSession(s) }
    }
  }
}
