package graft

import graft.functions.{ByteHistogramKernel, MinHashKernel, SubwordKernel}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pins for the native kernels' cross-engine contracts.
  * Each kernel's correctness argument is an EQUIVALENCE claim ("the tight
  * loop computes exactly what the oracle's closed form computes"); the
  * corpus queries only exercise the corpus's character distribution, so
  * these properties drive randomized inputs — including the edge shapes
  * the corpus never produces (empty strings, runs of spaces, non-ASCII,
  * surrogate pairs) — against independent reimplementations.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  // text shaped to collide with the subword vocab AND to hit boundaries:
  // letters, spaces (incl. runs), digits/punct, non-ASCII, an emoji
  // (surrogate pair)
  private val piece: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf(('a' to 'z').map(_.toString)),
    3 -> Gen.oneOf(SubwordKernel.units),
    2 -> Gen.const(" "),
    1 -> Gen.oneOf(".", ",", "!", "0", "9", "A", "Z"),
    1 -> Gen.oneOf("é", "中", "😀"))
  private val text: Gen[String] = Gen.listOf(piece).map(_.mkString)

  test("subword kernel == the oracle's regex closed form on arbitrary strings") {
    val re = SubwordKernel.regexAlternation
    check(Prop.forAll(text) { s =>
      val after = s.replaceAll(re, "#")
      // the oracle: length(after_replace) − n_spaces, in CODE POINTS
      val expected = after.codePointCount(0, after.length) - s.count(_ == ' ')
      SubwordKernel.count(UTF8String.fromString(s)) == expected.toLong
    })
  }

  test("byte histogram kernel == a naive per-byte recount on arbitrary strings") {
    check(Prop.forAll(text) { s =>
      val bins = new Array[Long](16)
      s.getBytes("UTF-8").foreach(b => bins((b & 0xff) >>> 4) += 1)
      val got = ByteHistogramKernel.hist(UTF8String.fromString(s)).toLongArray()
      got.toSeq == bins.toSeq
    })
  }

  test("shingle kernel == first-occurrence-distinct word 3-grams on arbitrary strings") {
    check(Prop.forAll(text) { s =>
      val words = s.split(" ", -1)
      val expected =
        if (words.length < 3) null
        else (0 to words.length - 3).map(i => words.slice(i, i + 3).mkString(" ")).distinct
      val got = Option(graft.functions.ShingleKernel.distinctShingles(UTF8String.fromString(s)))
        .map(_.toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq)
        .orNull
      got == expected
    })
  }

  test("simhash64 kernel == an independent FNV-1a bit-majority recomputation") {
    def fnv(tok: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      tok.foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
      h
    }
    check(Prop.forAll(text) { s =>
      val toks = s.getBytes("UTF-8")
        .foldLeft(List(Vector.empty[Byte])) { (acc, b) =>
          if (b == ' '.toByte) Vector.empty[Byte] :: acc
          else (acc.head :+ b) :: acc.tail
        }
        .reverse.filter(_.nonEmpty).map(_.toArray)
      val expected: Any =
        if (toks.isEmpty) null
        else {
          val hs = toks.map(fnv)
          (0 until 64).foldLeft(0L) { (out, b) =>
            val ones = hs.count(h => ((h >>> b) & 1L) == 1L)
            if (2 * ones >= hs.length) out | (1L << b) else out
          }
        }
      val got: Any = graft.functions.SimHashImpl.computeOrNull(UTF8String.fromString(s))
      got == expected
    })
  }

  test("minhash kernel == the md5→int32→band-rehash pipeline on arbitrary strings") {
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    check(Prop.forAll(text, Gen.choose(1, 12)) { (s, bands) =>
      val words = s.split(" ", -1)
      val expected =
        if (words.length < 3) null
        else {
          val hs = (0 to words.length - 3)
            .map(i => java.lang.Long.parseLong(md5hex(words.slice(i, i + 3).mkString(" ")).take(8), 16))
          (0 until bands).map { b =>
            if (hs.isEmpty) Long.MaxValue
            else hs.map(h => (h * (2 * b + 1) + 7919L * b) % 2147483647L).min
          }
        }
      val got = Option(MinHashKernel.sigs(UTF8String.fromString(s), bands))
        .map(_.toLongArray().toSeq).orNull
      got == expected
    })
  }

  // ---- bounded bottom-k aggregator (the q91/q94/q95 window replacement) ----

  private val bkItem: Gen[graft.functions.BKItem] = for {
    k1 <- Gen.choose(-20L, 20L) // small domain so ties and duplicates are common
    k2 <- Gen.choose(-5L, 5L)
    v <- Gen.choose(-100L, 100L)
  } yield graft.functions.BKItem(k1, k2, v)

  private def bkOrd: Ordering[graft.functions.BKItem] =
    Ordering.by(i => (i.k1, i.k2, i.v))

  test("bottom-k reduce == sort-and-take on arbitrary inputs, duplicates kept") {
    check(Prop.forAll(Gen.listOf(bkItem), Gen.choose(1, 8)) { (xs, k) =>
      val agg = graft.functions.BottomK(k, distinctK1 = false)
      val got = xs.foldLeft(agg.zero)(agg.reduce).items
      got == xs.sorted(bkOrd).take(k)
    })
  }

  test("bottom-k distinct mode == dedup-by-k1-keep-min, then sort-and-take") {
    check(Prop.forAll(Gen.listOf(bkItem), Gen.choose(1, 8)) { (xs, k) =>
      val agg = graft.functions.BottomK(k, distinctK1 = true)
      val got = xs.foldLeft(agg.zero)(agg.reduce).items
      val expected = xs.groupBy(_.k1).values.map(_.min(bkOrd)).toSeq.sorted(bkOrd).take(k)
      got == expected
    })
  }

  test("bottom-k merge of arbitrary partition splits == single-partition reduce") {
    // associativity + commutativity evidence: this is what licenses Spark
    // to partial-aggregate map-side and merge buffers in any order
    val gen = for {
      xs <- Gen.listOf(bkItem)
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(xs.length, 1)))
      k <- Gen.choose(1, 8)
      distinct <- Gen.oneOf(true, false)
    } yield (xs, cuts.sorted, k, distinct)
    check(Prop.forAll(gen) { case (xs, cuts, k, distinct) =>
      val agg = graft.functions.BottomK(k, distinct)
      val bounds = (0 +: cuts :+ xs.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val single = xs.foldLeft(agg.zero)(agg.reduce)
      merged.items == single.items
    })
  }
}
