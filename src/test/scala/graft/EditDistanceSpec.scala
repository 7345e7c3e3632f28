package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.EditDistanceKernel

/** The bit-parallel Levenshtein kernel (Myers/Hyyrö) must be
  * VALUE-IDENTICAL to the engine built-in it replaces in q129 — equality
  * is machine-checked here against `UTF8String.levenshteinDistance` (the
  * built-in's own kernel) on adversarial shapes and a randomized sweep
  * spanning every 64-bit block-boundary length the blocked algorithm
  * switches carry logic at.
  */
class EditDistanceSpec extends AnyFunSuite {

  private def builtin(a: String, b: String): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))

  private def bp(a: String, b: String): Int =
    EditDistanceKernel.lev(UTF8String.fromString(a), UTF8String.fromString(b))

  private def check(a: String, b: String): Unit = {
    val want = builtin(a, b)
    val got = bp(a, b)
    assert(got == want,
      s"lev('${a.take(40)}'(${a.length}), '${b.take(40)}'(${b.length})): bp=$got builtin=$want")
  }

  test("edge shapes: empties, equal, disjoint, prefixes, repeats") {
    check("", "")
    check("", "abc")
    check("abc", "")
    check("a", "a")
    check("a", "b")
    check("kitten", "sitting")
    check("flaw", "lawn")
    check("abcdef", "abcdef")
    check("aaaa", "bbbb")
    check("ab" * 100, "ba" * 100)
    check("x" * 64, "x" * 64 + "y")   // carry exactly at bit 63
    check("x" * 65, "x" * 64)
    check("abc" * 90, "acb" * 85)     // multi-block, length ≠
    check("q129" * 64, "q130" * 64)
  }

  test("block-boundary lengths: every (m, n) near 64/128/192/256 agrees") {
    val rnd = new scala.util.Random(42)
    // q129's alphabet: printable ASCII 33..126
    def s(len: Int): String =
      (0 until len).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
    for (m <- Seq(1, 2, 63, 64, 65, 127, 128, 129, 191, 192, 193, 255, 256);
         n <- Seq(0, 1, 63, 64, 65, 128, 256)) {
      check(s(m), s(n))
    }
  }

  test("randomized sweep: 2000 pairs, mixed lengths, near-duplicate and disjoint") {
    val rnd = new scala.util.Random(4242)
    def s(len: Int): String =
      (0 until len).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
    for (_ <- 1 to 1000) {
      val a = s(1 + rnd.nextInt(300))
      // near-duplicate: mutate a few positions of a
      val chars = a.toCharArray
      for (_ <- 0 to rnd.nextInt(5)) {
        chars(rnd.nextInt(chars.length)) = (33 + rnd.nextInt(94)).toChar
      }
      check(a, new String(chars))
      check(a, s(1 + rnd.nextInt(300)))
    }
  }

  test("non-ASCII inputs take the code-point fallback and agree with the built-in") {
    check("māori", "maori")
    check("tūī", "tui")
    check("ā" * 70, "a" * 70)
    check("abcā", "abc")
    // mixed: one side ASCII, one not
    check("plain ascii", "plāin āscii")
  }
}
