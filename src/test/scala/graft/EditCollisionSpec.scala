package graft

import org.scalatest.funsuite.AnyFunSuite

/** q129's compression-collision sensitivity: the class table under the
  * r13 default 2-chars-per-word alphabet (94², collision odds 1/8836 per
  * word pair) versus the r12 single-char cut (1/94). Jaccard is
  * compression-independent, so rows can only move along the edit_sim
  * axis (both ↔ jaccard_only, edit_only ↔ neither); the spec pins that
  * the total candidate-pair mass is invariant and quantifies the
  * movement the wider alphabet removes.
  */
class EditCollisionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def classTable(): Map[String, Long] = {
    SparkEntry.queries("q129_edit_verify")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("class table: total pair mass is compression-invariant; 94² moves few pairs vs 94") {
    val wide = classTable() // default charsPerWord=2
    spark.conf.set("graft.dedup.edit.charsPerWord", "1")
    val narrow =
      try classTable()
      finally spark.conf.unset("graft.dedup.edit.charsPerWord")
    assert(wide.values.sum == narrow.values.sum,
      s"total candidate pairs moved: wide=$wide narrow=$narrow")
    // jaccard-side mass is untouched by the compression: both+jaccard_only
    // (the jaccard ≥ τ pairs) must be identical between alphabets
    def jside(m: Map[String, Long]) =
      m.getOrElse("both", 0L) + m.getOrElse("jaccard_only", 0L)
    assert(jside(wide) == jside(narrow),
      s"jaccard-side mass moved with compression: wide=$wide narrow=$narrow")
    // the movement the hardening is about: pairs the narrow alphabet's
    // spurious matches push over the edit τ. Bounded, not zero — pin it.
    def eside(m: Map[String, Long]) =
      m.getOrElse("both", 0L) + m.getOrElse("edit_only", 0L)
    val moved = math.abs(eside(wide) - eside(narrow))
    val total = wide.values.sum
    assert(moved <= math.max(1L, total / 20),
      s"edit-side movement $moved of $total pairs exceeds 5% — alphabet sensitivity too high")
  }
}
