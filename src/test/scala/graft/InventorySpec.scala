package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the graded coverage checklist — this spec pins the doc
  * and the code together: every query id named in SURVEY exists in
  * SparkEntry.queries and vice versa, and every query has an oracle.
  */
class InventorySpec extends AnyFunSuite {

  private lazy val surveyIds: Set[String] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    // ids are qNN_ or qNNN_ followed by a snake_case name that may itself
    // carry digits (q98_bm25); \d{2,3} keeps plain "q95" prose unmatched
    "q\\d{2,3}_[a-z][a-z0-9_]*".r.findAllIn(text).toSet
  }

  test("every SURVEY §2 query id is implemented") {
    val missing = surveyIds.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"in SURVEY but not implemented: ${missing.toSeq.sorted}")
  }

  test("every implemented query is listed in SURVEY §2") {
    val undocumented = SparkEntry.queries.keySet.diff(surveyIds)
    assert(undocumented.isEmpty, s"implemented but not in SURVEY: ${undocumented.toSeq.sorted}")
  }

  test("every query has an oracle (full hash-check coverage, no rows-only)") {
    val noOracle = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(noOracle.isEmpty, s"queries without oracle SQL: ${noOracle.toSeq.sorted}")
  }

  test("query ids are unique across modules") {
    // Map construction would silently drop duplicates; count via the module list
    val all = Seq(
      operators.Relational, operators.Lake, operators.CatalogOps, operators.TextAnalysis,
      operators.Dedup, operators.Similarity, operators.Multimodal, operators.StreamingOps,
      operators.Extras)
      .flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query ids: $dups")
  }
}
