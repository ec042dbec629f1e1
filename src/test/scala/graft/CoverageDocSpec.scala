package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md's headline query count is documentation-by-assertion:
  * two consecutive rounds shipped a stale hand-maintained number
  * (167 vs 169, then 177 vs 183), so the count is now spec-enforced —
  * this test fails the build the moment the header drifts from
  * `SparkEntry.queries.size`.
  */
class CoverageDocSpec extends AnyFunSuite {

  test("COVERAGE.md headline count equals SparkEntry.queries.size") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = """Round \d+: (\d+) queries""".r.findFirstMatchIn(text)
    assert(m.isDefined, "COVERAGE.md lost its 'Round N: X queries' header")
    val claimed = m.get.group(1).toInt
    val actual = SparkEntry.queries.size
    assert(claimed == actual,
      s"COVERAGE.md claims $claimed queries but SparkEntry registers " +
        s"$actual — update the header (first 'Round N: X queries' line)")
  }

  test("every registered query has an oracle or is explicitly rows-only") {
    // oracle coverage is the correctness contract: a query without an
    // oracleSql entry gets only the driver's weak rows>0 check, so any
    // such query must be a deliberate choice, not an oversight
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: ${noOracle.toSeq.sorted.mkString(", ")}")
    val orphanOracles =
      SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracle SQL for unregistered queries: " +
        orphanOracles.toSeq.sorted.mkString(", "))
  }
}
