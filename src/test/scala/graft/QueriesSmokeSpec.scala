package graft

/** Every SparkEntry query must run end-to-end on sf0.001 and return rows.
  * (Exact correctness is the driver's DuckDB oracle gate; see
  * tools/check_oracle.py for the local equivalent.)
  */
class QueriesSmokeSpec extends SparkSpecBase {

  // q11 can be empty at the smallest sf; everything else must yield rows.
  private val mayBeEmpty = Set.empty[String]

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val n = fn(spark, Sf0001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
