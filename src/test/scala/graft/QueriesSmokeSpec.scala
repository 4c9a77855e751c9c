package graft

/** Every declared query runs end-to-end on sf0.001 and the flagship entry
  * returns rows (the driver's t1 smoke, BASELINE.md).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("benchQueries resolve") {
    assert(SparkEntry.benchQueries.forall(SparkEntry.queries.contains))
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      assert(fn(spark, sfSmoke).count() >= 0)
    }
  }
}
