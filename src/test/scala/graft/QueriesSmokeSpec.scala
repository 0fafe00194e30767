package graft

/** Driver-contract smoke: every query runs at sf0.001 and the flagship
  * returns rows. (Value-level correctness is the DuckDB oracle gate,
  * driven by Verify + tools/check.py.) */
class QueriesSmokeSpec extends GraftSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query outputs a raw DECIMAL column (portable-hash rule)") {
    // The driver's oracle compare hashes decimal text differently per
    // engine (trailing zeros), so every DECIMAL must be cast to DOUBLE at
    // the output edge — the q03 rule. Analysis-only: no query executes.
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      fn(spark, "/root/testdata/sf0.001").schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          s"$name.${f.name}"
      }.toSeq
    }
    assert(offenders.isEmpty, s"raw DECIMAL output columns: $offenders")
  }

  test("every query has matching oracle keys and runs at sf0.001") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
