package graft

/** Driver-contract integrity: the invariants the correctness gate assumes.
  * A typo'd key or a query that throws on construction would silently
  * become a missing oracle row in the driver's compare — fail fast here.
  */
class ContractSpec extends SparkSpec {

  test("every oracle key names a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("the operator inventory is complete and every op carries an oracle") {
    assert(SparkEntry.queries.size >= 90)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Round 5 closed the last rows-only entries: the sketches assert their
    // error bound as an oracle-checkable verdict, and dedup_simhash's hash
    // family is exact-integer so the oracle recomputes its fingerprints
    // verbatim. Nothing may regress to rows-only.
    assert(noOracle.isEmpty, s"rows-only ops reappeared: $noOracle")
  }

  test("bench marks a throwing query as error; healthy queries stay ok") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "good" -> ((s, _) => s.range(5).toDF()),
      "bad" -> ((_, _) => throw new RuntimeException("boom")))
    val r = Bench.timeQueries(spark, qs, sfDir, repeat = 2)
    assert(r("good")._2 === "ok")
    assert(r("bad")._2 === "error",
      "a failing query must surface as error, never silently bench")
  }

  test("entry() returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every batch query constructs a plan against sf0.001") {
    // Construction must never throw (streaming queries execute on
    // construction and are exercised by their own specs).
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!name.startsWith("stream_")) {
        val df = fn(spark, sfDir)
        assert(df.schema.fields.nonEmpty, s"$name: empty schema")
      }
    }
  }
}
