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

  test("Verify refuses a non-oracle channel count (SPARK_GRAFT_CHANNELS footgun)") {
    // Every CDC oracle SQL statement hard-codes user_id % 4; an oracle
    // dump under a channel override would silently hash-mismatch, so
    // Verify must fail fast instead.
    Verify.requireOracleChannels(4) // the oracle rule passes
    Seq(1, 8, 64).foreach { n =>
      intercept[IllegalArgumentException](Verify.requireOracleChannels(n))
    }
  }

  test("corpus contract: documents carry non-empty text (n_chars > 0)") {
    // The TextGates kernel defines punct=0 on zero-length text where the
    // Column chain's ANSI division would throw — deliberate totality, but
    // the parity domain is docs with characters. Pin the contract the
    // gated corpora actually satisfy so a loosened generator is caught
    // here, not as a silent kernel/Column divergence.
    import org.apache.spark.sql.functions._
    val m = graft.Tables.documents(spark, sfDir)
      .agg(min(length(col("text"))).as("mn")).collect()(0).getInt(0)
    assert(m > 0, s"documents corpus must have non-empty text, min chars = $m")
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
