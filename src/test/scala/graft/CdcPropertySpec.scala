package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks of the CDC fold semantics against brute-force
  * in-memory reference implementations — the oracle checks pin the testdata
  * distribution; these pin the ALGEBRA on adversarial inputs (ties, all-
  * deletes, single-event keys, duplicated timestamps). Fixed seeds keep the
  * suite deterministic.
  */
class CdcPropertySpec extends SparkSpec {

  private case class E(userId: Long, ts: Long, isDelete: Boolean)

  private val genEvents: Gen[List[E]] = Gen.nonEmptyListOf(for {
    u <- Gen.choose(0L, 8L)
    ts <- Gen.choose(0L, 20L) // tight range to force ts collisions
    d <- Gen.prob(0.3)
  } yield E(u, ts, d))

  private val params = Gen.Parameters.default.withSize(60)

  test("ValidData fold: Spark fold == reference fold, incl. tie semantics") {
    import spark.implicits._
    (1 to 20).foreach { i =>
      val evs = genEvents.pureApply(params, Seed(42L + i))
      val df = evs.map(e => (e.userId, e.ts, e.isDelete)).toDF("user_id", "ts", "is_delete")
      val folded = df.groupBy(col("user_id"))
        .agg(max(when(!col("is_delete"), col("ts"))).as("u"),
          max(when(col("is_delete"), col("ts"))).as("d"))
        .filter(col("u").isNotNull && (col("d").isNull || col("u") >= col("d")))
        .select("user_id").collect().map(_.getLong(0)).toSet
      val expected = evs.groupBy(_.userId).collect {
        case (u, es)
            if es.exists(!_.isDelete) &&
              (!es.exists(_.isDelete) ||
                es.filter(!_.isDelete).map(_.ts).max >= es.filter(_.isDelete).map(_.ts).max) =>
          u
      }.toSet
      assert(folded == expected, s"seed ${42L + i}: $evs")
    }
  }

  test("as-of carry-forward: running struct-max == brute-force last-at-or-before") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val genProbes = Gen.nonEmptyListOf(Gen.choose(0L, 20L))
    (1 to 20).foreach { i =>
      val evs = genEvents.pureApply(params, Seed(1000L + i))
      val probes = genProbes.pureApply(params, Seed(2000L + i)).distinct
      val ev = evs.zipWithIndex.map { case (e, idx) => (e.ts, idx.toLong) }
      val stream = ev.toDF("ts", "event_id")
        .select(col("ts"), col("event_id"), lit(0).as("is_probe"),
          lit(null).cast("long").as("probe_ts"))
      val probe = probes.toDF("pts")
        .select(col("pts").as("ts"), lit(null).cast("long").as("event_id"),
          lit(1).as("is_probe"), col("pts").as("probe_ts"))
      val w = Window.orderBy(col("ts"), col("is_probe"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val got = stream.unionAll(probe)
        .withColumn("pos",
          max(when(col("is_probe") === 0, struct(col("ts"), col("event_id")))).over(w))
        .filter(col("is_probe") === 1 && col("pos").isNotNull)
        .select(col("probe_ts"), col("pos.ts"), col("pos.event_id"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toSet
      val expected = (for {
        p <- probes
        eligible = ev.filter(_._1 <= p)
        if eligible.nonEmpty
      } yield (p, eligible.max)).toSet
      assert(got == expected, s"iteration $i")
    }
  }
}
