package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch
import graft.sources.Sources

class SketchSourcesSpec extends SparkSpec {

  test("approx_distinct stays within the configured relative error") {
    val rows = Sketch.approxDistinctRaw(spark, sfDir, rsd = 0.02).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
    // The oracle-facing verdict form must hold the same statement.
    Sketch.approxDistinct(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"), s"verdict false for $r")
    }
  }

  test("hll merge: unioned per-channel sketches estimate the global distinct") {
    val r = Sketch.hllMergeRaw(spark, sfDir).collect().head
    val exact = r.getAs[Long]("exact_users").toDouble
    val approx = r.getAs[Long]("approx_users").toDouble
    assert(r.getAs[Long]("n_channels") == 4L)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"merged estimate $approx vs exact $exact")
    assert(Sketch.hllMerge(spark, sfDir).collect().head.getAs[Boolean]("approx_ok"))
  }

  test("quantile sketch lands within a rank-neighborhood of each percentile") {
    // The sketch guarantee is on RANK, not value: it returns an element
    // whose rank is within n/accuracy of the target — in a heavy tail the
    // neighboring order statistics can differ a lot in value. Bracket each
    // approximate quantile between exact quantiles of a widened rank band.
    val lo = graft.Tables.events(spark, sfDir).groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.40, 0.85, 0.90))").as("lo"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    Sketch.valueQuantilesRaw(spark, sfDir).collect().foreach { r =>
      val et = r.getAs[String]("event_type")
      val approx = r.getSeq[Double](r.fieldIndex("aq"))
      val exactMax = r.getSeq[Double](r.fieldIndex("eq")).last
      approx.zip(lo(et)).foreach { case (a, l) =>
        assert(a >= l, s"$et: approx $a below rank band floor $l")
      }
      assert(approx.last <= exactMax * 1.5 + 1e-6,
        s"$et: p99 sketch ${approx.last} wildly above exact tail $exactMax")
      assert(approx == approx.sorted, "quantiles must be monotone")
    }
    // The oracle-facing verdict form: every bracket check must pass.
    Sketch.valueQuantiles(spark, sfDir).collect().foreach { r =>
      Seq("ok_p50", "ok_p95", "ok_p99").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c false for ${r.getAs[String]("event_type")}")
      }
    }
  }

  test("partitioned change log: channel/day filters prune at the partition level") {
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString + "/log"
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("channel", pmod(col("user_id"), lit(4)).cast("long"))
      .withColumn("day", to_date(col("ts")))
    Sources.writePartitioned(ev, base, "channel", "day")
    val t = Sources.readPartitioned(spark, base)
    val tail = t.filter(col("channel") === 2 && col("day") >= lit("2024-01-20"))
    val plan = planOf(tail)
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("isnotnull(channel") || plan.contains("(channel")),
      s"channel/day predicates must prune partitions, not filter rows:\n$plan")
    // Pruned read must agree with the unpartitioned filter.
    val expected = graft.Tables.events(spark, sfDir)
      .filter(pmod(col("user_id"), lit(4)) === 2 && to_date(col("ts")) >= lit("2024-01-20"))
      .count()
    assert(tail.count() == expected)
  }

  test("JSON-lines change log: round trip is lossless, folds agree with parquet") {
    val base = java.nio.file.Files.createTempDirectory("graft-json").toString + "/log"
    val ev = graft.Tables.events(spark, sfDir)
    Sources.writeJsonLog(ev, base)
    val back = Sources.readJsonLog(spark, base, ev.schema)
    // Losslessness proper: full-row set equality across the round trip —
    // every column, including microsecond timestamps on error rows.
    assert(ev.except(back).isEmpty && back.except(ev).isEmpty,
      "JSON round trip must preserve every row bit-for-bit")
  }

  test("bucketed change log: PK fold and self-join run with zero shuffles") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"))
    Sources.writeBucketed(ev, "events_bucketed", "user_id", buckets = 8)
    val t = Sources.readBucketed(spark, "events_bucketed")
    def shuffles(p: String): Int = "Exchange hashpartitioning".r.findAllIn(p).length
    val fold = t.groupBy(col("user_id"))
      .agg(max(col("ts")).as("head_ts"), count(lit(1)).as("n"))
    assert(shuffles(planOf(fold)) == 0,
      s"bucketed fold must not shuffle:\n${planOf(fold)}")
    assert(fold.count() > 0)
    val joined = fold.join(t, "user_id")
    assert(shuffles(planOf(joined)) == 0,
      "co-bucketed self-join must not shuffle (broadcast of the small side is fine)")
    assert(joined.count() >= fold.count())
  }
}
