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

  test("apply-changes algebra: snapshot⊕delta == full fold at EVERY split point") {
    import spark.implicits._
    (1 to 10).foreach { i =>
      val evs = genEvents.pureApply(params, Seed(3000L + i))
      val df = evs.map(e => (e.userId, e.ts, e.isDelete)).toDF("user_id", "ts", "is_delete")
      def fold(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("user_id"))
          .agg(max(when(!col("is_delete"), col("ts"))).as("u"),
            max(when(col("is_delete"), col("ts"))).as("d"),
            count(when(!col("is_delete"), lit(1))).as("uc"),
            count(when(col("is_delete"), lit(1))).as("dc"))
      val full = fold(df).collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), r.getLong(3), r.getLong(4)))
        .toMap
      // Try several checkpoints including degenerate ones (all / nothing in snapshot).
      Seq(-1L, 0L, 10L, 20L, 21L).foreach { cp =>
        val merged = fold(df.filter(col("ts") <= cp)).as("s")
          .join(fold(df.filter(col("ts") > cp)).as("t"), Seq("user_id"), "full_outer")
          .select(col("user_id"),
            greatest(col("s.u"), col("t.u")).as("u"),
            greatest(col("s.d"), col("t.d")).as("d"),
            (coalesce(col("s.uc"), lit(0L)) + coalesce(col("t.uc"), lit(0L))).as("uc"),
            (coalesce(col("s.dc"), lit(0L)) + coalesce(col("t.dc"), lit(0L))).as("dc"))
          .collect()
          .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), r.getLong(3), r.getLong(4)))
          .toMap
        assert(merged == full, s"seed ${3000L + i} checkpoint $cp")
      }
    }
  }

  test("TSO compose/parse roundtrips for arbitrary physical/logical pairs") {
    import spark.implicits._
    val gen = Gen.listOfN(200, for {
      phys <- Gen.choose(0L, 4102444800000L) // up to year 2100 in ms
      logical <- Gen.choose(0L, (1L << 18) - 1)
    } yield (phys, logical))
    val pairs = gen.pureApply(params, Seed(77L))
    val bad = pairs.toDF("phys", "logical")
      .select(col("phys"), col("logical"),
        (shiftleft(col("phys"), 18) + col("logical")).as("tso"))
      .filter(shiftrightunsigned(col("tso"), 18) =!= col("phys") ||
        col("tso").bitwiseAND(lit((1L << 18) - 1)) =!= col("logical"))
      .count()
    assert(bad == 0L)
  }

  test("sessionize algebra: window cumsum == brute-force gap scan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gap = 5L
    val gen = Gen.nonEmptyListOf(for {
      u <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 60L)
    } yield (u, ts))
    (1 to 10).foreach { i =>
      val evs = gen.pureApply(params, Seed(5000L + i))
        .zipWithIndex.map { case ((u, ts), idx) => (u, ts, idx.toLong) }
      val byUser = Window.partitionBy(col("u")).orderBy(col("ts"), col("id"))
      val got = evs.toDF("u", "ts", "id")
        .withColumn("prev", lag(col("ts"), 1).over(byUser))
        .withColumn("ns", when(col("prev").isNull || col("ts") - col("prev") > gap, 1L)
          .otherwise(0L))
        .withColumn("sid", sum(col("ns")).over(byUser))
        .groupBy(col("u")).agg(max(col("sid")).as("n_sessions"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = evs.groupBy(_._1).map { case (u, es) =>
        val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
        u -> (1L + ts.zip(ts.tail).count { case (a, b) => b - a > gap })
      }
      assert(got == expected, s"seed ${5000L + i}")
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

  test("data barrier: bucket-decomposed forward as-of == brute force, any bucket width") {
    import spark.implicits._
    val genCh: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(for {
      c <- Gen.choose(0L, 2L)
      ts <- Gen.choose(0L, 20L) // ties + probe-equal ts on purpose
    } yield (c, ts))
    val genDdl: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.choose(0L, 25L))
    (1 to 15).foreach { i =>
      val evs = genCh.pureApply(params, Seed(4000L + i))
      val ddls = genDdl.pureApply(params, Seed(5000L + i)).distinct
        .zipWithIndex.map { case (ts, idx) => (idx.toLong, ts) }
      val chDf = evs.toDF("channel", "ts")
      val ddlDf = ddls.toDF("ddl_id", "ddl_ts")
      val present = evs.map(_._1).distinct
      val expected = (for {
        (id, dts) <- ddls
        crossings = present.flatMap { c =>
          val hit = evs.filter(e => e._1 == c && e._2 >= dts).map(_._2)
          if (hit.isEmpty) None else Some(hit.min)
        }
        if crossings.size == 3 // every channel must cross
      } yield (id, dts, crossings.max)).toSet
      // Widths force single-bucket, multi-bucket, and bucket-per-tick
      // regimes — the decomposition must be invisible in the answer.
      Seq(1L, 5L, 1000L).foreach { width =>
        val got = graft.cdc.Cdc.barrierTsFrom(chDf, ddlDf, numChannels = 3, width)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == expected, s"iteration $i width $width")
      }
    }
  }

  test("seek as-of: bucket-decomposed backward as-of == brute force, any bucket width") {
    import spark.implicits._
    val genEv: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(for {
      c <- Gen.choose(0L, 2L)
      ts <- Gen.choose(0L, 20L) // ties + probe-equal ts on purpose
    } yield (c, ts))
    val genProbe: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(for {
      c <- Gen.choose(0L, 2L)
      ts <- Gen.choose(0L, 25L)
    } yield (c, ts))
    (1 to 15).foreach { i =>
      val evs = genEv.pureApply(params, Seed(6000L + i)).zipWithIndex
        .map { case ((c, ts), idx) => (c, ts, idx.toLong) }
      val probes = genProbe.pureApply(params, Seed(7000L + i)).distinct
        .zipWithIndex.map { case ((c, ts), idx) => (c, ts, idx.toLong) }
      val evDf = evs.toDF("channel", "ts", "event_id")
      val prDf = probes.map { case (c, ts, id) => (c, ts, id) }
        .toDF("channel", "ts", "ddl_id")
      val expected = (for {
        (c, pts, id) <- probes
        eligible = evs.collect { case (ec, ets, eid) if ec == c && ets <= pts => (ets, eid) }
        if eligible.nonEmpty
      } yield (id, c, eligible.max._1, eligible.max._2)).toSet
      // Widths force single-bucket, multi-bucket, and bucket-per-tick
      // regimes — the decomposition must be invisible in the answer.
      Seq(1L, 5L, 1000L).foreach { width =>
        val got = graft.cdc.Cdc.seekAsofFrom(evDf, prDf, width)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got == expected, s"iteration $i width $width")
      }
    }
  }

  test("channel mapping: idx DIV averageCnt == the reference's greedy first-fit, all count shapes") {
    import spark.implicits._
    // Direct restatement of channel_mapping.go's runtime: channels arrive
    // in index order; AddKeyValue assigns each key-side channel to the
    // first value-side channel CheckKeyNotExist admits (< averageCnt).
    def greedy(srcCnt: Int, tgtCnt: Int): (Set[(Long, Long)], Long) =
      if (srcCnt == tgtCnt) ((0 until srcCnt).map(i => (i.toLong, i.toLong)).toSet, 1L)
      else if (srcCnt > tgtCnt) {
        val avg = (srcCnt + tgtCnt - 1) / tgtCnt
        val cnt = Array.fill(tgtCnt)(0)
        val pairs = (0 until srcCnt).map { i =>
          val t = cnt.indexWhere(_ < avg); cnt(t) += 1; (i.toLong, t.toLong)
        }
        (pairs.toSet, avg.toLong)
      } else {
        val avg = (tgtCnt + srcCnt - 1) / srcCnt
        val cnt = Array.fill(srcCnt)(0)
        val pairs = (0 until tgtCnt).map { j =>
          val s = cnt.indexWhere(_ < avg); cnt(s) += 1; (s.toLong, j.toLong)
        }
        (pairs.toSet, avg.toLong)
      }
    def idxOf(name: String): Long = name.substring(name.lastIndexOf('_') + 1).toLong
    (1 to 8).foreach { srcCnt =>
      val src = (0L until srcCnt.toLong).toDF("src_idx")
      val scenarios = (1 to 8).map(t => (s"t$t", t.toLong)).toDF("scenario", "target_cnt")
      val rows = graft.cdc.Cdc.channelMappingResolve(src, scenarios).collect()
      (1 to 8).foreach { tgtCnt =>
        val (expPairs, expAvg) = greedy(srcCnt, tgtCnt)
        val got = rows.filter(_.getAs[String]("scenario") == s"t$tgtCnt")
        assert(got.forall(_.getAs[Long]("average_cnt") == expAvg),
          s"src=$srcCnt tgt=$tgtCnt averageCnt")
        val gotPairs = got.map(r => (idxOf(r.getAs[String]("source_channel")),
          idxOf(r.getAs[String]("target_channel")))).toSet
        assert(gotPairs == expPairs, s"src=$srcCnt tgt=$tgtCnt")
      }
    }
  }

  test("position codec: columnar protobuf roundtrips on adversarial generated positions") {
    // The corpus only exercises 2024 timestamps and small event ids; pin
    // the codec on the whole valid domain — any ms epoch past 1980 (TSO
    // in [2^56, 2^63) after the 18-bit shift) and any non-negative id,
    // including Long.MaxValue and ids exceeding the 18-bit logical field.
    import spark.implicits._
    val genPos: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(for {
      ms <- Gen.oneOf(Gen.choose(320000000000L, 7000000000000L),
        Gen.oneOf(320000000000L, 7000000000000L, 946684800000L))
      id <- Gen.oneOf(Gen.choose(0L, Long.MaxValue),
        Gen.oneOf(0L, 1L, 262143L, 262144L, Long.MaxValue))
    } yield (ms, id))
    (1 to 10).foreach { i =>
      val ps = genPos.pureApply(params, Seed(3000L + i)).distinct
      val df = ps.zipWithIndex.map { case ((ms, id), idx) =>
        (idx.toLong % 3, idx.toLong % 4, new java.sql.Timestamp(ms), id)
      }.toDF("collection_id", "channel", "pos_ts", "pos_event_id")
      val out = graft.cdc.Cdc.positionCodecFrom(df).collect()
      assert(out.length == ps.length)
      out.foreach { r =>
        assert(r.getAs[Boolean]("roundtrip_ok"),
          s"iteration $i: decode(encode(p)) != p for $r")
      }
    }
  }

  test("msgpack batching: windowed prefix-sum == sequential packer fold on random streams") {
    import spark.implicits._
    // Random per-channel streams with sizes straddling the oversize
    // threshold at varying densities (including none and many), sparse AND
    // dense event ids (bucket boundaries exercised both ways), and small
    // maxCount so count flushes interleave with size flushes; expected
    // values come from the shared [[PackerReference]] sequential replay.
    val genStream = for {
      n <- Gen.choose(1, 400)
      stride <- Gen.oneOf(1L, 7L, 5000L) // dense, co-prime-ish, bucket-jumping
      ovProb <- Gen.oneOf(0.0, 0.1, 0.6)
      sizes <- Gen.listOfN(n, Gen.prob(ovProb).flatMap(ov =>
        if (ov) Gen.choose(1001L, 5000L) else Gen.choose(1L, 1000L)))
    } yield sizes.zipWithIndex.map { case (sz, i) => (i * stride + 1, sz) }
    (1 to 12).foreach { i =>
      val msgs = genStream.pureApply(params, Seed(7000L + i))
      val expected = PackerReference.fold(msgs, maxCount = 5, maxBytes = 1000L)
      val df = msgs.map { case (id, sz) => (0L, id, sz) }.toDF("channel", "event_id", "sz")
      val got = graft.cdc.Cdc.msgpackBatchFrom(df, 5, 1000L)
        .orderBy(col("batch_id")).collect()
        .map(r => (r.getAs[Long]("n_msgs"), r.getAs[Long]("batch_bytes"),
          r.getAs[Long]("first_event_id"), r.getAs[Long]("last_event_id"),
          r.getAs[String]("reason"))).toSeq
      assert(got === expected, s"seed ${7000L + i}: ${msgs.take(20)}...")
    }
  }
}
