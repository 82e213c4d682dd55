package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg groups and aggregates") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0)
  }

  test("q1_agg pushes the shipdate filter to the parquet scan") {
    val plan = planOf(Relational.q1Agg(spark, sfDir))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("q_scalar_filter prunes columns at the scan") {
    val plan = planOf(Relational.qScalarFilter(spark, sfDir))
    // ReadSchema must not include untouched wide columns
    assert(!plan.contains("l_returnflag"))
    assert(plan.contains("PushedFilters"))
  }

  test("q3_join_topk broadcasts the customer dim and returns <=10 ordered rows") {
    val df = Relational.q3JoinTopk(spark, sfDir)
    assert(planOf(df).contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5_star_join yields one row per ASIA nation") {
    val rows = Relational.q5StarJoin(spark, sfDir).collect()
    assert(rows.length <= 5 && rows.nonEmpty)
  }

  test("q_window_rank keeps at most 3 rows per priority, correctly ranked") {
    val rows = Relational.qWindowRank(spark, sfDir).collect()
    val perGroup = rows.groupBy(_.getAs[String]("o_orderpriority"))
    perGroup.values.foreach { g =>
      assert(g.length <= 3)
      assert(g.map(_.getAs[Long]("rk")).sorted.sameElements(1L to g.length))
    }
  }

  test("q_topk_orders uses TakeOrderedAndProject (no global sort)") {
    val df = Relational.qTopkOrders(spark, sfDir)
    assert(planOf(df).contains("TakeOrderedAndProject"))
    assert(df.collect().length == 20)
  }

  test("q_count_distinct counts users per type") {
    val rows = Relational.qCountDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("users") <= r.getAs[Long]("cnt")))
  }

  test("q_pivot row sums and q_rollup grand total agree with the raw count") {
    val n = graft.Tables.events(spark, sfDir).count()
    val pivotTotal = Relational.qPivot(spark, sfDir).collect()
      .map(r => (0 until 4).map(c => r.getAs[Long](s"ch$c")).sum).sum
    assert(pivotTotal == n, "pivot cells must partition the stream")
    val rollup = Relational.qRollup(spark, sfDir).collect()
    val grand = rollup.filter(r =>
      r.getAs[String]("event_type") == "ALL" && r.getAs[Long]("channel") == -1L)
    assert(grand.length == 1 && grand.head.getAs[Long]("cnt") == n)
    // leaf rows (no ALL marker) also partition the stream
    val leaves = rollup.filter(r =>
      r.getAs[String]("event_type") != "ALL" && r.getAs[Long]("channel") != -1L)
    assert(leaves.map(_.getAs[Long]("cnt")).sum == n)
  }

  test("q_stratified_sample: splits partition orders deterministically at ~80/10/10") {
    val rows = Relational.qStratifiedSample(spark, sfDir).collect()
    val n = graft.Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == n, "splits must partition the table")
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_orders")).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val trainFrac = bySplit("train").toDouble / n
    assert(trainFrac > 0.75 && trainFrac < 0.85, s"train frac $trainFrac far from 0.8")
    // Deterministic: a re-run yields the identical audit (no RNG state).
    val again = Relational.qStratifiedSample(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // The split column is derived in a narrow map: the scan reads only the
    // three referenced columns and the audit hash-aggregates.
    val plan = planOf(Relational.qStratifiedSample(spark, sfDir))
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"))
    assert(!plan.contains("o_orderdate"), "unreferenced columns must be pruned from the scan")
  }
}
