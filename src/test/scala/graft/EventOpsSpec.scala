package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, lit, pmod}
import graft.ops.EventOps

/** Pins for the bin-bucketed range join (point-in-interval): result
  * parity against a brute-force recompute, and the physical-plan claim
  * that bucketing actually removed the nested-loop join a pure range
  * predicate would force.
  */
class EventOpsSpec extends SparkSpec {

  test("range join matches a brute-force point-in-interval recompute") {
    val got = EventOps.rangeJoinActiveSessions(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toMap

    val ev = EventOps.load(spark, sf())
      .select("event_id", "user_id", "ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sess = EventOps.sessionStats(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us")))

    assert(got.size == ev.length) // one output row per event, always
    for ((eid, user, ts) <- ev) {
      val want = sess.count { case (su, s0, s1) =>
        su != user && s0 <= ts && ts <= s1
      }
      assert(got(eid) == want.toLong, s"event $eid")
    }
  }

  test("gapfill: dense hourly grid, LOCF carries the last observation") {
    val rows = EventOps.gapfillLocf(spark, sf()).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    val hourUs = 3600L * 1000000L
    byUser.values.foreach { rs =>
      val hours = rs.map(_.getAs[Long]("hour_us")).sorted
      // grid is dense: consecutive hours, no gaps, no duplicates
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == hourUs })
      // first grid hour is observed by construction (span min)
      val sorted = rs.sortBy(_.getAs[Long]("hour_us"))
      assert(sorted.head.getAs[Boolean]("observed"))
      // LOCF: unobserved hours repeat the previous filled value
      sorted.sliding(2).foreach {
        case Array(prev, cur) if !cur.getAs[Boolean]("observed") =>
          assert(cur.getAs[Double]("filled_value") ==
            prev.getAs[Double]("filled_value"))
        case _ =>
      }
    }
    // observed cells match the raw hourly cardinality
    val nObserved = rows.count(_.getAs[Boolean]("observed"))
    val nHourly = EventOps.load(spark, sf())
      .select(col("user_id"),
        (col("ts_us") - pmod(col("ts_us"), lit(hourUs))).as("h"))
      .distinct().count()
    assert(nObserved.toLong == nHourly)
  }

  test("running totals: RANGE frame matches a brute-force 24h recompute") {
    val dayUs = 86400L * 1000000L
    val got = EventOps.runningTotals(spark, sf()).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("day_value"), r.getAs[Long]("day_n"))).toMap
    val ev = EventOps.load(spark, sf())
      .select("event_id", "user_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    ev.foreach { case (eid, user, ts, _) =>
      val frame = ev.filter { case (_, u, t, _) =>
        u == user && t >= ts - dayUs && t <= ts
      }
      val want = frame.map { case (_, _, _, v) => BigDecimal(v) }.sum
      assert(got(eid)._2 == frame.length.toLong, s"event $eid count")
      assert(math.abs(got(eid)._1 - want.toDouble) < 1e-6, s"event $eid sum")
    }
  }

  test("funnel: gated step times match brute force; no self-join planned") {
    val got = EventOps.funnel(spark, sf()).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[Any]("t1_us")), Option(r.getAs[Any]("t2_us")),
          Option(r.getAs[Any]("t3_us")), r.getAs[Int]("stage"))).toMap
    val ev = EventOps.load(spark, sf())
      .select("user_id", "event_type", "ts_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = ev.map(_._1).distinct
    assert(got.keySet == users.toSet)
    users.foreach { u =>
      val mine = ev.filter(_._1 == u)
      val t1 = mine.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(a => mine.filter(e =>
        e._2 == "click" && e._3 > a).map(_._3).minOption)
      val t3 = t2.flatMap(a => mine.filter(e =>
        e._2 == "purchase" && e._3 > a).map(_._3).minOption)
      val (g1, g2, g3, stage) = got(u)
      assert(g1.map(_.asInstanceOf[Long]) == t1, s"user $u t1")
      assert(g2.map(_.asInstanceOf[Long]) == t2, s"user $u t2")
      assert(g3.map(_.asInstanceOf[Long]) == t3, s"user $u t3")
      assert(stage == Seq(t1, t2, t3).count(_.isDefined), s"user $u stage")
    }
    // the sequential gating must not plan joins: window chain + reduce
    // on one user partitioning
    val plan = EventOps.funnel(spark, sf()).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), plan.take(2000))
    assert("Exchange \\(\\d+\\)".r.findAllIn(plan).size <= 2, plan.take(2000))
  }

  test("retention: cohort-0 cell counts every cohort user exactly once") {
    val rows = EventOps.retention(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // weeks_since is never negative and week 0 exists per cohort
    assert(rows.keys.forall(_._2 >= 0))
    val cohorts = rows.keys.map(_._1).toSet
    cohorts.foreach(c => assert(rows.contains((c, 0L)), s"cohort $c"))
    // the week-0 diagonal partitions the user base
    val weekUs = 7L * 86400L * 1000000L
    val firstSeen = EventOps.load(spark, sf())
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1) / weekUs))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSizes = firstSeen.values.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    cohortSizes.foreach { case (c, n) =>
      assert(rows((c, 0L)) == n, s"cohort $c size")
    }
    // retention never exceeds the cohort size
    rows.foreach { case ((c, _), n) => assert(n <= cohortSizes(c)) }
  }

  test("concurrency: two-level sweep equals a brute instantaneous count") {
    val got = EventOps.concurrency(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sess = EventOps.sessionStats(spark, sf()).collect()
      .map(r => (r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us")))
    // brute force: at every change point, count sessions covering it
    val points = sess.flatMap(s => Seq(s._1, s._2 + 1)).distinct.sorted
    val conc = points.map(t =>
      t -> sess.count(s => s._1 <= t && t <= s._2).toLong)
    val wantByHour = conc.groupBy(_._1 / 3600000000L * 3600000000L)
      .view.mapValues(_.map(_._2).max).toMap
    assert(got == wantByHour)
    // sanity: somewhere more than one session overlaps
    assert(got.values.max > 1)
  }

  test("concurrency: executed plan has no single-partition stage") {
    // The two-level prefix sum exists precisely so that NO operator —
    // window, sort, or aggregate — ever funnels the corpus through one
    // partition: every window is hour- or range-keyed and the
    // cross-range carry is a broadcast self-join over range totals.
    // A global window would plan `Exchange SinglePartition`; pin its
    // absence in the FINALIZED adaptive plan.
    val df = EventOps.concurrency(spark, sf())
    df.collect()
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan.take(3000))
  }

  test("binning yields an equi-join on bin, not BroadcastNestedLoopJoin") {
    val df = EventOps.rangeJoinActiveSessions(spark, sf())
    df.collect() // finalize AQE so the plan below is the executed one
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // the containment predicate must have become a residual condition
    // on an equi-join over the time bin (SMJ or hash variants)
    assert(plan.contains("bin"), plan.take(3000))
    assert(
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
      plan.take(3000))
  }

  test("token bucket matches a driver-side replay; both paths live") {
    import graft.ops.EventOps
    val got = EventOps.tokenBucket(spark, sf()).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cap = 60000000000L; val cost = 20000000000L
    val byUser = EventOps.load(spark, sf())
      .select("user_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).sorted }
    byUser.foreach { case (u, ts) =>
      var tok = cap; var last = -1L; var adm = 0L
      ts.foreach { t =>
        val t1 = math.min(cap, tok + (if (last < 0) 0L else t - last))
        if (t1 >= cost) { adm += 1; tok = t1 - cost } else tok = t1
        last = t
      }
      assert(got(u) == ((ts.length.toLong, adm, ts.length - adm, tok)),
        s"user $u")
    }
    val totalThrottled = got.values.map(_._3).sum
    assert(totalThrottled > 0, "fixture must exercise the deny path")
    assert(got.values.map(_._2).sum > 0)
  }

  test("readability: counts positive, score formula consistent per row") {
    import graft.ops.TextOps
    val rows = TextOps.readability(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, sents, syl, f) = (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getDouble(4))
      assert(w >= 1 && sents >= 1 && syl >= 0)
      val want = BigDecimal(206.835 - 1.015 * (w.toDouble / sents) -
        84.6 * (syl.toDouble / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(f - want) < 1e-9, s"doc ${r.getLong(0)}")
    }
  }

  test("seasonal anomaly: JVM cell-statistics recompute, labels exact") {
    val hours = graft.ops.EventOps.load(spark, sf())
      .select((org.apache.spark.sql.functions.col("ts_us") / 3600000000L)
        .cast("long").as("hour"))
      .groupBy("hour").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cells = hours.toSeq
      .groupBy { case (h, _) => ((h / 24 + 4) % 7, h % 24) }
    val rows = graft.ops.EventOps.seasonalAnomaly(spark, sf()).collect()
    assert(rows.length == hours.size)
    rows.foreach { r =>
      val h = r.getAs[Long]("hour")
      val c = hours(h)
      assert(r.getAs[Long]("n_events") == c)
      val cell = cells((r.getAs[Int]("dow").toLong, r.getAs[Int]("hod").toLong))
      val m = cell.size.toDouble
      val sc = cell.map(_._2).sum.toDouble
      val sc2 = cell.map(x => x._2 * x._2).sum.toDouble
      val mean = sc / m
      val variance = (sc2 - sc * sc / m) / m
      assert(math.abs(r.getAs[Double]("seasonal_mean") - mean) < 1e-6, s"h=$h")
      assert(math.abs(r.getAs[Double]("residual") - (c - mean)) < 1e-6)
      val band = 2.0 * math.sqrt(math.max(variance, 0.0))
      val want =
        if (c - mean > band) "spike"
        else if (c - mean < -band) "dip"
        else "normal"
      assert(r.getAs[String]("label") == want, s"h=$h")
    }
    // per-cell residuals sum to ~0 — the mean really is the baseline
    rows.groupBy(r => (r.getAs[Int]("dow"), r.getAs[Int]("hod")))
      .foreach { case (cell, rs) =>
        assert(math.abs(rs.map(_.getAs[Double]("residual")).sum) < 1e-4,
          s"cell $cell residuals must balance")
      }
  }

  test("seasonal anomaly: pre-1970 timestamps floor into their " +
    "calendar cell (dow/hod never negative)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-negevents").toString
    import spark.implicits._
    // 1969-12-31T23:00:30Z = -3 570 000 000 us -> hour floor = -1
    //   (truncation would claim hour 0, i.e. New Year's Day)
    // 1969-12-31T22:59:59Z = -3 601 000 000 us -> hour -2
    // Dec 31 1969 was a WEDNESDAY: dow = 3 for both, hod = 23 / 22
    Seq("1969-12-31T23:00:30Z", "1969-12-31T22:59:59Z")
      .map(t => java.sql.Timestamp.from(java.time.Instant.parse(t)))
      .toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventOps.seasonalAnomaly(spark, dir).collect()
      .map(r => r.getAs[Long]("hour") ->
        (r.getAs[Int]("dow"), r.getAs[Int]("hod"), r.getAs[Long]("n_events")))
      .toMap
    assert(rows == Map(
      -1L -> ((3, 23, 1L)),
      -2L -> ((3, 22, 1L))))
  }
}
