package graft

import org.apache.spark.sql.execution.ExplainMode
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
}
