package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Operators over the `events` stream table (SURVEY §2.6 extension
  * surface): ranking/analytic windows, tumbling time windows,
  * sessionization, JSON extraction.
  *
  * The fixture's `ts` physical type has varied across driver
  * generations — parquet TIMESTAMP(NANOS) (a type Spark lacks,
  * surfaced as a raw ns Long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and plain
  * TIMESTAMP(MICROS) (read as `timestamp_ntz`). [[load]] normalizes
  * either to the same pair: a µs epoch long `ts_us` plus a µs
  * timestamp `ts`. All ordering and window arithmetic uses the µs
  * values so results are reproducible against engines that keep full
  * ns precision (oracles truncate identically).
  */
object EventOps {

  /** Scan + ts normalization to (`ts_us` µs-epoch long, `ts` µs
    * timestamp), branching on the type the scan actually produced:
    *   - ns Long (nanosAsLong): `ts DIV 1000` — exact integer division
    *     (doubles would lose precision above 2^53);
    *   - timestamp_ntz: `timestampdiff` against the NTZ epoch — pure
    *     wall-clock arithmetic, never consults the session zone;
    *   - timestamp (ltz): `unix_micros`, exact on the stored instant.
    */
  def load(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = s.read.parquet(s"$dir/events.parquet")
    val tsUs = raw.schema("ts").dataType match {
      // FLOOR division (exact integers), not truncating DIV: a
      // pre-1970 nanosecond belongs to the microsecond at or before
      // it, matching DuckDB's epoch_ns(ts) // 1000
      case LongType => expr("(ts - pmod(ts, 1000)) DIV 1000")
      case TimestampNTZType => expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case _ => unix_micros(col("ts"))
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  private def userWindow =
    Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))

  /** Ranking + analytic window functions per user: row_number, rank
    * over value, lag of value. One shuffle on user_id; windows within
    * a user evaluate partition-locally (scale: user cardinality grows
    * with data, so partitions stay bounded).
    */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir)
    ev.select(
      col("event_id"), col("user_id"), col("value"),
      row_number().over(userWindow).as("rn"),
      lag("value", 1).over(userWindow).as("prev_value"))
  }

  /** Tumbling 1-hour windows via the built-in `window()` operator:
    * count + exact (decimal-summed) value total per (window, type).
    */
  def tumblingAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir)
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Sessionization: a new session starts after a >30-minute gap in a
    * user's event stream; session ids are per-user running counts.
    * Two window passes over the same (user_id) partitioning — Catalyst
    * reuses the single shuffle/sort.
    */
  private def sessionized(s: SparkSession, dir: String, gapMinutes: Int): DataFrame = {
    val ev = load(s, dir)
    val gapUs = gapMinutes * 60L * 1000000L
    val newSession = when(
      col("ts_us") - lag("ts_us", 1).over(userWindow) > gapUs, 1
    ).otherwise(
      when(lag("ts_us", 1).over(userWindow).isNull, 1).otherwise(0))
    ev.select(
        col("user_id"), col("event_id"), col("ts_us"),
        newSession.as("new_s"))
      .select(
        col("user_id"), col("event_id"), col("ts_us"),
        sum("new_s").over(
          userWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
  }

  def sessionize(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionized(s, dir, gapMinutes).drop("ts_us")

  /** Session-level rollup built on [[sessionize]]: events per session
    * and session bounds in epoch µs.
    */
  def sessionStats(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionized(s, dir, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"))

  /** Sliding 1-hour windows every 30 minutes: each event contributes
    * to two overlapping windows (epoch-aligned starts).
    */
  def slidingAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir)
    ev.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Range (point-in-interval) join, bin-bucketed: for every event,
    * the number of OTHER users' sessions whose [start, end] interval
    * contains the event's timestamp — "how many users were mid-session
    * when this happened". There is no equi-key connecting the two
    * sides (the session owner is explicitly a different user), so a
    * naive formulation is a pure range-predicate join that Spark can
    * only execute as a BroadcastNestedLoopJoin — O(events × sessions)
    * comparisons and a broadcast of a corpus-proportional side, both
    * non-starters at scale.
    *
    * Instead time is bucketed into fixed bins: each session interval
    * explodes over the bins it touches, each event lands in exactly
    * ONE bin, and the join becomes an equi-join on bin followed by the
    * residual containment filter. Because the point side's bin is
    * unique, no pair can match twice — no dedup pass. Candidate mass
    * is sum-over-bins(events_in_bin × session_rows_in_bin): linear in
    * both inputs while interval length stays on the order of the bin
    * width (sessions are gap-bounded, so multi-bin spans are the tail,
    * not the norm; a hot bin rides AQE's skew split). This is the
    * standard interval-join binning used by Spark range-join
    * implementations in the wild, chosen over a broadcast because BOTH
    * sides grow with the corpus.
    */
  def rangeJoinActiveSessions(
      s: SparkSession, dir: String,
      gapMinutes: Int = 30, binMinutes: Int = 60): DataFrame = {
    val binUs = binMinutes * 60L * 1000000L
    val sess = sessionStats(s, dir, gapMinutes)
      .select(col("user_id").as("s_user"),
        col("session_start_us").as("start_us"),
        col("session_end_us").as("end_us"))
      // ts DIV n is exact long division; doubles would round near 2^53
      .withColumn("s_bin",
        explode(sequence(expr(s"start_us DIV $binUs"),
          expr(s"end_us DIV $binUs"))))
    val ev = load(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
      .withColumn("bin", expr(s"ts_us DIV $binUs"))
    ev.join(sess,
        col("bin") === col("s_bin") &&
          col("s_user") =!= col("user_id") &&
          col("start_us") <= col("ts_us") &&
          col("ts_us") <= col("end_us"),
        "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("s_user")).as("n_active_sessions"))
  }

  /** JSON extraction from the `props` payload column. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    load(s, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** As-of join: every event takes the value of its user's most recent
    * 'purchase' event at or before its own timestamp (inclusive).
    *
    * Spark has no native as-of join; rather than a per-row range probe
    * this composes built-ins: tag both streams, union, and carry the
    * last non-null purchase value forward with a running window —
    * one shuffle on user_id, linear in events, no range explosion.
    * Purchases are deduplicated to one per (user, µs) with a
    * deterministic arg-max so ties are well-defined (DuckDB's native
    * ASOF JOIN pins the oracle).
    */
  def asofLastPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us")
      .agg(max_by(col("value"), col("event_id")).as("pval"))
      .select(col("user_id"), col("ts_us"),
        lit(null).cast("long").as("event_id"), col("pval"),
        lit(0).as("side"))
    val lefts = ev.select(col("user_id"), col("ts_us"), col("event_id"),
      lit(null).cast("double").as("pval"), lit(1).as("side"))
    // side orders purchases before events at equal ts_us → ">=" semantics
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lefts.union(purchases)
      .withColumn("last_purchase_value",
        last(col("pval"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("last_purchase_value"))
  }

  /** Time-series GAP FILL + forward fill (LOCF): per user, the dense
    * hourly grid between that user's first and last observed hour,
    * left-joined against the observed hourly sums, missing hours
    * carried forward from the last observation. Hours are epoch-µs
    * longs end to end — no timezone semantics anywhere near the
    * grid arithmetic. Scale shape: every stage is keyed on
    * user_id(+hour) — the hourly partial-agg shuffle, the tiny
    * per-user span agg, the grid explode (row-local), the grid⋈
    * observed join, and the LOCF window; per-user grid length is
    * bounded by the observation span, and user cardinality grows
    * with the data, so no partition outgrows its executor.
    */
  def gapfillLocf(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val hourly = load(s, dir)
      .withColumn("hour_us",
        col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
      .groupBy("user_id", "hour_us")
      .agg(Relational.sumd(col("value")).as("hour_value"))
    val grid = hourly.groupBy("user_id")
      .agg(min("hour_us").as("mn"), max("hour_us").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), lit(hourUs)))
          .as("hour_us"))
    val w = Window.partitionBy("user_id").orderBy("hour_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour_us"), "left")
      .select(col("user_id"), col("hour_us"),
        col("hour_value").isNotNull.as("observed"),
        last(col("hour_value"), ignoreNulls = true).over(w)
          .as("filled_value"))
  }

  /** Ordered FUNNEL analysis: per user, the earliest time of each
    * step completed strictly after the previous step (view → click →
    * purchase), and the furthest stage reached. The sequential
    * dependency (step k's candidate set is gated on step k-1's time)
    * is expressed as chained whole-partition window minima over ONE
    * user-keyed exchange — no self-joins, no per-user event collect;
    * the reduce to one row per user rides the same partitioning.
    */
  def funnel(s: SparkSession, dir: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.length == 3, "three-step funnel")
    val w = Window.partitionBy("user_id")
    load(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .withColumn("t1",
        min(when(col("event_type") === steps(0), col("ts_us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === steps(1) &&
          col("ts_us") > col("t1"), col("ts_us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === steps(2) &&
          col("ts_us") > col("t2"), col("ts_us"))).over(w))
      .groupBy("user_id")
      .agg(min("t1").as("t1_us"), min("t2").as("t2_us"),
        min("t3").as("t3_us"))
      .withColumn("stage",
        when(col("t3_us").isNotNull, 3)
          .when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1)
          .otherwise(0).cast("int"))
  }

  /** Per-hour MAX CONCURRENCY over the session intervals — the
    * sweep-line aggregate, done scalably: sessions become ±1 deltas
    * (half-open `[start, end+1)`), deltas COLLAPSE per timestamp
    * first (groupBy — this removes tie-ordering from the semantics
    * entirely, the cross-engine trap in any sweep), prefix-sum
    * locally within each hour partition, and the carried-in offset
    * per hour comes from a TWO-LEVEL prefix sum: hours group into
    * fixed 1024-hour ranges, each range prefix-sums its own hours
    * under a range-keyed window (parallel), and the per-range grand
    * totals — O(spanned hours / 1024) rows, ~90 for a decade — fold
    * into range offsets by a broadcast lower-triangle self-join, so
    * NO single-partition window exists anywhere in the plan. The
    * naive spelling is a single global window over every change
    * point: one reducer holding the corpus. This one never
    * materializes an ordering wider than an hour's points, and even
    * the hour relation itself is range-partitioned.
    */
  def concurrency(s: SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = {
    val hourUs = 3600L * 1000000L
    val rangeUs = hourUs * 1024L
    val sess = sessionStats(s, dir, gapMinutes)
    val deltas = sess
      .select(col("session_start_us").as("t_us"), lit(1L).as("d"))
      .unionAll(sess.select((col("session_end_us") + 1).as("t_us"),
        lit(-1L).as("d")))
    val pts = deltas.groupBy("t_us").agg(sum("d").as("d"))
      .withColumn("hour_us", col("t_us") - pmod(col("t_us"), lit(hourUs)))
    val wLocal = Window.partitionBy("hour_us").orderBy("t_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = pts.withColumn("local_sum", sum("d").over(wLocal))
    // level 1: strict prefix sum of hour totals WITHIN each range
    // (keyed window); level 2: offsets of whole ranges via a
    // broadcast lower-triangle self-join over the tiny range
    // relation — an aggregation, deliberately not a window, so the
    // plan has no unpartitioned ordering at any level
    val hourTot = pts.groupBy("hour_us").agg(sum("d").as("h_d"))
      .withColumn("rng", expr(s"hour_us div ${rangeUs}L"))
    val wInRange = Window.partitionBy("rng").orderBy("hour_us")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocalCarry = hourTot.withColumn("local_carried",
      coalesce(sum("h_d").over(wInRange), lit(0L)))
    val rngTot = hourTot.groupBy("rng").agg(sum("h_d").as("rng_d"))
    val rngOff = rngTot.select(col("rng"))
      .join(broadcast(rngTot.select(col("rng").as("rng2"), col("rng_d"))),
        col("rng2") < col("rng"), "left")
      .groupBy("rng")
      .agg(coalesce(sum("rng_d"), lit(0L)).as("rng_carried"))
    val offsets = withLocalCarry.join(broadcast(rngOff), "rng")
      .select(col("hour_us"),
        (col("local_carried") + col("rng_carried")).as("carried"))
    local.join(offsets, "hour_us")
      .groupBy("hour_us")
      .agg(max(col("local_sum") + col("carried")).as("max_concurrent"),
        count(lit(1)).as("n_changes"))
  }

  /** Cohort RETENTION matrix: users grouped by first-seen week
    * (epoch-week integer, no calendar/timezone semantics), counted
    * distinct in each subsequent week as (cohort_week, weeks_since,
    * n_users). Scale shape: a user-keyed first-seen aggregation, a
    * user-keyed join back (same partitioning), then the matrix
    * aggregation over |cohorts|×|weeks| cells — the only
    * data-proportional stages are the two map-side partials.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val e = load(s, dir)
      .select(col("user_id"), expr(s"ts_us div $weekUs").as("week"))
    val cohorts = e.groupBy("user_id").agg(min("week").as("cohort_week"))
    e.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** RANGE-frame running aggregates: per user and event, the
    * all-history cumulative value (ROWS frame, total-ordered by
    * (ts_us, event_id)) and the trailing-24h sum/count (RANGE frame
    * over the epoch-µs ordering — the frame the ROWS form can't
    * express when event spacing is irregular). Both sums ride the
    * exact decimal accumulator, so intra-frame addition order is
    * immaterial cross-engine. One user-keyed exchange serves both
    * windows.
    */
  def runningTotals(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val wCum = userWindow
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDay = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-dayUs, 0)
    val dec = col("value").cast(DecimalType(18, 6))
    load(s, dir).select(
      col("event_id"), col("user_id"), col("ts_us"),
      sum(dec).over(wCum).cast("double").as("cum_value"),
      sum(dec).over(wDay).cast("double").as("day_value"),
      count(lit(1)).over(wDay).as("day_n"))
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences — the behavior model session analytics fit: for every
    * (from, to) pair of consecutive events within a user's timeline
    * (ordered by ts, event_id tie-break — the same total order every
    * window operator here uses), the transition count and the
    * row-normalized probability p = c(from,to)/c(from,*). Counts are
    * exact; the probability divides exact longs once. One user-keyed
    * window exchange (the lag), then a |types|²-bounded aggregate.
    */
  def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    val prev = lag("event_type", 1).over(userWindow)
    val trans = load(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"))
      .select(col("event_type").as("to_type"), prev.as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val fromTot = trans.groupBy("from_type").agg(sum("n").as("tot"))
    trans.join(fromTot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
  }

  /** Token-bucket rate limiting per user — the admission-control
    * decision a crawl/API front end applies, replayed EXACTLY:
    * capacity 3 tokens, refill 1 token per 20000 s (sized to this
    * fixture's inter-arrival distribution so BOTH paths are live —
    * ~p05 gaps throttle, the median refills), one token per event.
    * All arithmetic is integer micro-tokens (1 token = 2·10¹⁰ micro,
    * refill = elapsed µs), so the per-user recurrence
    * `tok' = min(cap, tok + dt); admit iff tok' ≥ cost` is
    * cross-engine exact with no float in sight. Each user's event
    * times pack into one sorted array (bounded by events-per-user,
    * the same justification as sessionization's per-user windows) and
    * the bucket unrolls with the `aggregate` HOF; the DuckDB oracle
    * replays it per (user, rank) in a recursive CTE. One user-keyed
    * Exchange is the only shuffle.
    */
  def tokenBucket(s: SparkSession, dir: String): DataFrame = {
    val capMicro = 60000000000L // 3 tokens at 20000 s/token
    load(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("ts_us"))).as("ts"))
      .withColumn("st", expr(
        s"""aggregate(ts,
           |  named_struct('tok', CAST($capMicro AS BIGINT),
           |    'last', CAST(NULL AS BIGINT), 'adm', CAST(0 AS BIGINT)),
           |  (acc, t) -> named_struct(
           |    'tok', CASE WHEN least(CAST($capMicro AS BIGINT),
           |        acc.tok + coalesce(t - acc.last, CAST(0 AS BIGINT)))
           |        >= CAST(20000000000 AS BIGINT)
           |      THEN least(CAST($capMicro AS BIGINT),
           |        acc.tok + coalesce(t - acc.last, CAST(0 AS BIGINT)))
           |        - CAST(20000000000 AS BIGINT)
           |      ELSE least(CAST($capMicro AS BIGINT),
           |        acc.tok + coalesce(t - acc.last, CAST(0 AS BIGINT)))
           |    END,
           |    'last', t,
           |    'adm', acc.adm + CASE WHEN least(CAST($capMicro AS BIGINT),
           |        acc.tok + coalesce(t - acc.last, CAST(0 AS BIGINT)))
           |        >= CAST(20000000000 AS BIGINT)
           |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END))"""
          .stripMargin))
      .select(col("user_id"),
        size(col("ts")).cast("long").as("n_events"),
        col("st.adm").as("n_admitted"),
        (size(col("ts")).cast("long") - col("st.adm"))
          .as("n_throttled"),
        col("st.tok").as("final_micro_tokens"))
  }

  /** EWMA smoothing + spike/dip anomaly labels over hourly event
    * counts — the iterated-recurrence sibling of the window family:
    * e₁ = c₁, eᵢ = 0.25·cᵢ + 0.75·eᵢ₋₁ (coefficients chosen exactly
    * representable in binary), each step rounded to 12 decimals so
    * the sequential float recurrence is cross-engine exact (the
    * surprisal/PageRank mediation). An hour is a `spike` when its
    * count exceeds 2× the PRIOR smoothed level, a `dip` below half —
    * the detector never reads its own hour, so one anomalous hour
    * cannot mask itself.
    *
    * Scale shape: the only corpus-proportional stage is the hourly
    * count aggregate (map-side partials); the recurrence runs over
    * the calendar-bounded hour relation packed into ONE row
    * (sort_array for deterministic order) and unrolled with the
    * `aggregate` HOF — the same O(hours) ceiling the concurrency
    * sweep rides. The DuckDB oracle replays the recurrence in a
    * recursive CTE keyed by hour rank.
    */
  def ewmaAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = load(s, dir)
      .select((col("ts_us") / 3600000000L).cast("long").as("hour"))
      .groupBy("hour").agg(count(lit(1)).as("c"))
    hourly
      .agg(sort_array(collect_list(struct(col("hour"), col("c"))))
        .as("hc"))
      .withColumn("ew", expr(
        """aggregate(hc, CAST(array() AS ARRAY<DOUBLE>),
          |  (acc, x) -> array_append(acc,
          |    CASE WHEN size(acc) = 0 THEN CAST(x.c AS DOUBLE)
          |      ELSE round(CAST(0.25 AS DOUBLE) * x.c
          |        + CAST(0.75 AS DOUBLE) * element_at(acc, -1), 12)
          |    END))""".stripMargin))
      .select(posexplode(col("hc")).as(Seq("pos", "x")), col("ew"))
      .select(
        col("x.hour").as("hour"),
        col("x.c").as("n_events"),
        round(element_at(col("ew"), col("pos") + 1), 6).as("ewma"),
        when(col("pos") === 0, lit("start"))
          .when(col("x.c") >
            lit(2.0) * element_at(col("ew"), col("pos")), lit("spike"))
          .when(lit(2.0) * col("x.c") <
            element_at(col("ew"), col("pos")), lit("dip"))
          .otherwise(lit("normal")).as("label"))
  }

  /** Seasonal-baseline anomaly detection — the periodic complement of
    * [[ewmaAnomaly]]'s trend smoothing: traffic has a weekly pulse,
    * so each hour is judged against the mean of ITS OWN
    * (day-of-week × hour-of-day) cell, not against the hours just
    * before it (an EWMA flags every Monday morning; this doesn't).
    * Residual = count − cell mean; |residual| > 2·cell-stddev labels
    * spike/dip. All inputs are exact integer counts and the
    * mean/variance arithmetic is one fixed expression shape per row
    * (sums of counts and squared counts — no accumulation-order
    * dependence), so the doubles hash-match cross-engine. The
    * variance is floored at 0 before sqrt: the textbook
    * E[c²]−E[c]² form can round to −ε when a cell's counts are
    * constant.
    *
    * Shape at scale: the hourly partial-agg shuffle, then a ≤168-row
    * (dow, hod) relation that broadcasts back onto the hours —
    * nothing corpus-global.
    */
  def seasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    // FLOOR division + pmod throughout (not Spark's truncating
    // div/%): a pre-1970 timestamp must land in the calendar hour it
    // belongs to (floor), with dow in [0,6] and hod in [0,23] —
    // truncation would assign negative microseconds a negative dow
    // and a cell the DuckDB oracle (whose // floors) never builds.
    // Exact integer arithmetic: (x - pmod(x, d)) is divisible by d.
    val keyed = load(s, dir)
      .select(expr(
        "(ts_us - pmod(ts_us, 3600000000)) div 3600000000").as("hour"))
      .groupBy("hour").agg(count(lit(1)).as("c"))
      // epoch day 0 (1970-01-01) was a Thursday: +4 makes 0 = Sunday
      .withColumn("dow",
        pmod(expr("(hour - pmod(hour, 24)) div 24") + 4, lit(7)))
      .withColumn("hod", pmod(col("hour"), lit(24)))
    val season = keyed.groupBy("dow", "hod").agg(
      count(lit(1)).as("m"), sum("c").as("sc"),
      sum(col("c") * col("c")).as("sc2"))
      .withColumn("mean", col("sc").cast("double") / col("m").cast("double"))
      .withColumn("variance",
        (col("sc2").cast("double")
          - col("sc").cast("double") * col("sc").cast("double")
            / col("m").cast("double")) / col("m").cast("double"))
    val resid = col("c").cast("double") - col("mean")
    val band = lit(2.0) * sqrt(greatest(col("variance"), lit(0.0)))
    keyed.join(broadcast(season), Seq("dow", "hod"))
      .select(col("hour"),
        col("dow").cast("int").as("dow"), col("hod").cast("int").as("hod"),
        col("c").as("n_events"),
        round(col("mean"), 6).as("seasonal_mean"),
        round(resid, 6).as("residual"),
        when(resid > band, lit("spike"))
          .when(resid < -band, lit("dip"))
          .otherwise(lit("normal")).as("label"))
  }
}
