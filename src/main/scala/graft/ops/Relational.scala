package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational/aggregation extension surface (SURVEY §2.4-§2.6): grouped
  * and hierarchical aggregation, multi-way dimension joins, set
  * operations, distributed top-k.
  *
  * Determinism note: double aggregation is order-dependent under
  * shuffle, so every double sum here goes through an exact
  * decimal(18,6) accumulator and is cast back to double — the same
  * value on any partitioning, any cluster size, and in the DuckDB
  * oracles (see BASELINE.md / tools/check.py).
  */
object Relational {

  /** Exact, partitioning-independent sum of a double expression. */
  def sumd(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact mean: decimal sum over long count (double division). */
  def avgd(c: Column): Column =
    sumd(c) / count(lit(1))

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** TPC-H Q1-shaped pricing summary: grouped aggregation with derived
    * measures. Partial (map-side) aggregation makes this a single
    * shuffle of 4-ish groups regardless of input size.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sumd(disc).as("sum_disc_price"),
        sumd(disc * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avgd(col("l_quantity")).as("avg_qty"),
        avgd(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q5-shaped multi-hop dimension join: revenue per nation for
    * one region. The dimension chain (region → nation → supplier) is
    * broadcast — at 100 TB only the fact tables (orders, lineitem)
    * shuffle, and the region filter prunes before the join.
    */
  def revenueByNation(s: SparkSession, dir: String, region: String = "ASIA"): DataFrame = {
    val li = rd(s, dir, "lineitem")
    val ord = rd(s, dir, "orders")
    val cust = rd(s, dir, "customer")
    val sup = broadcast(rd(s, dir, "supplier"))
    val nat = broadcast(rd(s, dir, "nation"))
    val reg = broadcast(rd(s, dir, "region").filter(col("r_name") === region))
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** Least-squares regression aggregates per group — the
    * corr/covar/regr_* family, decimal-mediated so the result is
    * bit-reproducible cross-engine: the five moment sums (Σx, Σy,
    * Σxy, Σx², Σy²) accumulate as DECIMAL(38,12) — exact, so shuffle
    * width and combine order are immaterial — and only the FINAL
    * slope/intercept/r² expressions drop to IEEE doubles, written
    * with identical operation order on both engines. (The built-in
    * `regr_slope`/`corr` aggregate doubles directly: partial-combine
    * order then changes low bits across partitionings, which is
    * exactly what a 100 TB hash gate cannot tolerate.) One scan, one
    * group-keyed exchange with map-side partials.
    */
  def regression(s: SparkSession, dir: String): DataFrame = {
    // integer-cents mediation: round(v*100) is the same long on every
    // engine (the inputs are 2-decimal money/quantity, never near a
    // .5 at cent precision), so the five moment sums are exact
    // integers with no per-row decimal-rounding mode in sight; the
    // DECIMAL(38,0) accumulator keeps them exact at any corpus scale
    val xc = round(col("l_quantity") * 100).cast("long")
    val yc = round(col("l_extendedprice") * 100).cast("long")
    def sumx(c: Column): Column = sum(c.cast(DecimalType(38, 0)))
    val m = rd(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sumx(xc).as("sx"), sumx(yc).as("sy"),
        sumx(xc * yc).as("sxy"),
        sumx(xc * xc).as("sxx"),
        sumx(yc * yc).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double") / 100.0
    val sy = col("sy").cast("double") / 100.0
    val sxy = col("sxy").cast("double") / 10000.0
    val sxx = col("sxx").cast("double") / 10000.0
    val syy = col("syy").cast("double") / 10000.0
    val covn = n * sxy - sx * sy   // n^2 * covariance
    val varxn = n * sxx - sx * sx  // n^2 * variance(x)
    val varyn = n * syy - sy * sy
    m.select(col("l_returnflag"), col("n"),
      (covn / varxn).as("slope"),
      ((sy - (covn / varxn) * sx) / n).as("intercept"),
      (covn * covn / (varxn * varyn)).as("r2"))
  }

  /** Hierarchical aggregation: ROLLUP over (returnflag, linestatus). */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))

  /** CUBE over (returnflag, linestatus). */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))

  /** PIVOT: order count + exact revenue per priority × status. The
    * status value list is EXPLICIT — the implicit form runs a
    * distinct-value collect as a separate job before planning, a full
    * extra pass at 100 TB. With pinned values Spark plans the
    * double-aggregation: a data-proportional partial on
    * (priority, status), then a second shuffle over only the
    * |priorities|×|statuses| pre-aggregated rows — both stages
    * map-side combined, one scan (RelationalSpec pins the shape).
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)).as("cnt"), sumd(col("o_totalprice")).as("rev"))
      // a pivot cell with no rows is null in Spark but 0 under SQL's
      // count FILTER — pin the count columns to the SQL convention
      // (sums stay null/null on both sides)
      .na.fill(0L, Seq("O_cnt", "F_cnt", "P_cnt"))

  /** LEFT SEMI join (the EXISTS form): customers holding at least one
    * urgent order above a price threshold. The probe side never
    * duplicates and no fact columns survive — the filtered orders leg
    * reduces to bare keys before the join, so at 100 TB this is one
    * scan of each side with zero fact-row amplification (unlike the
    * inner-join + distinct spelling, which shuffles every matching
    * fact row only to throw the payload away).
    */
  def semiJoinUrgent(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "customer")
      .join(
        rd(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 400000.0)
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** LEFT ANTI join (the NOT EXISTS form): customers with no pending
    * (`P`-status) order — the relational primitive under every
    * decontamination/exclusion pass. Same single-scan-per-side shape
    * as [[semiJoinUrgent]]; the null-safe variant of NOT IN is
    * exactly what this spelling avoids relying on.
    */
  def antiJoinPending(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "customer")
      .join(
        rd(s, dir, "orders")
          .where(col("o_orderstatus") === "P")
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")

  /** UNPIVOT (melt): wide per-flag measures back to long
    * (metric, value) rows — the schema-normalization inverse of
    * [[pivotStatus]]. Row-local after the source aggregation: the
    * explode adds zero exchanges.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).cast("double").as("n"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n")),
        "metric", "value")

  /** Explicit GROUPING SETS: per-flag and per-status marginals in one
    * pass (one shuffle; the expand operator replicates map-side).
    */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))

  /** Corpus datasheet: the per-source / per-language / overall
    * composition report a dataset card publishes — document counts,
    * character and whitespace-token mass — in ONE grouping-sets pass
    * (one scan, one exchange; the alternative of three separate
    * aggregations scans the corpus three times). `grouping_id`
    * disambiguates the rollup levels exactly as the SQL standard
    * does.
    */
  def corpusDatasheet(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"),
        size(split(trim(lower(col("text"))), "\\s+")).as("n_tokens"))
      .groupingSets(
        Seq(Seq(col("source")), Seq(col("lang")), Seq.empty),
        col("source"), col("lang"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_tokens")).as("sum_tokens"))

  /** Cardinality profile of the documents table: exact distinct vs
    * HyperLogLog approximation (`approx_count_distinct`) — the
    * constant-memory path for 100 TB-scale distinct counting.
    */
  def dedupCounts(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "documents").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("text")).as("n_unique"))

  /** HLL distinct-count with a fully-oracled output: the hashed
    * columns are the EXACT n_docs/n_unique plus a Spark-side bound
    * verdict `within_eps` (|HLL − exact| ≤ eps·exact) — the
    * engine-specific HLL estimate feeds the verdict but never appears
    * as an output column, so a cross-engine oracle can recompute the
    * whole row (exact counts + literal TRUE). eps = 0.15 is 3× the
    * default 5% rsd; on fixed data the estimate is deterministic, so
    * the verdict is stable, and a FALSE here is a real sketch
    * regression, not flakiness. This keeps the built-in
    * constant-memory 100 TB path (approx_count_distinct) under the
    * same oracle gate as everything else — the exact countDistinct
    * riding alongside is the certificate generator, the same
    * double-pass any sketch-health monitor runs on a sample.
    */
  def dedupApprox(s: SparkSession, dir: String, eps: Double = 0.15): DataFrame =
    rd(s, dir, "documents")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique"),
        approx_count_distinct(col("text")).as("est"))
      .select(col("n_docs"), col("n_unique"),
        (abs(col("est") - col("n_unique")) <=
          lit(eps) * col("n_unique")).as("within_eps"))

  private def statusKeys(s: SparkSession, dir: String, status: String): DataFrame =
    rd(s, dir, "orders").filter(col("o_orderstatus") === status)
      .select("o_orderkey")

  private def urgentKeys(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")

  /** Set ops over order-key partitions (INTERSECT/EXCEPT/UNION are
    * hash-partitioned distinct joins in Spark — fully distributed).
    */
  def setIntersect(s: SparkSession, dir: String): DataFrame =
    statusKeys(s, dir, "F").intersect(urgentKeys(s, dir))

  def setExcept(s: SparkSession, dir: String): DataFrame =
    statusKeys(s, dir, "F").except(urgentKeys(s, dir))

  def setUnion(s: SparkSession, dir: String): DataFrame =
    statusKeys(s, dir, "F").union(statusKeys(s, dir, "O")).distinct()

  /** Distributed top-k: `orderBy().limit()` compiles to
    * TakeOrderedAndProject — per-partition heaps + a k-row driver
    * merge, never a global sort. Ties broken by key for determinism.
    */
  def topOrders(s: SparkSession, dir: String, k: Int = 100): DataFrame =
    rd(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select("o_orderkey", "o_totalprice")

  /** TPC-H Q6-shaped selective revenue: a tight filter band on date,
    * discount and quantity — the predicate-pushdown showcase (all
    * three predicates reach the parquet scan).
    */
  def selectiveRevenue(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.08) &&
        col("l_quantity") < 24)
      .agg(sumd(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))

  /** TPC-H Q3-shaped shipping priority: segment-filtered customer ⋈
    * orders ⋈ lineitem, revenue per order.
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = rd(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = rd(s, dir, "orders")
    val li = rd(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** String-function surface over part: case mapping, substring,
    * concat, LIKE classes, length.
    */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      substring(col("p_name"), 1, 5).as("name_head"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
      col("p_name").like("%red%").as("is_red"),
      length(col("p_name")).as("name_len"))

  /** Date/time-function surface over orders: calendar decomposition
    * and day arithmetic.
    */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
      datediff(lit("2026-01-01").cast("date"),
        col("o_orderdate").cast("date")).as("age_days"))

  /** Exact interpolated percentiles per group (`percentile` is the
    * exact sort-based aggregate; `approx_percentile` is the sketching
    * alternative for 100 TB inputs where an exact sort is wasteful).
    */
  def pricePercentiles(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))

  /** Approximate percentiles per group — the 100 TB path. `percentile`
    * buffers a per-group value-count map that grows with the input (an
    * OOM at billions of rows per group); `approx_percentile` keeps a
    * constant-memory quantile sketch with bounded RANK error
    * (Greenwald–Khanna: the returned element's rank is within
    * n/accuracy of ⌈q·n⌉) instead.
    *
    * The output is a rank CERTIFICATE, not the estimate: per group,
    * the exact row count plus `p50_ok`/`p90_ok` — true iff the
    * estimate's rank interval [|{x < est}|+1, |{x ≤ est}|] reaches
    * within n/accuracy (+1 slack for rank-convention off-by-ones) of
    * the target rank. Every hashed column is deterministic and
    * cross-engine recomputable (exact count + literal TRUE); the
    * engine-specific sketch value feeds the verdict without appearing
    * in it, and a FALSE is a real contract violation. The second scan
    * of orders (rank counting against the broadcast 3-row estimate
    * relation) is the certificate generator's cost — the pattern any
    * sketch-health monitor runs, and the broadcast keeps it
    * exchange-free on the corpus side.
    */
  def approxPricePercentiles(
      s: SparkSession, dir: String, accuracy: Int = 10000
  ): DataFrame = {
    val o = rd(s, dir, "orders").select(col("o_orderstatus"), col("o_totalprice"))
    val est = o.groupBy("o_orderstatus").agg(
      expr(s"approx_percentile(o_totalprice, 0.5, $accuracy)").as("e50"),
      expr(s"approx_percentile(o_totalprice, 0.9, $accuracy)").as("e90"))
    def rankLo(e: String) =
      sum(when(col("o_totalprice") < col(e), 1L).otherwise(0L)) + lit(1L)
    def rankHi(e: String) =
      sum(when(col("o_totalprice") <= col(e), 1L).otherwise(0L))
    def ok(q: Double, e: String) = {
      val target = ceil(lit(q) * col("n"))
      val slack = col("n").cast("double") / lit(accuracy.toDouble) + lit(1.0)
      (col(s"lo_$e").cast("double") <= target + slack) &&
        (col(s"hi_$e").cast("double") >= target - slack)
    }
    o.join(broadcast(est), Seq("o_orderstatus"))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        rankLo("e50").as("lo_e50"), rankHi("e50").as("hi_e50"),
        rankLo("e90").as("lo_e90"), rankHi("e90").as("hi_e90"))
      .select(col("o_orderstatus"), col("n"),
        ok(0.5, "e50").as("p50_ok"), ok(0.9, "e90").as("p90_ok"))
  }

  /** Skew-mitigating salted join: replicate the small side `salt`
    * ways and scatter the big side's hot keys across the replicas
    * with a deterministic content-derived salt — each (key, salt)
    * shuffle partition carries ~1/salt of a hot key's rows. Result is
    * identical to the plain join (pinned in RelationalSpec); use when
    * one key dominates and AQE's skew split isn't available.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, salt: Int
  ): DataFrame = {
    val saltCol = pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*),
      lit(salt)).cast("int")
    val bigS = big.withColumn("__salt", saltCol)
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Grouped top-k via ranking window: 3 most expensive parts per
    * brand. The window shuffles once on the group key; no global sort.
    */
  def topPerGroup(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    rd(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Deterministic stratified sampling — reproducible k docs per
    * stratum (lang), selected by content hash so reruns, retries, and
    * cluster-size changes all pick the same rows.
    *
    * Two-phase for scale: a cheap md5-prefix pre-filter (keeps ~1/4
    * of each stratum, pure map-side) feeds the per-stratum ranking
    * window, so the single-reducer-per-stratum sort ranks a fraction
    * of the corpus instead of all of it — at 100 TB the window over
    * raw strata would funnel whole languages through single tasks.
    * Both phases are content-derived, so the result is identical on
    * any engine that applies the same two phases (the DuckDB oracle
    * does).
    */
  /** Deterministic training-export sharding: every document gets a
    * reproducible shard id (md5-derived, salted so it is independent
    * of [[stratifiedSample]]'s hash) and a stable position within its
    * shard — the (shard, position) layout a tokenizer/loader consumes.
    * Re-running over the same corpus yields byte-identical shards; no
    * RNG, no partition-index dependence.
    *
    * Shape at scale: assignment is a narrow per-row expression; the
    * within-shard position is ONE shuffle keyed by shard_id. The real
    * writer would `repartition(nShards, shard_id)
    * .sortWithinPartitions(hash)` + `partitionBy("shard_id")` — the
    * same exchange this window performs, so the query IS the export
    * plan minus the sink. Positions are dense from 1, so a loader can
    * range-split every shard without scanning it.
    */
  def shardAssignments(
      s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val hash = md5(concat(col("doc_id").cast("string"), lit("#shard")))
    // first hex nibble is uniform over 0..15 → mod nShards (≤16) is
    // portable SQL on both sides (no 128-bit arithmetic needed)
    val shard = (conv(substring(hash, 1, 1), 16, 10).cast("int")
      % nShards).as("shard_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard_id")
      .orderBy(col("h"), col("doc_id"))
    rd(s, dir, "documents")
      .select(col("doc_id"), hash.as("h"), shard)
      .select(col("doc_id"), col("shard_id"),
        row_number().over(w).as("shard_pos"))
  }

  def stratifiedSample(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val hash = md5(concat(col("doc_id").cast("string"), lit("#sample")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(hash, col("doc_id"))
    rd(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .filter(substring(hash, 1, 1).isin("0", "1", "2", "3"))
      .select(col("doc_id"), col("lang"),
        row_number().over(w).as("sample_rank"))
      .filter(col("sample_rank") <= k)
  }

  /** Snapshot diff — the incremental-ingestion primitive: classify
    * every document across two corpus versions as `added`, `removed`,
    * `changed`, or `same` by CONTENT hash, not arrival metadata (a
    * re-crawl that returns identical bytes is `same`; one that
    * returns edits is `changed` and must re-enter the dedup/quality/
    * pack pipeline, which the [[graft.ops.TrainPrep]] layout then
    * reflows survivor-relatively). Fixture snapshots are carved
    * deterministically from the one documents table: the OLD snapshot
    * is `doc_id % 7 ≠ 0`, the NEW is `doc_id % 5 ≠ 0`, and new-side
    * content for `doc_id % 11 = 0` is uppercased — a simulated edit
    * the hash catches.
    *
    * Shape at scale: one full-outer join on the corpus key (the
    * [[Bucketed]] layout co-locates it), comparing 32-byte digests,
    * never text; each side's hash is computed inside its own scan.
    */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = rd(s, dir, "documents")
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("old_md5"))
    val neu = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 11 === 0, upper(col("text")))
          .otherwise(col("text"))).as("new_md5"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") === col("new_md5"), "same")
          .otherwise("changed").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }
}
