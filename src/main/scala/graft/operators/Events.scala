package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Event-log analytics over the `events` table: sessionization and
  * tumbling-window aggregation — the batch twins of the streaming
  * pipelines in [[graft.streaming.Streaming]].
  *
  * Event time: `events.ts` is parquet TIMESTAMP(NANOS); the session
  * reads it as raw nanosecond longs (`nanosAsLong`), and all logic
  * runs on integer epoch *seconds* (`ts div 1e9`). Integer seconds are
  * bit-identical between Spark and the DuckDB oracle, so gap and
  * window boundaries can never drift between engines; sub-second
  * precision is irrelevant at session/window granularity.
  */
object Events {

  /** Session gap: a pause > 30 minutes starts a new session. */
  val GapSec = 1800L

  /** Tumbling window width for the hourly rollup. */
  val WindowSec = 3600L

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Epoch seconds from whatever type a `ts` column actually carries,
    * derived timezone-INDEPENDENTLY in every branch so the result never
    * depends on `spark.sql.session.timeZone`:
    *   - raw nanosecond longs (`nanosAsLong` corpora): exact integer
    *     division — `div`, not `/`, so no double rounding;
    *   - TIMESTAMP_NTZ (parquet timestamp[us] with no timezone — the
    *     driver's corpora since the micros regeneration): the NTZ wall
    *     time IS the UTC instant by corpus contract, so epoch seconds
    *     come from wall-clock field arithmetic (`unix_date` of the wall
    *     date + h/m/s), which reads the NTZ fields directly — a cast to
    *     TIMESTAMP would instead re-interpret the wall time in the
    *     session zone and silently shift under a non-UTC session;
    *   - TIMESTAMP: stores an instant, so `unix_timestamp` returns the
    *     stored epoch with no zone math at all.
    */
  def tsSecOf(dt: DataType): Column = (dt match {
    case LongType => expr("ts div 1000000000")
    case TimestampNTZType =>
      expr("unix_date(cast(ts as date)) * 86400L" +
        " + hour(ts) * 3600L + minute(ts) * 60L + second(ts)")
    case _ => unix_timestamp(col("ts"))
  }).cast(LongType)

  /** events + `ts_sec` (integer epoch seconds, see [[tsSecOf]]). */
  def eventsSec(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("ts_sec", tsSecOf(ev.schema("ts").dataType))
  }

  /** Gap-based sessionization: pure window functions (lag → new-session
    * flag → running sum = session id), then one aggregation per
    * session. Scales as two shuffles on user_id — no driver state, no
    * iteration; AQE handles skewed users.
    */
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    eventsSec(spark, dir)
      .withColumn("new_sess",
        when(col("ts_sec") - lag(col("ts_sec"), 1).over(w) > GapSec, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_sec")).as("session_start"),
        max(col("ts_sec")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val qEventsSessionizeSql: String = s"""
    WITH es AS (
      SELECT user_id, event_id, value, epoch_ns(ts)//1000000000 AS ts_sec
      FROM events),
    tagged AS (
      SELECT user_id, event_id, ts_sec, value,
        CASE WHEN ts_sec - LAG(ts_sec) OVER w > $GapSec THEN 1 ELSE 0 END AS new_sess
      FROM es
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
    sess AS (
      -- running-sum window ordered by (ts_sec, event_id), identical to the
      -- Spark side: ties at a session boundary must assign rows to the same
      -- session in both engines (sf0.1 contains such a tie).
      SELECT user_id, ts_sec, value,
        CAST(1 + SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM tagged)
    SELECT user_id, session_id,
      MIN(ts_sec) AS session_start, MAX(ts_sec) AS session_end,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""

  /** Tumbling-window rollup: single groupBy on (hour bucket, type) —
    * one shuffle, map-side partial aggregation by construction.
    */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    eventsSec(spark, dir)
      .groupBy(expr(s"(ts_sec div $WindowSec) * $WindowSec").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  val qEventsWindowSql: String = s"""
    SELECT ((epoch_ns(ts)//1000000000) // $WindowSec) * $WindowSec AS window_start,
      event_type, COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Sketch-based distinct counting: HLL++ (`approx_count_distinct`)
    * per event type next to the exact count. rows-only in the gate
    * (the sketch estimate is engine-specific); the spec bounds the
    * relative error. At 100 TB the sketch is the only affordable
    * per-key cardinality — it merges map-side and never shuffles raw
    * user ids.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    eventsSec(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  /** KMV (k-minimum-values / theta) distinct sketch size. */
  val KmvK = 64

  /** KMV hash universe: 2^31−1 (Mersenne prime). Products of two
    * 31-bit residues stay under 2^62, so the linear permutation hash
    * h(x) = (a·x + b) mod p is exact BIGINT arithmetic in BOTH engines
    * — the same portability trick as the MinHash permutations, and
    * like them it is a BIJECTION on [0, p): distinct keys never share
    * a hash, so the estimator carries no collision bias (a quadratic
    * mix would be 2-to-1 near x and p−a−x). At 100 TB the 31-bit
    * universe saturates near 2^31 distinct keys; the production swap
    * is `xxhash64` for the hash (the sketch algebra is unchanged),
    * which the oracle can't replicate — the gate keeps the portable
    * hash.
    */
  private val KmvP = 2147483647L

  private def kmvEst(retained: Column, kth: Column): Column =
    round(when(retained < KmvK, retained.cast("double"))
      .otherwise(lit((KmvK - 1).toDouble * KmvP) / kth), 3)

  /** KMV/theta distinct sketches with set-operation algebra — the
    * capability HLL ([[qApproxDistinct]]) lacks: theta sketches
    * intersect. Per event type, the sketch is the K smallest distinct
    * hash values of user_id; union = K smallest over the merged
    * sketches (exact: each retained set contains its own K minima, so
    * merging sketches loses nothing); intersection estimates
    * |click ∩ purchase| as (common hashes below θ) · p/θ with
    * θ = min(θ_click, θ_purchase).
    *
    * Scale shape: one distinct on (type, hash) with map-side partial,
    * then the rank-≤K filter — Catalyst's InferWindowGroupLimit turns
    * it into a per-shuffle-partition group limit BEFORE the per-type
    * sort, so the final window task sees ≤ K·partitions rows, never
    * the distinct stream. Sketch composition runs over ≤ 5·K rows.
    */
  /** The per-type sketch build (lazy; [[qKmvSketch]] checkpoints it).
    * Exposed so the spec can pin the plan shape: the rank-≤K filter
    * must compile to WindowGroupLimit (partial per map task, final
    * per type), not a bare per-type window over the distinct stream.
    */
  private[graft] def kmvSketchBuild(spark: SparkSession, dir: String): DataFrame = {
    val x = col("user_id") % KmvP
    val h = (((lit(1103515245L) * x) % KmvP) + lit(12345L)) % KmvP
    Tables.events(spark, dir)
      .select(col("event_type"), h.as("h")).distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .where(col("rk") <= KmvK)
      .select("event_type", "h")
  }

  def qKmvSketch(spark: SparkSession, dir: String): DataFrame = {
    val sk = kmvSketchBuild(spark, dir).localCheckpoint()
    val perType = sk.groupBy("event_type")
      .agg(count(lit(1)).as("retained"), max("h").as("kth"))
      .localCheckpoint()
    val typeRows = perType.select(col("event_type").as("set_name"),
      col("retained"), kmvEst(col("retained"), col("kth")).as("est_distinct"))
    val uniRows = sk
      .agg(slice(sort_array(collect_set(col("h"))), 1, KmvK).as("hs"))
      .select(lit("union_all").as("set_name"),
        size(col("hs")).cast("long").as("retained"),
        kmvEst(size(col("hs")).cast("long"), element_at(col("hs"), KmvK))
          .as("est_distinct"))
    // θ = p for an unsaturated sketch (it retained everything), so the
    // intersection estimate degrades gracefully to the exact count.
    val theta = perType.where(col("event_type").isin("click", "purchase"))
      .agg(min(when(col("retained") < KmvK, lit(KmvP)).otherwise(col("kth")))
        .as("theta"))
    val aSide = sk.where(col("event_type") === "click").select(col("h"))
    val bSide = sk.where(col("event_type") === "purchase").select(col("h").as("hb"))
    val interRows = aSide.join(bSide, col("h") === col("hb"))
      .crossJoin(broadcast(theta)).where(col("h") < col("theta"))
      .agg(count(lit(1)).as("retained"))
      .crossJoin(broadcast(theta))
      .select(lit("click_x_purchase").as("set_name"), col("retained"),
        round(col("retained") * lit(KmvP.toDouble) / col("theta"), 3)
          .as("est_distinct"))
    typeRows.unionAll(uniRows).unionAll(interRows).orderBy("set_name")
  }

  val qKmvSketchSql: String = """
    WITH hs AS (SELECT DISTINCT event_type,
        (((1103515245 * (user_id % 2147483647)) % 2147483647) + 12345)
        % 2147483647 AS h
      FROM events),
    sk AS (SELECT event_type, h FROM (
        SELECT event_type, h,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM hs) WHERE rk <= 64),
    pt AS (SELECT event_type, COUNT(*)::BIGINT AS retained, MAX(h) AS kth
           FROM sk GROUP BY 1),
    t_rows AS (SELECT event_type AS set_name, retained,
        ROUND(CASE WHEN retained < 64 THEN 1.0 * retained
                   ELSE 63.0 * 2147483647 / kth END, 3) AS est_distinct
      FROM pt),
    u AS (SELECT h FROM (SELECT DISTINCT h FROM sk ORDER BY h LIMIT 64)),
    u_row AS (SELECT 'union_all' AS set_name, COUNT(*)::BIGINT AS retained,
        ROUND(CASE WHEN COUNT(*) < 64 THEN 1.0 * COUNT(*)
                   ELSE 63.0 * 2147483647 / MAX(h) END, 3) AS est_distinct
      FROM u),
    th AS (SELECT MIN(CASE WHEN retained < 64 THEN 2147483647
                           ELSE kth END) AS theta
           FROM pt WHERE event_type IN ('click', 'purchase')),
    icnt AS (SELECT COUNT(*)::BIGINT AS retained
             FROM sk a JOIN sk b ON a.h = b.h
               AND a.event_type = 'click' AND b.event_type = 'purchase', th
             WHERE a.h < th.theta),
    i_row AS (SELECT 'click_x_purchase' AS set_name, retained,
        ROUND(retained * 2147483647.0 / theta, 3) AS est_distinct
      FROM icnt, th)
    SELECT * FROM t_rows UNION ALL SELECT * FROM u_row
    UNION ALL SELECT * FROM i_row ORDER BY set_name"""

  /** As-of join — an operator Spark has no native form of (SURVEY §2
    * preference order (a): compose existing ops). Each `purchase`
    * event is joined to the most recent prior `click` of the same
    * user. Re-expressed as a single running-max window over the
    * time-ordered union — one shuffle on user_id, no range-join
    * explosion; the equivalent DuckDB SQL is the same window (DuckDB's
    * native ASOF JOIN would also work, but the window form keeps both
    * engines on identical semantics incl. ties).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsSec(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_sec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    ev.withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts_sec"))).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_sec").as("purchase_ts"),
        col("last_click_ts"),
        (col("ts_sec") - col("last_click_ts")).as("gap_sec"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String = """
    WITH es AS (
      SELECT event_id, user_id, event_type, epoch_ns(ts)//1000000000 AS ts_sec
      FROM events WHERE event_type IN ('click', 'purchase')),
    tagged AS (
      SELECT event_id, user_id, event_type, ts_sec,
        MAX(CASE WHEN event_type = 'click' THEN ts_sec END) OVER
          (PARTITION BY user_id ORDER BY ts_sec, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM es)
    SELECT event_id, user_id, ts_sec AS purchase_ts, last_click_ts,
      ts_sec - last_click_ts AS gap_sec
    FROM tagged WHERE event_type = 'purchase'
    ORDER BY event_id"""

  /** Ordered conversion funnel view → click → purchase: a user reaches
    * a stage only via a strictly-later event than the previous stage's
    * first occurrence (min-timestamp semantics — deterministic values,
    * no row-order dependence). Three conditional-min aggregations
    * chained by join, one shuffle each on user_id.
    */
  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val es = eventsSec(spark, dir).select("user_id", "event_type", "ts_sec")
    val u1 = es.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_sec")).as("v"))
    val u2 = es.where(col("event_type") === "click").join(u1, "user_id")
      .where(col("ts_sec") > col("v"))
      .groupBy("user_id").agg(min(col("ts_sec")).as("c"))
    val u3 = es.where(col("event_type") === "purchase").join(u2, "user_id")
      .where(col("ts_sec") > col("c"))
      .groupBy("user_id").agg(min(col("ts_sec")).as("p"))
    val spark2 = spark
    import spark2.implicits._
    Seq(("1_view", u1.count()), ("2_view_click", u2.count()),
      ("3_view_click_purchase", u3.count()))
      .toDF("stage", "n_users").orderBy("stage")
  }

  val qEventsFunnelSql: String = """
    WITH es AS (SELECT user_id, event_type,
                  epoch_ns(ts)//1000000000 AS ts_sec FROM events),
    u1 AS (SELECT user_id, MIN(ts_sec) AS v FROM es
           WHERE event_type = 'view' GROUP BY 1),
    u2 AS (SELECT e.user_id, MIN(e.ts_sec) AS c
           FROM es e JOIN u1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts_sec > u1.v GROUP BY 1),
    u3 AS (SELECT e.user_id, MIN(e.ts_sec) AS p
           FROM es e JOIN u2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts_sec > u2.c GROUP BY 1)
    SELECT stage, n_users FROM (
      SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM u1
      UNION ALL
      SELECT '2_view_click', CAST(COUNT(*) AS BIGINT) FROM u2
      UNION ALL
      SELECT '3_view_click_purchase', CAST(COUNT(*) AS BIGINT) FROM u3)
    ORDER BY stage"""

  /** Semi-structured extraction: `props` is a JSON string column;
    * pull the numeric `k` property out per row and aggregate on it.
    * `get_json_object` is Spark's codegen'd JSON path evaluator — at
    * 100 TB this is the schema-on-read path for event payloads (no
    * pre-parsing ETL); the single groupBy shuffles only the extracted
    * ints, not the JSON blobs.
    */
  def qEventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        dec2(col("value")).as("v"))
      // floor(k/10), not `div`: div truncates toward zero, which
      // diverges from floor for negative k; floor matches on both
      // engines for all inputs. A missing $.k yields a NULL band —
      // ordering pinned NULLS FIRST on both sides.
      .groupBy(floor(col("k") / 10).cast(LongType).as("k_band"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("v")).cast(DoubleType).as("total_value"))
      .orderBy(col("k_band").asc_nulls_first, col("event_type"))

  val qEventsJsonSql: String = """
    WITH ex AS (
      SELECT event_type, user_id, value,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT CAST(floor(k / 10.0) AS BIGINT) AS k_band, event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      MIN(k) AS min_k, MAX(k) AS max_k,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM ex GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2"""

  /** Rolling 1-hour window per event — a RANGE frame (time-valued
    * bounds), not a ROWS frame: every event sees the sum/count of the
    * same user's events in the preceding hour regardless of how many
    * rows that is, and timestamp ties are frame peers on both engines
    * (deterministic without a tie-break). One shuffle on user_id.
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-WindowSec, 0)
    eventsSec(spark, dir)
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(dec2(col("value"))).over(w).cast(DoubleType))
      .select(col("event_id"), col("user_id"), col("ts_sec"), col("n_1h"), col("sum_1h"))
      .orderBy("event_id")
  }

  val qWindowRangeSql: String = s"""
    WITH es AS (SELECT event_id, user_id, value,
                  epoch_ns(ts)//1000000000 AS ts_sec FROM events)
    SELECT event_id, user_id, ts_sec,
      COUNT(*) OVER w AS n_1h,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
    FROM es
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN $WindowSec PRECEDING AND CURRENT ROW)
    ORDER BY event_id"""

  /** SCD2 history build (slowly-changing dimension, type 2): collapse
    * each user's event-type stream into validity intervals
    * [valid_from, valid_to) with an is_current flag — the
    * change-stream → dimension-history materialization every warehouse
    * maintains. Gaps-and-islands via two window passes (lag → change
    * flag → running sum = run id), then one aggregation per run: two
    * shuffles on user_id total, no iteration, no driver state; at
    * 100 TB both windows share one hash partitioning on user_id so
    * the second pass is exchange-free.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val runs = eventsSec(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts_sec")).as("valid_from"), count(lit(1)).as("n_events"))
    // run_id is strictly increasing in event order per user, so it (not
    // valid_from, which can tie across adjacent runs within one second)
    // orders the history deterministically.
    val h = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs.select(col("user_id"), col("event_type"), col("valid_from"),
        lead(col("valid_from"), 1).over(h).as("valid_to"),
        lead(col("valid_from"), 1).over(h).isNull.cast(IntegerType).as("is_current"),
        col("n_events"))
      .orderBy(col("user_id"), col("valid_from"), col("event_type"))
  }

  val qScd2Sql: String = """
    WITH es AS (
      SELECT user_id, event_id, event_type, epoch_ns(ts)//1000000000 AS ts_sec
      FROM events),
    tagged AS (
      SELECT user_id, event_id, event_type, ts_sec,
        CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
             THEN 1 ELSE 0 END AS chg
      FROM es
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
    runs AS (
      SELECT user_id, event_type, ts_sec,
        SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM tagged),
    hist AS (
      SELECT user_id, run_id, event_type,
        MIN(ts_sec) AS valid_from, COUNT(*) AS n_events
      FROM runs GROUP BY 1, 2, 3)
    SELECT user_id, event_type, valid_from,
      LEAD(valid_from) OVER h AS valid_to,
      CAST(LEAD(valid_from) OVER h IS NULL AS INTEGER) AS is_current,
      n_events
    FROM hist
    WINDOW h AS (PARTITION BY user_id ORDER BY run_id)
    ORDER BY user_id, valid_from, event_type"""

  /** Weekly cohort retention — the product-analytics staple next to
    * the funnel: users are cohorted by the Monday-start week of their
    * first event, and each (cohort, week-offset) cell counts the
    * distinct users still active that many weeks later, through
    * offset 8.
    *
    * Week identity is pure integer epoch math — `wk = (epoch_day + 3)
    * div 7` (epoch day 0 is a Thursday, so +3 aligns the boundary to
    * Monday) — the same calendar/timezone-free route the sessionize
    * family takes for ts (NANOS-physical → epoch seconds), so both
    * engines agree exactly; the output week is rendered as its Monday
    * DATE by day-offset arithmetic, not calendar truncation.
    *
    * Scale shape: first-seen is one partial-agg groupBy on user_id;
    * the events←first-seen join reuses that aggregate's hash
    * distribution (one exchange for the events side, none for the
    * aggregate); the distinct-user count is the standard two-phase
    * expand. No windows, no driver state — at 100 TB this is three
    * key-partitioned shuffles on (user_id) and (cohort, offset).
    */
  def qEventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsSec(spark, dir)
      .select(col("user_id"), expr("((ts_sec div 86400) + 3) div 7").as("wk"))
    val first = ev.groupBy("user_id").agg(min(col("wk")).as("cwk"))
    ev.join(first, "user_id")
      .withColumn("week_offset", col("wk") - col("cwk"))
      .where(col("week_offset") <= 8)
      .groupBy(
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          (col("cwk") * 7 - 3).cast(IntegerType)).as("cohort_week"),
        col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val qEventsRetentionSql: String = """
    WITH ev AS (
      SELECT user_id,
        ((epoch_ns(ts) // 1000000000 // 86400) + 3) // 7 AS wk
      FROM events),
    f AS (SELECT user_id, MIN(wk) AS cwk FROM ev GROUP BY user_id)
    SELECT DATE '1970-01-01' + CAST(cwk * 7 - 3 AS INTEGER) AS cohort_week,
      wk - cwk AS week_offset,
      COUNT(DISTINCT ev.user_id) AS n_users
    FROM ev JOIN f ON ev.user_id = f.user_id
    WHERE wk - cwk <= 8
    GROUP BY 1, 2 ORDER BY 1, 2"""

  /** MERGE INTO (Delta-style row upsert): the per-user latest state
    * from all but the newest Monday-week is the target snapshot; the
    * newest week's latest-per-user rows are the delta. Matched keys
    * update, unmatched delta keys insert, untouched target keys keep —
    * each output row labeled with its merge action. Latest-per-user
    * uses the same (ts_sec DESC, event_id DESC) total order as
    * stream_latest_state, so out-of-order arrivals can never flip a
    * result; the newest-week scalar rides as a broadcast singleton.
    * Scale shape: two user_id-partitioned windows + one full outer
    * join on user_id — one shuffle geometry end-to-end, the same plan
    * a MERGE statement compiles to when both sides are key-unique.
    *
    * Transactionality caveat (documented contract, not a gap to
    * paper over): this op computes MERGE *semantics* over immutable
    * parquet — the merged snapshot is the RESULT SET, not an ACID
    * table mutation. A production deployment would sit this plan on a
    * transactional table format (Delta/Iceberg/Hudi), whose MERGE
    * compiles to exactly this join geometry plus a commit-protocol
    * write (snapshot isolation, conflict detection, file-level
    * rewrite). Those formats are external libraries this zero-egress
    * sandbox cannot resolve; the semantics, determinism contract, and
    * shuffle shape — the parts this engine owns — are identical
    * either way, which is why the op is oracle-gated on the result
    * set. Same story for q_scd2 and q_incremental (the other two
    * write-pattern simulations).
    */
  def qMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsSec(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts_sec"), expr("((ts_sec div 86400) + 3) div 7").as("wk"))
    val maxWk = ev.agg(max(col("wk")).as("maxwk"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec").desc, col("event_id").desc)
    def latest(side: DataFrame, p: String): DataFrame = side
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id").as(s"${p}_user"), col("event_type").as(s"${p}_type"),
        col("value").as(s"${p}_value"), col("ts_sec").as(s"${p}_ts"))
    val withMax = ev.crossJoin(broadcast(maxWk))
    val tgt = latest(withMax.where(col("wk") < col("maxwk")), "t")
    val dlt = latest(withMax.where(col("wk") === col("maxwk")), "d")
    dlt.join(tgt, col("d_user") === col("t_user"), "full_outer")
      .select(
        coalesce(col("d_user"), col("t_user")).as("user_id"),
        coalesce(col("d_type"), col("t_type")).as("event_type"),
        coalesce(col("d_value"), col("t_value")).as("value"),
        coalesce(col("d_ts"), col("t_ts")).as("ts_sec"),
        when(col("d_user").isNull, lit("keep"))
          .when(col("t_user").isNull, lit("insert"))
          .otherwise(lit("update")).as("action"))
      .orderBy("user_id")
  }

  val qMergeUpsertSql: String = """
    WITH es AS (
      SELECT user_id, event_id, event_type, value,
        epoch_ns(ts)//1000000000 AS ts_sec,
        ((epoch_ns(ts)//1000000000//86400) + 3)//7 AS wk
      FROM events),
    mx AS (SELECT MAX(wk) AS maxwk FROM es),
    tgt AS (
      SELECT user_id, event_type, value, ts_sec FROM (
        SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts_sec DESC, event_id DESC) AS rn
        FROM es e, mx WHERE e.wk < mx.maxwk) WHERE rn = 1),
    dlt AS (
      SELECT user_id, event_type, value, ts_sec FROM (
        SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts_sec DESC, event_id DESC) AS rn
        FROM es e, mx WHERE e.wk = mx.maxwk) WHERE rn = 1)
    SELECT COALESCE(d.user_id, t.user_id) AS user_id,
      COALESCE(d.event_type, t.event_type) AS event_type,
      COALESCE(d.value, t.value) AS value,
      COALESCE(d.ts_sec, t.ts_sec) AS ts_sec,
      CASE WHEN d.user_id IS NULL THEN 'keep'
           WHEN t.user_id IS NULL THEN 'insert'
           ELSE 'update' END AS action
    FROM dlt d FULL OUTER JOIN tgt t ON d.user_id = t.user_id
    ORDER BY user_id"""

  /** Per-user anomaly detection: events whose value sits more than 2
    * sample standard deviations from that user's mean, for users with
    * ≥ 10 events and non-zero variance. The per-user moments are exact
    * decimal sums (value is 2-dp money, value² exact at 4 dp), cast to
    * double once; mean/variance/z are then a fixed double expression
    * over those exact scalars, identical in both engines, so the
    * selected row set and the 4-dp outputs hash-compare. One shuffle
    * for the stats aggregate, one shuffle (or broadcast at gate scale)
    * to join stats back onto the event stream — the 100 TB shape of
    * every z-score filter.
    */
  def qEventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val es = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val stats = es.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("s1"),
        sum(dec2(col("value")) * dec2(col("value"))).cast(DoubleType).as("s2"))
      .where(col("n") >= 10)
      .select(col("user_id"), col("n"), (col("s1") / col("n")).as("mean"),
        ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("variance"))
      .where(col("variance") > 0.0)
    es.join(stats, "user_id")
      .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
      .where(abs(col("z")) > 2.0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        round(col("mean"), 4).as("user_mean"), round(col("z"), 4).as("z"))
      .orderBy("event_id")
  }

  val qEventsAnomalySql: String = """
    WITH st AS (
      SELECT user_id, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events GROUP BY user_id HAVING COUNT(*) >= 10),
    ms AS (
      SELECT user_id, s1 / n AS mean,
        (s2 - s1 * s1 / n) / (n - 1) AS variance
      FROM st),
    fl AS (
      SELECT e.event_id, e.user_id, e.event_type, e.value, ms.mean,
        (e.value - ms.mean) / SQRT(ms.variance) AS z
      FROM events e JOIN ms ON ms.user_id = e.user_id
      WHERE ms.variance > 0.0)
    SELECT event_id, user_id, event_type, value,
      ROUND(mean, 4) AS user_mean, ROUND(z, 4) AS z
    FROM fl WHERE ABS(z) > 2.0 ORDER BY event_id"""

  /** RFM (recency / frequency / monetary) user segmentation over
    * purchase events — the classic warehouse cohort op. Per user:
    * recency = whole days since their last purchase relative to the
    * corpus max purchase time, frequency = purchase count, monetary =
    * exact decimal spend. Each metric is scored 1-4 by its quartile
    * (computed over the per-user frame, cutpoints ROUNDed to 4 dp on
    * both engines so the comparison literal is the same double), with
    * recency inverted (most recent = 4); rfm = r·100 + f·10 + m.
    *
    * Scale shape: one aggregation over the purchase stream; the 9
    * cutpoints come from [[Relational.distributedQuantiles]] — the
    * same histogram-selection machinery as q_percentiles (bounded
    * driver collects, never a single-reducer percentile aggregate) —
    * and fold back as literals into a scan-side projection. No
    * windows, no global sort before the gate's canonical ORDER BY.
    */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val p = eventsSec(spark, dir).where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_sec"), dec2(col("value")).as("v2"))
    // zero-purchase corpus: max(ts_sec) is NULL — keep a dummy anchor
    // and skip the quantile machinery (no cutpoints exist on an empty
    // per-user frame); the contract frame is served empty either way
    val maxRow = p.agg(max("ts_sec")).head
    val noPurchases = maxRow.isNullAt(0)
    val maxTs = if (noPurchases) 0L else maxRow.getLong(0)
    val per = p.groupBy("user_id")
      .agg(max(col("ts_sec")).as("last_ts"), count(lit(1)).as("frequency"),
        sum(col("v2")).cast(DoubleType).as("monetary"))
      .select(col("user_id"),
        expr(s"($maxTs - last_ts) div 86400").as("recency_days"),
        col("frequency"), col("monetary"))
      .localCheckpoint()
    // cutpoints via the engine's distributed exact-quantile primitive
    // (histogram selection + bounded collects — never a single-reducer
    // percentile aggregate), already 4-dp-snapped to match the oracle's
    // ROUND(quantile_cont(...), 4)
    val vc = per.select(lit("rec").as("flag"),
        col("recency_days").cast(DoubleType).as("v"))
      .unionAll(per.select(lit("freq"), col("frequency").cast(DoubleType)))
      .unionAll(per.select(lit("mon"), col("monetary")))
      .groupBy("flag", "v").agg(count(lit(1)).as("c"))
    val q =
      if (noPurchases) Map.empty[(String, String), Double]
      else Relational.distributedQuantiles(vc,
        Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75))
    def cuts(flag: String): Seq[Double] =
      if (noPurchases) Seq(0.0, 0.0, 0.0)
      else Seq(q((flag, "q1")), q((flag, "q2")), q((flag, "q3")))
    def bucket(c: Column, q: Seq[Double]): Column =
      lit(1L) + (c > q(0)).cast(LongType) + (c > q(1)).cast(LongType) +
        (c > q(2)).cast(LongType)
    val (rq, fq, mq) = (cuts("rec"), cuts("freq"), cuts("mon"))
    per
      .withColumn("r_score", lit(5L) - bucket(col("recency_days"), rq))
      .withColumn("f_score", bucket(col("frequency"), fq))
      .withColumn("m_score", bucket(col("monetary"), mq))
      .withColumn("rfm", col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
      .orderBy("user_id")
  }

  val qRfmSql: String = """
    WITH p AS (
      SELECT user_id, epoch_ns(ts)//1000000000 AS ts_sec,
        CAST(value AS DECIMAL(18,2)) AS v2
      FROM events WHERE event_type = 'purchase'),
    mx AS (SELECT MAX(ts_sec) AS mt FROM p),
    per AS (
      SELECT user_id, (mx.mt - MAX(ts_sec)) // 86400 AS recency_days,
        COUNT(*) AS frequency, CAST(SUM(v2) AS DOUBLE) AS monetary
      FROM p, mx GROUP BY user_id, mx.mt),
    cut AS (SELECT
      ROUND(quantile_cont(recency_days, 0.25), 4) AS r1,
      ROUND(quantile_cont(recency_days, 0.5), 4) AS r2,
      ROUND(quantile_cont(recency_days, 0.75), 4) AS r3,
      ROUND(quantile_cont(frequency, 0.25), 4) AS f1,
      ROUND(quantile_cont(frequency, 0.5), 4) AS f2,
      ROUND(quantile_cont(frequency, 0.75), 4) AS f3,
      ROUND(quantile_cont(monetary, 0.25), 4) AS m1,
      ROUND(quantile_cont(monetary, 0.5), 4) AS m2,
      ROUND(quantile_cont(monetary, 0.75), 4) AS m3
      FROM per),
    sc AS (
      SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
        CAST(frequency AS BIGINT) AS frequency, monetary,
        5 - (1 + CAST(recency_days > cut.r1 AS BIGINT)
               + CAST(recency_days > cut.r2 AS BIGINT)
               + CAST(recency_days > cut.r3 AS BIGINT)) AS r_score,
        1 + CAST(frequency > cut.f1 AS BIGINT)
          + CAST(frequency > cut.f2 AS BIGINT)
          + CAST(frequency > cut.f3 AS BIGINT) AS f_score,
        1 + CAST(monetary > cut.m1 AS BIGINT)
          + CAST(monetary > cut.m2 AS BIGINT)
          + CAST(monetary > cut.m3 AS BIGINT) AS m_score
      FROM per, cut)
    SELECT user_id, recency_days, frequency, monetary,
      CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      CAST(m_score AS BIGINT) AS m_score,
      CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
    FROM sc ORDER BY user_id"""

  /** Welch two-sample A/B test per event type. Users split into
    * deterministic cohorts by user-id parity (what every production
    * hash-assignment reduces to); each type's `value` is compared
    * across cohorts: absolute and relative mean lift, Welch t
    * statistic, and Welch–Satterthwaite degrees of freedom. Moments
    * are exact decimal sums cast to double ONCE, so every downstream
    * double op (the identical expression tree on both engines) is
    * bit-reproducible and ROUND(4) compares literals.
    *
    * Scale shape: ONE conditional aggregation over the event stream —
    * per-type partial state is six numbers, map-side combine does all
    * the work, the shuffle carries #event_types rows. The 100 TB A/B
    * readout is exactly this plan; no per-cohort repartition, no
    * self-join.
    */
  def qAbtest(spark: SparkSession, dir: String): DataFrame = {
    val a = col("user_id") % 2 === 0
    val agg = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), dec2(col("value")).as("v2"))
      .groupBy("event_type")
      .agg(
        sum(when(a, 1L).otherwise(0L)).as("n_a"),
        sum(when(!a, 1L).otherwise(0L)).as("n_b"),
        sum(when(a, col("v2"))).cast(DoubleType).as("s1a"),
        sum(when(a, col("v2") * col("v2"))).cast(DoubleType).as("s2a"),
        sum(when(!a, col("v2"))).cast(DoubleType).as("s1b"),
        sum(when(!a, col("v2") * col("v2"))).cast(DoubleType).as("s2b"))
    val withMoments = agg
      .withColumn("mean_a", col("s1a") / col("n_a"))
      .withColumn("mean_b", col("s1b") / col("n_b"))
      .withColumn("var_a",
        (col("s2a") - col("s1a") * col("s1a") / col("n_a")) / (col("n_a") - 1))
      .withColumn("var_b",
        (col("s2b") - col("s1b") * col("s1b") / col("n_b")) / (col("n_b") - 1))
      .withColumn("se_a", col("var_a") / col("n_a"))
      .withColumn("se_b", col("var_b") / col("n_b"))
      .withColumn("se2", col("se_a") + col("se_b"))
    withMoments
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("mean_a"), 4).as("mean_a"),
        round(col("mean_b"), 4).as("mean_b"),
        round(col("mean_b") - col("mean_a"), 4).as("lift_abs"),
        round((col("mean_b") - col("mean_a")) / col("mean_a"), 4).as("lift_rel"),
        round((col("mean_b") - col("mean_a")) / sqrt(col("se2")), 4).as("t_welch"),
        round(col("se2") * col("se2") /
          (col("se_a") * col("se_a") / (col("n_a") - 1) +
            col("se_b") * col("se_b") / (col("n_b") - 1)), 4).as("df_welch"))
      .orderBy("event_type")
  }

  val qAbtestSql: String = """
    WITH m AS (
      SELECT event_type,
        CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s1a,
        CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s2a,
        CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s1b,
        CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s2b
      FROM events GROUP BY event_type),
    w AS (
      SELECT event_type, n_a, n_b,
        s1a / n_a AS mean_a, s1b / n_b AS mean_b,
        (s2a - s1a * s1a / n_a) / (n_a - 1) AS var_a,
        (s2b - s1b * s1b / n_b) / (n_b - 1) AS var_b
      FROM m),
    se AS (
      SELECT event_type, n_a, n_b, mean_a, mean_b,
        var_a / n_a AS se_a, var_b / n_b AS se_b,
        var_a / n_a + var_b / n_b AS se2
      FROM w)
    SELECT event_type, n_a, n_b,
      ROUND(mean_a, 4) AS mean_a,
      ROUND(mean_b, 4) AS mean_b,
      ROUND(mean_b - mean_a, 4) AS lift_abs,
      ROUND((mean_b - mean_a) / mean_a, 4) AS lift_rel,
      ROUND((mean_b - mean_a) / SQRT(se2), 4) AS t_welch,
      ROUND(se2 * se2 / (se_a * se_a / (n_a - 1) + se_b * se_b / (n_b - 1)), 4) AS df_welch
    FROM se ORDER BY event_type"""

  /** Per-user behavioral entropy over the event-type mix (the
    * diversity score behind engagement segmentation and bot
    * filtering). Shannon entropy in nats via the integer-count
    * identity H = ln(n) − (Σ c·ln c)/n, which keeps every log
    * argument an INTEGER — the same double input on both engines —
    * and the per-type terms c·ln(c) round to 9 dp and sum as EXACT
    * decimals, so the sum is aggregation-order-free (the
    * graph_harmonic pattern).
    *
    * Scale shape: two aggregations — (user, type) counts, then a
    * per-user fold over ≤ |type-alphabet| rows. Both map-side
    * combine; no windows, no self-joins. At 100 TB the first groupBy
    * is the only real shuffle and it carries one row per live
    * (user, type) pair.
    */
  def qEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    cnt.groupBy("user_id")
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(round(col("c") * log(col("c")), 9).cast(DecimalType(28, 9)))
          .cast(DoubleType).as("s"))
      .where(col("n_events") >= 20)
      .select(col("user_id"), col("n_events"), col("n_types"),
        round(log(col("n_events")) - col("s") / col("n_events"), 6).as("entropy"))
      .orderBy("user_id")
  }

  val qEntropySql: String = """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type),
    u AS (
      SELECT user_id, SUM(c) AS n_events, COUNT(*) AS n_types,
        CAST(SUM(CAST(ROUND(c * LN(c), 9) AS DECIMAL(28,9))) AS DOUBLE) AS s
      FROM c GROUP BY user_id)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events, n_types,
      ROUND(LN(n_events) - s / n_events, 6) AS entropy
    FROM u WHERE n_events >= 20 ORDER BY user_id"""

  /** First-order Markov transition matrix over per-user event-type
    * sequences (the behavioral model behind next-action prediction and
    * funnel-drop analysis): count each observed (type → next type)
    * transition in (ts, event_id) order, then row-normalize into
    * transition probabilities. Counts are exact integers; the single
    * division is the identical expression on both engines at ROUND(6).
    *
    * Scale shape: ONE user-partitioned window (same exchange the
    * sessionize family rides) produces successor pairs, then two
    * |type-alphabet|²-sized aggregations — map-side combine does the
    * heavy lifting, and the normalizing join runs on the tiny count
    * frame. At 100 TB this is one shuffle of the event stream on
    * user_id and nothing else data-sized.
    */
  def qMarkov(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val tr = eventsSec(spark, dir)
      .select(col("user_id"), col("ts_sec"), col("event_id"), col("event_type"))
      .withColumn("dst_type", lead(col("event_type"), 1).over(w))
      .where(col("dst_type").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("dst_type"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy("src_type").agg(sum(col("n")).as("n_src"))
    tr.join(tot, "src_type")
      .select(col("src_type"), col("dst_type"), col("n"),
        round(col("n") / col("n_src").cast(DoubleType), 6).as("p"))
      .orderBy("src_type", "dst_type")
  }

  val qMarkovSql: String = """
    WITH es AS (
      SELECT user_id, event_id, event_type, epoch_ns(ts)//1000000000 AS ts_sec
      FROM events),
    tr AS (
      SELECT event_type AS src_type,
        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS dst_type
      FROM es),
    cnt AS (
      SELECT src_type, dst_type, COUNT(*) AS n FROM tr
      WHERE dst_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT src_type, CAST(SUM(n) AS BIGINT) AS n_src FROM cnt GROUP BY 1)
    SELECT c.src_type, c.dst_type, c.n,
      ROUND(c.n / CAST(t.n_src AS DOUBLE), 6) AS p
    FROM cnt c JOIN tot t ON t.src_type = c.src_type
    ORDER BY c.src_type, c.dst_type"""

  /** EWMA smoothing weight: e₁ = x₁, eₖ = α·xₖ + (1−α)·eₖ₋₁. Both
    * coefficients are spelled as literals (0.3 / 0.7) on both engines
    * so the fp constants are identical bits, not derived. */
  val EwmaAlpha = 0.3
  val EwmaBeta = 0.7

  /** Exponentially weighted moving average of daily revenue per event
    * type — the trend/anomaly baseline every metrics pipeline keeps.
    * Days are integer epoch days (timezone-free), daily totals exact
    * decimal sums cast to double ONCE; the recurrence is then the same
    * double chain on both engines (Spark: an `aggregate` fold over the
    * day-sorted array; oracle: the equivalent recursive CTE), so
    * ROUND(6) compares identical bits.
    *
    * Scale shape: the daily rollup is the only data-sized shuffle
    * (map-side combine to one row per (type, day)); the fold then runs
    * on |types| × |days| rows — series state is O(#days) per type,
    * independent of corpus size, and series are the parallel
    * dimension. A 100 TB corpus changes the rollup's input, not the
    * fold.
    */
  def qEwma(spark: SparkSession, dir: String): DataFrame =
    qEwmaAt(spark, dir, EwmaAlpha)

  /** Parameterized twin (the fuzz family draws α): β = 1 − α is
    * computed ONCE in driver double arithmetic and rendered into both
    * engines via Double.toString (shortest round-trip repr), so the
    * recurrence constants are identical bits on both sides.
    */
  private[graft] def qEwmaAt(spark: SparkSession, dir: String,
      alpha: Double): DataFrame = {
    val beta = 1.0 - alpha
    val daily = eventsSec(spark, dir)
      .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
      .agg(sum(dec2(col("value"))).cast(DoubleType).as("x"))
    val series = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("xs"))
    val ewArr = aggregate(
      col("xs"),
      array().cast("array<double>"),
      (acc, e) => concat(acc, array(
        when(size(acc) === 0, e("x"))
          .otherwise(lit(alpha) * e("x") + lit(beta) * element_at(acc, -1)))))
    series
      .select(col("event_type"), explode(arrays_zip(col("xs"), ewArr.as("ew"))).as("z"))
      .select(col("event_type"), col("z.xs.day").as("day"),
        round(col("z.xs.x"), 2).as("daily_value"),
        round(col("z.ew"), 6).as("ewma"))
      .orderBy("event_type", "day")
  }

  def qEwmaSqlAt(alpha: Double): String = {
    val beta = 1.0 - alpha
    s"""
    WITH RECURSIVE es AS (
      SELECT event_type, epoch_ns(ts)//1000000000 AS ts_sec, value FROM events),
    daily AS (
      SELECT event_type, ts_sec // 86400 AS day,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      FROM es GROUP BY 1, 2),
    idx AS (
      SELECT event_type, day, x,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k
      FROM daily),
    rec AS (
      SELECT event_type, day, x, k, x AS ew FROM idx WHERE k = 1
      UNION ALL
      SELECT i.event_type, i.day, i.x, i.k, $alpha * i.x + $beta * r.ew AS ew
      FROM idx i JOIN rec r ON r.event_type = i.event_type AND i.k = r.k + 1)
    SELECT event_type, day, ROUND(x, 2) AS daily_value, ROUND(ew, 6) AS ewma
    FROM rec ORDER BY event_type, day"""
  }

  val qEwmaSql: String = qEwmaSqlAt(EwmaAlpha)

  /** Day-of-week revenue seasonality per event type — the calendar
    * profile behind staffing/campaign planning: for each (type, dow),
    * the number of active days, the average daily revenue, and the
    * seasonality index (that dow's average daily revenue over the
    * type's overall average). Day-of-week is pure integer epoch math —
    * `(epoch_day + 4) % 7`, 0 = Sunday (epoch day 0 is a Thursday) —
    * so the grouping key is timezone/calendar-free and engine-exact;
    * daily totals are exact decimals, divided as doubles in the
    * identical tree at ROUND(4)/ROUND(6).
    *
    * Scale shape: one data-sized shuffle (the (type, day) rollup,
    * map-side combined); everything after runs on ≤ 7·|types| rows.
    */
  def qSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = eventsSec(spark, dir)
      .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
      .agg(sum(dec2(col("value"))).as("x"))
      .withColumn("dow", expr("(day + 4) % 7"))
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total"))
    val overall = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_all"), sum(col("x")).as("tot_all"))
    byDow.join(overall, "event_type")
      .select(col("event_type"), col("dow"), col("n_days"),
        round(col("total").cast(DoubleType) / col("n_days"), 4).as("dow_avg"),
        round((col("total").cast(DoubleType) / col("n_days"))
          / (col("tot_all").cast(DoubleType) / col("n_all")), 6).as("seasonality"))
      .orderBy("event_type", "dow")
  }

  val qSeasonalitySql: String = """
    WITH es AS (
      SELECT event_type, epoch_ns(ts)//1000000000 AS ts_sec, value FROM events),
    daily AS (
      SELECT event_type, ts_sec // 86400 AS day,
        SUM(CAST(value AS DECIMAL(18,2))) AS x
      FROM es GROUP BY 1, 2),
    d AS (SELECT event_type, (day + 4) % 7 AS dow, x FROM daily),
    byd AS (
      SELECT event_type, dow, COUNT(*) AS n_days, SUM(x) AS total
      FROM d GROUP BY 1, 2),
    oa AS (
      SELECT event_type, COUNT(*) AS n_all, SUM(x) AS tot_all
      FROM d GROUP BY 1)
    SELECT b.event_type, b.dow, b.n_days,
      ROUND(CAST(b.total AS DOUBLE) / b.n_days, 4) AS dow_avg,
      ROUND((CAST(b.total AS DOUBLE) / b.n_days)
        / (CAST(o.tot_all AS DOUBLE) / o.n_all), 6) AS seasonality
    FROM byd b JOIN oa o ON o.event_type = b.event_type
    ORDER BY b.event_type, b.dow"""

  def ops: Seq[Op] = Seq(
    Op("q_markov", qMarkov, Some(qMarkovSql)),
    Op("q_ewma", qEwma, Some(qEwmaSql)),
    Op("q_seasonality", qSeasonality, Some(qSeasonalitySql)),
    Op("q_abtest", qAbtest, Some(qAbtestSql)),
    Op("q_entropy", qEntropy, Some(qEntropySql)),
    Op("q_rfm", qRfm, Some(qRfmSql)),
    Op("q_events_anomaly", qEventsAnomaly, Some(qEventsAnomalySql)),
    Op("q_events_sessionize", qEventsSessionize, Some(qEventsSessionizeSql)),
    Op("q_merge_upsert", qMergeUpsert, Some(qMergeUpsertSql)),
    Op("q_events_retention", qEventsRetention, Some(qEventsRetentionSql)),
    Op("q_scd2", qScd2, Some(qScd2Sql)),
    Op("q_window_range", qWindowRange, Some(qWindowRangeSql)),
    Op("q_events_json", qEventsJson, Some(qEventsJsonSql)),
    Op("q_events_window", qEventsWindow, Some(qEventsWindowSql)),
    Op("q_events_funnel", qEventsFunnel, Some(qEventsFunnelSql)),
    Op("q_asof_join", qAsofJoin, Some(qAsofJoinSql)),
    Op("q_approx_distinct", qApproxDistinct, None),
    Op("q_kmv_sketch", qKmvSketch, Some(qKmvSketchSql)),
  )
}
