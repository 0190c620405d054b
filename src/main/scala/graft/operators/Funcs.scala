package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface + statistical aggregates, oracle-compared.
  *
  * A user switching engines leans on the long tail of built-in
  * functions as much as on operators; these queries pin a broad slice
  * of that surface (string, date/time, histogram banding, correlation
  * and regression moments) against DuckDB semantics. Everything here
  * is a narrow projection or a single aggregation: scans stay pruned
  * to the referenced columns, expressions stay inside whole-stage
  * codegen, and the only shuffles are the final groupBy/orderBy.
  *
  * Date/timestamp outputs are formatted to strings on both engines —
  * engine-native temporal types differ in printed resolution
  * (date vs ns/us timestamps), which the gate's string-compare would
  * flag as false mismatches.
  */
object Funcs {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---- histogram banding -------------------------------------------------

  /** Fixed-width histogram of order totals via `width_bucket`: bucket 0
    * underflow, 1..N in-range, N+1 overflow. Bounds chosen so the
    * bucket width (10000) is exact in binary — the floor boundary then
    * agrees bit-for-bit with the oracle's `floor(v / width)` formula.
    * One narrow scan + one small groupBy; at 100 TB this is the
    * map-side-combine shape (N+2 groups max).
    */
  val HistLo = 0.0
  val HistHi = 500000.0
  val HistN = 50

  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(width_bucket(col("o_totalprice"), lit(HistLo), lit(HistHi), lit(HistN))
        .as("bucket"), col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total_price"))
      .orderBy("bucket")

  val qHistogramSql: String = s"""
    WITH b AS (
      SELECT CASE WHEN o_totalprice < $HistLo THEN 0
                  WHEN o_totalprice >= $HistHi THEN ${HistN + 1}
                  ELSE CAST(floor(o_totalprice / ${(HistHi - HistLo) / HistN}) AS BIGINT) + 1
             END AS bucket, o_totalprice
      FROM orders)
    SELECT bucket, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM b GROUP BY bucket ORDER BY bucket"""

  // ---- correlation / regression moments ----------------------------------

  /** Bivariate statistics per event type: correlation, sample
    * covariance, stddev/variance, and the OLS regression line of
    * `value` on the JSON-extracted `k` property. Single-pass co-moment
    * aggregates (Welford-style merge) on both engines; results rounded
    * to 4 dp because partial-aggregate merge order perturbs the last
    * few bits. One shuffle of 4-group partials.
    */
  def qCorrStats(spark: SparkSession, dir: String): DataFrame = {
    def r4(c: Column) = round(c, 4)
    Tables.events(spark, dir)
      .select(col("event_type"), col("value").as("v"),
        get_json_object(col("props"), "$.k").cast(DoubleType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("v"))).cast(DoubleType).as("sum_v"),
        r4(corr(col("v"), col("k"))).as("corr_vk"),
        r4(covar_samp(col("v"), col("k"))).as("covar_vk"),
        r4(stddev_samp(col("v"))).as("stddev_v"),
        r4(var_samp(col("v"))).as("var_v"),
        r4(regr_slope(col("v"), col("k"))).as("slope_vk"),
        r4(regr_intercept(col("v"), col("k"))).as("icept_vk"))
      .orderBy("event_type")
  }

  val qCorrStatsSql: String = """
    WITH ex AS (
      SELECT event_type, value AS v,
        CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
      FROM events)
    SELECT event_type, COUNT(*) AS n,
      CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      ROUND(corr(v, k), 4) AS corr_vk,
      ROUND(covar_samp(v, k), 4) AS covar_vk,
      ROUND(stddev_samp(v), 4) AS stddev_v,
      ROUND(var_samp(v), 4) AS var_v,
      ROUND(regr_slope(v, k), 4) AS slope_vk,
      ROUND(regr_intercept(v, k), 4) AS icept_vk
    FROM ex GROUP BY event_type ORDER BY event_type"""

  // ---- string function surface -------------------------------------------

  /** String-function coverage probe over a deterministic customer
    * sample: case mapping, substring, concat, padding, reverse,
    * replace, position, regex extraction, repeat. Pure projection —
    * a pushed-down filter + pruned scan, no shuffle but the order-by.
    */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") % 50 === 0)
      .select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 10, 5).as("sub"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("cat"),
        lpad(col("c_custkey").cast(StringType), 10, "0").as("pad"),
        reverse(col("c_name")).as("rev"),
        regexp_replace(col("c_name"), "^Customer#0*", "C").as("rep"),
        instr(col("c_name"), "#").as("pos"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("num"),
        repeat(substring(col("c_mktsegment"), 1, 1), 3).as("rpt"))
      .orderBy("c_custkey")

  val qStringFuncsSql: String = """
    SELECT c_custkey,
      upper(c_name) AS up,
      lower(c_mktsegment) AS lo,
      CAST(length(c_name) AS INT) AS len,
      substring(c_name, 10, 5) AS sub,
      concat_ws('|', c_mktsegment, c_name) AS cat,
      lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
      reverse(c_name) AS rev,
      regexp_replace(c_name, '^Customer#0*', 'C') AS rep,
      CAST(strpos(c_name, '#') AS INT) AS pos,
      regexp_extract(c_name, '([0-9]+)', 1) AS num,
      repeat(substring(c_mktsegment, 1, 1), 3) AS rpt
    FROM customer WHERE c_custkey % 50 = 0 ORDER BY c_custkey"""

  // ---- date/time function surface ----------------------------------------

  /** Date/time-function coverage probe over a deterministic order
    * sample: calendar field extraction, truncation, month arithmetic
    * with end-of-month clamping, day differences. Weekday is pinned to
    * the ISO Monday=0 convention on both engines (Spark `weekday` vs
    * DuckDB `isodow - 1` — the engines' default `dayofweek` disagree).
    */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate")
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"),
        date_format(d, "yyyy-MM-dd").as("ymd"),
        year(d).as("y"), month(d).as("m"), dayofmonth(d).as("dom"),
        quarter(d).as("q"),
        weekday(d).as("wd"),
        dayofyear(d).as("doy"),
        date_format(date_trunc("month", d), "yyyy-MM-dd").as("trunc_m"),
        date_format(last_day(d), "yyyy-MM-dd").as("last_d"),
        datediff(d, lit("1995-01-01").cast(DateType)).as("days_since"),
        date_format(add_months(d, 3), "yyyy-MM-dd").as("plus_3m"))
      .orderBy("o_orderkey")
  }

  val qDateFuncsSql: String = """
    SELECT o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS ymd,
      CAST(year(o_orderdate) AS INT) AS y,
      CAST(month(o_orderdate) AS INT) AS m,
      CAST(day(o_orderdate) AS INT) AS dom,
      CAST(quarter(o_orderdate) AS INT) AS q,
      CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
      CAST(dayofyear(o_orderdate) AS INT) AS doy,
      strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS trunc_m,
      strftime(last_day(o_orderdate), '%Y-%m-%d') AS last_d,
      CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since,
      strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m
    FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey"""

  // ---- lateral / UNNEST surface ------------------------------------------

  /** Array explosion with ordinality (the UNNEST / LATERAL surface):
    * each document's token array is exploded WITH POSITION, then
    * laterally re-aggregated per (doc, token) into occurrence count +
    * first/last position, keeping tokens repeated ≥ 3× within their
    * doc. The explode is a Generator inside whole-stage codegen — rows
    * fan out in the scan stage, and only the (doc, token) aggregates
    * shuffle, never the exploded stream itself. Positions and counts
    * are BIGINT on both engines.
    */
  def qUnnestTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("n"),
        min(col("pos")).cast(LongType).as("first_pos"),
        max(col("pos")).cast(LongType).as("last_pos"))
      .where(col("n") >= 3)
      .orderBy("doc_id", "tok")

  val qUnnestTokensSql: String = """
    WITH ex AS (
      SELECT doc_id, u.tok AS tok, CAST(u.pos AS BIGINT) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) d,
      LATERAL (SELECT unnest(arr) AS tok, generate_subscripts(arr, 1) - 1 AS pos) u)
    SELECT doc_id, tok, COUNT(*) AS n, MIN(pos) AS first_pos, MAX(pos) AS last_pos
    FROM ex GROUP BY 1, 2 HAVING COUNT(*) >= 3 ORDER BY doc_id, tok"""

  def ops: Seq[Op] = Seq(
    Op("q_histogram", qHistogram, Some(qHistogramSql)),
    Op("q_corr_stats", qCorrStats, Some(qCorrStatsSql)),
    Op("q_string_funcs", qStringFuncs, Some(qStringFuncsSql)),
    Op("q_date_funcs", qDateFuncs, Some(qDateFuncsSql)),
    Op("q_unnest_tokens", qUnnestTokens, Some(qUnnestTokensSql)),
  )
}
