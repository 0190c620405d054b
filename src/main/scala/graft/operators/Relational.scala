package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational / OLAP query suite over the warehouse tables.
  *
  * Design rules (see SURVEY.md §5-§6):
  *  - declarative DataFrame plans only — Catalyst pushes filters and
  *    projections into the parquet scans and picks join strategies;
  *  - small dimensions are broadcast explicitly;
  *  - money aggregates snap per-row double expressions to DECIMAL
  *    (exact, order-independent) and cast the final sum to DOUBLE, so
  *    results hash-match the DuckDB oracle bit-for-bit;
  *  - every result ends in a deterministic ORDER BY.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  private def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  private def ts(s: String): Column = lit(s).cast(TimestampType)

  /** Pricing summary: wide aggregation over lineitem (TPC-H Q1 shape). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= ts("2000-01-01 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")))).cast(DoubleType).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(dec2(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Shipping-priority top-k: selective dim filter (broadcast) →
    * fact join → agg → top-k (TPC-H Q3 shape).
    */
  def q3JoinTopk(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // No explicit broadcast on customer: at real scale customer is a
    // fact-sized table; AQE promotes the join to broadcast at runtime
    // when the filtered side is actually small.
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinTopkSql: String = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  /** Local-supplier volume: 6-table star join with broadcast dims
    * (TPC-H Q5 shape). The fact-fact join (orders ⋈ lineitem) shuffles
    * on orderkey; all dimension joins broadcast.
    */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00"))
    val li = Tables.lineitem(spark, dir)

    // customer/supplier are fact-sized at real scale — no broadcast
    // hints (AQE decides at runtime); nation/region are true dims.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5MultijoinSql: String = """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  /** Semi + anti join: EXISTS / NOT EXISTS re-expressed as left_semi /
    * left_anti (no row duplication, no distinct needed).
    */
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(400000.0)).select("o_custkey")
    val semi = Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("big_order_cust").as("kind"), col("c_custkey").as("key"))
    // distinct before the anti join: the join only needs key presence,
    // and the partial aggregate collapses duplicate partkeys map-side,
    // so the exchange carries ~|distinct keys| instead of |lineitem|
    val anti = Tables.part(spark, dir)
      .join(Tables.lineitem(spark, dir).select("l_partkey").distinct(),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(lit("never_shipped_part").as("kind"), col("p_partkey").as("key"))
    semi.unionAll(anti).orderBy(col("kind"), col("key"))
  }

  val qSemiAntiSql: String = """
    SELECT * FROM (
      SELECT 'big_order_cust' AS kind, c_custkey AS key FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      UNION ALL
      SELECT 'never_shipped_part' AS kind, p_partkey AS key FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    ) ORDER BY kind, key"""

  /** Window functions: per-customer order sequence + exact running
    * total (explicit ROWS frame; unique sort key so the frame is
    * deterministic).
    */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast(LongType).as("rn"),
        sum(dec2(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("run_total"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowSql: String = """
    SELECT o_custkey, o_orderkey,
      ROW_NUMBER() OVER w AS rn,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, rn"""

  /** Per-group top-k via row_number (the scalable top-k idiom: no
    * global sort; partial top-k per partition then per-group).
    */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).cast(LongType).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  val qTopkPerGroupSql: String = """
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
        ROW_NUMBER() OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part)
    WHERE rn <= 3
    ORDER BY p_brand, rn"""

  /** Hierarchical aggregation (rollup region → nation); NULL group
    * markers coalesced to 'ALL' so NULL-ordering dialect differences
    * can't bite.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val cna = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
    cna.rollup(col("r_name"), col("n_name"))
      .agg(sum(dec2(col("c_acctbal"))).cast(DoubleType).as("total_acctbal"),
        count(lit(1)).as("n_customers"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("total_acctbal"), col("n_customers"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  val qRollupSql: String = """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region_name, nation_name"""

  /** Small-quantity revenue (TPC-H Q17 shape): correlated per-part
    * average re-expressed as an aggregate + self-join — the scalable
    * decorrelation (one shuffle on partkey, no per-row subquery).
    * The per-part average uses the decimal-snap sum so the 0.2·avg
    * comparison is bit-identical across engines.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#1" && col("p_type") === "ECONOMY")
      .select("p_partkey")
    val avgq = li.groupBy("l_partkey")
      .agg((sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(avgq, "l_partkey")
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(
        (coalesce(sum(dec2(col("l_extendedprice"))).cast(DoubleType), lit(0.0)) / 7.0)
          .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17SmallQtySql: String = """
    WITH avgq AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty
      FROM lineitem GROUP BY 1)
    SELECT COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)/7.0 AS avg_yearly,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq USING (l_partkey)
    WHERE p_brand = 'Brand#1' AND p_type = 'ECONOMY'
      AND l_quantity < 0.2 * avg_qty"""

  /** Exact linear-interpolation percentiles per group via distributed
    * selection — NOT a per-group sort: `l_returnflag` has 3 values,
    * so a `Window.partitionBy(flag)` rank (the obvious plan) sorts
    * each group in ONE task — a 33M-row-per-task bottleneck at 100 TB
    * that no cluster width fixes. Instead: (1) compress the multiset
    * to per-(flag, value) counts — a high-cardinality shuffle with
    * map-side combine; (2) build a 1024-bucket equi-width histogram
    * per flag (flag×bucket-sized, collected — ≤ 3k rows by
    * construction) and locate each target rank's bucket with driver
    * prefix sums; (3) resolve exact neighbor values with a cumulative
    * count over ONLY the target buckets' distinct values (a
    * (flag, bucket)-partitioned window over a vanishing slice). Same
    * quantile_cont definition: idx = p·(n−1), v = v_lo + frac·(v_hi −
    * v_lo); 4-dp rounding on both engines absorbs last-ulp noise.
    *
    * Driver state is HARD-bounded, not distribution-bounded: no slice
    * is ever collected unless its DISTINCT-value count is ≤
    * [[SliceCap]] (enforced with a `require` at the collect). A hot
    * bucket (adversarial distributions can concentrate every distinct
    * value in one of the 1024 buckets) is instead re-histogrammed
    * over its ACTUAL value extent — 1024 sub-buckets per level, one
    * distributed agg per level, rank arithmetic on the driver — until
    * the rank-holding range fits the cap. Each level shrinks the
    * range ≥ 1024× and provably splits (the range's min and max land
    * in different sub-buckets whenever min < max), so convergence
    * needs ≤ 3 levels on anything non-degenerate; a depth valve turns
    * the denormal-spacing corner (value differences below
    * MIN_NORMAL) into a loud error rather than an unbounded collect.
    */
  /** Audit tap for the distributed intermediates qPercentiles executes
    * eagerly: its RETURNED frame is a driver-local toDF (the final
    * percentiles), so a plan audit of the return value alone would
    * inspect a LocalTableScan and miss the real work. Tests install a
    * buffer here (same thread) and get every intermediate frame as
    * built, pre-execution.
    */
  private[graft] val percentileAudit =
    new ThreadLocal[scala.collection.mutable.Buffer[DataFrame]]

  /** Hard cap on rows any qPercentiles slice collect may pull to the
    * driver — buckets above it refine instead of collecting.
    */
  private[graft] val SliceCap = 4096

  private def audited(df: DataFrame): DataFrame = {
    val buf = percentileAudit.get()
    if (buf != null) buf += df
    df
  }

  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ps: Seq[(String, Double)] =
      Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val vc = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast(DoubleType).as("v"))
      .agg(count(lit(1)).as("c"))
    val q = distributedQuantiles(vc, ps)
    val out = q.keys.map(_._1).toSeq.distinct.sorted.map { f =>
      (f, q((f, "p25")), q((f, "p50")), q((f, "p90")), q((f, "p99")))
    }
    out.toDF("l_returnflag", "p25", "p50", "p90", "p99")
      .orderBy("l_returnflag")
  }

  /** The engine's exact-quantile primitive, reusable by any op needing
    * distributed cutpoints (q_percentiles, q_rfm): linear-interpolation
    * quantiles (quantile_cont definition) per `flag` over a compressed
    * `(flag, v: double, c: long)` value-count frame, returning
    * `(flag, name) → value` snapped to 4 dp. See the algorithm note
    * above qPercentiles — histogram bucket location + bounded slice
    * collects + hot-bucket refinement; never a single-reducer
    * `percentile` aggregate, never an unbounded driver collect.
    */
  private[graft] def distributedQuantiles(vc0: DataFrame,
      ps: Seq[(String, Double)]): Map[(String, String), Double] = {
    val NB = 1024
    val vc = audited(vc0).localCheckpoint()
    val stats = audited(vc.groupBy("flag")
      .agg(min("v").as("lo"), max("v").as("hi"), sum("c").as("n")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    def bucketCol: org.apache.spark.sql.Column = {
      val cases = stats.foldLeft(lit(0)) { case (acc, (f, (lo, hi, _))) =>
        val width = math.max((hi - lo) / NB, java.lang.Double.MIN_NORMAL)
        when(col("flag") === f,
          least(floor((col("v") - lit(lo)) / lit(width)), lit(NB - 1)).cast("int"))
          .otherwise(acc)
      }
      cases
    }
    // per-(flag, bucket): row mass, DISTINCT-value count, and actual
    // value extent — the last two are free in the same shuffle and are
    // what the cap check and one refinement level need
    val hist = audited(vc.groupBy(col("flag"), bucketCol.as("b"))
      .agg(sum("c").as("bc"), count(lit(1)).as("nd"),
        min("v").as("mn"), max("v").as("mx"))).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // driver: target (1-based) ranks per (flag, percentile) and the
    // bucket holding each, via prefix sums over ≤ NB buckets
    case class Target(flag: String, name: String, rank: Long, frac: Double, isHi: Boolean)
    val targets = stats.toSeq.flatMap { case (f, (_, _, n)) =>
      ps.flatMap { case (name, p) =>
        val idx = p * (n - 1) // 0-based fractional index
        val lo = math.floor(idx).toLong + 1
        val frac = idx - math.floor(idx)
        Target(f, name, lo, frac, isHi = false) ::
          (if (lo < n) List(Target(f, name, lo + 1, frac, isHi = true)) else Nil)
      }
    }
    def bucketOf(f: String, rank: Long): Int = {
      var cum = 0L
      var b = 0
      while (b < NB) {
        cum += hist.get((f, b)).map(_._1).getOrElse(0L)
        if (cum >= rank) return b
        b += 1
      }
      NB - 1
    }
    def prefixBefore(f: String, b: Int): Long =
      (0 until b).map(bb => hist.get((f, bb)).map(_._1).getOrElse(0L)).sum
    val needed = targets.map(t => (t.flag, bucketOf(t.flag, t.rank))).distinct
    val (okNeeded, hotNeeded) =
      needed.partition { case (f, b) => hist((f, b))._2 <= SliceCap }
    // cumulative counts over the CAP-OK target buckets' distinct
    // values only — one batched job, the common (non-adversarial) path
    val slice =
      if (okNeeded.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else {
        val bucketFilter = okNeeded.map { case (f, b) =>
          col("flag") === f && col("b") === b
        }.reduce(_ || _)
        val wb = Window.partitionBy(col("flag"), col("b"))
          .orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        audited(vc.withColumn("b", bucketCol).where(bucketFilter)
          .withColumn("cum", sum(col("c")).over(wb))
          .select(col("flag"), col("b"), col("v"), col("c"), col("cum")))
          .collect()
      }
    // Hot buckets (DISTINCT count above the cap) never collect:
    // re-histogram over the bucket's actual extent — 1024 sub-buckets,
    // one distributed agg per level — until the rank-holding range
    // fits the cap. mn < mx guarantees a strict split per level (mn
    // lands in sub-bucket 0, mx in ≥ 1), so each level shrinks the
    // extent ≥ 1024×; the depth valve only fires on sub-MIN_NORMAL
    // value spacing, where it fails loud instead of collecting big.
    val resolvedHot = scala.collection.mutable.Map.empty[(String, Long), Double]
    def refine(flag: String, cond: org.apache.spark.sql.Column, prefix: Long,
        nd: Long, mn: Double, mx: Double, ranks: Seq[Long], depth: Int): Unit = {
      require(depth < 300, s"qPercentiles: refinement failed to converge for '$flag'")
      if (nd <= SliceCap) {
        val w = Window.partitionBy(col("flag"))
          .orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val s = audited(vc.where(cond)
          .withColumn("cum", sum(col("c")).over(w))
          .select(col("v"), col("c"), col("cum"))).collect()
        require(s.length <= SliceCap, s"qPercentiles: slice cap violated for '$flag'")
        ranks.foreach { r =>
          val off = r - prefix
          val row = s.find(x => x.getLong(2) - x.getLong(1) < off && off <= x.getLong(2))
            .getOrElse(sys.error(s"qPercentiles: rank $r not found for '$flag'"))
          resolvedHot((flag, r)) = row.getDouble(0)
        }
      } else {
        val width = math.max((mx - mn) / NB, java.lang.Double.MIN_NORMAL)
        val sb = least(floor((col("v") - lit(mn)) / lit(width)), lit(NB - 1)).cast("int")
        val sub = audited(vc.where(cond).groupBy(sb.as("sb"))
          .agg(sum("c").as("bc"), count(lit(1)).as("nd"),
            min("v").as("mn"), max("v").as("mx"))).collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
          .sortBy(_._1)
        def locate(off: Long): (Int, Long) = {
          var cum = 0L
          var i = 0
          while (i < sub.length) {
            if (cum + sub(i)._2._1 >= off) return (i, cum)
            cum += sub(i)._2._1
            i += 1
          }
          sys.error(s"qPercentiles: rank offset $off beyond range mass for '$flag'")
        }
        ranks.map(r => (locate(r - prefix), r)).groupBy(_._1)
          .foreach { case ((i, before), rs) =>
            val (b, (_, nd2, mn2, mx2)) = sub(i)
            refine(flag, cond && sb === b, prefix + before,
              nd2, mn2, mx2, rs.map(_._2), depth + 1)
          }
      }
    }
    hotNeeded.foreach { case (f, b) =>
      val (_, nd, mn, mx) = hist((f, b))
      val ranks = targets.collect {
        case t if t.flag == f && bucketOf(f, t.rank) == b => t.rank
      }.distinct
      refine(f, col("flag") === f && bucketCol === b, prefixBefore(f, b),
        nd, mn, mx, ranks, 0)
    }
    // rank r (group-global) lives at the slice row with
    // prefix + cum − c < r ≤ prefix + cum
    def valueAt(f: String, rank: Long): Double = {
      val b = bucketOf(f, rank)
      if (hist((f, b))._2 > SliceCap) return resolvedHot((f, rank))
      val off = rank - prefixBefore(f, b)
      slice.iterator
        .filter(r => r.getString(0) == f && r.getInt(1) == b)
        .find(r => r.getLong(4) - r.getLong(3) < off && off <= r.getLong(4))
        .map(_.getDouble(2))
        .getOrElse(sys.error(s"qPercentiles: rank $rank not found for '$f'"))
    }
    stats.keys.toSeq.sorted.flatMap { f =>
      ps.map { case (name, p) =>
        val n = stats(f)._3
        val idx = p * (n - 1)
        val lo = math.floor(idx).toLong + 1
        val frac = idx - math.floor(idx)
        val vLo = valueAt(f, lo)
        val vHi = if (lo < n) valueAt(f, lo + 1) else vLo
        (f, name) -> BigDecimal(vLo + frac * (vHi - vLo))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
  }

  val qPercentilesSql: String = """
    SELECT l_returnflag,
      ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY 1 ORDER BY 1"""

  /** Full cube over (status, priority): every marginal including the
    * cross ones rollup can't produce — one pass, Catalyst expands to
    * a single Expand + aggregation (no 4× re-scan of the fact table).
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total_price"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("total_price"), col("n_orders"))
      .orderBy(col("status"), col("priority"))

  val qCubeSql: String = """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""

  /** Set operators INTERSECT / EXCEPT over derived keysets: customers
    * who ordered in both 1995 and 1996, and those who ordered in 1995
    * but never in 1996 — tagged into one result. Spark plans both as
    * joins (left-semi / left-anti over distinct inputs), so they scale
    * like any key join: shuffle on the key, AQE handles skew.
    */
  def qIntersectExcept(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def custsIn(y: Int) =
      o.where(year(col("o_orderdate")) === y).select(col("o_custkey")).distinct()
    val both = custsIn(1995).intersect(custsIn(1996))
      .withColumn("tag", lit("both_95_96"))
    val only95 = custsIn(1995).except(custsIn(1996))
      .withColumn("tag", lit("only_95"))
    both.unionAll(only95).orderBy("tag", "o_custkey")
  }

  val qIntersectExceptSql: String = """
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1995),
    c96 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = 1996)
    SELECT o_custkey, 'both_95_96' AS tag FROM (
      SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
    UNION ALL
    SELECT o_custkey, 'only_95' FROM (
      SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96)
    ORDER BY tag, o_custkey"""

  /** Explicit GROUPING SETS — the general form under rollup/cube: only
    * the requested marginals {(status, priority), (status), ()} are
    * aggregated, one Expand + single aggregation pass (a rollup of a
    * different shape would re-scan; cube would compute the unneeded
    * priority-only marginal).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total_price"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("total_price"), col("n_orders"))
      .orderBy(col("status"), col("priority"))

  val qGroupingSetsSql: String = """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY status, priority"""

  /** Salted two-phase aggregation — the skew-mitigation shape written
    * out as an operator: partial aggregate on (key, salt) spreads a
    * hot key over `SkewSalts` reducers, the final aggregate combines
    * the partials. Decimal partial sums make the two-phase result
    * bit-identical to the direct aggregation (the oracle) — which is
    * exactly the invariant that makes salting safe to apply at 100 TB.
    * (For sum/count Spark's map-side partial aggregation already does
    * this implicitly; the explicit form is the building block for
    * skewed high-cardinality aggregates and skewed join keys.)
    */
  val SkewSalts = 8

  def qSkewAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), dec2(col("l_quantity")).as("q"),
        pmod(col("l_orderkey"), lit(SkewSalts)).as("salt"))
      .groupBy(col("l_suppkey"), col("salt"))
      .agg(sum(col("q")).as("pq"), count(lit(1)).as("pn"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("pq")).cast(DoubleType).as("sum_qty"),
        sum(col("pn")).as("n_items"))
      .orderBy("l_suppkey")

  val qSkewAggSql: String = """
    SELECT l_suppkey,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_items
    FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""

  /** Pivot (wide crosstab): order counts per status × priority, one
    * column per priority. Pivot values are passed explicitly (from the
    * TPC-H priority domain) so Catalyst skips the distinct-values
    * pre-scan and the column set is deterministic; the oracle is the
    * equivalent conditional aggregation.
    */
  val PivotPriorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val renames = PivotPriorities.map(p => col(s"`$p`").as(s"p${p.head}"))
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", PivotPriorities)
      .agg(count(lit(1)))
      .select(col("o_orderstatus") +: renames: _*)
      .na.fill(0L)
      .orderBy("o_orderstatus")
  }

  val qPivotSql: String = {
    val cols = PivotPriorities.map(p =>
      s"CAST(COUNT(*) FILTER (o_orderpriority = '$p') AS BIGINT) AS p${p.head}")
      .mkString(",\n      ")
    s"""
    SELECT o_orderstatus,
      $cols
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  }

  /** Incremental materialized-view maintenance: the per-(status, month)
    * revenue MV is kept as mergeable partials — counts and decimal
    * sums — so a late-arriving delta batch folds in by re-aggregating
    * (base partials ∪ delta partials), never rescanning the base fact.
    * Here the pivot date splits orders into the "stored MV" side and
    * the "new arrivals" side; at 100 TB the base side is a stored
    * partial-agg table of ~|groups| rows and each refresh costs one
    * scan of the delta plus a |groups|-sized merge shuffle. The oracle
    * is the full recompute over all orders — equality is exactly the
    * MV-consistency invariant (decimal sums make the merge
    * order-independent).
    */
  val IncrPivot = "2000-01-01 00:00:00"

  def qIncremental(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderstatus").as("status"),
          date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("o_totalprice"))).as("rev"))
    val base  = partials(o.where(col("o_orderdate") < ts(IncrPivot)))
    val delta = partials(o.where(col("o_orderdate") >= ts(IncrPivot)))
    base.unionAll(delta)
      .groupBy(col("status"), col("mon"))
      .agg(sum(col("n")).as("n_orders"),
        sum(col("rev")).cast(DoubleType).as("revenue"))
      .orderBy(col("status"), col("mon"))
  }

  val qIncrementalSql: String = """
    SELECT o_orderstatus AS status,
      date_trunc('month', o_orderdate) AS mon,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Runtime-filter (bloom) semi-join reduction: build a bloom filter
    * over the filtered dim's join keys, probe it on the fact side
    * BEFORE the join shuffle, then run the exact equi-join — false
    * positives are removed by the join, so the result is exact and
    * oracle-able. This is the explicit form of Spark's row-level
    * runtime filtering (`spark.sql.optimizer.runtime.bloomFilter.*`,
    * which injects the same agg+probe pair automatically when stats
    * warrant); written out as an operator because the SQL surface of
    * this build does not register `bloom_filter_agg`/`might_contain`.
    * At 100 TB the win is shuffle volume: fact rows that cannot join
    * (here ~80 %) are dropped at the scan, for one broadcast of a
    * ~1.2 MB bitset; the probe is the codegen'd
    * [[graft.functions.BloomMightContain]] expression (the filter
    * ships as a binary literal → codegen reference object), so the
    * fact scan keeps one unbroken WholeStageCodegen stage — a Scala
    * UDF here forced a codegen break on every scanned row.
    */
  def qBloomSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"))
    // The dim build cost (one count + one agg over the small side) is
    // the inherent price of any runtime filter.
    val bf = dim.stat.bloomFilter("o_orderkey", math.max(dim.count(), 1L), 0.01)
    val bytes = { val os = new java.io.ByteArrayOutputStream(); bf.writeTo(os); os.toByteArray }
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .where(call_function("graft_might_contain", lit(bytes), col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("revenue"))
      .orderBy(col("status"))
  }

  val qBloomSemijoinSql: String = """
    SELECT o_orderstatus AS status,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1 ORDER BY 1"""

  /** Interval (range) overlap join — the join shape Spark has no
    * native operator for (an inequality-only condition plans as a
    * nested-loop join): each order→ship transit interval
    * [o_orderdate, l_shipdate] against the 4 busiest order weeks'
    * unaligned 13-day promo periods [week−3d, week+9d); output is
    * per-period overlap count + mean transit length.
    *
    * Scale shape — bin bucketing: BOTH interval sets explode into the
    * 7-day bins they cover, the join is a bin EQUI-join (hash
    * partitionable, AQE-skew-splittable — never a nested loop), the
    * exact overlap predicate runs as a join residual, and a pair
    * sharing several bins is emitted exactly once by the canonical-bin
    * residual (only the bin containing max(lo, plo) emits — no dedup
    * shuffle). Cost: |rows| × (span/bin + 1)
    * exploded rows per side, overlap-true pairs out — the standard
    * fact-fact range-join answer. Here the period side is also
    * dimension-sized and broadcast, which AQE would do anyway; the
    * exploded-bin plan is what survives when BOTH sides are facts.
    */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast(DateType)
    val binDays = 7L
    def bins(lo: Column, hi: Column): Column =
      explode(sequence(floor(lo / binDays).cast(LongType),
        floor(hi / binDays).cast(LongType)))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      datediff(to_date(col("o_orderdate")), epoch).cast(LongType).as("od"))
    val iv = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(to_date(col("l_shipdate")), epoch).cast(LongType).as("hi"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("hi") >= col("od"))
      .select(col("l_orderkey"), col("l_linenumber"), col("od").as("lo"), col("hi"))
    val periods = o
      .groupBy(floor(col("od") / binDays).cast(LongType).as("wk"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("wk")).limit(4)
      .select((col("wk") * binDays - 3L).as("plo"), (col("wk") * binDays + 9L).as("phi"))
    val ivB = iv.withColumn("b", bins(col("lo"), col("hi")))
    val pB = periods.withColumn("b", bins(col("plo"), col("phi")))
    // a pair sharing several bins is emitted ONLY from the bin holding
    // max(lo, plo) — the canonical-bin trick: exactly-once without any
    // dedup shuffle (and robust to duplicate fact rows, which this
    // corpus has: (l_orderkey, l_linenumber) is not unique)
    ivB.join(broadcast(pB), "b")
      .where(col("lo") <= col("phi") && col("hi") >= col("plo") &&
        col("b") === floor(greatest(col("lo"), col("plo")) / binDays).cast(LongType))
      .groupBy(col("plo").as("period_start"))
      .agg(count(lit(1)).as("n_overlap"),
        round(sum(col("hi") - col("lo")).cast(DoubleType) / count(lit(1)), 6)
          .as("avg_transit_days"))
      .orderBy("period_start")
  }

  /** Oracle: the direct inequality join — bin bucketing is a pure
    * execution strategy, so plain overlap SQL is the contract.
    */
  val qIntervalJoinSql: String = """
    WITH o AS (SELECT o_orderkey,
                 CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od
               FROM orders),
    iv AS (SELECT l_orderkey, l_linenumber, o.od AS lo,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS hi
           FROM lineitem JOIN o ON o_orderkey = l_orderkey
           WHERE CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) >= o.od),
    wk AS (SELECT CAST(FLOOR(od / 7) AS BIGINT) AS wk, COUNT(*) AS n
           FROM o GROUP BY 1),
    periods AS (SELECT wk * 7 - 3 AS plo, wk * 7 + 9 AS phi FROM wk
                ORDER BY n DESC, wk LIMIT 4)
    SELECT p.plo AS period_start, CAST(COUNT(*) AS BIGINT) AS n_overlap,
      ROUND(CAST(SUM(iv.hi - iv.lo) AS DOUBLE) / COUNT(*), 6) AS avg_transit_days
    FROM iv JOIN periods p ON iv.lo <= p.phi AND iv.hi >= p.plo
    GROUP BY p.plo ORDER BY period_start"""

  /** Per-nation inequality readout of customer spend: exact Gini
    * coefficient via the rank identity G = 2·Σ rᵢxᵢ/(n·Σx) − (n+1)/n
    * (x ascending, ties broken by custkey so the rank — and therefore
    * the statistic — is deterministic), plus the top-20% concentration
    * share (the 80/20 readout). Spend, rank·spend and the top-quintile
    * sum stay EXACT decimals until one final cast, so the double
    * arithmetic is the same literal tree on both engines at
    * ROUND(6).
    *
    * Scale shape: the spend rollup shuffles on (nation, customer) —
    * full parallelism — and the rank is ADAPTIVE on the per-nation
    * group size. Under [[GiniExactWindowRows]] rows per nation the
    * rank is one window over the 25-key nation partitioning (a
    * per-group sort that spills fine at millions of customers per
    * nation — and the cheapest plan at gate scale). Above it, the
    * single-task-per-nation sort would be the one "spill and hope"
    * plan in the gate, so the rank switches to the BUCKETED-RANK path:
    * histogram spend into ≤1024 per-nation value-range buckets (the
    * [[distributedQuantiles]] bucketing), collect the ≤ 25×1024 bucket
    * counts, turn their per-nation prefix sums into broadcast rank
    * offsets, and rank within (nation, bucket) — EXACT global ranks
    * (bucketing is monotone in spend, and spend ties always land in
    * one bucket, where the (spend, ck) window order still applies) at
    * nations×buckets-way parallelism. Both paths produce bit-identical
    * output (GiniPathSpec pins it, including on a planted heavy-nation
    * skew corpus); the oracle contract never changes. No global sort,
    * no cross join.
    */
  def qGini(spark: SparkSession, dir: String): DataFrame =
    qGiniImpl(spark, dir, forceBucketed = false)

  /** Per-nation row count above which [[qGini]] abandons the exact
    * per-nation window for the bucketed-rank path. 2M rows ≈ a
    * 100-200 MB per-task sort of (nk, ck, spend) rows — comfortably
    * inside one executor task without spilling; past that the bucketed
    * path's two extra small jobs (histogram + offsets) buy
    * nations×1024-way sort parallelism.
    */
  val GiniExactWindowRows: Long = 2L << 20

  /** Group count above which the bucketed path derives the bucket id
    * via a broadcast-joined (nk, lo, width) param frame instead of a
    * per-nation nested CASE: the foldLeft CASE is the cheapest shape
    * at warehouse nation counts (25 branches, no extra join) but its
    * codegen grows quadratically with branches — at thousands of
    * groups the expression tree itself becomes the bottleneck. Both
    * shapes bucket with the same doubles, so ranks (and output) are
    * bit-identical (spec-pinned via forceParamJoin).
    */
  val GiniCaseMaxGroups: Int = 100

  private[graft] def qGiniImpl(spark: SparkSession, dir: String,
      forceBucketed: Boolean, forceParamJoin: Boolean = false,
      forceExactWindow: Boolean = false, custModulus: Long = 1L): DataFrame = {
    val sp = Tables.customer(spark, dir)
      .where(col("c_custkey") % custModulus === 0)
      .select(col("c_nationkey").cast(LongType).as("nk"), col("c_custkey").as("ck"))
      .join(Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice")),
        col("o_custkey") === col("ck"))
      .groupBy("nk", "ck").agg(sum(dec2(col("o_totalprice"))).as("spend"))
      // checkpointed: the path decision needs per-nation counts, and
      // on the bucketed path the histogram + ranking passes must not
      // re-run the customer⋈orders rollup
      .localCheckpoint()
    // ≤ 25 rows: nation count, spend extent (as double — only used to
    // cut monotone bucket boundaries, never for the statistic itself)
    val stats = sp.groupBy("nk")
      .agg(count(lit(1)).as("n"),
        min(col("spend").cast(DoubleType)).as("lo"),
        max(col("spend").cast(DoubleType)).as("hi"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val maxGroup = if (stats.isEmpty) 0L else stats.valuesIterator.map(_._1).max
    val rk =
      if (forceExactWindow || (!forceBucketed && maxGroup <= GiniExactWindowRows)) {
        val byNation = Window.partitionBy("nk")
        sp.withColumn("r",
            row_number().over(byNation.orderBy("spend", "ck")).cast(LongType))
          .withColumn("n", count(lit(1)).over(byNation))
      } else {
        val NB = 1024
        import spark.implicits._
        // monotone per-nation bucket of spend: equal spends share a
        // bucket, so the within-bucket (spend, ck) order is globally
        // consistent and offset + row_number is the EXACT global rank.
        // Bucket-id derivation is shape-adaptive: a nested CASE at
        // warehouse group counts, a broadcast-joined param frame past
        // [[GiniCaseMaxGroups]] (identical doubles → identical buckets)
        def withBucket(d: DataFrame): DataFrame =
          if (forceParamJoin || stats.size > GiniCaseMaxGroups) {
            val params = stats.toSeq.map { case (nk, (_, lo, hi)) =>
              (nk, lo, math.max((hi - lo) / NB, java.lang.Double.MIN_NORMAL))
            }.toDF("nk", "blo", "bwidth")
            d.join(broadcast(params), Seq("nk"))
              .withColumn("b",
                least(floor((col("spend").cast(DoubleType) - col("blo")) / col("bwidth")),
                  lit(NB - 1)).cast("int"))
              .drop("blo", "bwidth")
          } else {
            val bCol = stats.foldLeft(lit(0)) { case (acc, (nk, (_, lo, hi))) =>
              val width = math.max((hi - lo) / NB, java.lang.Double.MIN_NORMAL)
              when(col("nk") === nk,
                least(floor((col("spend").cast(DoubleType) - lit(lo)) / lit(width)),
                  lit(NB - 1)).cast("int"))
                .otherwise(acc)
            }
            d.withColumn("b", bCol)
          }
        val hist = withBucket(sp)
          .groupBy("nk", "b").agg(count(lit(1)).as("c")).collect()
          .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
        // per-(nation, bucket) rank offsets via driver prefix sums over
        // ≤ 25×1024 counts, plus the nation total the readout needs
        val offRows = stats.toSeq.flatMap { case (nk, (n, _, _)) =>
          var cum = 0L
          (0 until NB).flatMap { b =>
            hist.get((nk, b)).map { c =>
              val off = cum; cum += c; (nk, b, off, n)
            }
          }
        }
        val offDf = offRows.toDF("nk", "b", "off", "n")
        val wb = Window.partitionBy("nk", "b")
        withBucket(sp)
          .join(broadcast(offDf), Seq("nk", "b"))
          .withColumn("r",
            row_number().over(wb.orderBy("spend", "ck")).cast(LongType) + col("off"))
          .drop("b", "off")
      }
    val ag = rk.withColumn("top_k", floor(col("n") / 5))
      .groupBy("nk", "top_k")
      .agg(max(col("n")).as("n"),
        sum(col("spend")).cast(DoubleType).as("total"),
        sum(col("r") * col("spend")).cast(DoubleType).as("rs"),
        sum(when(col("r") > col("n") - col("top_k"), col("spend")))
          .cast(DoubleType).as("top_spend"))
    ag.select(col("nk").as("nationkey"), col("n").as("n_customers"),
        round(col("total"), 2).as("total_spend"),
        round(lit(2) * col("rs") / (col("n") * col("total"))
          - (col("n") + lit(1.0)) / col("n"), 6).as("gini"),
        col("top_k"),
        round(coalesce(col("top_spend"), lit(0.0)) / col("total"), 6).as("top20_share"))
      .orderBy("nationkey")
  }

  /** Parameterized [[qGiniSql]] for the fuzz family: the same exact
    * rank-identity SQL over the customers passing a `c_custkey %
    * modulus = 0` subset — varying the per-nation group sizes the way
    * the engine's path decision sees them. The oracle is PATH-BLIND
    * (exact window always): every engine path must reproduce it.
    */
  def qGiniSqlAt(modulus: Long): String = s"""
    WITH sp AS (
      SELECT CAST(c.c_nationkey AS BIGINT) AS nk, c.c_custkey AS ck,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey % $modulus = 0
      GROUP BY 1, 2),
    rk AS (
      SELECT nk, ck, spend,
        ROW_NUMBER() OVER (PARTITION BY nk ORDER BY spend, ck) AS r,
        COUNT(*) OVER (PARTITION BY nk) AS n
      FROM sp),
    ag AS (
      SELECT nk, MAX(n) AS n,
        CAST(SUM(spend) AS DOUBLE) AS total,
        CAST(SUM(r * spend) AS DOUBLE) AS rs,
        CAST(SUM(CASE WHEN r > n - CAST(FLOOR(n / 5) AS BIGINT) THEN spend END) AS DOUBLE) AS top_spend,
        CAST(FLOOR(n / 5) AS BIGINT) AS top_k
      FROM rk GROUP BY nk, CAST(FLOOR(n / 5) AS BIGINT))
    SELECT nk AS nationkey, n AS n_customers,
      ROUND(total, 2) AS total_spend,
      ROUND(2 * rs / (n * total) - (n + 1.0) / n, 6) AS gini,
      top_k, ROUND(COALESCE(top_spend, 0) / total, 6) AS top20_share
    FROM ag ORDER BY nationkey"""

  val qGiniSql: String = """
    WITH sp AS (
      SELECT CAST(c.c_nationkey AS BIGINT) AS nk, c.c_custkey AS ck,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    rk AS (
      SELECT nk, ck, spend,
        ROW_NUMBER() OVER (PARTITION BY nk ORDER BY spend, ck) AS r,
        COUNT(*) OVER (PARTITION BY nk) AS n
      FROM sp),
    ag AS (
      SELECT nk, MAX(n) AS n,
        CAST(SUM(spend) AS DOUBLE) AS total,
        CAST(SUM(r * spend) AS DOUBLE) AS rs,
        CAST(SUM(CASE WHEN r > n - CAST(FLOOR(n / 5) AS BIGINT) THEN spend END) AS DOUBLE) AS top_spend,
        CAST(FLOOR(n / 5) AS BIGINT) AS top_k
      FROM rk GROUP BY nk, CAST(FLOOR(n / 5) AS BIGINT))
    SELECT nk AS nationkey, n AS n_customers,
      ROUND(total, 2) AS total_spend,
      ROUND(2 * rs / (n * total) - (n + 1.0) / n, 6) AS gini,
      top_k, ROUND(COALESCE(top_spend, 0) / total, 6) AS top20_share
    FROM ag ORDER BY nationkey"""

  /** Market-basket association mining over order baskets: for every
    * brand pair co-purchased in ≥ MinSupport orders, the support /
    * confidence / lift triple (the Agrawal–Srikant readout, the
    * warehouse staple behind "frequently bought together"). All three
    * ratios come from integer counts with explicit one-step double
    * casts, so the doubles are bit-identical on both engines at
    * ROUND(6).
    *
    * Scale shape (r17): ONE shuffle of the basket stream. The
    * (order, brand) rows group straight into per-order brand SETS
    * (bounded: ≤ |brands| elements, so collect_set is never a skew
    * hazard), and the ordered pairs explode map-side from each sorted
    * set — per-order work is C(basket-brands, 2), bounded by basket
    * size, never corpus-quadratic, with no self-join machinery at
    * all. The former shape (distinct → self-equi-join on the order
    * key) shuffled the basket stream three times (distinct by (o,b),
    * then both join sides by o); the grouped frame is
    * localCheckpoint'd so the pair explosion, the brand marginals
    * (explode + count), and the 1-row order total all read the one
    * shuffled pass. Marginals and the order count ride a broadcast
    * into the final ≤ |brands|² row join.
    */
  val BasketMinSupport = 5L

  def qBasket(spark: SparkSession, dir: String): DataFrame =
    basketRules(spark, dir, BasketMinSupport)

  /** Parameterized twin (the fuzz family draws the support floor). */
  private[graft] def basketRules(spark: SparkSession, dir: String,
      minSupport: Long): DataFrame = {
    val ob = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
    // Bounded-dimension collect (the langid-allLangs pattern) from the
    // part DIMENSION, never the basket stream.
    val brandArr = Tables.part(spark, dir).select(col("p_brand"))
      .distinct().collect().map(_.getString(0)).sorted
    basketRulesFromPairs(spark, ob, brandArr, minSupport)
  }

  /** Core of [[basketRules]] over an `(o, b)` basket stream.
    *
    * The brand alphabet is a bounded dimension (25 at every TPC-H
    * scale), so a basket is a FIXED-WIDTH value: one bit per brand
    * across ceil(|brands|/64) 64-bit words — ONE word column on the
    * shipped data model, and the same plan simply widens by a word
    * per extra 64 brands instead of refusing (the former
    * `require(<= 64)`). bit_or over long words runs in the codegen'd,
    * gracefully-spilling HashAggregate with map-side partial combine
    * — ONE shuffle of the basket stream and the only corpus-sized
    * pass. (collect_set is ObjectHashAggregate, whose sort-based
    * fallback re-sorts the full stream at real key counts — measured
    * 24 → 67 s at sf10 — and a lag-dedup + self-join pays 3 stream
    * exchanges.) Pair/marginal counts then read the DISTINCT-mask
    * frame (collapses hard on replicated corpora) against broadcast
    * bit tables — |brands| and C(|brands|, 2) rows, word-indexed —
    * so there is no corpus-sized join at all at any alphabet width.
    */
  private[graft] def basketRulesFromPairs(spark: SparkSession, ob: DataFrame,
      brandArr: Array[String], minSupport: Long): DataFrame = {
    import spark.implicits._
    val nWords = math.max(1, (brandArr.length + 63) / 64)
    val wordMap = typedLit(brandArr.zipWithIndex.map {
      case (b, i) => b -> (i / 64)
    }.toMap)
    val bitMap = typedLit(brandArr.zipWithIndex.map {
      case (b, i) => b -> (1L << (i % 64))
    }.toMap)
    val wordAggs = (0 until nWords).map(w =>
      expr(s"bit_or(CASE WHEN w = $w THEN bit ELSE 0L END)").as(s"m$w"))
    val masks = ob
      .withColumn("w", element_at(wordMap, col("b")))
      .withColumn("bit", element_at(bitMap, col("b")))
      .groupBy("o").agg(wordAggs.head, wordAggs.tail: _*)
    // distinct-mask histogram: the three readouts below consume it, so
    // one checkpoint of a <= min(n_orders, 2^|brands|)-row frame;
    // the words collapse into one array column for the bit probes
    val maskCols = (0 until nWords).map(w => col(s"m$w"))
    val mc = masks.groupBy(maskCols: _*).agg(count(lit(1)).as("cnt"))
      .select(array(maskCols: _*).as("marr"), col("cnt"))
      .localCheckpoint()
    // broadcast bit tables carry 1-based word indices for element_at
    val pairTab = broadcast(
      (for {
        i <- brandArr.indices; j <- brandArr.indices if i < j
      } yield (brandArr(i), brandArr(j),
        i / 64 + 1, 1L << (i % 64), j / 64 + 1, 1L << (j % 64)))
        .toDF("b1", "b2", "w1", "bit1", "w2", "bit2"))
    val brandTab = broadcast(
      brandArr.zipWithIndex.map { case (b, i) => (b, i / 64 + 1, 1L << (i % 64)) }
        .toSeq.toDF("b", "w", "bit"))
    def hasBit(w: Column, bit: Column): Column =
      element_at(col("marr"), w).bitwiseAND(bit) === bit
    val nb = mc.join(brandTab, hasBit(col("w"), col("bit")))
      .groupBy("b").agg(sum(col("cnt")).as("nb"))
    val no = mc.agg(sum(col("cnt")).as("n"))
    val pr = mc.join(pairTab,
        hasBit(col("w1"), col("bit1")) && hasBit(col("w2"), col("bit2")))
      .groupBy("b1", "b2").agg(sum(col("cnt")).as("n_both"))
      .where(col("n_both") >= minSupport)
    pr.join(nb.select(col("b").as("b1"), col("nb").as("n1")), "b1")
      .join(nb.select(col("b").as("b2"), col("nb").as("n2")), "b2")
      .crossJoin(broadcast(no))
      .select(col("b1"), col("b2"), col("n_both"),
        round(col("n_both") / col("n").cast(DoubleType), 6).as("support"),
        round(col("n_both") / col("n1").cast(DoubleType), 6).as("confidence"),
        round(col("n_both") * col("n").cast(DoubleType)
          / (col("n1").cast(DoubleType) * col("n2")), 6).as("lift"))
      .orderBy("b1", "b2")
  }

  def qBasketSqlAt(minSupport: Long): String = s"""
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS o, p_brand AS b
      FROM lineitem JOIN part ON p_partkey = l_partkey),
    nb AS (SELECT b, COUNT(*) AS nb FROM ob GROUP BY b),
    no AS (SELECT COUNT(DISTINCT o) AS n FROM ob),
    pr AS (
      SELECT a.b AS b1, c.b AS b2, COUNT(*) AS n_both
      FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
      GROUP BY 1, 2),
    st AS (
      SELECT b1, b2, n_both, n1.nb AS n1, n2.nb AS n2, no.n AS n
      FROM pr JOIN nb n1 ON n1.b = pr.b1 JOIN nb n2 ON n2.b = pr.b2, no
      WHERE n_both >= $minSupport)
    SELECT b1, b2, n_both,
      ROUND(n_both / CAST(n AS DOUBLE), 6) AS support,
      ROUND(n_both / CAST(n1 AS DOUBLE), 6) AS confidence,
      ROUND(n_both * CAST(n AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS lift
    FROM st ORDER BY b1, b2"""

  val qBasketSql: String = qBasketSqlAt(BasketMinSupport)

  def ops: Seq[Op] = Seq(
    Op("q_basket", qBasket, Some(qBasketSql)),
    Op("q_gini", qGini, Some(qGiniSql)),
    Op("q17_small_qty", q17SmallQty, Some(q17SmallQtySql)),
    Op("q_interval_join", qIntervalJoin, Some(qIntervalJoinSql)),
    Op("q_incremental", qIncremental, Some(qIncrementalSql)),
    Op("q_bloom_semijoin", qBloomSemijoin, Some(qBloomSemijoinSql)),
    Op("q_pivot", qPivot, Some(qPivotSql)),
    Op("q_cube", qCube, Some(qCubeSql)),
    Op("q_grouping_sets", qGroupingSets, Some(qGroupingSetsSql)),
    Op("q_intersect_except", qIntersectExcept, Some(qIntersectExceptSql)),
    Op("q_skew_agg", qSkewAgg, Some(qSkewAggSql)),
    Op("q_percentiles", qPercentiles, Some(qPercentilesSql)),
    Op("q1_agg", q1Agg, Some(q1AggSql)),
    Op("q3_join_topk", q3JoinTopk, Some(q3JoinTopkSql)),
    Op("q5_multijoin", q5Multijoin, Some(q5MultijoinSql)),
    Op("q_semi_anti", qSemiAnti, Some(qSemiAntiSql)),
    Op("q_window", qWindow, Some(qWindowSql)),
    Op("q_topk_pergroup", qTopkPerGroup, Some(qTopkPerGroupSql)),
    Op("q_rollup", qRollup, Some(qRollupSql)),
  )
}
