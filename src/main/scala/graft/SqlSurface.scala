package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's SQL front door.
  *
  * Every operator in this library is a Scala function, but a real
  * analytics user's first query is `spark.sql(...)` — so the
  * warehouse tables and the named derived graphs register as temp
  * views, and a representative slice of the operator surface (one or
  * more per family: OLAP aggregation, star join, top-k, semi/anti,
  * window, rollup, graph degrees, exact dedup, ANN brute force) is
  * expressed as plain Spark SQL over those views. Each SQL entry is
  * contract-equal to its operator: SqlSurfaceSpec runs both and
  * compares the full row set under the driver's column-sorted
  * convention, so the SQL surface is gated by exactly the oracle
  * answers the operators are.
  *
  * The session's custom Catalyst expressions (`graft_dot`,
  * `graft_norm`, `graft_isect`, `graft_argmin`, `graft_might_contain`
  * — injected via `SparkSessionExtensions` in [[GraftSession]]) are
  * first-class SQL functions here: the ANN entry scores with
  * `graft_dot`/`graft_norm` inside whole-stage codegen, which is the
  * reason the SQL path carries the same 100 TB story as the Scala
  * path (same plans, same pushdown, same codegen — views add
  * nothing at runtime).
  *
  * Scale note: view registration is lazy metadata (no materialization;
  * the derived-graph views serve the session-cataloged frames, so a
  * SQL user shares the load-once-query-many graph cache with the
  * Scala API — reference load model: primary_server.c:153-176).
  */
object SqlSurface {

  /** Register the warehouse tables and named graphs for `dir` as temp
    * views: `region nation customer supplier part orders lineitem
    * events documents embeddings` plus `graph_supply`,
    * `graph_supply_und`, `graph_nation`, `graph_hash`.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))
    graph.DerivedGraphs.supplyEdges(spark, dir).createOrReplaceTempView("graph_supply")
    graph.DerivedGraphs.supplyEdgesUndirected(spark, dir)
      .createOrReplaceTempView("graph_supply_und")
    graph.DerivedGraphs.nationEdges(spark, dir).createOrReplaceTempView("graph_nation")
    graph.DerivedGraphs.hashEdges(spark, dir).createOrReplaceTempView("graph_hash")
  }

  /** Run one named surface query against `dir`. */
  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    register(spark, dir)
    spark.sql(queries(name))
  }

  /** Spark SQL per gate-op name, output-identical to the operator
    * (same columns, same values — including the decimal-snap
    * aggregation pattern, so doubles are bit-equal).
    */
  val queries: Map[String, String] = Map(
    "q1_agg" -> """
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
      ORDER BY l_returnflag, l_linestatus""",

    "q3_join_topk" -> """
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
      LIMIT 10""",

    "q5_multijoin" -> """
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
      ORDER BY revenue DESC, n_name""",

    "q17_small_qty" -> """
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
        AND l_quantity < 0.2 * avg_qty""",

    "q_semi_anti" -> """
      SELECT * FROM (
        SELECT 'big_order_cust' AS kind, c_custkey AS key FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        UNION ALL
        SELECT 'never_shipped_part' AS kind, p_partkey AS key FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ) ORDER BY kind, key""",

    "q_window" -> """
      SELECT o_custkey, o_orderkey,
        CAST(ROW_NUMBER() OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      FROM orders
      ORDER BY o_custkey, rn""",

    "q_topk_pergroup" -> """
      SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
        FROM part)
      WHERE rn <= 3
      ORDER BY p_brand, rn""",

    "q_rollup" -> """
      SELECT COALESCE(r_name, 'ALL') AS region_name,
             COALESCE(n_name, 'ALL') AS nation_name,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
             COUNT(*) AS n_customers
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY region_name, nation_name""",

    "q_interval_join" -> """
      WITH o AS (SELECT o_orderkey,
                   CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) AS od
                 FROM orders),
      iv AS (SELECT l_orderkey, l_linenumber, o.od AS lo,
               CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) AS hi
             FROM lineitem JOIN o ON l_orderkey = o_orderkey
             WHERE CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) >= o.od),
      periods AS (SELECT wk * 7 - 3 AS plo, wk * 7 + 9 AS phi FROM (
                   SELECT CAST(FLOOR(od / 7) AS BIGINT) AS wk, COUNT(*) AS n
                   FROM o GROUP BY 1 ORDER BY n DESC, wk LIMIT 4)),
      ivb AS (SELECT l_orderkey, l_linenumber, lo, hi, b FROM iv
              LATERAL VIEW explode(sequence(CAST(FLOOR(lo / 7) AS BIGINT),
                                            CAST(FLOOR(hi / 7) AS BIGINT))) t AS b),
      pb AS (SELECT plo, phi, b FROM periods
             LATERAL VIEW explode(sequence(CAST(FLOOR(plo / 7) AS BIGINT),
                                           CAST(FLOOR(phi / 7) AS BIGINT))) t AS b)
      SELECT /*+ BROADCAST(pb) */ plo AS period_start, COUNT(*) AS n_overlap,
        ROUND(CAST(SUM(hi - lo) AS DOUBLE) / COUNT(*), 6) AS avg_transit_days
      FROM ivb JOIN pb USING (b)
      WHERE lo <= phi AND hi >= plo
        AND b = CAST(FLOOR(GREATEST(lo, plo) / 7) AS BIGINT)
      GROUP BY plo ORDER BY period_start""",

    "graph_degrees" -> """
      SELECT vertex, CAST(SUM(o) AS BIGINT) AS out_deg,
             CAST(SUM(i) AS BIGINT) AS in_deg,
             CAST(SUM(o) + SUM(i) AS BIGINT) AS total_deg
      FROM (SELECT src AS vertex, 1 AS o, 0 AS i FROM graph_supply
            UNION ALL SELECT dst, 0, 1 FROM graph_supply)
      GROUP BY vertex ORDER BY vertex""",

    "dedup_exact" -> """
      SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents GROUP BY md5(text)
      ORDER BY doc_id""",

    "ann_topk_bruteforce" -> s"""
      WITH n AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v,
                        graft_norm(embedding) AS nrm
                 FROM embeddings),
      q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n
            WHERE vec_id < ${similarity.Ann.NumQueries}),
      s AS (SELECT q.qid, n.vec_id,
              ROUND(CASE WHEN qn * nrm = 0.0 THEN CAST('NaN' AS DOUBLE)
                    ELSE graft_dot(qv, v) / (qn * nrm) END, 6) + 0.0 AS score
            FROM q JOIN n ON n.vec_id != q.qid),
      r AS (SELECT qid, vec_id, score,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
            FROM s)
      SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, score
      FROM r WHERE rank <= ${similarity.Ann.K} ORDER BY qid, rank""",

    "text_chunk_overlap" -> s"""
      SELECT doc_id, CAST(pos AS BIGINT) AS chunk_id, s AS start_tok,
        LEAST(${text.TextAnalysis.ChunkLen}L, n - s) AS n_tokens,
        concat_ws(' ', slice(ws, s + 1, ${text.TextAnalysis.ChunkLen})) AS chunk_text
      FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, split(text, ' ') AS ws,
              CAST(size(split(text, ' ')) AS BIGINT) AS n
            FROM documents)
      LATERAL VIEW posexplode(
        filter(sequence(0L, n - 1L, ${text.TextAnalysis.ChunkStride}L),
          x -> x = 0 OR x + ${text.TextAnalysis.ChunkLen - text.TextAnalysis.ChunkStride} < n)) AS pos, s
      ORDER BY doc_id, chunk_id""",

    "mm_shard_manifest" -> s"""
      SELECT doc_id, source,
        concat(source, '-', lpad(CAST(shard_id AS STRING), 5, '0')) AS shard,
        shard_id, start_byte - shard_id * ${multimodal.Multimodal.ShardBytes}L AS offset,
        n_bytes
      FROM (SELECT doc_id, source, n_bytes, start_byte,
              start_byte div ${multimodal.Multimodal.ShardBytes}L AS shard_id
            FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                    CAST(octet_length(text) AS BIGINT) AS n_bytes,
                    CAST(COALESCE(SUM(octet_length(text)) OVER (
                      PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                      AS start_byte
                  FROM documents))
      ORDER BY source, doc_id""",
  )
}
