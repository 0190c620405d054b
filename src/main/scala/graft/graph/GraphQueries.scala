package graft.graph

import graft.Op
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Driver-contract entries for the graph database surface (reference
  * ops 1-4 re-expressed + the standard analytics suite). Every oracle
  * mirrors the exact derived-graph definition from DerivedGraphs.
  */
object GraphQueries {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-graphstore").toString

  private def affine(spark: SparkSession, dir: String, m: Long, mult: Long, add: Long): DataFrame = {
    val base = graft.Tables.orders(spark, dir).select((col("o_orderkey") % m).as("v")).distinct()
    base.select(col("v").as("src"), ((col("v") * mult + add) % m).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
  }

  /** Reference op 1: create a named graph, read it back. */
  def graphLoad(spark: SparkSession, dir: String): DataFrame = {
    val work = tmpDir()
    GraphStore.save(spark, work, "supply", DerivedGraphs.supplyEdges(spark, dir))
    GraphStore.load(spark, work, "supply").orderBy("src", "dst")
  }

  val graphLoadSql: String =
    s"""WITH ${DerivedGraphs.supplyEdgesSql}
       |SELECT src, dst FROM se ORDER BY src, dst""".stripMargin

  /** Reference op 2: modify a named graph (upsert merge), read back. */
  def graphModify(spark: SparkSession, dir: String): DataFrame = {
    val work = tmpDir()
    GraphStore.save(spark, work, "hash", affine(spark, dir, 2048, 31, 7))
    GraphStore.upsert(spark, work, "hash", affine(spark, dir, 2048, 17, 3))
    GraphStore.load(spark, work, "hash").orderBy("src", "dst")
  }

  val graphModifySql: String =
    s"""WITH ${DerivedGraphs.hashEdgesSql(2048)}
       |SELECT src, dst FROM he ORDER BY src, dst""".stripMargin

  /** Reference file-format parity: round-trip the hash graph through
    * the G*.txt adjacency-matrix text format (write it the way
    * primary_server.c does, parse it back 1-based, shift to the
    * derived graph's 0-based ids). Oracle = the derived graph itself,
    * so a row/column/one-basing mistake on either side hash-fails.
    */
  def graphLoadText(spark: SparkSession, dir: String): DataFrame = {
    val m = 256
    val e = DerivedGraphs.hashEdges(spark, dir, m)
    val file = s"${tmpDir()}/G.txt"
    GraphStore.toAdjacencyText(
      e.select((col("src") + 1).as("src"), (col("dst") + 1).as("dst")), file, m)
    GraphStore.fromAdjacencyText(spark, file)
      .select((col("src") - 1).as("src"), (col("dst") - 1).as("dst"))
      .orderBy("src", "dst")
  }

  val graphLoadTextSql: String =
    s"""WITH ${DerivedGraphs.hashEdgesSql(256)}
       |SELECT src, dst FROM he ORDER BY src, dst""".stripMargin

  /** Reference op 4: BFS levels on the (undirected) supply graph. */
  def graphBfs(spark: SparkSession, dir: String): DataFrame = {
    // materialized via the derived-graph catalog: the source
    // aggregate and every traversal level read one checkpointed frame
    val e = DerivedGraphs.supplyEdgesUndirected(spark, dir)
    val src = e.agg(min(col("src")).as("vertex"))
    GraphOps.bfsFrom(e, src, maxDepth = 6)
      .select(col("vertex"), col("level").cast("long").as("level"))
      .orderBy("vertex")
  }

  val graphBfsSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.supplyEdgesSql},
       |su AS (SELECT src, dst FROM se UNION SELECT dst, src FROM se),
       |s0 AS (SELECT MIN(src) AS v FROM se),
       |b AS (
       |  SELECT v, 0 AS level FROM s0
       |  UNION
       |  SELECT su.dst, b.level + 1 FROM b JOIN su ON su.src = b.v WHERE b.level < 6
       |)
       |SELECT v AS vertex, CAST(MIN(level) AS BIGINT) AS level
       |FROM b GROUP BY v ORDER BY vertex""".stripMargin

  /** BFS on the deep hash graph (depth ~17): the traversal stress test. */
  def graphBfsDeep(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.hashEdges(spark, dir, 2048).localCheckpoint()
    val src = e.agg(min(col("src")).as("vertex"))
    GraphOps.bfsFrom(e, src, maxDepth = 30)
      .select(col("vertex"), col("level").cast("long").as("level"))
      .orderBy("vertex")
  }

  val graphBfsDeepSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.hashEdgesSql(2048)},
       |s0 AS (SELECT MIN(src) AS v FROM he),
       |b AS (
       |  SELECT v, 0 AS level FROM s0
       |  UNION
       |  SELECT he.dst, b.level + 1 FROM b JOIN he ON he.src = b.v WHERE b.level < 30
       |)
       |SELECT v AS vertex, CAST(MIN(level) AS BIGINT) AS level
       |FROM b GROUP BY v ORDER BY vertex""".stripMargin

  /** Reference op 3 (deterministic contract): reachable set from source. */
  def graphDfsReach(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.hashEdges(spark, dir, 2048).localCheckpoint()
    val src = e.agg(min(col("src")).as("vertex"))
    GraphOps.reach(e, src).orderBy("vertex")
  }

  val graphDfsReachSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.hashEdgesSql(2048)},
       |s0 AS (SELECT MIN(src) AS v FROM he),
       |r AS (
       |  SELECT v FROM s0
       |  UNION
       |  SELECT he.dst FROM r JOIN he ON he.src = r.v
       |)
       |SELECT v AS vertex FROM r ORDER BY vertex""".stripMargin

  /** Reference op 3 terminal-vertex variant (dfs_bfs.h:70-77): the
    * reachable sinks from the source — see [[GraphOps.dfsLeaves]] for
    * the determinism argument. Runs on the supply graph (bipartite
    * customer→supplier: supplier vertices are genuine sinks at every
    * scale factor, unlike the hash graph, whose sinks vanish once all
    * residues appear).
    */
  def graphDfsLeaves(spark: SparkSession, dir: String): DataFrame = {
    // catalog-served frame is already checkpointed — a second
    // localCheckpoint would materialize a redundant 59M-edge copy at
    // sf10 (measured: the op's dominant cost was exactly these copies)
    val e = DerivedGraphs.supplyEdges(spark, dir)
    val src = e.agg(min(col("src")).as("vertex"))
    // anti-join probe from the shared degree catalog entry: out_deg > 0
    // IS the distinct-src set, without re-distincting the edge list
    val srcs = DerivedGraphs.supplyDegrees(spark, dir)
      .where(col("out_deg") > 0).select("vertex")
    GraphOps.dfsLeaves(e, src, srcVertices = Some(srcs)).orderBy("vertex")
  }

  val graphDfsLeavesSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.supplyEdgesSql},
       |s0 AS (SELECT MIN(src) AS v FROM se),
       |r AS (
       |  SELECT v FROM s0
       |  UNION
       |  SELECT se.dst FROM r JOIN se ON se.src = r.v
       |)
       |SELECT v AS vertex FROM r
       |WHERE v NOT IN (SELECT src FROM se) ORDER BY vertex""".stripMargin

  /** Reference op 3 (ordering parity): lexicographic DFS preorder,
    * driver-side on a small graph. Oracle-backed since r19 (below);
    * rows-only from r2-r18.
    */
  def graphDfsPreorder(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.hashEdges(spark, dir, 512)
    val src = e.agg(min(col("src"))).head().getLong(0)
    GraphOps.dfsPreorder(e, src).orderBy("pos")
  }

  /** DFS preorder oracle (r19): DFS is a sequential stack machine, so
    * the CTE replays it AS ONE — a single-row recursive state
    * `(ord, stk)` advancing one DFS step per iteration: pop the head,
    * skip if visited, else append to the order and push the unvisited
    * neighbors in ascending order (head = explored first — exactly
    * [[GraphOps.dfsPreorder]]'s reversed-push loop). Terminates when
    * the stack empties; V + pushed-duplicates iterations (~1.5k at
    * m=512), each O(state). This sidesteps both the exponential
    * simple-path enumeration and the keyed-fixpoint recursion DuckDB
    * 1.0 lacks.
    */
  val graphDfsPreorderSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.hashEdgesSql(512)},
       |adj AS (SELECT src, list(dst ORDER BY dst) AS ns FROM he GROUP BY src),
       |s0 AS (SELECT MIN(src) AS v FROM he),
       |dfs(ord, stk) AS (
       |  SELECT [s0.v], COALESCE(a.ns, []) FROM s0 LEFT JOIN adj a ON a.src = s0.v
       |  UNION ALL
       |  SELECT
       |    CASE WHEN visited THEN ord ELSE list_append(ord, v) END,
       |    CASE WHEN visited THEN stk[2:]
       |         ELSE list_concat(list_filter(nsv, x -> NOT list_contains(ord, x) AND x != v), stk[2:]) END
       |  FROM (
       |    SELECT d.ord, d.stk, d.stk[1] AS v, list_contains(d.ord, d.stk[1]) AS visited,
       |           COALESCE(a.ns, []) AS nsv
       |    FROM dfs d LEFT JOIN adj a ON a.src = d.stk[1]
       |    WHERE len(d.stk) > 0
       |  )
       |),
       |fin AS (SELECT ord FROM dfs WHERE len(stk) = 0),
       |ux AS (SELECT unnest(ord) AS vertex, generate_subscripts(ord, 1) AS i FROM fin)
       |SELECT CAST(i - 1 AS BIGINT) AS pos, CAST(vertex AS BIGINT) AS vertex
       |FROM ux ORDER BY pos""".stripMargin

  /** Served from the shared supply-degree catalog entry
    * ([[DerivedGraphs.supplyDegrees]]), which tags each directed edge
    * end and aggregates once (primary_server.c:27-64's one-way
    * adjacency rows). The out/in split comes from the edge side itself
    * — NOT from a `vertex < SupplierOffset` compare, which misreads
    * any custkey ≥ 1e6 (ScaleUp-shifted corpora, plain TPC-H sf≥7) as
    * a supplier. GraphSpec pins this row-identical to
    * [[GraphOps.degrees]] over the directed frame; the DuckDB oracle
    * (below, unchanged) hash-gates it every round.
    */
  def graphDegrees(spark: SparkSession, dir: String): DataFrame =
    DerivedGraphs.supplyDegrees(spark, dir)
      .select("vertex", "out_deg", "in_deg", "total_deg")
      .orderBy("vertex")

  // SUM over INTEGER is HUGEINT in DuckDB — cast back to BIGINT so the
  // serialized type matches Spark's LongType sums.
  val graphDegreesSql: String =
    s"""WITH ${DerivedGraphs.supplyEdgesSql}
       |SELECT vertex, CAST(SUM(o) AS BIGINT) AS out_deg,
       |       CAST(SUM(i) AS BIGINT) AS in_deg,
       |       CAST(SUM(o) + SUM(i) AS BIGINT) AS total_deg
       |FROM (SELECT src AS vertex, 1 AS o, 0 AS i FROM se
       |      UNION ALL SELECT dst, 0, 1 FROM se)
       |GROUP BY vertex ORDER BY vertex""".stripMargin

  /** Connected components (alternating star) on the nation graph. */
  def graphCc(spark: SparkSession, dir: String): DataFrame =
    GraphOps.connectedComponents(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  val graphCcSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.nationEdgesSql},
       |u AS (SELECT src, dst FROM ne UNION SELECT dst, src FROM ne),
       |verts AS (SELECT src AS v FROM ne UNION SELECT dst FROM ne),
       |r AS (
       |  SELECT v AS start, v AS reach FROM verts
       |  UNION
       |  SELECT r.start, u.dst FROM r JOIN u ON u.src = r.reach
       |)
       |SELECT start AS vertex, MIN(reach) AS component
       |FROM r GROUP BY start ORDER BY vertex""".stripMargin

  /** CC at scale (supply graph, ~1.6k vertices at sf0.01) — the same
    * recursive-closure oracle as the nation graph; feasible because
    * the giant component's closure is ~|V|² ≈ 2.6M rows in DuckDB.
    */
  def graphCcLarge(spark: SparkSession, dir: String): DataFrame =
    GraphOps.connectedComponents(DerivedGraphs.supplyEdges(spark, dir))
      .orderBy("vertex")

  val graphCcLargeSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.supplyEdgesSql},
       |u AS (SELECT src, dst FROM se UNION SELECT dst, src FROM se),
       |verts AS (SELECT src AS v FROM se UNION SELECT dst FROM se),
       |r AS (
       |  SELECT v AS start, v AS reach FROM verts
       |  UNION
       |  SELECT r.start, u.dst FROM r JOIN u ON u.src = r.reach
       |)
       |SELECT CAST(start AS BIGINT) AS vertex,
       |  CAST(MIN(reach) AS BIGINT) AS component
       |FROM r GROUP BY start ORDER BY vertex""".stripMargin

  /** Damped PageRank, 3 iterations, on the hash graph. */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame =
    GraphOps.pagerank(DerivedGraphs.hashEdges(spark, dir, 2048), iters = 3)
      .select(col("vertex"), round(col("rank"), 6).as("rank"))
      .orderBy("vertex")

  val graphPagerankSql: String = {
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT verts.v, (1.0 - 0.85)/(SELECT n FROM nn)
         |         + 0.85 * COALESCE(SUM($prev.r / od.od), 0.0) AS r
         |  FROM verts
         |  LEFT JOIN he ON he.dst = verts.v
         |  LEFT JOIN od ON od.src = he.src
         |  LEFT JOIN $prev ON $prev.v = he.src
         |  GROUP BY verts.v)""".stripMargin
    s"""WITH ${DerivedGraphs.hashEdgesSql(2048)},
       |verts AS (SELECT src AS v FROM he UNION SELECT dst FROM he),
       |nn AS (SELECT COUNT(*) AS n FROM verts),
       |od AS (SELECT src, COUNT(*) AS od FROM he GROUP BY src),
       |p0 AS (SELECT v, 1.0/(SELECT n FROM nn) AS r FROM verts),
       |${iter("p0", "p1")},
       |${iter("p1", "p2")},
       |${iter("p2", "p3")}
       |SELECT v AS vertex, ROUND(r, 6) AS rank FROM p3 ORDER BY vertex""".stripMargin
  }

  /** Seed-set size for personalized PageRank. */
  val PprSeeds = 8

  /** Personalized PageRank from the [[PprSeeds]] lowest vertex ids of
    * the hash graph — "find more like these" seed expansion. The
    * derived graph is checkpointed once (seed selection and the rank
    * loop both read it); the oracle unrolls the same 3 rounds with
    * the reset mass pinned to the seeds.
    */
  def graphPpr(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.hashEdges(spark, dir, 2048).localCheckpoint()
    val seeds = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v")))
      .distinct().orderBy("v").limit(PprSeeds)
      .collect().map(_.getLong(0)).toSeq
    GraphOps.ppr(e, seeds, iters = 3)
      .select(col("vertex"), round(col("rank"), 6).as("rank"))
      .orderBy("vertex")
  }

  val graphPprSql: String = {
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT rv.v, (1.0 - 0.85) * rv.s
         |         + 0.85 * COALESCE(SUM($prev.r / od.od), 0.0) AS r
         |  FROM rv
         |  LEFT JOIN he ON he.dst = rv.v
         |  LEFT JOIN od ON od.src = he.src
         |  LEFT JOIN $prev ON $prev.v = he.src
         |  GROUP BY rv.v, rv.s)""".stripMargin
    s"""WITH ${DerivedGraphs.hashEdgesSql(2048)},
       |verts AS (SELECT src AS v FROM he UNION SELECT dst FROM he),
       |seeds AS (SELECT v FROM verts ORDER BY v LIMIT $PprSeeds),
       |ns AS (SELECT COUNT(*) AS n FROM seeds),
       |rv AS (SELECT verts.v,
       |         CASE WHEN seeds.v IS NOT NULL
       |              THEN 1.0/(SELECT n FROM ns) ELSE 0.0 END AS s
       |       FROM verts LEFT JOIN seeds ON seeds.v = verts.v),
       |od AS (SELECT src, COUNT(*) AS od FROM he GROUP BY src),
       |p0 AS (SELECT v, s AS r FROM rv),
       |${iter("p0", "p1")},
       |${iter("p1", "p2")},
       |${iter("p2", "p3")}
       |SELECT v AS vertex, ROUND(r, 6) AS rank FROM p3 ORDER BY vertex""".stripMargin
  }

  /** Deterministic seeded random walks on the hash graph: 2 walks of
    * length 4 from each of the 4 lowest-id vertices — the
    * DeepWalk/node2vec sampling primitive (see
    * [[GraphOps.randomWalks]]). Oracle = unrolled per-step CTEs with
    * the identical integer hash and (hash, dst) tie-break, so every
    * hop is engine-exact.
    */
  val WalkLen = 4
  val WalkSeeds = 4
  val WalksPerSeed = 2

  def graphRandomWalk(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.hashEdges(spark, dir, 2048).localCheckpoint()
    val seeds = e.select(col("src").as("v")).unionAll(e.select(col("dst").as("v")))
      .distinct().orderBy("v").limit(WalkSeeds)
      .collect().map(_.getLong(0)).toSeq
    val walks = for {
      (s, i) <- seeds.zipWithIndex
      r <- 0 until WalksPerSeed
    } yield (i.toLong * WalksPerSeed + r, s)
    GraphOps.randomWalks(e, walks, WalkLen).orderBy("walk_id", "step")
  }

  val graphRandomWalkSql: String = {
    def step(i: Int): String =
      s"""s$i AS (
         |  SELECT walk_id, seed, $i AS step, dst AS vertex FROM (
         |    SELECT p.walk_id, p.seed, he.dst,
         |      ROW_NUMBER() OVER (PARTITION BY p.walk_id
         |        ORDER BY (p.vertex*1000003 + he.dst*7919 + $i*104729 + p.walk_id*31) % 999983,
         |          he.dst) AS rn
         |    FROM s${i - 1} p JOIN he ON he.src = p.vertex)
         |  WHERE rn = 1)""".stripMargin
    val steps = (1 to WalkLen).map(step).mkString(",\n")
    val unions = (0 to WalkLen).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH ${DerivedGraphs.hashEdgesSql(2048)},
       |verts AS (SELECT src AS v FROM he UNION SELECT dst FROM he),
       |seeds AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS si
       |          FROM (SELECT v FROM verts ORDER BY v LIMIT $WalkSeeds)),
       |walks AS (SELECT si * $WalksPerSeed + r AS walk_id, v AS seed
       |          FROM seeds CROSS JOIN (VALUES (0), (1)) t(r)),
       |s0 AS (SELECT walk_id, seed, 0 AS step, seed AS vertex FROM walks),
       |$steps
       |SELECT walk_id, seed, step, vertex FROM ($unions)
       |ORDER BY walk_id, step""".stripMargin
  }

  /** k-core membership (k=3) on the nation graph. The engine iterates
    * to fixpoint; the oracle unrolls 7 prune rounds — measured
    * convergence is 2 rounds at every shipped SF, so both reach the
    * same fixpoint (monotone pruning: extra rounds are no-ops), and a
    * sentinel row fires if rounds 6 and 7 ever still differ.
    */
  val KCoreK = 3

  def graphKCore(spark: SparkSession, dir: String): DataFrame =
    GraphOps.kCore(DerivedGraphs.nationEdges(spark, dir), KCoreK)
      .orderBy("vertex")

  /** Truss order for the gate query: every surviving edge must close
    * ≥ 2 triangles within the surviving subgraph. */
  val TrussK = 4

  /** k-truss of the nation trade graph — the cohesion notch above
    * [[graphKCore]]: surviving edges with their in-truss triangle
    * support. Oracle = unrolled MATERIALIZED prune rounds (support →
    * filter), more rounds than the gate graphs need (pruning is
    * idempotent at fixpoint, so spare rounds are no-ops), then one
    * final support pass over the fixpoint edge set.
    */
  def graphKTruss(spark: SparkSession, dir: String): DataFrame =
    GraphOps.kTruss(DerivedGraphs.nationEdges(spark, dir), TrussK)
      .orderBy("u", "v")

  /** Parameterized k-truss oracle (the gate uses [[TrussK]]; the fuzz
    * family draws k). `nRounds` prune rounds are unrolled; the final
    * support pass reads the LAST round, and a sentinel row (-1,-1,-1)
    * is emitted whenever the last two rounds' edge counts differ — an
    * unconverged unroll fails the gate loudly instead of silently
    * blessing a pre-fixpoint edge set (pruning is monotone, so equal
    * counts ⇔ fixpoint reached ⇔ spare rounds were no-ops).
    */
  def graphKTrussSqlAt(k: Int, nRounds: Int = 5): String = {
    def round(prev: String, cur: String): String =
      s"""tri$cur AS MATERIALIZED (SELECT x.u AS a, x.v AS b, y.v AS c
         |  FROM e$prev x JOIN e$prev y ON y.u = x.v
         |  JOIN e$prev z ON z.u = x.u AND z.v = y.v),
         |s$cur AS MATERIALIZED (SELECT u, v, COUNT(*) AS c FROM (
         |  SELECT a AS u, b AS v FROM tri$cur
         |  UNION ALL SELECT a, c FROM tri$cur
         |  UNION ALL SELECT b, c FROM tri$cur) t GROUP BY 1, 2),
         |e$cur AS MATERIALIZED (SELECT s.u, s.v FROM s$cur s WHERE s.c >= ${k - 2})""".stripMargin
    val rounds = (1 to nRounds).map(i => round((i - 1).toString, i.toString)).mkString(",\n")
    val (last, prev) = (s"e$nRounds", s"e${nRounds - 1}")
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM ne WHERE src != dst),
       |$rounds,
       |trif AS (SELECT x.u AS a, x.v AS b, y.v AS c
       |  FROM $last x JOIN $last y ON y.u = x.v
       |  JOIN $last z ON z.u = x.u AND z.v = y.v),
       |sf AS (SELECT u, v, COUNT(*) AS c FROM (
       |  SELECT a AS u, b AS v FROM trif
       |  UNION ALL SELECT a, c FROM trif
       |  UNION ALL SELECT b, c FROM trif) t GROUP BY 1, 2)
       |SELECT u, v, support FROM (
       |  SELECT sf.u AS u, sf.v AS v, sf.c AS support FROM sf
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |  WHERE (SELECT COUNT(*) FROM $last) != (SELECT COUNT(*) FROM $prev))
       |ORDER BY u, v""".stripMargin
  }

  val graphKTrussSql: String = graphKTrussSqlAt(TrussK)

  /** Full core decomposition of the nation graph: every vertex with
    * its coreness (max k whose k-core still contains it) — the notch
    * of information above [[graphKCore]]'s single membership cut,
    * and the standard influence/density ranking a graph DB ships.
    * Oracle: the unrolled k-core level chain below, CHAINED
    * incrementally (level k prunes level k−1's fixpoint, mirroring
    * [[GraphOps.coreness]]); coreness = max level whose fixpoint
    * still holds the vertex.
    */
  def graphCoreness(spark: SparkSession, dir: String): DataFrame =
    GraphOps.coreness(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  /** Measured max coreness is 5 (sf0.001) / 8 (sf0.01); the unroll
    * goes to [[CorenessMaxK]] with two spare levels, 7 prune rounds
    * per level, and THREE loud-failure sentinels: per-level
    * unconverged rounds, and a non-empty top level (a corpus whose
    * degeneracy reaches the unroll ceiling would otherwise silently
    * understate coreness).
    */
  val CorenessMaxK = 10

  /** Parameterized coreness oracle (the fuzz family draws the unroll
    * geometry): `maxK` levels × `rounds` prune rounds per level, same
    * three loud-failure sentinels at every shape.
    */
  def graphCorenessSqlAt(maxK: Int, rounds: Int = 7): String = {
    def round(k: Int, prev: String, cur: String): String =
      s"""d$cur AS MATERIALIZED (SELECT x, COUNT(*) AS c
         |  FROM (SELECT u AS x FROM $prev UNION ALL SELECT v FROM $prev) GROUP BY 1),
         |$cur AS MATERIALIZED (SELECT e.u, e.v FROM $prev e
         |  JOIN d$cur a ON a.x = e.u JOIN d$cur b ON b.x = e.v
         |  WHERE a.c >= $k AND b.c >= $k)""".stripMargin
    // level k's chain starts from level (k-1)'s fixpoint edge set
    def level(k: Int): String =
      (1 to rounds).map { r =>
        val prev = if (r == 1) finalOf(k - 1) else s"l${k}_${r - 1}"
        round(k, prev, s"l${k}_$r")
      }.mkString(",\n")
    def finalOf(k: Int): String = if (k <= 1) "e1" else s"l${k}_$rounds"
    val levels = (2 to maxK).map(level).mkString(",\n")
    val cands = (1 to maxK).map { k =>
      s"""SELECT x AS vertex, $k AS k FROM (
         |    SELECT u AS x FROM ${finalOf(k)} UNION SELECT v FROM ${finalOf(k)})""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val sentinels = (2 to maxK).map { k =>
      s"""SELECT CAST(-$k AS BIGINT), CAST(-1 AS BIGINT)
         |  WHERE (SELECT COUNT(*) FROM ${finalOf(k)}) !=
         |        (SELECT COUNT(*) FROM l${k}_${rounds - 1})""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |e1 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM ne WHERE src != dst),
       |$levels,
       |cand AS (
       |  $cands
       |)
       |SELECT vertex, coreness FROM (
       |  SELECT vertex, CAST(MAX(k) AS BIGINT) AS coreness FROM cand GROUP BY vertex
       |  UNION ALL
       |  $sentinels
       |  UNION ALL
       |  SELECT CAST(-99 AS BIGINT), CAST(-1 AS BIGINT)
       |  WHERE EXISTS (SELECT 1 FROM ${finalOf(maxK)}))
       |ORDER BY vertex""".stripMargin
  }

  val graphCorenessSql: String = graphCorenessSqlAt(CorenessMaxK)

  /** Densest subgraph of the nation graph (Charikar greedy peel,
    * parallel threshold form — [[GraphOps.densestSubgraph]]): the
    * capstone of the cohesion family (k-core / coreness / k-truss
    * order vertices and edges by local density; this finds the
    * globally densest region). Output: the winning snapshot's
    * vertices, each carrying the ROUND(m/n, 6) density.
    */
  def graphDensest(spark: SparkSession, dir: String): DataFrame =
    GraphOps.densestSubgraph(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  /** Measured peel depth is 3 rounds (sf0.001) / 2 (sf0.01); the
    * unroll goes to [[DensestMaxRounds]] with spare rounds and a loud
    * sentinel (-99 row) if the last unrolled prune still holds edges —
    * the coreness oracle's convergence-sentinel pattern.
    */
  val DensestMaxRounds = 6

  /** Oracle: the identical threshold peel unrolled — per round, the
    * degree table (d·), the (n, m) stats row (s·), and the
    * integer-compare prune into the next edge set; the best round is
    * picked by the same exact cross-multiply the engine uses (no FP
    * until the single final ROUND).
    */
  val graphDensestSql: String = {
    def roundCtes(r: Int): String =
      s"""d$r AS MATERIALIZED (SELECT x, COUNT(*) AS c FROM
         |  (SELECT u AS x FROM e$r UNION ALL SELECT v FROM e$r) GROUP BY 1),
         |s$r AS MATERIALIZED (SELECT (SELECT COUNT(*) FROM e$r) AS m,
         |  (SELECT COUNT(*) FROM d$r) AS n),
         |e${r + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e$r e
         |  JOIN d$r a ON a.x = e.u JOIN d$r b ON b.x = e.v
         |  WHERE CAST(a.c AS HUGEINT) * 10 * (SELECT n FROM s$r) > 22 * (SELECT m FROM s$r)
         |    AND CAST(b.c AS HUGEINT) * 10 * (SELECT n FROM s$r) > 22 * (SELECT m FROM s$r))""".stripMargin
    val rounds = (1 to DensestMaxRounds).map(roundCtes).mkString(",\n")
    val roundsTable = (1 to DensestMaxRounds).map(r =>
      s"SELECT $r AS r, n, m FROM s$r WHERE m > 0").mkString("\n  UNION ALL\n  ")
    val cands = (1 to DensestMaxRounds).map(r =>
      s"SELECT $r AS r, x AS vertex FROM d$r").mkString("\n  UNION ALL\n  ")
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |e1 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM ne WHERE src != dst),
       |$rounds,
       |rounds AS (
       |  $roundsTable),
       |best AS (SELECT r, n, m FROM rounds a WHERE NOT EXISTS (
       |  SELECT 1 FROM rounds b
       |  WHERE CAST(b.m AS HUGEINT) * a.n > CAST(a.m AS HUGEINT) * b.n
       |     OR (CAST(b.m AS HUGEINT) * a.n = CAST(a.m AS HUGEINT) * b.n AND b.r < a.r))),
       |cand AS (
       |  $cands)
       |SELECT vertex, density FROM (
       |  SELECT c.vertex, ROUND(CAST(b.m AS DOUBLE) / b.n, 6) AS density
       |  FROM cand c JOIN best b ON b.r = c.r
       |  UNION ALL
       |  SELECT CAST(-99 AS BIGINT), CAST(-1 AS DOUBLE)
       |  WHERE EXISTS (SELECT 1 FROM e${DensestMaxRounds + 1}))
       |ORDER BY vertex""".stripMargin
  }

  val graphKCoreSql: String = {
    // MATERIALIZED: each round reads the previous edge set 3×; inlined
    // CTEs would expand the base join 3^rounds times.
    def round(prev: String, cur: String): String =
      s"""d$cur AS MATERIALIZED (SELECT x, COUNT(*) AS c
         |  FROM (SELECT u AS x FROM e$prev UNION ALL SELECT v FROM e$prev) GROUP BY 1),
         |e$cur AS MATERIALIZED (SELECT e.u, e.v FROM e$prev e
         |  JOIN d$cur a ON a.x = e.u JOIN d$cur b ON b.x = e.v
         |  WHERE a.c >= $KCoreK AND b.c >= $KCoreK)""".stripMargin
    val rounds = (1 to 7).map(i => round((i - 1).toString, i.toString)).mkString(",\n")
    // Same convergence sentinel as [[graphKTrussSqlAt]]: the final
    // readout comes from the LAST unrolled round, and a (-1,-1) row
    // appears whenever the last two rounds still differ — a corpus
    // needing an 8th prune fails the gate loudly.
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM ne WHERE src != dst),
       |$rounds
       |SELECT vertex, core_deg FROM (
       |  SELECT x AS vertex, CAST(COUNT(*) AS BIGINT) AS core_deg
       |  FROM (SELECT u AS x FROM e7 UNION ALL SELECT v FROM e7)
       |  GROUP BY x
       |  UNION ALL
       |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       |  WHERE (SELECT COUNT(*) FROM e7) != (SELECT COUNT(*) FROM e6))
       |ORDER BY vertex""".stripMargin
  }

  /** Synchronous label propagation (4 rounds, min-tie) on the nation
    * graph — deterministic community detection; oracle = unrolled
    * materialized-CTE rounds with the identical top-1 rule.
    */
  val LpaIters = 4

  def graphLpa(spark: SparkSession, dir: String): DataFrame =
    GraphOps.labelPropagation(DerivedGraphs.nationEdges(spark, dir), LpaIters)
      .orderBy("vertex")

  /** The LPA oracle's CTE chain (nation edges → und → l0..l{iters}),
    * shared by [[graphLpaSql]] and the modularity oracle so both read
    * the identical labeling.
    */
  private val lpaCtes: String = {
    def round(i: Int): String =
      s"""c$i AS MATERIALIZED (SELECT u.a AS v, l.lab, COUNT(*) AS c
         |  FROM und u JOIN l${i - 1} l ON l.v = u.b GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT v, lab FROM (
         |  SELECT v, lab, ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn
         |  FROM c$i) WHERE rn = 1)""".stripMargin
    val rounds = (1 to LpaIters).map(round).mkString(",\n")
    s"""${DerivedGraphs.nationEdgesSql},
       |und AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT src AS a, dst AS b FROM ne UNION SELECT dst, src FROM ne)
       |  WHERE a != b),
       |l0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS lab FROM und),
       |$rounds""".stripMargin
  }

  val graphLpaSql: String =
    s"""WITH $lpaCtes
       |SELECT v AS vertex, lab AS community FROM l$LpaIters ORDER BY vertex""".stripMargin

  /** Per-community modularity decomposition of the LPA labeling on the
    * nation graph: q_term(c) = L_c/m − (D_c/2m)² (Newman-Girvan; the
    * global Q is the sum over rows). Oracle replays the identical LPA
    * CTE chain, then the same exact-integer counts and the same double
    * expression — see [[GraphOps.modularity]].
    */
  def graphModularity(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.nationEdges(spark, dir)
    GraphOps.modularity(e, GraphOps.labelPropagation(e, LpaIters))
      .orderBy("community")
  }

  val graphModularitySql: String =
    s"""WITH $lpaCtes,
       |u AS (SELECT a, b FROM und WHERE a < b),
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM u),
       |deg AS (SELECT a AS v, COUNT(*) AS deg FROM und GROUP BY 1),
       |cs AS (SELECT l.lab AS community, COUNT(*) AS n_vertices,
       |         SUM(deg.deg) AS degree_sum
       |       FROM deg JOIN l$LpaIters l ON l.v = deg.v GROUP BY 1),
       |ie AS (SELECT la.lab AS community, COUNT(*) AS internal_edges
       |       FROM u JOIN l$LpaIters la ON la.v = u.a
       |       JOIN l$LpaIters lb ON lb.v = u.b AND lb.lab = la.lab GROUP BY 1)
       |SELECT cs.community, CAST(cs.n_vertices AS BIGINT) AS n_vertices,
       |  CAST(COALESCE(ie.internal_edges, 0) AS BIGINT) AS internal_edges,
       |  CAST(cs.degree_sum AS BIGINT) AS degree_sum,
       |  ROUND(CAST(COALESCE(ie.internal_edges, 0) AS DOUBLE) / mm.m
       |    - (CAST(cs.degree_sum AS DOUBLE) / (2.0 * mm.m))
       |      * (CAST(cs.degree_sum AS DOUBLE) / (2.0 * mm.m)), 6) AS q_term
       |FROM cs LEFT JOIN ie ON ie.community = cs.community, mm
       |ORDER BY cs.community""".stripMargin

  /** Strongly connected components on the directed 512-vertex hash
    * graph (functional graphs have real cycle structure); oracle =
    * mutual-reachability closure, scc = MIN mutually-reachable id.
    */
  def graphScc(spark: SparkSession, dir: String): DataFrame =
    GraphOps.scc(DerivedGraphs.hashEdges(spark, dir, 512))
      .orderBy("vertex")

  val graphSccSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.hashEdgesSql(512)},
       |verts AS (SELECT src AS v FROM he UNION SELECT dst FROM he),
       |r AS (
       |  SELECT v AS s, v AS t FROM verts
       |  UNION
       |  SELECT r.s, he.dst FROM r JOIN he ON he.src = r.t
       |)
       |SELECT a.s AS vertex, MIN(a.t) AS scc
       |FROM r a JOIN r b ON b.s = a.t AND b.t = a.s
       |GROUP BY a.s ORDER BY vertex""".stripMargin

  /** Out-closeness centrality on the directed nation graph —
    * [[GraphOps.closeness]] is adaptive: the sub-threshold gate graph
    * takes the exact all-sources BFS path (integer hop sums →
    * engine-exact vs the oracle); past
    * [[GraphOps.ExactAllSourcesVerts]] it switches to HyperBall
    * sketches (GraphSpec pins sketch vs exact here).
    */
  def graphCloseness(spark: SparkSession, dir: String): DataFrame =
    GraphOps.closeness(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  val graphClosenessSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.nationEdgesSql},
       |verts AS (SELECT src AS v FROM ne UNION SELECT dst FROM ne),
       |r AS (
       |  SELECT v AS s, v AS t, 0 AS d FROM verts
       |  UNION
       |  SELECT r.s, ne.dst, r.d + 1 FROM r JOIN ne ON ne.src = r.t
       |    WHERE r.d < (SELECT COUNT(*) FROM verts)
       |),
       |sp AS (SELECT s, t, MIN(d) AS d FROM r GROUP BY 1, 2)
       |SELECT s AS vertex, CAST(COUNT(*) AS BIGINT) AS n_reached,
       |  CASE WHEN SUM(d) > 0
       |       THEN ROUND((COUNT(*) - 1) / SUM(d), 6) ELSE 0.0 END AS closeness
       |FROM sp GROUP BY s ORDER BY vertex""".stripMargin

  /** Out-eccentricity on the directed nation graph (max hop distance
    * to any reachable vertex, with the reachable count) — the
    * diameter/radius building block; adaptive exact/HyperBall like
    * closeness ([[GraphOps.eccentricity]]).
    */
  def graphEccentricity(spark: SparkSession, dir: String): DataFrame =
    GraphOps.eccentricity(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  val graphEccentricitySql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.nationEdgesSql},
       |verts AS (SELECT src AS v FROM ne UNION SELECT dst FROM ne),
       |r AS (
       |  SELECT v AS s, v AS t, 0 AS d FROM verts
       |  UNION
       |  SELECT r.s, ne.dst, r.d + 1 FROM r JOIN ne ON ne.src = r.t
       |    WHERE r.d < (SELECT COUNT(*) FROM verts)
       |),
       |sp AS (SELECT s, t, MIN(d) AS d FROM r GROUP BY 1, 2)
       |SELECT s AS vertex, CAST(COUNT(*) AS BIGINT) AS n_reached,
       |  CAST(MAX(d) AS BIGINT) AS ecc
       |FROM sp GROUP BY s ORDER BY vertex""".stripMargin

  /** Harmonic centrality on the directed nation graph — Σ 1/d(v,u)
    * over reachable u ≠ v, the closeness variant that stays meaningful
    * on disconnected graphs. Adaptive exact/HyperBall like closeness
    * ([[GraphOps.harmonic]]); per-level terms round to 9 dp and sum as
    * exact decimals so the float sum is aggregation-order-free.
    */
  def graphHarmonic(spark: SparkSession, dir: String): DataFrame =
    GraphOps.harmonic(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  val graphHarmonicSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.nationEdgesSql},
       |verts AS (SELECT src AS v FROM ne UNION SELECT dst FROM ne),
       |r AS (
       |  SELECT v AS s, v AS t, 0 AS d FROM verts
       |  UNION
       |  SELECT r.s, ne.dst, r.d + 1 FROM r JOIN ne ON ne.src = r.t
       |    WHERE r.d < (SELECT COUNT(*) FROM verts)
       |),
       |sp AS (SELECT s, t, MIN(d) AS d FROM r GROUP BY 1, 2),
       |lv AS (SELECT s, d, COUNT(*) AS cnt FROM sp WHERE d > 0 GROUP BY 1, 2),
       |h AS (SELECT s, SUM(CAST(ROUND(cnt / d, 9) AS DECIMAL(28,9))) AS hs
       |      FROM lv GROUP BY s),
       |agg AS (SELECT s, COUNT(*) AS nr FROM sp GROUP BY s)
       |SELECT agg.s AS vertex, CAST(agg.nr AS BIGINT) AS n_reached,
       |  ROUND(CAST(COALESCE(h.hs, 0) AS DOUBLE), 6) AS harmonic
       |FROM agg LEFT JOIN h ON h.s = agg.s ORDER BY vertex""".stripMargin

  /** Betweenness centrality on the directed nation graph — adaptive on
    * both axes ([[GraphOps.betweenness]]): all-sources exact under
    * [[GraphOps.ExactAllSourcesVerts]] vertices (the gate/oracle
    * path), [[GraphOps.BetweennessSampleSources]] sampled pivots
    * scaled by nv/k above; driver-local Brandes under the edge
    * threshold, level-synchronous distributed Brandes past it.
    */
  def graphBetweenness(spark: SparkSession, dir: String): DataFrame =
    GraphOps.betweenness(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  /** Oracle: the pair-formula identity for Brandes dependencies —
    * bc(v) = Σ_{s≠v≠t} σ(s,v)·σ(v,t)/σ(s,t) over pairs with
    * d(s,v)+d(v,t) = d(s,t). σ is counted by enumerating walks of the
    * shortest-path DAG with a UNION ALL recursive CTE (a DAG, so it
    * terminates; every s-walk in it IS a shortest path, so the walk
    * count per (s,t) is σ). `verts` needs an explicit DISTINCT: in a
    * WITH RECURSIVE list DuckDB gives plain UNION CTEs append
    * semantics, which the distance oracles never notice (their
    * recursive `r` dedups downstream) but a multiplicity-sensitive
    * walk count would.
    */
  val graphBetweennessSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.nationEdgesSql},
       |verts AS (SELECT DISTINCT v FROM
       |          (SELECT src AS v FROM ne UNION ALL SELECT dst FROM ne)),
       |r AS (
       |  SELECT v AS s, v AS t, 0 AS d FROM verts
       |  UNION
       |  SELECT r.s, ne.dst, r.d + 1 FROM r JOIN ne ON ne.src = r.t
       |    WHERE r.d < (SELECT COUNT(*) FROM verts)
       |),
       |sp AS (SELECT s, t, MIN(d) AS d FROM r GROUP BY 1, 2),
       |dag AS (SELECT a.s, ne.src AS u, ne.dst AS v
       |        FROM ne JOIN sp a ON a.t = ne.src
       |        JOIN sp b ON b.s = a.s AND b.t = ne.dst AND b.d = a.d + 1),
       |w AS (
       |  SELECT v AS s, v AS t FROM verts
       |  UNION ALL
       |  SELECT w.s, dag.v FROM w JOIN dag ON dag.s = w.s AND dag.u = w.t
       |),
       |sg AS (SELECT s, t, CAST(COUNT(*) AS DOUBLE) AS sigma FROM w GROUP BY 1, 2),
       |terms AS (
       |  SELECT sv.t AS vertex, sv.sigma * vt.sigma / st.sigma AS term
       |  FROM sg sv
       |  JOIN sp dsv ON dsv.s = sv.s AND dsv.t = sv.t
       |  JOIN sg vt ON vt.s = sv.t
       |  JOIN sp dvt ON dvt.s = vt.s AND dvt.t = vt.t
       |  JOIN sg st ON st.s = sv.s AND st.t = vt.t
       |  JOIN sp dst_ ON dst_.s = st.s AND dst_.t = st.t AND dst_.d = dsv.d + dvt.d
       |  WHERE sv.s != sv.t AND vt.s != vt.t AND sv.s != vt.t
       |)
       |SELECT verts.v AS vertex, ROUND(COALESCE(SUM(term), 0), 6) AS betweenness,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM verts) AS n_sources
       |FROM verts LEFT JOIN terms ON terms.vertex = verts.v
       |GROUP BY verts.v ORDER BY vertex""".stripMargin

  /** Per-vertex triangle counts on the nation graph. */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame =
    GraphOps.triangleCounts(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  val graphTrianglesSql: String =
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |      FROM ne WHERE src != dst),
       |tri AS (SELECT x.a AS a, x.b AS b, y.b AS c
       |        FROM u x JOIN u y ON y.a = x.b
       |        JOIN u z ON z.a = x.a AND z.b = y.b)
       |SELECT vertex, COUNT(*) AS n_tri
       |FROM (SELECT a AS vertex FROM tri
       |      UNION ALL SELECT b FROM tri
       |      UNION ALL SELECT c FROM tri)
       |GROUP BY vertex ORDER BY vertex""".stripMargin

  /** Local clustering coefficient per vertex of the nation graph —
    * same triangle enumeration as [[graphTriangles]] plus the degree
    * normalization (2·tri / deg·(deg−1)).
    */
  def graphClustering(spark: SparkSession, dir: String): DataFrame =
    GraphOps.clusteringCoefficients(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("vertex")

  val graphClusteringSql: String =
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |      FROM ne WHERE src != dst),
       |deg AS (SELECT v, COUNT(*) AS deg FROM (
       |         SELECT a AS v FROM u UNION ALL SELECT b FROM u) GROUP BY v),
       |tri AS (SELECT x.a AS a, x.b AS b, y.b AS c
       |        FROM u x JOIN u y ON y.a = x.b
       |        JOIN u z ON z.a = x.a AND z.b = y.b),
       |tc AS (SELECT vertex, COUNT(*) AS n_tri
       |       FROM (SELECT a AS vertex FROM tri
       |             UNION ALL SELECT b FROM tri
       |             UNION ALL SELECT c FROM tri) GROUP BY vertex)
       |SELECT deg.v AS vertex, CAST(deg.deg AS BIGINT) AS deg,
       |  CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri,
       |  ROUND(CASE WHEN deg.deg >= 2
       |    THEN (2.0 * COALESCE(tc.n_tri, 0)) / (deg.deg * (deg.deg - 1))
       |    ELSE 0.0 END, 6) AS clustering
       |FROM deg LEFT JOIN tc ON tc.vertex = deg.v
       |ORDER BY vertex""".stripMargin

  /** Degree assortativity of the undirected supply graph (one scalar
    * row — the Newman r over exact integer moments). The heavy side is
    * the degree join over the full both-orientations edge list, so
    * this is a genuine scale op on the largest derived graph.
    */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame =
    GraphOps.assortativity(DerivedGraphs.supplyEdgesUndirected(spark, dir),
      degrees = Some(DerivedGraphs.supplyDegreesUndirected(spark, dir)))

  val graphAssortativitySql: String =
    s"""WITH ${DerivedGraphs.supplyEdgesSql},
       |su AS (SELECT src, dst FROM se UNION SELECT dst, src FROM se),
       |deg AS (SELECT src AS v, COUNT(*) AS d FROM su GROUP BY 1),
       |xy AS (SELECT dx.d AS x, dy.d AS y FROM su
       |       JOIN deg dx ON dx.v = su.src JOIN deg dy ON dy.v = su.dst),
       |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
       |         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
       |         CAST(SUM(x * y) AS DOUBLE) AS sxy,
       |         CAST(SUM(x * x) AS DOUBLE) AS sxx,
       |         CAST(SUM(y * y) AS DOUBLE) AS syy
       |       FROM xy)
       |SELECT m AS n_edges,
       |  ROUND(CASE WHEN SQRT(sxx * m - sx * sx) * SQRT(syy * m - sy * sy) = 0.0
       |    THEN NULL
       |    ELSE (sxy * m - sx * sy)
       |      / (SQRT(sxx * m - sx * sx) * SQRT(syy * m - sy * sy)) END, 6)
       |    AS assortativity
       |FROM mo""".stripMargin

  /** Hop distance to each of the 3 smallest landmark vertices
    * (multi-source tagged BFS over reversed edges).
    */
  def graphShortestPaths(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.hashEdges(spark, dir, 2048).localCheckpoint()
    val landmarks = e.select(col("src")).distinct().orderBy("src").limit(3)
      .select(col("src").as("vertex"), col("src").as("tag"))
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    GraphOps.bfs(rev, landmarks, maxDepth = 30)
      .select(col("vertex"), col("tag").as("landmark"),
        col("level").cast("long").as("dist"))
      .orderBy("vertex", "landmark")
  }

  val graphShortestPathsSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.hashEdgesSql(2048)},
       |lm AS (SELECT DISTINCT src AS l FROM he ORDER BY src LIMIT 3),
       |rev AS (SELECT dst AS src, src AS dst FROM he),
       |sp AS (
       |  SELECT l AS landmark, l AS v, 0 AS dist FROM lm
       |  UNION
       |  SELECT sp.landmark, rev.dst, sp.dist + 1
       |  FROM sp JOIN rev ON rev.src = sp.v WHERE sp.dist < 30
       |)
       |SELECT v AS vertex, landmark, CAST(MIN(dist) AS BIGINT) AS dist
       |FROM sp GROUP BY v, landmark ORDER BY vertex, landmark""".stripMargin

  /** Weighted shortest-path distances from the smallest vertex of the
    * tolled nation graph (integer tolls 1..7, [[DerivedGraphs
    * .nationWeightedEdges]]): frontier-relaxation Bellman-Ford
    * distributed, Dijkstra locally — see [[GraphOps.sssp]].
    */
  def graphSsspWeighted(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.nationWeightedEdges(spark, dir)
    val source = e.agg(min(col("src"))).head().getLong(0)
    GraphOps.sssp(e, source).orderBy("vertex")
  }

  /** Oracle: recursive state enumeration over (vertex, running toll).
    * UNION dedups states; tolls are 1..7 on a ≤25-vertex graph, so any
    * shortest distance is ≤ 24×7 = 168 and the d < 200 guard both
    * terminates the recursion and prunes nothing reachable-shortest.
    */
  val graphSsspWeightedSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.nationWeightedEdgesSql},
       |s AS (SELECT MIN(src) AS v FROM nwe),
       |r AS (
       |  SELECT v, 0 AS d FROM s
       |  UNION
       |  SELECT nwe.dst, r.d + nwe.w FROM r JOIN nwe ON nwe.src = r.v
       |  WHERE r.d < 200
       |)
       |SELECT v AS vertex, CAST(MIN(d) AS BIGINT) AS dist
       |FROM r GROUP BY v ORDER BY vertex""".stripMargin

  /** Minimum spanning forest of the tolled nation graph (undirected,
    * min toll per unordered pair): Borůvka distributed, Kruskal
    * locally — see [[GraphOps.msf]]. The (w, a, b) composite order
    * makes the forest unique, so all paths hash-compare.
    */
  def graphMsf(spark: SparkSession, dir: String): DataFrame =
    GraphOps.msf(DerivedGraphs.nationWeightedEdges(spark, dir))
      .orderBy("src", "dst")

  /** Oracle: the cycle property under the (w, a, b) total order — an
    * edge is in the unique MSF iff its endpoints are NOT connected by
    * strictly smaller edges. The recursive CTE enumerates, per
    * candidate edge, the vertices reachable from its `a` endpoint
    * through edges ordered strictly below it; the edge survives iff
    * `b` is never reached. States are (edge, vertex) pairs on a
    * ≤25-vertex graph — bounded, and UNION dedups.
    */
  val graphMsfSql: String =
    s"""WITH RECURSIVE ${DerivedGraphs.nationWeightedEdgesSql},
       |ue AS (SELECT a, b, MIN(w) AS w FROM (
       |         SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, w
       |         FROM nwe WHERE src != dst) GROUP BY 1, 2),
       |r AS (
       |  SELECT a AS ea, b AS eb, w AS ew, a AS v FROM ue
       |  UNION
       |  SELECT r.ea, r.eb, r.ew,
       |    CASE WHEN u.a = r.v THEN u.b ELSE u.a END
       |  FROM r JOIN ue u ON (u.a = r.v OR u.b = r.v)
       |  WHERE (u.w, u.a, u.b) < (r.ew, r.ea, r.eb)
       |)
       |SELECT e.a AS src, e.b AS dst, e.w AS w
       |FROM ue e
       |WHERE NOT EXISTS (SELECT 1 FROM r
       |  WHERE r.ea = e.a AND r.eb = e.b AND r.ew = e.w AND r.v = e.b)
       |ORDER BY src, dst""".stripMargin

  /** HITS hubs & authorities on the directed nation graph, 2 rounds
    * with L1 normalization per half-step; oracle = the identical
    * unrolled CTE chain (same schedule: a from h, normalize; h from a,
    * normalize). 6-dp rounding absorbs ~1e-15 normalization noise.
    */
  val HitsIters = 2

  def graphHits(spark: SparkSession, dir: String): DataFrame =
    GraphOps.hits(DerivedGraphs.nationEdges(spark, dir), HitsIters)
      .select(col("vertex"),
        round(col("authority"), 6).as("authority"),
        round(col("hub"), 6).as("hub"))
      .orderBy("vertex")

  val graphHitsSql: String = {
    // one half-step: push `prev` scores across ne (inC → outC), then
    // L1-normalize. MATERIALIZED: each score CTE is read twice.
    def half(prev: String, cur: String, inC: String, outC: String): String =
      s"""${cur}r AS MATERIALIZED (
         |  SELECT verts.v, COALESCE(SUM($prev.s), 0.0) AS x
         |  FROM verts LEFT JOIN ne ON ne.$outC = verts.v
         |  LEFT JOIN $prev ON $prev.v = ne.$inC
         |  GROUP BY verts.v),
         |$cur AS MATERIALIZED (
         |  SELECT v, x / (SELECT SUM(x) FROM ${cur}r) AS s FROM ${cur}r)""".stripMargin
    val rounds = (1 to HitsIters).map { i =>
      val prevH = if (i == 1) "h0" else s"h${i - 1}"
      half(prevH, s"a$i", "src", "dst") + ",\n" + half(s"a$i", s"h$i", "dst", "src")
    }.mkString(",\n")
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |verts AS (SELECT src AS v FROM ne UNION SELECT dst FROM ne),
       |h0 AS (SELECT v, 1.0 AS s FROM verts),
       |$rounds
       |SELECT verts.v AS vertex, ROUND(a$HitsIters.s, 6) AS authority,
       |       ROUND(h$HitsIters.s, 6) AS hub
       |FROM verts JOIN a$HitsIters ON a$HitsIters.v = verts.v
       |JOIN h$HitsIters ON h$HitsIters.v = verts.v
       |ORDER BY vertex""".stripMargin
  }

  /** Link prediction (common neighbors / Jaccard / Adamic-Adar) for
    * non-adjacent pairs of the undirected nation graph.
    */
  def graphLinkPredict(spark: SparkSession, dir: String): DataFrame =
    GraphOps.linkPrediction(DerivedGraphs.nationEdges(spark, dir))
      .orderBy("a", "b")

  val graphLinkPredictSql: String =
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |und AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT src AS a, dst AS b FROM ne UNION SELECT dst, src FROM ne)
       |  WHERE a != b),
       |deg AS MATERIALIZED (SELECT a AS v, COUNT(*) AS d FROM und GROUP BY 1),
       |wedge AS (
       |  SELECT x.a AS a, y.a AS b, COUNT(*) AS cn, SUM(1.0 / LN(deg.d)) AS aa
       |  FROM und x JOIN und y ON y.b = x.b AND x.a < y.a
       |  JOIN deg ON deg.v = x.b
       |  GROUP BY 1, 2),
       |nonadj AS (
       |  SELECT w.* FROM wedge w LEFT JOIN und u ON u.a = w.a AND u.b = w.b
       |  WHERE u.a IS NULL)
       |SELECT n.a, n.b, n.cn,
       |  ROUND(n.cn / (da.d + db.d - n.cn), 6) AS jaccard,
       |  ROUND(n.aa, 6) AS adamic_adar
       |FROM nonadj n JOIN deg da ON da.v = n.a JOIN deg db ON db.v = n.b
       |ORDER BY a, b""".stripMargin

  /** The warehouse→graph derivation itself (nation trade graph with
    * its threshold rule), exposed directly so the derivation layer has
    * its own gate entry (supply-graph derivation is gated via
    * graph_load/bfs/degrees).
    */
  def graphFromTpch(spark: SparkSession, dir: String): DataFrame =
    DerivedGraphs.nationEdges(spark, dir).orderBy("src", "dst")

  val graphFromTpchSql: String =
    s"""WITH ${DerivedGraphs.nationEdgesSql}
       |SELECT src, dst FROM ne ORDER BY src, dst""".stripMargin

  /** Per-vertex reciprocity profile of the directed nation trade graph
    * (who trades back): out-degree, in-degree, reciprocated out-degree
    * (out-neighbors that link back), and the reciprocity ratio —
    * Garlaschelli–Loffredo's vertex-local form, the standard directed-
    * graph health metric (mutual-follow rate, bidirectional-trade
    * share).
    *
    * Scale shape: the reciprocated set is ONE equi-join of the edge
    * list with its transpose on the composite (src, dst) key — hash
    * join, never all-pairs — and the three counts are map-side-combine
    * aggregations unioned on the vertex key. At 100 TB this is two
    * shuffles of the edge list (one per join side) and degree-sized
    * aggregates; hub skew lands on the same hubSplit geometry the
    * iterative family uses if the edge frame is pre-split.
    */
  def graphReciprocity(spark: SparkSession, dir: String): DataFrame = {
    val e = DerivedGraphs.nationEdges(spark, dir)
    val rev = e.select(col("dst").as("r_src"), col("src").as("r_dst"))
    val recip = e.join(rev, col("src") === col("r_src") && col("dst") === col("r_dst"))
      .groupBy(col("src").as("v")).agg(count(lit(1)).as("recip_deg"))
    val outDeg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("out_deg"))
    val inDeg = e.groupBy(col("dst").as("v")).agg(count(lit(1)).as("in_deg"))
    outDeg.join(inDeg, Seq("v"), "full_outer")
      .join(recip, Seq("v"), "left_outer")
      .select(col("v").as("vertex"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("recip_deg"), lit(0L)).as("recip_deg"))
      .withColumn("reciprocity",
        when(col("out_deg") > 0, round(col("recip_deg") / col("out_deg"), 6))
          .otherwise(lit(0.0)))
      .orderBy("vertex")
  }

  val graphReciprocitySql: String =
    s"""WITH ${DerivedGraphs.nationEdgesSql},
       |rd AS (
       |  SELECT a.src AS v, COUNT(*) AS recip_deg
       |  FROM ne a JOIN ne b ON b.src = a.dst AND b.dst = a.src
       |  GROUP BY a.src),
       |od AS (SELECT src AS v, COUNT(*) AS out_deg FROM ne GROUP BY src),
       |id AS (SELECT dst AS v, COUNT(*) AS in_deg FROM ne GROUP BY dst),
       |verts AS (SELECT v FROM od UNION SELECT v FROM id)
       |SELECT verts.v AS vertex,
       |  COALESCE(od.out_deg, 0) AS out_deg,
       |  COALESCE(id.in_deg, 0) AS in_deg,
       |  COALESCE(rd.recip_deg, 0) AS recip_deg,
       |  CASE WHEN COALESCE(od.out_deg, 0) > 0
       |       THEN ROUND(COALESCE(rd.recip_deg, 0) / od.out_deg, 6)
       |       ELSE 0.0 END AS reciprocity
       |FROM verts LEFT JOIN od ON od.v = verts.v
       |LEFT JOIN id ON id.v = verts.v
       |LEFT JOIN rd ON rd.v = verts.v
       |ORDER BY vertex""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("graph_reciprocity", graphReciprocity, Some(graphReciprocitySql)),
    Op("graph_from_tpch", graphFromTpch, Some(graphFromTpchSql)),
    Op("graph_load", graphLoad, Some(graphLoadSql)),
    Op("graph_load_text", graphLoadText, Some(graphLoadTextSql)),
    Op("graph_modify", graphModify, Some(graphModifySql)),
    Op("graph_bfs", graphBfs, Some(graphBfsSql)),
    Op("graph_bfs_deep", graphBfsDeep, Some(graphBfsDeepSql)),
    Op("graph_dfs_reach", graphDfsReach, Some(graphDfsReachSql)),
    Op("graph_dfs_leaves", graphDfsLeaves, Some(graphDfsLeavesSql)),
    Op("graph_dfs_preorder", graphDfsPreorder, Some(graphDfsPreorderSql)),
    Op("graph_degrees", graphDegrees, Some(graphDegreesSql)),
    Op("graph_cc", graphCc, Some(graphCcSql)),
    Op("graph_cc_large", graphCcLarge, Some(graphCcLargeSql)),
    Op("graph_pagerank", graphPagerank, Some(graphPagerankSql)),
    Op("graph_ppr", graphPpr, Some(graphPprSql)),
    Op("graph_random_walk", graphRandomWalk, Some(graphRandomWalkSql)),
    Op("graph_k_core", graphKCore, Some(graphKCoreSql)),
    Op("graph_coreness", graphCoreness, Some(graphCorenessSql)),
    Op("graph_densest_subgraph", graphDensest, Some(graphDensestSql)),
    Op("graph_k_truss", graphKTruss, Some(graphKTrussSql)),
    Op("graph_lpa", graphLpa, Some(graphLpaSql)),
    Op("graph_scc", graphScc, Some(graphSccSql)),
    Op("graph_closeness", graphCloseness, Some(graphClosenessSql)),
    Op("graph_betweenness", graphBetweenness, Some(graphBetweennessSql)),
    Op("graph_eccentricity", graphEccentricity, Some(graphEccentricitySql)),
    Op("graph_hits", graphHits, Some(graphHitsSql)),
    Op("graph_link_predict", graphLinkPredict, Some(graphLinkPredictSql)),
    Op("graph_triangles", graphTriangles, Some(graphTrianglesSql)),
    Op("graph_clustering", graphClustering, Some(graphClusteringSql)),
    Op("graph_harmonic", graphHarmonic, Some(graphHarmonicSql)),
    Op("graph_assortativity", graphAssortativity, Some(graphAssortativitySql)),
    Op("graph_modularity", graphModularity, Some(graphModularitySql)),
    Op("graph_shortest_paths", graphShortestPaths, Some(graphShortestPathsSql)),
    Op("graph_sssp_weighted", graphSsspWeighted, Some(graphSsspWeightedSql)),
    Op("graph_msf", graphMsf, Some(graphMsfSql)),
  )
}
