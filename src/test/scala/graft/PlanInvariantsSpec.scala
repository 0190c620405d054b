package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.expressions.ScalaUDF

/** Automated audit of the scale invariants SURVEY §6 promises, over
  * EVERY gate operator's physical plan (so a regression in any op
  * fails here instead of passing the gate silently):
  *
  *  - no `CartesianProductExec` anywhere (broadcast nested-loop joins
  *    over broadcast-bounded sides are fine and appear as
  *    BroadcastNestedLoopJoin, a different node);
  *  - no `ScalaUDF` in any plan expression — every scalar hot path is
  *    either built-in (codegen'd) or a native Catalyst expression;
  *  - no unpartitioned window (WindowExec or WindowGroupLimitExec
  *    with an empty partitionSpec) — the "move all data to a single
  *    partition" shape that cannot survive a 100 TB input. Whitelist:
  *    empty, and keep it that way;
  *  - the selective relational scans actually push their predicates
  *    into the parquet reader (non-empty PushedFilters — column
  *    pruning alone is not enough at 100 TB).
  *
  * Plans are inspected at sf0.001 BEFORE execution (initial AQE plan):
  * these are structural properties of what the optimizer emitted, not
  * runtime measurements.
  */
class PlanInvariantsSpec extends SparkSpec {

  /** Ops whose filters must reach the parquet scan, with the scan
    * metadata key that must be non-empty (data-filter pushdown for
    * the relational scans; partition pruning for the partitioned
    * source, whose predicate eliminates files rather than rows).
    */
  private val PushdownOps = Map(
    "q1_agg" -> "PushedFilters", "q3_join_topk" -> "PushedFilters",
    "q5_multijoin" -> "PushedFilters", "q17_small_qty" -> "PushedFilters",
    "q_incremental" -> "PushedFilters",
    "source_partitioned" -> "PartitionFilters")

  /** Every physical node, descending through the AQE wrapper and into
    * subquery plans (scalar subqueries carry scans too).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case other => other.children
    }
    p +: (kids ++ p.subqueries).flatMap(allNodes)
  }

  /** Driver-side ops (q_percentiles) execute their distributed work
    * eagerly inside the function and return a driver-local frame, so
    * auditing only the RETURNED plan would inspect a LocalTableScan.
    * The audit tap in Relational hands us every intermediate frame as
    * built (same thread); their plans are appended to the op's node
    * list so the invariants run against the real work.
    */
  private lazy val plans: Map[String, Seq[SparkPlan]] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val tapped = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
      graft.operators.Relational.percentileAudit.set(tapped)
      val returned =
        try fn(spark, sfDir)
        finally graft.operators.Relational.percentileAudit.remove()
      name -> (returned +: tapped.toSeq)
        .flatMap(df => allNodes(df.queryExecution.executedPlan))
    }.toMap

  test("driver-side q_percentiles exposes its distributed intermediates") {
    // the value-count agg, stats, histogram, and windowed slice — if the
    // tap silently unwires, the audit regresses to the LocalTableScan
    // blind spot this guards against
    assert(plans("q_percentiles").count(_.isInstanceOf[FileSourceScanExec]) >= 1)
    assert(plans("q_percentiles").exists(_.isInstanceOf[WindowExec]))
  }

  test("every gate op is audited") {
    assert(plans.keySet === SparkEntry.queries.keySet)
    assert(plans.size >= 100)
  }

  test("no CartesianProduct in any gate plan") {
    val offenders = plans.collect {
      case (name, ns) if ns.exists(_.isInstanceOf[CartesianProductExec]) => name
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("no ScalaUDF in any gate plan") {
    val offenders = plans.collect {
      case (name, ns) if ns.exists(
        _.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF]))) => name
    }
    assert(offenders.isEmpty, s"ScalaUDFs in: $offenders")
  }

  test("no unpartitioned window in any gate plan") {
    val offenders = plans.collect {
      case (name, ns) if ns.exists {
        case w: WindowExec => w.partitionSpec.isEmpty
        case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
        case _ => false
      } => name
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: $offenders")
  }

  test("selective relational scans push filters into parquet") {
    val missing = PushdownOps.filterNot { case (name, key) =>
      plans(name).exists {
        case f: FileSourceScanExec =>
          f.metadata.get(key).exists(s => s.nonEmpty && s != "[]")
        case _ => false
      }
    }
    assert(missing.isEmpty, s"no pushed filters in: ${missing.keys}")
  }
}
