package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** All registered operators, by module. */
  def ops: Seq[Op] =
    operators.Relational.ops ++ operators.Events.ops ++ operators.Sampling.ops ++
      operators.Sources.ops ++ operators.Funcs.ops ++
      graph.GraphQueries.ops ++
      text.TextAnalysis.ops ++ dedup.Dedup.ops ++ similarity.Ann.ops ++
      similarity.Cluster.ops ++
      multimodal.Multimodal.ops ++ streaming.Streaming.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q5Multijoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.map(op => op.name -> op.query).toMap

  /** For each key in queries, equivalent DuckDB SQL on the same parquet
    * tables. Omitted for non-SQL-expressible ops (rows-only check).
    */
  def oracleSql: Map[String, String] =
    ops.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
