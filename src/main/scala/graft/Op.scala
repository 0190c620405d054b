package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * @param name   key in `SparkEntry.queries`
  * @param query  (session, scale-factor dir) => result
  * @param oracle equivalent DuckDB SQL over the same tables; None for
  *               ops whose semantics are not SQL-expressible (those get
  *               a rows-only driver check and a ScalaTest cross-check
  *               against an exact counterpart instead).
  */
final case class Op(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  /** Exact decimal snap: money values in the warehouse are 2-decimal
    * (stored as double); decimal aggregation is exact and
    * summation-order independent, which keeps Spark and DuckDB
    * hash-identical. Final cast back to double for a stable schema.
    */
  val MoneyNote = "cast to DECIMAL before SUM, cast to DOUBLE after"
}
