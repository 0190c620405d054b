package graft.dedup

import org.apache.spark.sql.DataFrame

/** Scratch accessors for profiling private Dedup phases (not part of
  * the driver contract).
  */
object DedupProbe {
  def prefixRowsPublic(docArr: DataFrame, tau: Double): DataFrame =
    Dedup.prefixRowsForProbe(docArr, tau)
  def verifyJaccardPublic(cand: DataFrame, docArr: DataFrame, tau: Double): DataFrame =
    Dedup.verifyJaccardForProbe(cand, docArr, tau)
}
