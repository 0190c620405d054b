package graft.tools

/** Dev utility: prints the gate-op names missing from the SQL surface
  * (and the exclusion catalog's view of them) so the exposed/excluded
  * partition can be audited from the command line.
  */
object DumpSurface {
  def main(args: Array[String]): Unit = {
    val all = graft.SparkEntry.queries.keySet
    val sql = graft.SqlSurface.queries.keySet
    (all -- sql).toSeq.sorted.foreach(println)
    println(s"EXCL_COUNT=${(all -- sql).size} SQL_COUNT=${sql.size}")
  }
}
