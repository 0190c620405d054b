package graft.tools
object DumpCodeSrc {
  def main(args: Array[String]): Unit = {
    val src = graft.Materialized.getClass.getProtectionDomain.getCodeSource
    println("LOC=" + (if (src == null) "null" else src.getLocation))
  }
}
