package graft.tools

/** Dump the full oracleSql map as JSON (no query execution) for
  * oracle-side type audits: runMain graft.tools.DumpSql <outFile> */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val body = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out), body.getBytes("UTF-8"))
    println(s"WROTE $out (${graft.SparkEntry.oracleSql.size} queries)")
  }
}
