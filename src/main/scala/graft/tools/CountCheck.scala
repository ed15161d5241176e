package graft.tools
object CountCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[countcheck] queries=${q.size} oracle=${o.size} q-o=${q -- o} o-q=${o -- q}")
  }
}
