package graft.tools

/** Print one oracle SQL by name (dev aid for iterating on new oracles). */
object OracleDump {
  def main(args: Array[String]): Unit =
    args.foreach { q =>
      println(s"-- $q")
      println(graft.SparkEntry.oracleSql(q))
      println(";")
    }
}
