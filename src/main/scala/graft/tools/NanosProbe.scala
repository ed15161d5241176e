package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: can spark.sql.legacy.parquet.nanosAsLong be set at runtime
  * on an existing session, and what schema do the events then read as?
  */
object NanosProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.printSchema()
    df.show(3, truncate = false)
    spark.stop()
  }
}
