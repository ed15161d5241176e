package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, Dedup}
import graft.functions.TextFunctions
import graft.sources.{BronzeIngest, Layout, NeoSchema}

/** Operational robustness: small-files compaction, corrupt-JSON ingest
  * resilience, and the unified batch/streaming behavior of the
  * shuffle-free text/dedup projections.
  */
class OpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("compaction: many small files → ceil(bytes/target), same rows") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(10000).selectExpr("id", "id * 2 AS v")
      .repartition(40).write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 30)
    Compaction.compact(spark, dir, targetBytes = 1L << 30)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after === 1)
    assert(spark.read.parquet(dir).count() === 10000)
    assert(spark.read.parquet(dir).agg(sum(col("v"))).as[Long]
      .collect().head === (0L until 10000L).map(_ * 2).sum)
  }

  test("bronze read survives a corrupt JSON document (permissive mode)") {
    val layout = Layout(Files.createTempDirectory("graft-corrupt").toString)
    BronzeIngest.writeRaw(spark, layout, "2026-08-12",
      """{"element_count": not even json!!""")
    // explicit schema + default PERMISSIVE mode: the corrupt document
    // yields a null-fielded row, the flatten yields 0 rows, no crash
    val feed = spark.read.schema(NeoSchema.feed)
      .option("multiLine", "true")
      .json(layout.bronzeFile("2026-08-12"))
    val flat = graft.etl.BronzeToSilver.flatten(feed)
    assert(flat.count() === 0)
  }

  test("shuffle-free dedup/text projections run unchanged on a stream") {
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    // minhash signatures + quality + fingerprint are pure projections →
    // legal in APPEND mode with zero state
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
        k = 2, numHashes = 4)
      .withColumn("quality",
        TextFunctions.qualityScore(lit("some sample text here")))
    val q = sigs.writeStream.format("memory").queryName("stream_sigs")
      .outputMode("append").start()
    in.addData((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "one two"), (4L, "x"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_sigs")
    assert(out.count() === 3) // doc 4 has < k tokens → no shingles
    val sig = out.select(col("doc_id"), col("mh0"))
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) === sig(2L)) // identical docs, identical signatures
  }
}
