package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.{BronzeToSilver, SilverToGold}
import graft.operators.MergeUpsert
import graft.sources.{Layout, NeoSchema}

/** Streaming-native variant of the medallion pipeline (SURVEY.md §2.7).
  *
  * The reference's "stream" is macro-batch: an @daily Airflow DAG over
  * date-keyed bronze files (reference: airflow/dags/nasa_asteroid_dag.py:21,
  * src/etl/bronze_ingest.py:19,35). This module is the faithful
  * Structured-Streaming extension the survey calls out: the bronze
  * directory becomes a file stream, the SAME flatten plan produces
  * silver continuously, and each micro-batch runs the gold merge-upsert
  * in `foreachBatch` — so batch and streaming share one transform
  * codepath (no logic fork to drift).
  *
  * Scale notes: the file source tracks processed files in the checkpoint
  * (exactly-once per file); `maxFilesPerTrigger` bounds micro-batch size
  * at backfill; the gold upsert is idempotent on its merge keys, so a
  * replayed batch converges to the same table.
  *
  * Exactly-once boundary: the sink inside foreachBatch is not
  * transactional with the checkpoint commit, so a crash between sink
  * write and commit REPLAYS the batch. Every write here is therefore
  * IDEMPOTENT: gold merges on keys, and silver (since round 3) is a
  * keyed merge + dynamic-partition overwrite of only the approach_date
  * partitions present in the batch — a replay recomputes the identical
  * partition contents and converges instead of appending duplicates
  * (the round-2 blind append could double rows in that window). The
  * residual non-atomicity is per-partition: a crash mid-overwrite can
  * leave SOME of the batch's partitions updated, but each is replaced
  * by a superset (existing ∪ batch merged on the natural key), so no
  * state loses rows and the replay finishes the rest. A multi-partition
  * atomic commit needs a table format with a transaction log
  * (Delta/Iceberg — jars not available offline here).
  */
object StreamingPipeline {

  /** Continuous silver: every new bronze JSON document under the layout's
    * bronze prefix, flattened to the 27-column silver schema.
    */
  def silverStream(spark: SparkSession, layout: Layout,
                   maxFilesPerTrigger: Int = 10): DataFrame = {
    val feed = spark.readStream
      .schema(NeoSchema.feed)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(s"${layout.base}/bronze/JSON")
    BronzeToSilver.flatten(feed)
  }

  /** Natural key of one silver row: one close approach of one asteroid.
    * This is what makes the streaming silver write replay-idempotent.
    */
  val silverKeys: Seq[String] = Seq("neo_reference_id", "approach_epoch")

  /** Start the continuous bronze→silver→gold pipeline. Each micro-batch
    * upserts its rows into silver (keyed merge + dynamic overwrite of
    * only the touched approach_date partitions) and merge-upserts all
    * four gold tables — every write idempotent under batch replay.
    */
  def start(spark: SparkSession, layout: Layout,
            checkpoint: String): StreamingQuery =
    silverStream(spark, layout).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        val silver = batch.localCheckpoint() // cut lineage once; reused 6×
        val path = new org.apache.hadoop.fs.Path(layout.silverAsteroids)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(path)) {
            // partition values in this batch: bounded by the batch's date
            // span (a handful) — driver-side metadata, not data
            val dates = silver.select("approach_date").distinct()
              .collect().map(_.getString(0)).toSeq
            // explicit schema keeps approach_date a STRING on read (the
            // partition-column type silver writes), so merge unions align
            val existing = spark.read.schema(silver.schema)
              .parquet(layout.silverAsteroids)
              .filter(col("approach_date").isin(dates: _*))
            MergeUpsert.merge(existing, silver, silverKeys)
          } else silver
        merged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("approach_date")
          .parquet(layout.silverAsteroids)
        SilverToGold.tables.foreach { case (name, build, keys) =>
          MergeUpsert.saveOrUpdate(spark, build(silver),
            layout.gold(name), keys)
        }
        ()
      }
      .start()
}
