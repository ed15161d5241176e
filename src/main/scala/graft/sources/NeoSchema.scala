package graft.sources

import org.apache.spark.sql.types._

/** Explicit read schema for the NASA NeoWs daily feed JSON.
  *
  * The reference reads the feed with full schema inference
  * (reference: src/etl/bronze_to_silver.py:34-38) and then dodges the
  * map-as-struct problem by string-interpolating the request date into
  * the field path `near_earth_objects.<date>` (bronze_to_silver.py:41-43).
  * Here `near_earth_objects` is declared as
  * `MapType(StringType, ArrayType(neo))`, so one generic
  * `explode(map)` handles any number of feed dates (SURVEY.md §7.2 #1) —
  * no per-date code paths, and the scan needs no inference pass.
  */
object NeoSchema {

  private val diameterRange = StructType(Seq(
    StructField("estimated_diameter_min", DoubleType),
    StructField("estimated_diameter_max", DoubleType)))

  val estimatedDiameter: StructType = StructType(Seq(
    StructField("kilometers", diameterRange),
    StructField("meters", diameterRange),
    StructField("miles", diameterRange),
    StructField("feet", diameterRange)))

  val closeApproach: StructType = StructType(Seq(
    StructField("close_approach_date", StringType),
    StructField("close_approach_date_full", StringType),
    StructField("epoch_date_close_approach", LongType),
    StructField("relative_velocity", StructType(Seq(
      StructField("kilometers_per_second", StringType),
      StructField("kilometers_per_hour", StringType),
      StructField("miles_per_hour", StringType)))),
    StructField("miss_distance", StructType(Seq(
      StructField("astronomical", StringType),
      StructField("lunar", StringType),
      StructField("kilometers", StringType),
      StructField("miles", StringType)))),
    StructField("orbiting_body", StringType)))

  val neo: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("neo_reference_id", StringType),
    StructField("name", StringType),
    StructField("absolute_magnitude_h", DoubleType),
    StructField("is_potentially_hazardous_asteroid", BooleanType),
    StructField("is_sentry_object", BooleanType),
    StructField("nasa_jpl_url", StringType),
    StructField("links", StructType(Seq(StructField("self", StringType)))),
    StructField("estimated_diameter", estimatedDiameter),
    StructField("close_approach_data", ArrayType(closeApproach))))

  /** Top-level feed document schema. */
  val feed: StructType = StructType(Seq(
    StructField("element_count", LongType),
    StructField("near_earth_objects", MapType(StringType, ArrayType(neo)))))
}
