package graft.sources

/** Deterministic NASA NeoWs feed fixture documents (FIXTURES.md §1).
  *
  * Shape mirrors what the reference's bronze layer persists
  * (reference: src/etl/bronze_ingest.py:30-37) and its silver flatten
  * consumes (reference: src/etl/bronze_to_silver.py:41-109). Covers every
  * edge the test plan calls for: multiple approaches per NEO, empty
  * `close_approach_data`, placeholder values (`"NULL"`/`"Null"`/`""`/
  * padded strings), duplicate ids across days, null `orbiting_body` /
  * `close_approach_date_full` (the null-SK quirk, SURVEY.md F9), and a
  * two-date `near_earth_objects` map in one document.
  */
object NeoFixture {

  /** One close-approach record. Nulls render as JSON null. */
  final case class Approach(
      date: String,
      dateFull: Option[String],
      epoch: Long,
      kmS: String, kmH: String, miH: String,
      au: String, lunar: String, km: String, mi: String,
      orbitingBody: Option[String]) {
    def json: String = {
      val full = dateFull.map(s => "\"" + s + "\"").getOrElse("null")
      val body = orbitingBody.map(s => "\"" + s + "\"").getOrElse("null")
      s"""{
         |  "close_approach_date": "$date",
         |  "close_approach_date_full": $full,
         |  "epoch_date_close_approach": $epoch,
         |  "relative_velocity": {
         |    "kilometers_per_second": "$kmS",
         |    "kilometers_per_hour": "$kmH",
         |    "miles_per_hour": "$miH"
         |  },
         |  "miss_distance": {
         |    "astronomical": "$au",
         |    "lunar": "$lunar",
         |    "kilometers": "$km",
         |    "miles": "$mi"
         |  },
         |  "orbiting_body": $body
         |}""".stripMargin
    }
  }

  final case class Neo(
      id: String,
      name: String,
      magnitude: Double,
      hazardous: Boolean,
      sentry: Boolean,
      diamKmMin: Double, diamKmMax: Double,
      approaches: Seq[Approach]) {
    def json: String = {
      // meters/miles/feet derived deterministically from km
      def rng(min: Double, max: Double) =
        s"""{ "estimated_diameter_min": $min, "estimated_diameter_max": $max }"""
      s"""{
         |  "id": "$id",
         |  "neo_reference_id": "$id",
         |  "name": "$name",
         |  "absolute_magnitude_h": $magnitude,
         |  "is_potentially_hazardous_asteroid": $hazardous,
         |  "is_sentry_object": $sentry,
         |  "nasa_jpl_url": "https://ssd.jpl.nasa.gov/tools/sbdb_lookup.html#/?sstr=$id",
         |  "links": { "self": "http://api.nasa.gov/neo/rest/v1/neo/$id" },
         |  "estimated_diameter": {
         |    "kilometers": ${rng(diamKmMin, diamKmMax)},
         |    "meters": ${rng(diamKmMin * 1000, diamKmMax * 1000)},
         |    "miles": ${rng(diamKmMin * 0.621371, diamKmMax * 0.621371)},
         |    "feet": ${rng(diamKmMin * 3280.84, diamKmMax * 3280.84)}
         |  },
         |  "close_approach_data": [${approaches.map(_.json).mkString(",\n")}]
         |}""".stripMargin
    }
  }

  /** Full feed document: Map(date -> NEOs) rendered as a JSON object. */
  def feedJson(days: Seq[(String, Seq[Neo])]): String = {
    val neos = days.map { case (d, ns) =>
      s""""$d": [${ns.map(_.json).mkString(",\n")}]"""
    }.mkString(",\n")
    val n = days.map(_._2.size).sum
    s"""{
       |  "links": { "next": "http://api.nasa.gov/neo/rest/v1/feed?ignored" },
       |  "element_count": $n,
       |  "near_earth_objects": { $neos }
       |}""".stripMargin
  }

  private def approach(date: String, hhmm: String, epoch: Long, kmS: Double,
                       missKm: Double, body: Option[String] = Some("Earth"),
                       dateFullOverride: Option[Option[String]] = None)
      : Approach = {
    val mmm = Map("01" -> "Jan", "02" -> "Feb", "03" -> "Mar", "04" -> "Apr",
      "05" -> "May", "06" -> "Jun", "07" -> "Jul", "08" -> "Aug",
      "09" -> "Sep", "10" -> "Oct", "11" -> "Nov", "12" -> "Dec")
    val Array(y, m, d) = date.split("-")
    val full = dateFullOverride.getOrElse(Some(s"$y-${mmm(m)}-$d $hhmm"))
    Approach(date, full, epoch,
      kmS = f"$kmS%.2f", kmH = f"${kmS * 3600}%.1f", miH = f"${kmS * 2236.94}%.1f",
      au = f"${missKm / 1.496e8}%.4f", lunar = f"${missKm / 384400}%.2f",
      km = f"$missKm%.1f", mi = f"${missKm * 0.621371}%.1f",
      orbitingBody = body)
  }

  /** Day-1 document (2026-08-12): the happy path plus placeholder and
    * fan-out edges. 4 NEOs, 6 approach rows after explode (one NEO has
    * two approaches, one has none and vanishes at explode).
    */
  val day1Date = "2026-08-12"
  def day1: String = feedJson(Seq(day1Date -> Seq(
    Neo("3542519", "(2010 PK9)", 21.87, hazardous = true, sentry = false,
      0.12, 0.27, Seq(
        approach(day1Date, "07:31", 1786174260000L, 13.58, 1.7682e7))),
    Neo("2099942", "99942 Apophis (2004 MN4)", 19.7, hazardous = true,
      sentry = false, 0.31, 0.68, Seq(
        approach(day1Date, "03:10", 1786158600000L, 7.42, 3.84e7),
        approach(day1Date, "21:45", 1786225500000L, 7.43, 3.86e7))),
    // placeholder edges: padded body, "NULL" name sentinel, null date_full
    Neo("3726710", "NULL", 26.5, hazardous = false, sentry = false,
      0.01, 0.02, Seq(
        approach(day1Date, "12:00", 1786190400000L, 20.0, 5.0e6,
          body = Some("  Earth  "),
          dateFullOverride = Some(None)))),
    // no approaches at all: contributes zero silver rows
    Neo("54016476", "(2020 AB3)", 24.1, hazardous = false, sentry = true,
      0.03, 0.07, Nil))))

  /** Day-2 document (2026-08-13): re-observes Apophis (duplicate id across
    * days → gold dedup on id), adds a Venus approach (second orbiting
    * body) and a "Null" placeholder body (null-SK fact row).
    */
  val day2Date = "2026-08-13"
  def day2: String = feedJson(Seq(day2Date -> Seq(
    Neo("2099942", "99942 Apophis (2004 MN4)", 19.7, hazardous = true,
      sentry = false, 0.31, 0.68, Seq(
        approach(day2Date, "06:00", 1786255200000L, 7.44, 3.9e7))),
    Neo("2000433", "433 Eros (A898 PA)", 10.31, hazardous = false,
      sentry = false, 16.8, 37.6, Seq(
        approach(day2Date, "14:20", 1786285200000L, 5.26, 2.6e7,
          body = Some("Venus")),
        approach(day2Date, "23:59", 1786319940000L, 5.27, 2.61e7,
          body = Some("Null")))))))

  // ── backfill extension (days 3–5) ────────────────────────────────────
  // Three more daily documents for the out-of-order backfill gate
  // (q_neo_backfill): each re-observes an earlier NEO with CHANGED
  // attributes (so the deterministic latest-approach-date survivor is
  // load-bearing, not cosmetic) and day 4 carries an empty-approaches
  // NEO that must contribute zero silver rows on every replay.

  val day3Date = "2026-08-14"
  def day3: String = feedJson(Seq(day3Date -> Seq(
    // 2010 PK9 re-observed: refined magnitude + diameter band
    Neo("3542519", "(2010 PK9)", 21.91, hazardous = true, sentry = false,
      0.13, 0.28, Seq(
        approach(day3Date, "09:15", 1786353300000L, 13.61, 1.771e7))),
    Neo("3840869", "(2019 GT3)", 23.4, hazardous = false, sentry = false,
      0.08, 0.18, Seq(
        approach(day3Date, "18:30", 1786386600000L, 9.05, 1.2e7))))))

  val day4Date = "2026-08-15"
  def day4: String = feedJson(Seq(day4Date -> Seq(
    // Apophis re-observed a THIRD time: this row must win the survivor
    // window over the day-1 and day-2 observations
    Neo("2099942", "99942 Apophis (2004 MN4)", 19.6, hazardous = true,
      sentry = false, 0.32, 0.70, Seq(
        approach(day4Date, "11:05", 1786446300000L, 7.46, 3.95e7))),
    // empty close_approach_data: zero silver rows, absent from the dim
    Neo("54339874", "(2023 DW)", 26.0, hazardous = false, sentry = true,
      0.02, 0.05, Nil))))

  val day5Date = "2026-08-16"
  def day5: String = feedJson(Seq(day5Date -> Seq(
    // Eros re-observed: day-5 row outranks both day-2 approaches
    Neo("2000433", "433 Eros (A898 PA)", 10.33, hazardous = false,
      sentry = false, 16.9, 37.7, Seq(
        approach(day5Date, "02:40", 1786502400000L, 5.29, 2.63e7))),
    Neo("2001036", "1036 Ganymed (A924 UB)", 9.2, hazardous = false,
      sentry = false, 31.7, 70.9, Seq(
        approach(day5Date, "16:55", 1786553700000L, 8.11, 5.6e7))))))

  /** All five backfill days, keyed by date — the multi-day fetcher's
    * feed table.
    */
  def backfillDays: Map[String, String] = Map(
    day1Date -> day1, day2Date -> day2, day3Date -> day3,
    day4Date -> day4, day5Date -> day5)
}
