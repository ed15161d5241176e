package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal (binary) column handling for training-data pipelines:
  * opaque `binary` payloads with typed metadata — size, magic-sniffed
  * mime type, content fingerprint, and header-parsed image dimensions —
  * plus the decode plumbing a real image/audio stage would use.
  *
  * The local testdata ships no binary table, so [[fakeMedia]] derives one
  * deterministically from `documents`: a third of the rows get a PNG-
  * style header (magic + big-endian width/height) prepended, a third a
  * RIFF magic, the rest stay raw UTF-8 payloads. The exact same
  * construction is expressed in the DuckDB oracle SQL, so every byte —
  * and therefore every size/mime/fingerprint/dimension — is
  * hash-checked end-to-end.
  *
  * Engine-parity note: DuckDB cannot slice or hash BLOBs, so all
  * byte-level inspection happens on the UPPERCASE hex encoding, which
  * both engines produce identically (`hex(bytes)`). The hex detour is
  * for oracle parity only; each helper documents the direct-binary form
  * a production pipeline would use.
  *
  * Scale notes: every operator here is a pure projection over built-ins
  * (zero shuffle, whole-stage codegen); payload bytes never leave the
  * executor. Decode ([[decodeAll]]) is the one imperative stage — see
  * its doc for the batch shape.
  */
object Multimodal {

  private val PNG_MAGIC_HEX = "89504E470D0A1A0A" // \x89PNG\r\n\x1a\n
  // IHDR chunk prefix: length=13 then the ASCII tag — the synthetic
  // header carries it so width/height sit at the REAL PNG offsets
  // (bytes 17–20 / 21–24, 1-based). Round-12's bomb guard made the stub
  // parse the user-visible output for oversized real images; with the
  // real layout one offset pair serves fixtures and genuine PNGs alike
  // (ADVICE r12).
  private val PNG_IHDR_HEX = "0000000D49484452"
  private val RIFF_MAGIC_HEX = "52494646"        // RIFF

  /** Deterministic synthetic media table from `documents`:
    * (media_id, bytes). Mirrored verbatim in the oracle's media CTE.
    */
  def fakeMedia(docs: DataFrame): DataFrame = {
    val w = lit(16) + col("doc_id") % 1024
    val h = lit(16) + (col("doc_id") * 7) % 1024
    val pngHeader = concat(lit(PNG_MAGIC_HEX + PNG_IHDR_HEX),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"))
    val payload = encode(col("text"), "UTF-8")
    val bytes = when(col("doc_id") % 3 === 0,
        concat(unhex(pngHeader), payload))
      .when(col("doc_id") % 3 === 1,
        concat(unhex(lit(RIFF_MAGIC_HEX)), payload))
      .otherwise(payload)
    docs.select(col("doc_id").as("media_id"), bytes.as("bytes"))
  }

  /** Payload size in bytes. */
  def byteSize(bytes: Column): Column = length(bytes)

  /** Strided byte-diversity stats per payload — the decode-free
    * blank/corruption screen (q_media_bytestats): sample ≤ 64 bytes at
    * a fixed stride in-row, count distinct, flag uniform payloads.
    * Pure projection, cost independent of payload size; expects
    * (media_id, bytes).
    */
  def byteStats(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        byteSize(col("bytes")).cast("long").as("n_bytes"),
        col("bytes"))
      .withColumn("stride",
        when(col("n_bytes") >= 64, expr("n_bytes div 64"))
          .otherwise(lit(1L)))
      .withColumn("k", least(lit(64L), col("n_bytes")))
      .withColumn("n_distinct",
        when(col("k") > 0, size(array_distinct(expr(
          "transform(sequence(0L, k - 1), " +
            "i -> substring(bytes, CAST(1 + i * stride AS INT), 1))")))
          .cast("long"))
          .otherwise(lit(0L)))
      .select(col("media_id"), col("n_bytes"),
        col("k").as("n_sampled"), col("n_distinct"),
        (col("n_distinct") === 1).cast("long").as("is_uniform"))

  /** Magic-byte mime sniff over the hex encoding (production form:
    * compare `substring(bytes, 1, n)` against binary literals).
    */
  def magicMime(bytes: Column): Column = {
    val hx = hex(bytes)
    when(substring(hx, 1, 16) === PNG_MAGIC_HEX, "image/png")
      .when(substring(hx, 1, 8) === RIFF_MAGIC_HEX, "audio/x-riff")
      .otherwise("application/octet-stream")
  }

  /** Content fingerprint: sha256 of the hex encoding (production form:
    * `sha2(bytes, 256)` directly — DuckDB can only hash VARCHAR).
    */
  def fingerprint(bytes: Column): Column = sha2(hex(bytes), 256)

  /** Big-endian u32 at byte offset (1-based) parsed from the hex dump. */
  private def beU32(bytes: Column, byteOffset: Int): Column =
    conv(substring(hex(bytes), (byteOffset - 1) * 2 + 1, 8), 16, 10)
      .cast("long")

  /** PNG header width: IHDR data bytes 17–20 (big-endian), the real
    * PNG offset — valid for genuine files, not only the fixtures.
    */
  def pngWidth(bytes: Column): Column = beU32(bytes, 17)

  /** PNG header height: IHDR data bytes 21–24 (big-endian). */
  def pngHeight(bytes: Column): Column = beU32(bytes, 21)

  // ── decode plumbing ──────────────────────────────────────────────────

  /** One media row as the decode stage sees it. */
  final case class MediaRow(media_id: Long, bytes: Array[Byte])

  /** Typed decode output: header metadata plus a cheap content feature. */
  final case class DecodedMedia(media_id: Long, mime: String,
                                n_bytes: Int, width: Long, height: Long,
                                mean_byte: Double)

  /** Pluggable decoder. Production would back this with an actual codec
    * (JNI libjpeg/ffmpeg, or in PySpark an Arrow-batched pandas UDF);
    * this container has no media libraries, so [[StubDecoder]] stands in
    * with a deterministic parse of the same synthetic headers.
    */
  trait MediaDecoder extends Serializable {
    def decode(m: MediaRow): DecodedMedia

    /** Largest payload one decode call accepts. JVM byte arrays cap at
      * Int.MaxValue (~2 GB), so anything larger must be rejected at
      * PLAN time from the catalog's size column — a task that tried to
      * materialize it would OOM or overflow instead of failing clearly.
      * Real codecs override LOWER (a 2 GB frame buffer rarely fits).
      */
    def maxBytes: Long = Int.MaxValue.toLong

    /** Fail-fast guard for declared payload sizes. Call it at PLAN time
      * on the catalog's size column (before bytes load); [[decodeAll]]
      * also re-checks each materialized payload so an unguarded
      * pipeline still fails with this message instead of a codec OOM.
      * MultimodalSpec's decoder conformance suite pins this contract
      * for every implementation.
      */
    final def checkDecodable(nBytes: Long): Unit =
      require(nBytes >= 0 && nBytes <= maxBytes,
        s"payload of $nBytes bytes exceeds decoder limit $maxBytes " +
          "(or is negative); filter or split upstream")
  }

  /** Mean payload byte, accumulated in a Long: an Int sum overflows at
    * ~8.4 MB of 0xff bytes, well inside the 512 MB payloads
    * [[ImageIoDecoder]] accepts.
    */
  private def meanByte(b: Array[Byte]): Double =
    if (b.isEmpty) 0.0
    else b.foldLeft(0L)((a, x) => a + (x & 0xff)).toDouble / b.length

  /** Deterministic stand-in decoder: sniffs the magic, parses the PNG
    * header dims, and computes the mean payload byte as the "feature".
    */
  object StubDecoder extends MediaDecoder {
    private def beU32At(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    def decode(m: MediaRow): DecodedMedia = {
      val b = m.bytes
      // mime sniffs on the 8-byte magic ALONE — the same rule as
      // magicMime/q_media_catalog, so the two mime surfaces can never
      // diverge on a short PNG-magic payload (ADVICE r13). Width/height
      // live at offsets 16/20 — the REAL PNG IHDR layout (offsets 8/12
      // are the chunk length and tag), so the stub reports a genuine
      // PNG's declared dims correctly (the visible output for oversized
      // real images under the bomb guard, ADVICE r12); the dim parse —
      // not the mime — is gated on the 24 bytes it needs.
      val isPng = b.length >= 8 &&
        b.take(8).sameElements(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
          0x1a, 0x0a).map(_.toByte))
      val isRiff = !isPng && b.length >= 4 &&
        b.take(4).sameElements("RIFF".getBytes)
      val mime =
        if (isPng) "image/png"
        else if (isRiff) "audio/x-riff"
        else "application/octet-stream"
      val (w, h) =
        if (isPng && b.length >= 24) (beU32At(b, 16), beU32At(b, 20))
        else (0L, 0L)
      DecodedMedia(m.media_id, mime, b.length, w, h, meanByte(b))
    }
  }

  /** REAL image codec, backed by the JDK's own `javax.imageio` (PNG /
    * JPEG / GIF / BMP readers ship with Java SE — no external library
    * needed after all). A payload that a registered ImageIO reader can
    * actually decode gets its mime from the reader's format name and
    * its dimensions from the DECODED RASTER — not from header offsets —
    * so a lying header cannot spoof dims past this decoder. Anything
    * ImageIO rejects (including the synthetic-header fixtures and all
    * non-image payloads) falls back to [[StubDecoder]]'s deterministic
    * sniff, so the conformance contract holds unchanged and the two
    * decoders agree wherever the stub's convention applies.
    *
    * `maxBytes` is 512 MB: a real decoder materializes a frame buffer
    * (w·h·4 bytes) on top of the payload, so accepting a full 2 GB
    * array is an OOM, not a capability.
    */
  object ImageIoDecoder extends MediaDecoder {
    override def maxBytes: Long = 512L * 1024 * 1024

    /** Decoded-frame pixel budget. The byte cap alone does not bound the
      * frame buffer: a few-KB PNG/GIF can DECLARE huge dimensions
      * (decompression bomb) and `read(0)` would allocate w·h·4 bytes
      * sized by the header, not the payload. getWidth/getHeight(0) read
      * only the header, so the check costs no decode work. 2^28 px
      * (≈16k×16k) is a 1 GiB ARGB frame — the most one local decode
      * slot should ever pin.
      */
    val maxPixels: Long = 1L << 28

    // ImageIO's default stream cache writes temp FILES per decode —
    // per-row disk I/O inside a task. Memory-cached streams instead.
    javax.imageio.ImageIO.setUseCache(false)

    private def tryReal(b: Array[Byte]): Option[(String, Long, Long)] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val declared = r.getWidth(0).toLong * r.getHeight(0).toLong
              if (declared > maxPixels) None // bomb: fall back, don't decode
              else {
                val img = r.read(0)
                Some(("image/" + r.getFormatName.toLowerCase,
                  img.getWidth.toLong, img.getHeight.toLong))
              }
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    def decode(m: MediaRow): DecodedMedia =
      tryReal(m.bytes) match {
        case Some((mime, w, h)) =>
          DecodedMedia(m.media_id, mime, m.bytes.length, w, h,
            meanByte(m.bytes))
        case None => StubDecoder.decode(m)
      }
  }

  /** Distributed decode: one decoder call per row, batched per
    * partition. mapPartitions is deliberate here — decode is genuinely
    * imperative per-payload work (the one case the build brief reserves
    * it for); the decoder ships once in the task closure, and the
    * per-partition iterator is where a real codec would lazily init and
    * amortize native resources. Schema is the typed [[DecodedMedia]]
    * encoder; partitioning passes through unchanged (no shuffle).
    */
  def decodeAll(media: Dataset[MediaRow],
                decoder: MediaDecoder): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map { m =>
      decoder.checkDecodable(m.bytes.length.toLong)
      decoder.decode(m)
    })
  }

  /** One sampled frame of a media payload. */
  final case class Frame(media_id: Long, frame_idx: Int,
                         frame_bytes: Array[Byte])

  /** q_media_frames fixture knobs: 64-byte windows, every 2nd one. */
  val FRAME_BYTES = 64
  val FRAME_STRIDE = 2
  val RESIZE_FACTOR = 4  // q_media_resize: keep every 4th byte

  /** Frame sampling: treat the payload as fixed-size frames and emit
    * every `stride`-th one — the one-to-many imperative stage a video
    * pipeline runs before per-frame featurization. The "frames" here are
    * raw byte windows (no container parser in this environment); the
    * Spark plumbing — typed flatMap fan-out, schema, partition
    * passthrough — is the real part.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int,
                   stride: Int): Dataset[Frame] = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be > 0")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.bytes.grouped(frameSize).zipWithIndex.collect {
        case (b, i) if i % stride == 0 => Frame(m.media_id, i, b)
      }
    }
  }

  /** Stub resize: keeps every `factor`-th payload byte — a deterministic
    * stand-in for a real scaler (no image codec in this environment)
    * that preserves the bytes-in/bytes-out shape a resize stage has.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor > 0, "factor must be > 0")
    import media.sparkSession.implicits._
    media.map(m => MediaRow(m.media_id,
      m.bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }))
  }

  // ── perceptual average-hash ──────────────────────────────────────────

  /** aHash sample count / fingerprint width. 60 (not 64) for the same
    * reason as [[Dedup.SIMHASH_BITS]]: the value stays non-negative in a
    * signed 64-bit integer in both engines.
    */
  val AHASH_BITS = 60
  /** Media near-dup verify radius — bands = radius + 1 everywhere. */
  val MEDIA_MAX_HAMMING = 3

  /** Perceptual average-hash over the payload: sample AHASH_BITS bytes
    * at a fixed stride, bit_i = sample_i > integer-mean of the samples.
    * This is the classic aHash shape (a real image pipeline feeds it
    * decoded grayscale pixels; here the samples are payload bytes — the
    * fingerprint arithmetic, banding compatibility with
    * [[Dedup.simhashNearDupPairs]]-style retrieval, and oracle parity
    * are the point). All-integer; byte access happens on the hex
    * encoding for DuckDB parity (production form: `substring(bytes, p, 1)`
    * directly).
    */
  /** (media_id, ahash) for every non-empty payload.
    *
    * STAGED as four projections on purpose: a single Column expression
    * would duplicate `hex(bytes)` into all 60 samples and every sample
    * into the mean AND its bit term — a multiplicative expression
    * blowup that codegen cannot deduplicate (first cut of this ran 30×
    * slower). Binding each intermediate to a column makes every hex /
    * sample / mean evaluate exactly once per row; CollapseProject leaves
    * non-cheap expressions used more than once alone.
    */
  // integer division via floor: operands stay far below 2^53, so the
  // double detour is exact and matches DuckDB's `//`
  private def idiv(a: Column, b: Long): Column =
    floor(a / lit(b)).cast("long")

  /** The shared sampling stage: `bits` stride-sampled payload bytes as
    * columns s0..s{bits−1} — the input every perceptual hash folds
    * (aHash/dHash at AHASH_BITS, pHash at its 8×8 = 64 grid).
    */
  private def sampledBytes(media: DataFrame,
                           bits: Int = AHASH_BITS): DataFrame = {
    val base = media
      .filter(length(col("bytes")) > 0)
      .select(col("media_id"), hex(col("bytes")).as("hx"),
        length(col("bytes")).cast("long").as("n"))
      .withColumn("stride",
        greatest(lit(1L), idiv(col("n"), bits.toLong)))
    base.select(col("media_id") +:
      (0 until bits).map { i =>
        val p = least(lit(1L) + lit(i.toLong) * col("stride"), col("n"))
        conv(col("hx").substr(((p - lit(1L)) * 2 + 1).cast("int"), lit(2)),
          16, 10).cast("long").as(s"s$i")
      }: _*)
  }

  /** pHash geometry: 8×8 sample grid → separable integer DCT-II →
    * signs of the 60 lowest-frequency AC coefficients (zig-zag order).
    */
  private val PHASH_DIM = 8
  private val PHASH_N = PHASH_DIM * PHASH_DIM
  private val PHASH_SCALE = 1024L
  private[operators] val PHASH_BITS = 60

  /** Integer-scaled orthonormal DCT-II basis: T(u,i) = round(1024 ·
    * α(u) · cos((2i+1)uπ/16)). Float cos runs once at BUILD time —
    * the same literal table lands in both engines' expressions, so
    * engine-exactness never depends on runtime trig.
    */
  private lazy val DCT8: Array[Array[Long]] =
    Array.tabulate(PHASH_DIM, PHASH_DIM) { (u, i) =>
      val a = if (u == 0) math.sqrt(1.0 / PHASH_DIM) else 0.5
      math.round(PHASH_SCALE * a *
        math.cos((2 * i + 1) * u * math.Pi / (2 * PHASH_DIM)))
    }

  /** JPEG zig-zag traversal of the 8×8 grid, DC dropped, first 60 —
    * lowest spatial frequencies first, matching classic pHash's
    * low-frequency crop.
    */
  private lazy val PHASH_COEFFS: Seq[(Int, Int)] = {
    val zig = for {
      s <- 0 until 2 * PHASH_DIM - 1
      d <- 0 to s
      u = if (s % 2 == 0) math.min(s, PHASH_DIM - 1) - d
          else math.max(0, s - (PHASH_DIM - 1)) + d
      v = s - u
      if u >= 0 && u < PHASH_DIM && v >= 0 && v < PHASH_DIM
    } yield (u, v)
    zig.drop(1).take(PHASH_BITS)
  }

  /** Perceptual DCT hash (classic pHash shape, integer-exact): 8×8
    * stride-sampled grid → separable scaled-integer DCT (two 8-term
    * matrix-multiply stages, never the fused 64-term quadruple sum) →
    * sign bits of the 60 lowest AC coefficients. Signs of an integer
    * linear form are engine-exact, so the whole hash runs under the
    * DuckDB gate; 60 bits drop straight into the shared
    * banded-hamming retrieval machinery. aHash sees level shifts,
    * dHash sees local gradients — pHash thresholds the GLOBAL
    * frequency structure, the detector that survives high-frequency
    * noise both of them flag. |C| ≤ 8²·255·1024² ≈ 1.7·10¹⁰ — int64
    * headroom by construction.
    */
  def pHashed(media: DataFrame): DataFrame = {
    val base = sampledBytes(media, PHASH_N)
    val withR = base.select(col("media_id") +:
      (for (u <- 0 until PHASH_DIM; j <- 0 until PHASH_DIM) yield
        (0 until PHASH_DIM)
          .map(i => col(s"s${i * PHASH_DIM + j}") * lit(DCT8(u)(i)))
          .reduce(_ + _).as(s"r${u}_$j")): _*)
    withR.select(col("media_id"),
      PHASH_COEFFS.zipWithIndex.map { case ((u, v), b) =>
        val c = (0 until PHASH_DIM)
          .map(j => col(s"r${u}_$j") * lit(DCT8(v)(j))).reduce(_ + _)
        when(c > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as("phash"))
  }

  def aHashed(media: DataFrame): DataFrame = {
    val withMean = sampledBytes(media).withColumn("m",
      idiv((0 until AHASH_BITS).map(i => col(s"s$i")).reduce(_ + _),
        AHASH_BITS.toLong))
    withMean.select(col("media_id"),
      (0 until AHASH_BITS).map { i =>
        when(col(s"s$i") > col("m"), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _).as("ahash"))
  }

  /** Perceptual difference-hash over the same sampled bytes: bit_i =
    * sample_i > sample_{(i+1) mod 60} — gradient SIGNS instead of
    * deviation from a global mean.
    * aHash thresholds on the payload's own mean, so a uniform level
    * shift (re-encode, brightness in a real pixel pipeline) can flip
    * many bits at once; dHash compares ADJACENT samples, which such
    * shifts leave invariant — the standard second detector an image
    * dedup stack runs beside aHash (agreement between the two is the
    * q_detector_agreement idea applied to media). Same integer/oracle
    * contract and the same banding compatibility as [[aHashed]]; the
    * cyclic final pair keeps the fold at exactly AHASH_BITS samples.
    */
  def dHashed(media: DataFrame): DataFrame =
    sampledBytes(media).select(col("media_id"),
      (0 until AHASH_BITS).map { i =>
        when(col(s"s$i") > col(s"s${(i + 1) % AHASH_BITS}"),
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _).as("dhash"))

  // ── declared queries + oracle ────────────────────────────────────────

  private def mediaOf(s: SparkSession, dir: String): DataFrame =
    fakeMedia(Tables.load(s, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // size + mime + fingerprint catalog over the binary column
    "q_media_catalog" -> { (s, dir) =>
      mediaOf(s, dir).select(col("media_id"),
        byteSize(col("bytes")).as("n_bytes"),
        magicMime(col("bytes")).as("mime"),
        fingerprint(col("bytes")).as("fp"))
    },

    // header-parsed dimensions for the image rows only
    "q_media_dimensions" -> { (s, dir) =>
      mediaOf(s, dir)
        .filter(magicMime(col("bytes")) === "image/png")
        .select(col("media_id"),
          pngWidth(col("bytes")).as("width"),
          pngHeight(col("bytes")).as("height"),
          (pngWidth(col("bytes")) * pngHeight(col("bytes")))
            .as("n_pixels"))
    },

    // ── strided byte-diversity stats (blank/corruption screen) ─────────
    // Up to 64 bytes sampled at a fixed stride per payload; the
    // distinct count is the cheap decode-free screen for blank frames,
    // zero-filled uploads, and truncated constant padding (uniform ⇒
    // nothing to decode). Pure projection — HOF transform over an
    // in-row sample, no shuffle, cost independent of payload size.
    // The DuckDB twin samples the SAME positions via hex-string pairs
    // (BLOB slicing is off-limits there), 1:1 with the binary bytes.
    "q_media_bytestats" -> { (s, dir) => byteStats(mediaOf(s, dir)) },

    // exact binary dedup: group identical payloads by content hash
    // (duplicate text payloads in documents collide across mime wrappers
    // only when the full byte stream — header included — matches)
    "q_media_dedup" -> { (s, dir) =>
      mediaOf(s, dir)
        .groupBy(fingerprint(col("bytes")).as("fp"))
        .agg(min(col("media_id")).as("keep_id"),
          count(lit(1)).as("n_dups"))
    },

    // perceptual average-hash fingerprints (near-dup retrieval banding
    // compatible with the SimHash machinery)
    "q_media_ahash" -> { (s, dir) => aHashed(mediaOf(s, dir)) },

    "q_media_phash" -> { (s, dir) => pHashed(mediaOf(s, dir)) },

    // difference-hash fingerprints (see dHashed — the level-shift-
    // invariant second detector beside aHash)
    "q_media_dhash" -> { (s, dir) => dHashed(mediaOf(s, dir)) },

    // perceptual near-dup retrieval: the generic banded-hamming
    // machinery ([[Dedup.bandedHammingPairs]]) applied to media aHashes —
    // candidates from band collisions, exact bit_count(xor) verify
    "q_media_neardup" -> { (s, dir) =>
      Dedup.bandedHammingPairs(aHashed(mediaOf(s, dir)),
          "media_id", "ahash", AHASH_BITS, MEDIA_MAX_HAMMING)
        .toDF("media_a", "media_b", "hamming")
    },

    // ── frame sampling + decode fan-out, per-media rollup ──────────────
    // [[sampleFrames]] (every 2nd 64-byte window) fanned out through
    // [[decodeAll]] with the REAL [[ImageIoDecoder]] — the
    // video-pipeline shape (sample → per-frame decode/featurize →
    // rollup) end-to-end under the hash gate. Frame counts are a known
    // function of payload size (ceil(ceil(n/64)/2)); the PNG frame of
    // an image payload surfaces its header dims through the decoder's
    // deterministic fallback (a 64-byte window is never a decodable
    // raster, so ImageIO rejects it and the stub parses the IHDR —
    // the exact fallback contract MultimodalSpec pins). mapPartitions
    // fan-out + typed flatMap; partitioning passes through, no shuffle
    // until the final keyed rollup.
    "q_media_frames" -> { (s, dir) =>
      import s.implicits._
      val frames = sampleFrames(mediaOf(s, dir).as[MediaRow],
        FRAME_BYTES, FRAME_STRIDE)
      val decoded = decodeAll(
        frames.map(f => MediaRow(f.media_id, f.frame_bytes)),
        ImageIoDecoder)
      decoded.toDF().groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("n_bytes").cast("long")).as("n_frame_bytes"),
          sum(when(col("mime") === "image/png", 1L).otherwise(0L))
            .as("n_png_frames"),
          sum(when(col("mime") === "audio/x-riff", 1L).otherwise(0L))
            .as("n_riff_frames"),
          max(col("width")).as("width"),
          max(col("height")).as("height"))
    },

    // ── stub-resize rollup: the scale stage of the media pipeline ──────
    // resizeStub (every factor-th payload byte — the deterministic
    // stand-in for a real scaler; MultimodalSpec pins the byte rule)
    // gated end-to-end: per media, the resized size, the unsigned
    // byte sum, and the first 8 resized bytes in hex — three
    // independent witnesses of WHICH bytes survived, so a stride slip
    // or an off-by-one cannot hash-match. The DuckDB twin replays the
    // byte selection over hex pairs (blobs are not sliceable there).
    "q_media_resize" -> { (s, dir) =>
      import s.implicits._
      resizeStub(mediaOf(s, dir).as[MediaRow], RESIZE_FACTOR)
        .map { m =>
          val sum = m.bytes.foldLeft(0L)((a, b) => a + (b & 0xFF))
          val head = m.bytes.take(8).map(b => f"${b & 0xFF}%02X").mkString
          (m.media_id, m.bytes.length.toLong, sum, head)
        }.toDF("media_id", "n_resized", "byte_sum", "head8")
    },

    // ── perceptual near-dup CLUSTERS: the actionable media dedup form ──
    // Same pairs→components closure the text side uses ([[Clusters]]):
    // banded-hamming pairs over the aHash fingerprints, closed into
    // (media_id, cluster_id, cluster_sz) — the keep/drop unit a media
    // curation pipeline executes. The recursive-CTE oracle replays the
    // fixpoint exactly.
    "q_media_clusters" -> { (s, dir) =>
      Clusters.memberTable(
        Dedup.bandedHammingPairs(aHashed(mediaOf(s, dir)),
            "media_id", "ahash", AHASH_BITS, maxHamming = 3)
          .toDF("doc_a", "doc_b", "hamming"))
        .toDF("media_id", "cluster_id", "cluster_sz")
    }
  )

  /** Shared media CTE — byte-identical to [[fakeMedia]]. */
  private[graft] val mediaCte =
    s"""media AS (SELECT doc_id AS media_id,
       |  CASE WHEN doc_id % 3 = 0 THEN
       |         unhex('$PNG_MAGIC_HEX$PNG_IHDR_HEX' ||
       |           lpad(hex(16 + doc_id % 1024), 8, '0') ||
       |           lpad(hex(16 + (doc_id * 7) % 1024), 8, '0')) ||
       |         encode(text)
       |       WHEN doc_id % 3 = 1 THEN unhex('$RIFF_MAGIC_HEX') || encode(text)
       |       ELSE encode(text) END AS bytes
       |  FROM documents)""".stripMargin

  /** CTE chain (appended after `media`) ending in `ah(media_id, ahash)` —
    * the SQL twin of [[aHash]].
    */
  private[graft] val aHashCtes: String = {
    def sampleSql(i: Int) =
      s"CAST(('0x' || substr(hx, CAST(((least(1 + $i * stride, n) - 1) * 2 + 1) AS INT), 2)) AS BIGINT)"
    val samples = (0 until AHASH_BITS).map(sampleSql)
    val sum = samples.mkString("(", " + ", ")")
    val bits = samples.zipWithIndex.map { case (s, i) =>
      s"(CASE WHEN $s > m THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"""m2 AS (SELECT media_id, hex(bytes) AS hx,
       |    CAST(octet_length(bytes) AS BIGINT) AS n,
       |    greatest(1, CAST(octet_length(bytes) AS BIGINT) // $AHASH_BITS) AS stride
       |  FROM media WHERE octet_length(bytes) > 0),
       |withmean AS (SELECT media_id, hx, n, stride,
       |    $sum // $AHASH_BITS AS m
       |  FROM m2),
       |ah AS (SELECT media_id, CAST($bits AS BIGINT) AS ahash
       |  FROM withmean)""".stripMargin
  }

  /** The banded-aHash CTE (appended after `ah`) — the oracle twin of
    * [[graft.operators.Dedup.hammingBandKeys]] at the media radius:
    * MEDIA_MAX_HAMMING+1 equal bands of the AHASH_BITS fingerprint.
    * ONE definition for every media-banding oracle, so a radius change
    * can never drift between the Scala banding and the SQL twins.
    */
  private[graft] val bandedCte: String = {
    val bands = MEDIA_MAX_HAMMING + 1
    val width = AHASH_BITS / bands
    val mask = (1L << width) - 1
    s"""banded AS (SELECT media_id, ahash, bands.band,
       |    (ahash >> (bands.band * $width)) & $mask AS bkey
       |  FROM ah, (SELECT unnest(range($bands)) AS band) bands)""".stripMargin
  }

  /** The q_stream_media_dedup oracle: banded aHash self-join WITHOUT
    * the `<` direction cut (the stream emits every (arrival, corpus)
    * direction), collision multiplicity per pair, then the per-media
    * ingestion rollup — exactly what the stream-static band join +
    * in-row verify must reproduce on a corpus replay.
    */
  private[graft] def streamMediaDedupSql: String =
    s"""WITH $mediaCte,
       |$aHashCtes,
       |$bandedCte,
       |mcand AS (SELECT a.media_id AS media_id, b.media_id AS match_id,
       |    bit_count(xor(a.ahash, b.ahash)) AS hamming,
       |    count(*) AS nb
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey
       |    AND a.media_id != b.media_id
       |  GROUP BY 1, 2, 3)
       |SELECT media_id, count(DISTINCT match_id) AS n_matches,
       |  min(hamming) AS best_hamming,
       |  CAST(sum(nb) AS BIGINT) AS n_band_hits
       |FROM mcand WHERE hamming <= $MEDIA_MAX_HAMMING
       |GROUP BY 1""".stripMargin

  /** SQL twin of [[pHashed]]: the identical DCT8 literal table and the
    * same two-stage separable structure as chained CTEs (64 samples →
    * 64 row-transform sums → 60 sign bits).
    */
  private lazy val pHashCtes: String = {
    def sampleSql(i: Int) =
      s"CAST(('0x' || substr(hx, CAST(((least(1 + $i * stride, n) - 1) * 2 + 1) AS INT), 2)) AS BIGINT) AS s$i"
    val samples = (0 until PHASH_N).map(sampleSql).mkString(",\n    ")
    val rCols = (for (u <- 0 until PHASH_DIM; j <- 0 until PHASH_DIM) yield {
      val terms = (0 until PHASH_DIM)
        .map(i => s"s${i * PHASH_DIM + j} * ${DCT8(u)(i)}").mkString(" + ")
      s"($terms) AS r${u}_$j"
    }).mkString(",\n    ")
    val bits = PHASH_COEFFS.zipWithIndex.map { case ((u, v), b) =>
      val c = (0 until PHASH_DIM)
        .map(j => s"r${u}_$j * ${DCT8(v)(j)}").mkString(" + ")
      s"(CASE WHEN ($c) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString("\n    + ")
    s"""pm AS (SELECT media_id, hex(bytes) AS hx,
       |    CAST(octet_length(bytes) AS BIGINT) AS n,
       |    greatest(1, CAST(octet_length(bytes) AS BIGINT) // $PHASH_N) AS stride
       |  FROM media WHERE octet_length(bytes) > 0),
       |psm AS (SELECT media_id,
       |    $samples
       |  FROM pm),
       |ppr AS (SELECT media_id,
       |    $rCols
       |  FROM psm),
       |ph AS (SELECT media_id, CAST($bits AS BIGINT) AS phash
       |  FROM ppr)""".stripMargin
  }

  /** SQL twin of [[dHashed]]: the same sampled-byte expressions folded
    * as cyclic adjacent-pair comparisons.
    */
  private val dHashCtes: String = {
    def sampleSql(i: Int) =
      s"CAST(('0x' || substr(hx, CAST(((least(1 + $i * stride, n) - 1) * 2 + 1) AS INT), 2)) AS BIGINT)"
    val bits = (0 until AHASH_BITS).map { i =>
      s"(CASE WHEN ${sampleSql(i)} > ${sampleSql((i + 1) % AHASH_BITS)} " +
        s"THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"""dm2 AS (SELECT media_id, hex(bytes) AS hx,
       |    CAST(octet_length(bytes) AS BIGINT) AS n,
       |    greatest(1, CAST(octet_length(bytes) AS BIGINT) // $AHASH_BITS) AS stride
       |  FROM media WHERE octet_length(bytes) > 0),
       |dh AS (SELECT media_id, CAST($bits AS BIGINT) AS dhash
       |  FROM dm2)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_media_catalog" ->
      s"""WITH $mediaCte
         |SELECT media_id, octet_length(bytes) AS n_bytes,
         |  CASE WHEN substr(hex(bytes), 1, 16) = '$PNG_MAGIC_HEX' THEN 'image/png'
         |       WHEN substr(hex(bytes), 1, 8) = '$RIFF_MAGIC_HEX' THEN 'audio/x-riff'
         |       ELSE 'application/octet-stream' END AS mime,
         |  sha256(hex(bytes)) AS fp
         |FROM media""".stripMargin,

    "q_media_dimensions" ->
      s"""WITH $mediaCte
         |SELECT media_id,
         |  CAST(('0x' || substr(hex(bytes), 33, 8)) AS BIGINT) AS width,
         |  CAST(('0x' || substr(hex(bytes), 41, 8)) AS BIGINT) AS height,
         |  CAST(('0x' || substr(hex(bytes), 33, 8)) AS BIGINT)
         |    * CAST(('0x' || substr(hex(bytes), 41, 8)) AS BIGINT) AS n_pixels
         |FROM media
         |WHERE substr(hex(bytes), 1, 16) = '$PNG_MAGIC_HEX'""".stripMargin,

    // SQL twin of sampleFrames → decodeAll(ImageIoDecoder): frames are
    // hex-string windows (2·FRAME_BYTES hex chars at stride 2·64);
    // per-frame mime replays StubDecoder's magic sniff (the decoder's
    // deterministic fallback — no 64-byte window is a decodable
    // raster) with its ≥8/≥4-byte guards, dims replay the ≥24-byte
    // IHDR parse at byte offsets 16/20.
    "q_media_frames" -> {
      val fs = FRAME_BYTES
      s"""WITH $mediaCte,
         |fr AS (SELECT media_id, hex(bytes) AS hx,
         |    CAST(octet_length(bytes) AS BIGINT) AS n FROM media),
         |idx AS (SELECT media_id, hx, n, CAST(i AS BIGINT) AS i
         |  FROM fr, unnest(range(0, (n + ${fs - 1}) // $fs)) AS u(i)
         |  WHERE i % $FRAME_STRIDE = 0),
         |f AS (SELECT media_id, least($fs, n - i * $fs) AS fb,
         |    substr(hx, CAST(i * ${2 * fs} + 1 AS INT), ${2 * fs}) AS fhx
         |  FROM idx),
         |d AS (SELECT media_id, fb,
         |    CASE WHEN fb >= 8 AND substr(fhx, 1, 16) = '$PNG_MAGIC_HEX'
         |           THEN 'image/png'
         |         WHEN fb >= 4 AND substr(fhx, 1, 8) = '$RIFF_MAGIC_HEX'
         |           THEN 'audio/x-riff'
         |         ELSE 'application/octet-stream' END AS mime, fhx
         |  FROM f),
         |dd AS (SELECT media_id, fb, mime,
         |    CASE WHEN mime = 'image/png' AND fb >= 24
         |      THEN CAST(('0x' || substr(fhx, 33, 8)) AS BIGINT)
         |      ELSE 0 END AS w,
         |    CASE WHEN mime = 'image/png' AND fb >= 24
         |      THEN CAST(('0x' || substr(fhx, 41, 8)) AS BIGINT)
         |      ELSE 0 END AS h
         |  FROM d)
         |SELECT media_id, count(*) AS n_frames,
         |  CAST(sum(fb) AS BIGINT) AS n_frame_bytes,
         |  CAST(sum(CASE WHEN mime = 'image/png' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_png_frames,
         |  CAST(sum(CASE WHEN mime = 'audio/x-riff' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_riff_frames,
         |  CAST(max(w) AS BIGINT) AS width,
         |  CAST(max(h) AS BIGINT) AS height
         |FROM dd GROUP BY media_id""".stripMargin
    },

    // the stub resize replayed over hex pairs: position i survives iff
    // i % factor = 0; three witnesses (count, unsigned sum, head-8 hex)
    "q_media_resize" ->
      s"""WITH $mediaCte,
         |rr AS (SELECT media_id, hex(bytes) AS h,
         |    CAST(octet_length(bytes) AS BIGINT) AS n FROM media),
         |rb AS (SELECT media_id,
         |    CAST(('0x' || substr(h, CAST(i * 2 + 1 AS INT), 2))
         |      AS BIGINT) AS bv,
         |    substr(h, CAST(i * 2 + 1 AS INT), 2) AS pr,
         |    CAST(i // $RESIZE_FACTOR AS BIGINT) AS ri
         |  FROM rr, unnest(range(0, n, $RESIZE_FACTOR)) AS u(i))
         |SELECT rr.media_id,
         |  CAST((rr.n + ${RESIZE_FACTOR - 1}) // $RESIZE_FACTOR
         |    AS BIGINT) AS n_resized,
         |  CAST(coalesce(sum(rb.bv), 0) AS BIGINT) AS byte_sum,
         |  coalesce(string_agg(CASE WHEN rb.ri < 8 THEN rb.pr END, ''
         |    ORDER BY rb.ri), '') AS head8
         |FROM rr LEFT JOIN rb USING (media_id)
         |GROUP BY rr.media_id, rr.n""".stripMargin,

    "q_media_dedup" ->
      s"""WITH $mediaCte
         |SELECT sha256(hex(bytes)) AS fp, min(media_id) AS keep_id,
         |  count(*) AS n_dups
         |FROM media GROUP BY 1""".stripMargin,

    "q_media_bytestats" ->
      s"""WITH $mediaCte,
         |b AS (SELECT media_id, octet_length(bytes) AS n_bytes,
         |    hex(bytes) AS h FROM media),
         |p AS (SELECT media_id, n_bytes, least(64, n_bytes) AS k,
         |    CASE WHEN n_bytes >= 64 THEN n_bytes // 64 ELSE 1 END
         |      AS stride, h
         |  FROM b),
         |d AS (SELECT media_id, n_bytes, k,
         |    CAST(len(list_distinct(list_transform(range(0, k),
         |      i -> substr(h, CAST(2 * i * stride + 1 AS INT), 2))))
         |      AS BIGINT) AS n_distinct
         |  FROM p)
         |SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes,
         |  CAST(k AS BIGINT) AS n_sampled, n_distinct,
         |  CAST(CASE WHEN n_distinct = 1 THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_uniform
         |FROM d""".stripMargin,

    "q_media_ahash" ->
      s"""WITH $mediaCte,
         |$aHashCtes
         |SELECT media_id, ahash FROM ah""".stripMargin,

    "q_media_dhash" ->
      s"""WITH $mediaCte,
         |$dHashCtes
         |SELECT media_id, dhash FROM dh""".stripMargin,

    "q_media_phash" ->
      s"""WITH $mediaCte,
         |$pHashCtes
         |SELECT media_id, phash FROM ph""".stripMargin,

    "q_media_neardup" ->
      s"""WITH $mediaCte,
         |$aHashCtes,
         |$bandedCte,
         |cand AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         |    bit_count(xor(a.ahash, b.ahash)) AS hamming
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.media_id < b.media_id)
         |SELECT media_a, media_b, hamming FROM cand
         |WHERE hamming <= $MEDIA_MAX_HAMMING""".stripMargin,

    "q_media_clusters" ->
      s"""WITH RECURSIVE $mediaCte,
         |$aHashCtes,
         |$bandedCte,
         |vp AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.media_id < b.media_id
         |  WHERE bit_count(xor(a.ahash, b.ahash)) <= $MEDIA_MAX_HAMMING),
         |e AS (SELECT media_a AS src, media_b AS dst FROM vp
         |      UNION SELECT media_b, media_a FROM vp),
         |reach AS (SELECT src AS id, src AS r FROM e
         |          UNION
         |          SELECT reach.id, e.dst FROM reach JOIN e ON e.src = reach.r),
         |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |csz AS (SELECT cluster_id, count(*) AS cluster_sz
         |  FROM cc GROUP BY cluster_id)
         |SELECT cc.id AS media_id, cc.cluster_id, csz.cluster_sz
         |FROM cc JOIN csz USING (cluster_id)""".stripMargin
  )
}
