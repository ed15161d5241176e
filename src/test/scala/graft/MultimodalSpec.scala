package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, StubDecoder}

/** Binary-column (multimodal) operator semantics on crafted payloads
  * where the right answer is known by construction, and agreement
  * between the expression path (hex parsing) and the imperative decode
  * path (byte parsing).
  */
class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // doc_id 0 → PNG (w=16, h=16), 1 → RIFF, 2 → raw, 3 → PNG (w=19, h=37)
  private lazy val docs = Seq(
    (0L, "alpha beta"), (1L, "gamma"), (2L, "delta"), (3L, "epsilon"))
    .toDF("doc_id", "text")
  private lazy val media = Multimodal.fakeMedia(docs)

  test("fakeMedia: header + payload byte layout") {
    val row = media.filter(col("media_id") === 0)
      .select(col("bytes")).as[Array[Byte]].collect().head
    // real PNG IHDR layout: magic(8) + len(4) + 'IHDR'(4) + w(4) + h(4)
    assert(row.length === 24 + "alpha beta".length)
    assert((row(0) & 0xff) === 0x89 && row(1) === 'P'.toByte)
    assert(row.slice(12, 16) === "IHDR".getBytes("US-ASCII"))
    val raw = media.filter(col("media_id") === 2)
      .select(col("bytes")).as[Array[Byte]].collect().head
    assert(raw === "delta".getBytes("UTF-8"))
  }

  test("magicMime + byteSize + dimensions expressions") {
    val out = media.select(col("media_id"),
        Multimodal.magicMime(col("bytes")).as("mime"),
        Multimodal.byteSize(col("bytes")).as("n"),
        coalesce(Multimodal.pngWidth(col("bytes")), lit(-1L)).as("w"),
        coalesce(Multimodal.pngHeight(col("bytes")), lit(-1L)).as("h"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L)._1 === "image/png")
    assert(out(1L)._1 === "audio/x-riff")
    assert(out(2L)._1 === "application/octet-stream")
    assert(out(0L)._3 === 16L && out(0L)._4 === 16L) // 16 + 0 % 1024
    assert(out(3L)._3 === 19L && out(3L)._4 === 37L) // 16+3, 16+21
    assert(out(1L)._2 === 4 + "gamma".length)
  }

  test("fingerprint: distinct payloads, stable across recompute") {
    val fps = media.select(Multimodal.fingerprint(col("bytes")))
      .as[String].collect()
    assert(fps.distinct.length === 4)
    assert(fps.forall(_.matches("[0-9a-f]{64}")))
  }

  test("sampleFrames + resizeStub: deterministic shapes") {
    val ds = media.select(col("media_id"), col("bytes")).as[MediaRow]
    // media 0: 24-byte header + 10-byte payload = 34 bytes;
    // frameSize 8 → frames of 8,8,8,8,2; stride 2 keeps idx 0, 2, 4
    val frames = Multimodal.sampleFrames(ds, frameSize = 8, stride = 2)
      .filter(col("media_id") === 0).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(frames.map(_.frame_bytes.length).toSeq === Seq(8, 8, 2))
    // resize by 2 halves the byte count (rounding up)
    val resized = Multimodal.resizeStub(ds, factor = 2).collect()
      .map(m => m.media_id -> m.bytes.length).toMap
    val orig = ds.collect().map(m => m.media_id -> m.bytes.length).toMap
    orig.foreach { case (id, n) => assert(resized(id) === (n + 1) / 2) }
  }

  test("decodeAll: imperative decode agrees with expression parsing") {
    val ds = media.select(col("media_id"), col("bytes"))
      .as[MediaRow]
    val decoded = Multimodal.decodeAll(ds, StubDecoder)
      .collect().map(d => d.media_id -> d).toMap
    val expr = media.select(col("media_id"),
        Multimodal.magicMime(col("bytes")).as("mime"),
        Multimodal.byteSize(col("bytes")).as("n"),
        coalesce(Multimodal.pngWidth(col("bytes")), lit(-1L)).as("w"),
        coalesce(Multimodal.pngHeight(col("bytes")), lit(-1L)).as("h"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    expr.foreach { case (id, (mime, n, w, h)) =>
      val d = decoded(id)
      assert(d.mime === mime)
      assert(d.n_bytes === n)
      if (mime == "image/png") { assert(d.width === w && d.height === h) }
      assert(d.mean_byte > 0.0)
    }
  }

  test("aHash: identical payloads equal; unsampled-byte edits invisible; sampled edits local") {
    // length 600 ⇒ stride 10 ⇒ sampled 1-based positions 1, 11, 21, …
    // varied byte values: mean-relative bits need spread samples (a
    // uniform payload puts every sample AT the mean, where a one-byte
    // edit flips all 60 bits — the classic aHash degenerate case)
    val base = Array.tabulate(600)(i => ((i * 37) % 251).toByte)
    val editUnsampled = base.clone(); editUnsampled(5) = 'Z'.toByte  // pos 6
    val editSampled = base.clone(); editSampled(10) = 0.toByte      // pos 11
    val df = Seq(
      (1L, base), (2L, base.clone()),
      (3L, editUnsampled), (4L, editSampled)
    ).toDF("media_id", "bytes")
    val hashes = Multimodal.aHashed(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hashes(1L) === hashes(2L))           // deterministic
    assert(hashes(1L) === hashes(3L))           // stride skips the edit
    assert(hashes(1L) !== hashes(4L))           // a sampled byte changed…
    assert(hamming(hashes(1L), hashes(4L)) <= 8) // …but the damage is local
  }

  // ── decoder conformance suite ────────────────────────────────────────
  // The seam a REAL codec drops into: any MediaDecoder implementation
  // must pass these unchanged (operators never special-case a decoder).
  // Run against StubDecoder here; a libjpeg/ffmpeg-backed decoder would
  // add one `conformance("RealDecoder", RealDecoder)` line and nothing
  // else.

  private val pngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
    0x1a, 0x0a).map(_.toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  // real PNG IHDR layout: magic, chunk length 13, tag, width, height
  private def png(w: Long, h: Long, payload: Array[Byte]): Array[Byte] =
    pngMagic ++ be32(13L) ++ "IHDR".getBytes("US-ASCII") ++
      be32(w) ++ be32(h) ++ payload

  private def conformance(name: String,
                          d: Multimodal.MediaDecoder): Unit = {

    test(s"$name conformance: magic dispatch with parsed dimensions") {
      val img = d.decode(MediaRow(1L, png(640L, 480L, Array[Byte](1, 2, 3))))
      assert(img.mime.startsWith("image/"))
      assert(img.width === 640L && img.height === 480L)
      val riff = d.decode(MediaRow(2L,
        "RIFF1234WAVE".getBytes("UTF-8")))
      assert(!riff.mime.startsWith("image/"))
      val raw = d.decode(MediaRow(3L, Array[Byte](1, 2, 3, 4, 5)))
      assert(raw.mime === "application/octet-stream")
    }

    test(s"$name conformance: truncated header neither crashes nor invents dims") {
      // every prefix of a valid PNG, including cuts INSIDE the magic and
      // inside the dimension words — decode must return, and must not
      // report dimensions it could not have parsed
      val full = png(640L, 480L, Array[Byte](9, 9, 9))
      for (cut <- 0 until 24) {
        val out = d.decode(MediaRow(10L + cut, full.take(cut)))
        assert(out.n_bytes === cut)
        assert(out.width === 0L && out.height === 0L,
          s"dims invented from a $cut-byte prefix")
      }
    }

    test(s"$name conformance: empty payload is a clean zero row") {
      val out = d.decode(MediaRow(7L, Array.empty[Byte]))
      assert(out.media_id === 7L)
      assert(out.n_bytes === 0 && out.mean_byte === 0.0)
      assert(out.mime === "application/octet-stream")
    }

    test(s"$name conformance: deterministic and id-preserving") {
      val m = MediaRow(42L, png(8L, 8L, Array.tabulate(32)(_.toByte)))
      val a = d.decode(m)
      assert(a === d.decode(m))
      assert(a.media_id === 42L)
    }

    test(s"$name conformance: size guard rejects what a JVM array cannot hold") {
      d.checkDecodable(0L)
      d.checkDecodable(d.maxBytes)
      assert(d.maxBytes <= Int.MaxValue.toLong,
        "no single-call decoder can accept more than a JVM byte array")
      intercept[IllegalArgumentException](d.checkDecodable(d.maxBytes + 1))
      intercept[IllegalArgumentException](d.checkDecodable(-1L))
      intercept[IllegalArgumentException](
        d.checkDecodable(3L * 1024 * 1024 * 1024)) // the 3 GB "video"
    }

    test(s"$name conformance: distributed decodeAll preserves per-row results") {
      val rows = Seq(
        MediaRow(1L, png(4L, 2L, Array[Byte](5, 5))),
        MediaRow(2L, "RIFFxxxx".getBytes("UTF-8")),
        MediaRow(3L, Array.empty[Byte]))
      val dist = Multimodal.decodeAll(rows.toDS().repartition(3), d)
        .collect().map(x => x.media_id -> x).toMap
      rows.foreach(m => assert(dist(m.media_id) === d.decode(m)))
    }
  }

  conformance("StubDecoder", StubDecoder)
  conformance("ImageIoDecoder", Multimodal.ImageIoDecoder)

  // ── the REAL-codec proof ─────────────────────────────────────────────
  // Encode genuine images with the JDK's own ImageIO writers and decode
  // them back. The raster-decode proof rides the JPEG case: a JPEG has
  // no PNG magic, so the stub reports 0×0 and only a real raster decode
  // can produce 5×3. For PNG the stub's IHDR parse (offsets 16/20 —
  // the real layout, ADVICE r12) must now AGREE with the raster, which
  // is exactly what makes the bomb fallback report declared dims.
  private def encodeImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out),
      s"no ImageIO writer for $fmt")
    out.toByteArray
  }

  test("ImageIoDecoder: real PNG and JPEG bytes decode to raster dims") {
    for ((fmt, mime) <- Seq("png" -> "image/png", "jpg" -> "image/jpeg")) {
      val bytes = encodeImage(5, 3, fmt)
      val d = Multimodal.ImageIoDecoder.decode(MediaRow(1L, bytes))
      assert(d.mime === mime, s"$fmt mime")
      assert(d.width === 5L && d.height === 3L,
        s"$fmt dims from raster, got ${d.width}x${d.height}")
      val s = StubDecoder.decode(MediaRow(1L, bytes))
      if (fmt == "png")
        // the stub's IHDR parse reads a REAL file's declared dims —
        // the guarantee the bomb fallback depends on
        assert(s.width === 5L && s.height === 3L,
          s"stub IHDR parse on a real PNG, got ${s.width}x${s.height}")
      else
        // …while the JPEG result can only have come from the raster
        assert(s.width === 0L && s.height === 0L,
          "stub parsed dims from a JPEG — raster proof degenerate")
    }
  }

  test("ImageIoDecoder: distributed decodeAll over a mixed real/synthetic " +
    "batch") {
    val rows = Seq(
      MediaRow(1L, encodeImage(8, 2, "png")),   // real codec path
      MediaRow(2L, png(640L, 480L, Array[Byte](1))), // synthetic fallback
      MediaRow(3L, "RIFF1234WAVE".getBytes("UTF-8")))
    val got = Multimodal.decodeAll(rows.toDS().repartition(2),
      Multimodal.ImageIoDecoder).collect().map(x => x.media_id -> x).toMap
    assert(got(1L).width === 8L && got(1L).height === 2L)
    assert(got(2L).width === 640L && got(2L).height === 480L)
    assert(got(3L).mime === "audio/x-riff")
  }

  test("ImageIoDecoder: decompression bomb (tiny payload, huge declared " +
    "dims) falls back without decoding") {
    // A real 5×3 PNG whose IHDR width/height are patched to 65536×65536
    // (2^32 px ≫ maxPixels) with the chunk CRC re-computed: ImageIO's
    // header parse reports the declared dims, and an unguarded read(0)
    // would size its frame buffer from them — the classic bomb. The
    // guard must reject on the header alone and fall back to the stub.
    val bytes = encodeImage(5, 3, "png")
    def putBE(off: Int, v: Long): Unit = {
      bytes(off) = ((v >>> 24) & 0xff).toByte
      bytes(off + 1) = ((v >>> 16) & 0xff).toByte
      bytes(off + 2) = ((v >>> 8) & 0xff).toByte
      bytes(off + 3) = (v & 0xff).toByte
    }
    putBE(16, 65536L) // IHDR width
    putBE(20, 65536L) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 12, 4 + 13) // chunk type + IHDR data
    putBE(12 + 4 + 13, crc.getValue)
    assert(65536L * 65536L > Multimodal.ImageIoDecoder.maxPixels)
    val d = Multimodal.ImageIoDecoder.decode(MediaRow(9L, bytes))
    assert(d === StubDecoder.decode(MediaRow(9L, bytes)),
      "bomb must take the stub fallback, not a raster decode")
    // and the fallback reports the DECLARED dims (the bomb's own lie),
    // not IHDR framing words — ADVICE r12
    assert(d.width === 65536L && d.height === 65536L)
  }

  test("StubDecoder: mime sniffs on the 8-byte magic alone — a short " +
    "PNG-magic payload agrees with magicMime (ADVICE r13)") {
    // 10-byte payload: PNG magic + 2 trailing bytes — too short for the
    // IHDR dim parse, but BOTH mime surfaces must still say image/png
    val short = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x01).map(_.toByte)
    val d = StubDecoder.decode(MediaRow(5L, short))
    assert(d.mime === "image/png", "stub mime must match the magic sniff")
    assert(d.width === 0L && d.height === 0L,
      "dims unparseable below 24 bytes → 0x0")
    val viaCatalog = Seq((5L, short)).toDF("media_id", "bytes")
      .select(Multimodal.magicMime(col("bytes")).as("mime"))
      .as[String].head()
    assert(viaCatalog === d.mime, "the two mime surfaces must agree")
  }

  test("decoder mean_byte stays exact past the Int-sum overflow point") {
    // 16 MB of 0xff sums to 4.08e9 > Int.MaxValue: an Int accumulator
    // wraps negative; the Long path must return exactly 255.0.
    val big = Array.fill[Byte](16 * 1024 * 1024)(0xff.toByte)
    assert(StubDecoder.decode(MediaRow(7L, big)).mean_byte === 255.0)
    assert(Multimodal.ImageIoDecoder.decode(MediaRow(7L, big))
      .mean_byte === 255.0)
  }

  test("byteStats: uniform, varied, and empty payloads") {
    // raw-wrapped docs (id % 3 == 2): payload is exactly the text bytes
    val corpus = Seq(
      (2L, "aaaaaaaaaaaaaaaa"),  // uniform byte content
      (5L, "abcdefghijklmnop"),  // all-distinct bytes
      (8L, "")                   // empty payload
    ).toDF("doc_id", "text")
    val stats = Multimodal.byteStats(Multimodal.fakeMedia(corpus))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("n_bytes"), r.getAs[Long]("n_sampled"),
          r.getAs[Long]("n_distinct"), r.getAs[Long]("is_uniform"))))
      .toMap
    assert(stats(2L) === ((16L, 16L, 1L, 1L)))   // uniform flagged
    assert(stats(5L) === ((16L, 16L, 16L, 0L)))  // varied not flagged
    assert(stats(8L) === ((0L, 0L, 0L, 0L)))     // empty: no sample
  }

  test("q_media_frames gate: frame counts follow the closed form and " +
    "PNG header dims survive the per-frame decode") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Multimodal
      .queries("q_media_frames")(spark, dir)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    // n_frames = ceil(ceil(n_bytes / 64) / 2) per payload, exactly
    val sizes = graft.operators.Multimodal.fakeMedia(
        graft.Tables.load(spark, dir, "documents"))
      .select(col("media_id"), length(col("bytes")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes.foreach { case (id, n) =>
      val expect = ((n + 63) / 64 + 1) / 2
      if (n == 0) assert(!out.contains(id))
      else assert(out(id).getAs[Long]("n_frames") === expect,
        s"media $id: n=$n")
    }
    // PNG media (doc_id % 3 == 0, non-empty): exactly one PNG frame
    // (frame 0) whose decoded dims are the synthetic header's
    sizes.filter { case (id, n) => id % 3 == 0 && n > 0 }.keys
      .foreach { id =>
        val r = out(id)
        assert(r.getAs[Long]("n_png_frames") === 1L)
        assert(r.getAs[Long]("width") === 16 + id % 1024)
        assert(r.getAs[Long]("height") === 16 + (id * 7) % 1024)
      }
  }
}
