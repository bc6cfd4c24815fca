package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit
import graft.media.MediaFunctions
import graft.media.MediaFunctions.MediaRecord

/** The multimodal plumbing around the stubbed decode: typed schemas,
  * per-partition batch iteration, partition preservation, determinism —
  * everything that stays when a real codec replaces the stub.
  */
class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def records() = {
    import spark.implicits._
    Tables.documents(spark, sf)
      .selectExpr("doc_id as id", "cast(text as binary) as payload", "'text/plain' as format")
      .as[MediaRecord]
  }

  test("decodeFrames: one output per record, stable schema, deterministic") {
    val recs = records()
    val d1 = MediaFunctions.decodeFrames(recs)
    assert(d1.count() == recs.count())
    assert(d1.schema.fieldNames.toSeq ==
      Seq("id", "width", "height", "n_pixels", "checksum"))
    val a = d1.collect().sortBy(_.id).map(_.checksum).toSeq
    val b = MediaFunctions.decodeFrames(recs).collect().sortBy(_.id).map(_.checksum).toSeq
    assert(a == b)
    assert(d1.collect().forall(f => f.n_pixels == f.width.toLong * f.height))
  }

  test("decodeFrames: narrow transformation — partitioning preserved, no added shuffle") {
    def exchanges(plan: String): Int = "Exchange".r.findAllIn(plan).length
    val recs = records().repartition(6)
    val decoded = MediaFunctions.decodeFrames(recs)
    assert(decoded.rdd.getNumPartitions == 6)
    // the only Exchange is the repartition(6) above — decode adds none
    assert(exchanges(decoded.queryExecution.executedPlan.toString) ==
      exchanges(recs.queryExecution.executedPlan.toString))
  }

  test("resizePayloads: size bounded by cap, small payloads untouched, deterministic") {
    val recs = records()
    val cap = 64
    val resized = MediaFunctions.resizePayloads(recs, cap).collect()
    val orig = recs.collect().map(r => r.id -> r.payload).toMap
    assert(resized.length == orig.size)
    resized.foreach { r =>
      assert(r.payload.length <= cap, s"id=${r.id} len=${r.payload.length}")
      if (orig(r.id).length <= cap)
        assert(r.payload.sameElements(orig(r.id)), s"small payload ${r.id} must pass through")
      else {
        // subsample keeps bytes at stride positions, starting at 0
        val stride = (orig(r.id).length + cap - 1) / cap
        assert(r.payload(0) == orig(r.id)(0))
        assert(r.payload(1) == orig(r.id)(stride))
      }
    }
    val again = MediaFunctions.resizePayloads(recs, cap).collect()
      .sortBy(_.id).map(_.payload.toSeq).toSeq
    assert(again == resized.sortBy(_.id).map(_.payload.toSeq).toSeq)
  }

  test("sampleFrames: offsets stride correctly and stay in payload bounds") {
    import spark.implicits._
    val sampled = MediaFunctions.sampleFrames(records(), frameSize = 16, stride = 4)
    val byId = sampled.collect().groupBy(_.id)
    assert(byId.nonEmpty)
    val lens = records().collect().map(r => r.id -> r.payload.length).toMap
    byId.foreach { case (id, frames) =>
      val idxs = frames.map(_.frame_idx).sorted
      assert(idxs.toSeq == (0 until frames.length).toSeq)
      frames.foreach { f =>
        assert(f.offset == f.frame_idx.toLong * 16 * 4)
        assert(f.offset + 16 <= lens(id))
      }
    }
  }

  test("extractFeatures: fixed-width vectors whose mass equals the payload size") {
    val feats = MediaFunctions.extractFeatures(records()).collect()
    val lens = records().collect().map(r => r.id -> r.payload.length.toLong).toMap
    assert(feats.length == lens.size)
    feats.foreach { f =>
      assert(f.hist.length == 16)           // fixed-width output contract
      assert(f.hist.sum == f.n_bytes)       // every byte lands in one bin
      assert(f.n_bytes == lens(f.id))
      assert(f.hist.forall(_ >= 0))
    }
    // deterministic across runs
    val again = MediaFunctions.extractFeatures(records()).collect()
      .sortBy(_.id).map(_.hist.toSeq).toSeq
    assert(again == feats.sortBy(_.id).map(_.hist.toSeq).toSeq)
  }

  test("aHash: values stay in 60-bit range and exact duplicates collide") {
    val hs = MediaFunctions.aHashes(records()).collect().map(h => h.id -> h.ahash).toMap
    assert(hs.values.forall(h => h >= 0 && h < (1L << 60)))
    // identical payloads must produce identical fingerprints
    val texts = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    for ((a, ta) <- texts; (b, tb) <- texts if a < b && ta == tb)
      assert(hs(a) == hs(b), s"exact dup $a/$b must collide")
  }

  test("q147 banding finds every pair all-pairs Hamming finds (recall 1 at <= 3)") {
    import spark.implicits._
    val got = graft.media.MediaQueries.q147ImageNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = MediaFunctions.aHashes(
      MediaFunctions.resizePayloads(
        Tables.documents(spark, sf).select($"doc_id".as("id"),
          $"text".cast("binary").as("payload"), lit("fake").as("format"))
          .as[MediaFunctions.MediaRecord], cap = 64)).collect()
    val want = (for {
      a <- hs; b <- hs if a.id < b.id
      d = java.lang.Long.bitCount(a.ahash ^ b.ahash) if d <= 3
    } yield (a.id, b.id, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty, "test corpus must contain at least one near-dup pair")
  }

  // ---- the REAL codec (round 14): PPM/BMP parse, encode, resize --------

  /** Deterministic raster for codec tests: pixel p channel values spread
    * across the byte range so luma buckets vary.
    */
  private def raster(w: Int, h: Int, seed: Int = 0): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    (0 until w * h).foreach { p =>
      rgb(3 * p) = ((seed + p * 7) % 256).toByte
      rgb(3 * p + 1) = ((seed + p * 13 + 91) % 256).toByte
      rgb(3 * p + 2) = ((seed + p * 29 + 180) % 256).toByte
    }
    rgb
  }

  test("codec: PPM and BMP encode→decode round-trips every pixel, at every padding width") {
    // widths 1..8 cover all 4 BMP row-padding classes (w*3 mod 4)
    for (w <- 1 to 8; h <- Seq(1, 3, 5)) {
      val rgb = raster(w, h, seed = w * 31 + h)
      val viaPpm = MediaFunctions.decodeImage(MediaFunctions.encodePpm(w, h, rgb))
      val viaBmp = MediaFunctions.decodeImage(MediaFunctions.encodeBmp(w, h, rgb))
      assert(viaPpm.exists(i => i.width == w && i.height == h && i.rgb.sameElements(rgb)),
        s"PPM round-trip broke at ${w}x$h")
      assert(viaBmp.exists(i => i.width == w && i.height == h && i.rgb.sameElements(rgb)),
        s"BMP round-trip broke at ${w}x$h (padding ${(4 - (w * 3) % 4) % 4})")
    }
  }

  test("codec: PPM header grammar — comments, multi-whitespace, and rejection of malformed variants") {
    val rgb = raster(3, 2)
    // hand-built header with comments and mixed whitespace — valid P6
    val commented = ("P6\n# a comment\n3   # trailing\n\t2\r\n255\n".getBytes("US-ASCII")
      ++ rgb)
    val dec = MediaFunctions.decodeImage(commented)
    assert(dec.exists(i => i.width == 3 && i.height == 2 && i.rgb.sameElements(rgb)))
    // rejected: 2-byte samples, truncated raster, zero dims, wrong magic
    assert(MediaFunctions.decodeImage("P6\n3 2\n65535\n".getBytes ++ rgb).isEmpty)
    assert(MediaFunctions.decodeImage(
      MediaFunctions.encodePpm(3, 2, rgb).dropRight(1)).isEmpty)
    assert(MediaFunctions.decodeImage("P6\n0 2\n255\n".getBytes ++ rgb).isEmpty)
    assert(MediaFunctions.decodeImage("P5\n3 2\n255\n".getBytes ++ rgb).isEmpty)
  }

  test("codec: top-down BMP (negative height) decodes to the same raster as bottom-up") {
    val w = 5; val h = 4
    val rgb = raster(w, h, seed = 7)
    val bottomUp = MediaFunctions.encodeBmp(w, h, rgb)
    // flip to the top-down variant: height := -h, rows already in file
    // order for bottom-up, so ALSO reverse the row order in the raster
    val topDown = bottomUp.clone()
    val negH = -h
    topDown(22) = negH.toByte; topDown(23) = (negH >> 8).toByte
    topDown(24) = (negH >> 16).toByte; topDown(25) = (negH >> 24).toByte
    val rowSize = ((w * 3 + 3) / 4) * 4
    (0 until h).foreach { y =>
      System.arraycopy(bottomUp, 54 + (h - 1 - y) * rowSize, topDown, 54 + y * rowSize, rowSize)
    }
    val a = MediaFunctions.decodeImage(bottomUp).get
    val b = MediaFunctions.decodeImage(topDown).get
    assert(a.rgb.sameElements(b.rgb) && b.rgb.sameElements(rgb))
  }

  test("decodeFrames: declared images decode for real; corrupt ones quarantine with width 0") {
    import spark.implicits._
    val rgb = raster(4, 3)
    val recs = Seq(
      MediaRecord(1L, MediaFunctions.encodePpm(4, 3, rgb), "ppm"),
      MediaRecord(2L, MediaFunctions.encodeBmp(4, 3, rgb), "bmp"),
      MediaRecord(3L, Array[Byte]('P', '6', ' ', 'x'), "ppm"), // corrupt
      MediaRecord(4L, "P6\n9 9\n255\nshort".getBytes, "image") // truncated
    ).toDS()
    val out = MediaFunctions.decodeFrames(recs).collect().map(f => f.id -> f).toMap
    assert(out(1L).width == 4 && out(1L).height == 3 && out(1L).n_pixels == 12)
    // container invariance: same pixels, same checksum from either format
    assert(out(1L).checksum == out(2L).checksum)
    assert(out(3L).width == 0 && out(3L).n_pixels == 0, "corrupt image must quarantine")
    assert(out(4L).width == 0, "truncated raster must quarantine")
  }

  test("resizeImages: pixel budget enforced, nearest-neighbor samples exact, non-images untouched") {
    import spark.implicits._
    val w = 16; val h = 9
    val rgb = raster(w, h, seed = 3)
    val recs = Seq(
      MediaRecord(1L, MediaFunctions.encodeBmp(w, h, rgb), "bmp"),
      MediaRecord(2L, MediaFunctions.encodePpm(4, 3, raster(4, 3)), "ppm"), // within budget
      MediaRecord(3L, "not an image at all".getBytes, "text/plain")
    ).toDS()
    val out = MediaFunctions.resizeImages(recs, maxPixels = 24)
      .collect().map(r => r.id -> r).toMap
    val big = MediaFunctions.decodeImage(out(1L).payload).get
    // k = 3 is the smallest k with ceil(16/k)*ceil(9/k) <= 24
    assert(big.width == 6 && big.height == 3)
    (0 until big.height).foreach { y =>
      (0 until big.width).foreach { x =>
        val d = 3 * (y * big.width + x)
        val s = 3 * (y * 3 * w + x * 3)
        assert(big.rgb(d) == rgb(s) && big.rgb(d + 1) == rgb(s + 1) && big.rgb(d + 2) == rgb(s + 2),
          s"thumb pixel ($x,$y) is not the nearest sample")
      }
    }
    // within budget: transcoded to PPM, pixels untouched
    val small = MediaFunctions.decodeImage(out(2L).payload).get
    assert(out(2L).format == "ppm" && small.width == 4 && small.rgb.sameElements(raster(4, 3)))
    // non-image: byte-identical passthrough
    assert(out(3L).payload.sameElements("not an image at all".getBytes))
  }

  test("codec: WAV PCM16 encode→decode round-trips samples, mono and stereo") {
    val mono = Array.tabulate(97)(i => (i * 131 % 4001) - 2000)
    val m = MediaFunctions.decodeWav(MediaFunctions.encodeWavPcm16(1, 8000, mono)).get
    assert(m.channels == 1 && m.sampleRate == 8000 && m.samples.sameElements(mono))
    val stereo = Array.tabulate(60)(i => (i * 977 % 65536) - 32768)
    val st = MediaFunctions.decodeWav(MediaFunctions.encodeWavPcm16(2, 44100, stereo)).get
    assert(st.channels == 2 && st.framesPerChannel == 30 && st.samples.sameElements(stereo))
    // extreme values survive the sign extension
    val edges = Array(Short.MinValue.toInt, -1, 0, 1, Short.MaxValue.toInt, 0)
    val e = MediaFunctions.decodeWav(MediaFunctions.encodeWavPcm16(2, 8000, edges)).get
    assert(e.samples.sameElements(edges))
  }

  test("codec: WAV chunk walk skips foreign chunks (odd sizes padded) and rejects malformed files") {
    val samples = Array.tabulate(10)(i => i * 100 - 500)
    val plain = MediaFunctions.encodeWavPcm16(1, 8000, samples)
    // splice a 5-byte LIST chunk (odd size → 1 pad byte) before fmt/data
    val foreign = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes ++ Array[Byte](0)
    val spliced = plain.take(12) ++ foreign ++ plain.drop(12)
    // RIFF size field is not re-checked by the parser; splice as-is
    val dec = MediaFunctions.decodeWav(spliced)
    assert(dec.exists(_.samples.sameElements(samples)), "foreign chunk broke the walk")
    // rejections: wrong magic, truncated data chunk, non-PCM format code
    assert(MediaFunctions.decodeWav("RIFFxxxxWAVX".getBytes).isEmpty)
    assert(MediaFunctions.decodeWav(plain.dropRight(3)).isEmpty)
    val nonPcm = plain.clone(); nonPcm(20) = 3 // IEEE float
    assert(MediaFunctions.decodeWav(nonPcm).isEmpty)
  }

  test("decodeAudioClips + audioFrameEnergy: stats are integer-exact and stereo de-interleaves") {
    import spark.implicits._
    val mono = Array(3, -4, 0, 5, -5, 2, 1, -1)
    val stereo = Array(10, -99, 20, -99, 30, -99, 40, -99) // ch0 = 10,20,30,40
    val recs = Seq(
      MediaRecord(1L, MediaFunctions.encodeWavPcm16(1, 1000, mono), "wav"),
      MediaRecord(2L, MediaFunctions.encodeWavPcm16(2, 8000, stereo), "wav"),
      MediaRecord(3L, "nonsense".getBytes, "wav") // corrupt
    ).toDS()
    val stats = MediaFunctions.decodeAudioClips(recs).collect().map(a => a.id -> a).toMap
    assert(stats(1L).n_frames == 8 && stats(1L).duration_ms == 8 && stats(1L).peak == 5)
    assert(stats(1L).sum_sq == mono.map(s => s.toLong * s).sum)
    assert(stats(2L).channels == 2 && stats(2L).n_frames == 4)
    assert(stats(3L).channels == 0 && stats(3L).n_frames == 0, "corrupt must quarantine")
    val frames = MediaFunctions.audioFrameEnergy(recs, frameSize = 2)
      .collect().map(f => (f.id, f.frame_idx) -> f).toMap
    // stereo channel 0 only: frames (10,20) and (30,40)
    assert(frames((2L, 0)).energy == 100 + 400 && frames((2L, 0)).peak == 20)
    assert(frames((2L, 1)).energy == 900 + 1600 && frames((2L, 1)).peak == 40)
    // mono: 4 complete frames; corrupt contributes none
    assert(frames.keys.count(_._1 == 1L) == 4 && !frames.keys.exists(_._1 == 3L))
  }

  test("codec: AVI encode→decode round-trips every frame at every padding width; foreign chunks skipped") {
    for (w <- Seq(3, 4, 5, 6); h <- Seq(2, 3)) {
      val frames = (0 until 3).map(t => raster(w, h, seed = t * 17 + w))
      val avi = MediaFunctions.encodeAvi(w, h, 40000, frames)
      val dec = MediaFunctions.decodeAvi(avi).getOrElse(fail(s"decode failed at ${w}x$h"))
      assert(dec.width == w && dec.height == h && dec.usecPerFrame == 40000)
      assert(dec.frames.size == 3)
      frames.indices.foreach(t => assert(dec.frames(t).sameElements(frames(t)),
        s"frame $t broke at ${w}x$h (padding ${(4 - (w * 3) % 4) % 4})"))
    }
    // splice a JUNK chunk (odd size, padded) between hdrl and movi —
    // every real muxer emits alignment junk; the walker must skip it
    val avi = MediaFunctions.encodeAvi(4, 3, 40000, Seq(raster(4, 3)))
    val hdrlEnd = 12 + 8 + 192 // RIFF hdr + LIST hdrl chunk
    val junk = "JUNK".getBytes ++ Array[Byte](3, 0, 0, 0) ++ "xyz".getBytes ++ Array[Byte](0)
    val spliced = avi.take(hdrlEnd) ++ junk ++ avi.drop(hdrlEnd)
    val dec = MediaFunctions.decodeAvi(spliced)
    assert(dec.exists(_.frames.size == 1), "JUNK chunk broke the walk")
    // rejections: wrong form type, truncated frame data
    assert(MediaFunctions.decodeAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(MediaFunctions.decodeAvi(avi.dropRight(5)).isEmpty)
  }

  test("compressed/foreign payloads quarantine, never a wrong answer (VERDICT r14 #5)") {
    // the most common REAL inputs are the ones these codecs don't parse:
    // compressed containers. Each must hit the quarantine path (None →
    // width-0/channels-0 rows) — never a partial decode, never a throw.
    // JPEG and PNG magic bytes declared as image formats
    assert(MediaFunctions.decodeImage(media.MediaQueries.jpegMagicBytes(7L)).isEmpty,
      "JPEG bytes must not parse as PPM/BMP")
    assert(MediaFunctions.decodeImage(media.MediaQueries.pngMagicBytes(7L)).isEmpty,
      "PNG bytes must not parse as PPM/BMP")
    // WAV whose fmt tag says IEEE float (3), not PCM (1)
    assert(MediaFunctions.decodeWav(media.MediaQueries.floatWavBytes(7L)).isEmpty,
      "non-PCM WAV must quarantine")
    // AVI with a compressed '00dc' frame chunk: decoding "around" it
    // would silently drop frames — the whole clip must quarantine
    assert(MediaFunctions.decodeAvi(media.MediaQueries.compressedAviBytes(7L)).isEmpty,
      "compressed AVI frame must quarantine the clip")
    // an unknown LIST inside movi could hide frames — loud, not lossy
    val base = MediaFunctions.encodeAvi(4, 3, 40000, Seq(raster(4, 3)))
    def patchLe32(b: Array[Byte], off: Int, delta: Int): Unit = {
      val v = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      val n = v + delta
      b(off) = n.toByte; b(off + 1) = (n >> 8).toByte
      b(off + 2) = (n >> 16).toByte; b(off + 3) = (n >> 24).toByte
    }
    def wrapMoviIn(listType: String): Array[Byte] = {
      val moviTag = base.indexOfSlice("movi".getBytes("US-ASCII"))
      val framesStart = moviTag + 4
      val framesLen = base.length - framesStart
      val out = new Array[Byte](base.length + 12)
      System.arraycopy(base, 0, out, 0, framesStart)
      "LIST".getBytes("US-ASCII").copyToArray(out, framesStart)
      out(framesStart + 4) = (4 + framesLen).toByte
      out(framesStart + 5) = ((4 + framesLen) >> 8).toByte
      out(framesStart + 6) = ((4 + framesLen) >> 16).toByte
      out(framesStart + 7) = ((4 + framesLen) >> 24).toByte
      listType.getBytes("US-ASCII").copyToArray(out, framesStart + 8)
      System.arraycopy(base, framesStart, out, framesStart + 12, framesLen)
      patchLe32(out, 4, 12)           // RIFF size
      patchLe32(out, moviTag - 4, 12) // LIST movi size
      out
    }
    assert(MediaFunctions.decodeAvi(wrapMoviIn("wtf ")).isEmpty,
      "unknown LIST inside movi must quarantine, not skip frames")
    // 'rec ' LISTs are how real muxers group frames inside movi
    // (ADVICE r14): the walker must recurse and lose NOTHING
    val recWrapped = MediaFunctions.decodeAvi(wrapMoviIn("rec "))
      .getOrElse(fail("'rec '-wrapped frames failed to decode"))
    val plain = MediaFunctions.decodeAvi(base).get
    assert(recWrapped.frames.size == plain.frames.size &&
      recWrapped.frames.head.sameElements(plain.frames.head),
      "'rec ' wrapping changed the decoded frames")
    // adversarial avih dims: width·height overflows Int — must
    // quarantine by the Long-checked pixel cap, not by wrap-around luck
    val bomb = MediaFunctions.encodeAvi(4, 3, 40000, Seq(raster(4, 3)))
    val avihAt = bomb.indexOfSlice("avih".getBytes("US-ASCII"))
    patchLe32(bomb, avihAt + 8 + 32, 65536 - 4) // width  = 65536
    patchLe32(bomb, avihAt + 8 + 36, 65536 - 3) // height = 65536
    assert(MediaFunctions.decodeAvi(bomb).isEmpty, "dimension bomb must quarantine")
  }

  test("decodeVideoMeta + sampleVideoFrames: real stats, stride sampling, quarantine") {
    import spark.implicits._
    val frames = (0 until 5).map(t => raster(4, 3, seed = t))
    val recs = Seq(
      MediaRecord(1L, MediaFunctions.encodeAvi(4, 3, 40000, frames), "avi"),
      MediaRecord(2L, "definitely not a video".getBytes, "video")
    ).toDS()
    val meta = MediaFunctions.decodeVideoMeta(recs).collect().map(v => v.id -> v).toMap
    assert(meta(1L).width == 4 && meta(1L).n_frames == 5 && meta(1L).usec_per_frame == 40000)
    assert(meta(2L).width == 0, "corrupt video must quarantine")
    val sampled = MediaFunctions.sampleVideoFrames(recs, stride = 2).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    // a sampled frame's checksum equals the whole-clip hash restricted to
    // that frame — recompute frame 2's luma FNV directly
    val rgb = frames(2)
    var want = 0xcbf29ce484222325L
    (0 until 12).foreach { p =>
      val l = MediaFunctions.luma601(rgb(3 * p) & 0xff, rgb(3 * p + 1) & 0xff, rgb(3 * p + 2) & 0xff)
      want = (want ^ l.toLong) * 0x100000001b3L
    }
    assert(sampled.find(_.frame_idx == 2).get.frame_checksum == want)
  }

  test("aHash: real-image path is container-invariant and flips with inverted brightness") {
    import spark.implicits._
    val rgb = raster(8, 8, seed = 11)
    val inv = rgb.map(b => (255 - (b & 0xff)).toByte)
    val recs = Seq(
      MediaRecord(1L, MediaFunctions.encodePpm(8, 8, rgb), "ppm"),
      MediaRecord(2L, MediaFunctions.encodeBmp(8, 8, rgb), "bmp"),
      MediaRecord(3L, MediaFunctions.encodePpm(8, 8, inv), "ppm"),
      MediaRecord(4L, Array[Byte]('B', 'M'), "bmp") // corrupt
    ).toDS()
    val hs = MediaFunctions.aHashes(recs).collect().map(h => h.id -> h.ahash).toMap
    assert(hs(1L) == hs(2L), "aHash must be container-invariant on real pixels")
    assert(hs(1L) != hs(3L), "inverting brightness must change the fingerprint")
    assert(hs(4L) == 0L, "corrupt declared image hashes to 0")
    assert(hs.values.forall(h => h >= 0 && h < (1L << 60)))
  }
}
