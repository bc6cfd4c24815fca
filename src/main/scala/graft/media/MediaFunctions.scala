package graft.media

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition — the shape a training-data pipeline
  * uses for image/audio/video columns at 100 TB.
  *
  * The decode bodies are STUBS — this environment ships no image/audio
  * codecs, so `decodeFrames`/`sampleFrames` compute a deterministic fake
  * (hash-derived dimensions) where a real deployment would call the codec.
  * Everything AROUND the stub is real and tested (MediaSpec): the typed
  * record/row schemas, the `mapPartitions` batch iteration (one codec
  * context per partition, not per row — the pattern that amortizes
  * expensive decoder init), partition-count preservation, and determinism.
  * Swapping in a real codec changes only the marked lines.
  *
  * mapPartitions is SURVEY §2 policy case (d): genuine per-partition
  * imperative logic (a codec loop with per-partition init) that neither
  * built-ins nor a scalar Expression express.
  */
object MediaFunctions {

  /** A multimodal record: opaque payload + source-side metadata. */
  case class MediaRecord(id: Long, payload: Array[Byte], format: String)

  /** Decoded per-item features (dimensions, derived stats, content hash). */
  case class DecodedFrame(id: Long, width: Int, height: Int, n_pixels: Long, checksum: Long)

  /** Sampled "frames" of a pretend video payload. */
  case class SampledFrame(id: Long, frame_idx: Int, offset: Long, frame_checksum: Long)

  /** Per-payload feature vector (16-bin high-nibble byte histogram). */
  case class FeatureVector(id: Long, n_bytes: Long, hist: Array[Long])

  private def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = math.max(from, 0)
    val end = math.min(until, bytes.length)
    while (i < end) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Decode payloads to per-item features. One "codec context" per
    * partition (the `it =>` scope), streamed row-by-row — no partition-wide
    * materialization, so executor memory is bounded by one payload.
    */
  def decodeFrames(records: Dataset[MediaRecord]): Dataset[DecodedFrame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real pipeline: codec init here, once per partition
      it.map { r =>
        val h = fnv64(r.payload, 0, r.payload.length)
        // STUB decode: dimensions derived from the content hash — a real
        // codec would parse the payload header instead (only these 2 lines
        // change).
        val width = 16 + ((h & 0xff).toInt)
        val height = 16 + (((h >> 8) & 0xff).toInt)
        DecodedFrame(r.id, width, height, width.toLong * height, h)
      }
    }
  }

  /** "Resize": stride-subsample the payload bytes to a bounded-size
    * thumbnail payload (cap bytes, keep every ceil(len/cap)-th byte) — the
    * downsample-before-shuffle step an image pipeline runs so the network
    * moves thumbnails, not originals. Output size ≤ cap regardless of
    * input size, which is the property that bounds shuffle volume at
    * 100 TB. The byte-level subsample is the STUB for a real resampling
    * kernel; the record plumbing, size bound, and determinism are real
    * (MediaSpec).
    */
  def resizePayloads(records: Dataset[MediaRecord], cap: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    require(cap > 0)
    records.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        if (n <= cap) r
        else {
          val stride = (n + cap - 1) / cap
          val out = new Array[Byte]((n + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = r.payload(i * stride); i += 1 }
          MediaRecord(r.id, out, r.format)
        }
      }
    }
  }

  /** Perceptual fingerprint (id, ahash). */
  case class PerceptualHash(id: Long, ahash: Long)

  /** Average-hash (aHash) perceptual fingerprint: bit j is set iff
    * "pixel" j is strictly brighter than the item's mean. The real
    * algorithm runs on an 8×8 grayscale downsample; here the pixels are
    * the first `bits` bytes of the (already resize-bounded) payload — the
    * STUB stands in for the decode+downsample, while the mean-threshold
    * bit derivation, the integer-exact determinism (`byte·n > Σbytes`,
    * no float mean), and the fixed-width mergeable output are the real
    * contract. 60 bits so 4×15-bit banding (q26's constants) applies
    * downstream with sign-free shifts in both engines.
    */
  def aHashes(records: Dataset[MediaRecord], bits: Int = 60): Dataset[PerceptualHash] = {
    import records.sparkSession.implicits._
    require(bits >= 1 && bits <= 60, s"bits must be in [1,60]: $bits")
    records.mapPartitions { it =>
      // real pipeline: decoder/downsampler init here, once per partition
      it.map { r =>
        val n = math.min(r.payload.length, bits)
        var sum = 0L
        var i = 0
        while (i < n) { sum += (r.payload(i) & 0xffL); i += 1 }
        var h = 0L
        i = 0
        while (i < n) {
          if ((r.payload(i) & 0xffL) * n > sum) h |= 1L << i
          i += 1
        }
        PerceptualHash(r.id, h)
      }
    }
  }

  /** Feature extraction over opaque payloads: one fixed-width vector per
    * item — the embed-the-modality step between decode and the vector tier.
    * The feature here is a 16-bin byte histogram (high nibble), a REAL
    * feature (format sniffing uses exactly this) that doubles as the
    * deterministic stand-in for a learned encoder: a real pipeline loads
    * the encoder in the per-partition init and replaces the histogram loop
    * with a forward pass; the record plumbing, batch iteration, and
    * fixed-width output contract are what this function pins down.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[FeatureVector] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real pipeline: encoder/model init here, once per partition
      it.map { r =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.payload.length) { hist((r.payload(i) & 0xff) >> 4) += 1; i += 1 }
        FeatureVector(r.id, r.payload.length.toLong, hist)
      }
    }
  }

  /** Sample every `stride`-th fixed-size block of the payload as a "frame"
    * — the frame-sampling access pattern (seek + bounded read per sample)
    * over an opaque video column.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[SampledFrame] = {
    import records.sparkSession.implicits._
    require(frameSize > 0 && stride > 0)
    records.flatMap { r =>
      val nFrames = math.max(r.payload.length / (frameSize * stride), 0)
      (0 until nFrames).map { i =>
        val off = i.toLong * frameSize * stride
        // STUB frame decode: checksum of the sampled block
        SampledFrame(r.id, i, off, fnv64(r.payload, off.toInt, off.toInt + frameSize))
      }
    }
  }
}
