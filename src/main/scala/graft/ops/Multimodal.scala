package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch encode / decode / feature-extract
  * operators.
  *
  * The audio tier is a REAL pure-JVM codec (this container has no external
  * media libraries, so the format is the simplest real one): a WAV writer
  * producing a byte-exact RIFF/WAVE container around 8-bit unsigned mono
  * PCM, and a WAV reader that validates the magics, walks the chunk list,
  * reads the little-endian `fmt ` fields, and computes integer-exact PCM
  * statistics over the data chunk. The partition-batch shape (one codec
  * context per partition, rows streamed through `mapPartitions`) is exactly
  * how a native codec would be driven; swapping in e.g. a JPEG or FLAC
  * library changes only the two byte-level functions.
  *
  * Determinism: every feature is integer arithmetic (the mean is a
  * truncating micro-unit quotient — the repo-wide halfway-digit contract),
  * so a DuckDB oracle reproduces the whole decode bit-for-bit from the
  * source bytes.
  */
object Multimodal {

  /** Wrap a text corpus as binary assets: (id, content: binary, meta struct).
    * In production the binary column comes straight from parquet. */
  def asAssets(docs: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        length(col(payloadCol).cast("binary")).as("n_bytes"),
        lit(format).as("format"),
        md5(col(payloadCol).cast("binary")).as("content_fp")).as("meta"))

  // ------------------------------------------------------------ WAV codec

  val SampleRate = 8000

  /** Byte-exact WAV container (RIFF/WAVE, PCM format 1, mono, 8-bit
    * unsigned) around `samples`. 44-byte canonical header + data chunk. */
  def encodeWav8(samples: Array[Byte], sampleRate: Int = SampleRate): Array[Byte] = {
    val n = samples.length
    val bb = ByteBuffer.allocate(44 + n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + n).put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1)                       // audio format: PCM
      .putShort(1)                       // channels: mono
      .putInt(sampleRate)
      .putInt(sampleRate)                // byte rate = rate · block align (1)
      .putShort(1)                       // block align: 1 byte/frame
      .putShort(8)                       // bits per sample
    bb.put("data".getBytes(US_ASCII)).putInt(n).put(samples)
    bb.array()
  }

  /** Integer-exact PCM statistics of one decoded WAV asset. `meanMicro` is
    * the truncating micro-unit mean sample value; `energy` is the exact
    * centered second moment Σ(s−128)²; `zeroCross` counts sign changes of
    * the centered signal (strict <128 vs ≥128 flips between neighbors). */
  final case class WavStats(sampleRate: Int, nSamples: Long, peak: Int,
                            trough: Int, meanMicro: Long, energy: Long,
                            zeroCross: Long)

  /** Validated RIFF chunk walk shared by the decoders: locates `fmt ` and
    * `data`, enforces the PCM / mono / 8-bit contract, and returns
    * (sampleRate, dataOffset, dataLength). Anything else is a decode
    * error, as a real codec would report. */
  private def wavPcmRegion(bytes: Array[Byte]): (Int, Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(bytes, i, 4, US_ASCII)
    require(bytes.length >= 44, s"wav: truncated header (${bytes.length} bytes)")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "wav: bad RIFF/WAVE magic")
    var pos = 12
    var fmtCode, channels, bits, sampleRate = -1
    var dataOff = -1
    var dataLen = -1L
    while (pos + 8 <= bytes.length && (dataOff < 0 || fmtCode < 0)) {
      val id = tag(pos)
      val sz = le32(pos + 4)
      // a declared size that can't fit in the remaining bytes is a corrupt
      // container: fail fast. Unvalidated, a size >= 2^31 truncates negative
      // in the position bump below and the walk stops advancing (spin).
      require(sz <= bytes.length - pos - 8,
        s"wav: chunk '$id' size $sz overruns container (${bytes.length} bytes)")
      if (id == "fmt ") {
        require(sz >= 16, "wav: fmt chunk too short")
        fmtCode = le16(pos + 8)
        channels = le16(pos + 10)
        sampleRate = le32(pos + 12).toInt
        bits = le16(pos + 22)
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = sz
      }
      pos += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
    }
    require(fmtCode == 1 && channels == 1 && bits == 8,
      s"wav: unsupported format (fmt=$fmtCode ch=$channels bits=$bits); only PCM u8 mono")
    require(dataOff >= 0 && dataOff + dataLen <= bytes.length, "wav: bad data chunk")
    (sampleRate, dataOff, dataLen.toInt)
  }

  /** Real WAV reader: validates RIFF/WAVE magics, walks the (word-aligned)
    * chunk list for `fmt ` and `data`, reads the little-endian format
    * fields, and reduces the PCM samples in one pass. Only PCM / mono /
    * 8-bit payloads are accepted — anything else is a decode error, as a
    * real codec would report. */
  def decodeWav8(bytes: Array[Byte]): WavStats = {
    val (sampleRate, dataOff, dataLen) = wavPcmRegion(bytes)
    def u8(i: Int): Int = bytes(i) & 0xff
    var i = dataOff
    val end = dataOff + dataLen.toInt
    var peak = 0; var trough = 255
    var sum = 0L; var energy = 0L; var zc = 0L
    var prevBelow = false; var first = true
    while (i < end) {
      val s = u8(i)
      if (s > peak) peak = s
      if (s < trough) trough = s
      sum += s
      val c = s - 128L
      energy += c * c
      val below = s < 128
      if (!first && below != prevBelow) zc += 1
      prevBelow = below; first = false
      i += 1
    }
    // an empty data chunk is a VALID container (encodeWav8 of an empty
    // payload produces one): return zeroed stats rather than crash — the
    // degenerate-input twin of the oracle's no-row behavior for empty docs
    if (dataLen == 0L) WavStats(sampleRate, 0L, 0, 0, 0L, 0L, 0L)
    else WavStats(sampleRate, dataLen, peak, trough, sum * 1000000L / dataLen,
      energy, zc)
  }

  private val wavAssetSchema = new StructType()
    .add("asset_id", LongType).add("content", BinaryType, nullable = false)

  /** Encode each document's ASCII payload as a real WAV asset (the bytes
    * ARE the 8-bit PCM samples). Partition-batched: one encoder context per
    * partition, rows streamed through it — the shape a native codec needs. */
  def asWavAssets(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(wavAssetSchema)
    // empty payloads are dropped BEFORE encode — a per-char feature oracle
    // emits no row for an empty document, and a zero-sample asset carries
    // no signal; keeping the filter here (not in each query) makes every
    // consumer match that semantic
    docs.filter(length(col(payloadCol).cast("binary")) > 0)
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), encodeWav8(r.getAs[Array[Byte]](1))))
      }(enc)
  }

  private val wavFeatureSchema = new StructType()
    .add("asset_id", LongType).add("n_bytes", LongType)
    .add("sample_rate", IntegerType).add("n_samples", LongType)
    .add("peak", IntegerType).add("trough", IntegerType)
    .add("mean_micro", LongType).add("energy", LongType)
    .add("zero_cross", LongType)

  /** Partition-batched decode + feature extraction over WAV assets
    * (columns `asset_id`, `content`): header fields come from the REAL
    * chunk parse, statistics from one pass over the PCM data. */
  def extractWavFeatures(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(wavFeatureSchema)
    assets.select(col("asset_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val w = decodeWav8(bytes)
        Row(r.getLong(0), bytes.length.toLong, w.sampleRate, w.nSamples,
          w.peak, w.trough, w.meanMicro, w.energy, w.zeroCross)
      }
    }(enc)
  }

  /** Samples per fingerprint window and windows per fingerprint: the
    * anchor clip covers the first FpWindows·FpWindow = 256 samples. */
  val FpWindow = 4
  val FpWindows = 64

  /** 64-window audio energy fingerprint over a FIXED-DURATION anchor clip
    * (the first 256 samples): window `w` covers samples [w·4, w·4+4); bit
    * `w` is set iff that window's centered energy Σ(s−128)² exceeds its
    * equal share of the clip — the exact integer comparison
    * windowEnergy·64 > clipEnergy, the aHash trick applied to the time
    * axis. Fixed-duration windows (not length-proportional ones) are what
    * make the signature robust to edits past the clip: two tracks sharing
    * the anchor clip collapse to Hamming 0 regardless of how their tails
    * differ, while an equal-count grid would re-bin every window whenever
    * the total length changes (measured on the fixture: planted
    * shared-prefix pairs land at Hamming ≥ 11 under equal-count windows vs
    * 0 here, with the noise floor at 8). A localized in-clip edit perturbs
    * only the windows it touches; DC offset cancels under the centering.
    * Packed in the portable 4×16-bit chunk layout shared with
    * SimHash/aHash so [[graft.ops.Dedup.chunk4x16Pairs]] consumes it
    * unchanged. Assets shorter than the clip are dropped (same floor
    * discipline as [[ahashBits]]). */
  def audioFpBits(bytes: Array[Byte]): Option[(Long, Array[Long])] = {
    val (_, off, len) = wavPcmRegion(bytes)
    val clip = FpWindow * FpWindows
    if (len < clip) None
    else {
      val sums = new Array[Long](FpWindows)
      var p = 0
      while (p < clip) {
        val c = (bytes(off + p) & 0xff) - 128L
        sums(p / FpWindow) += c * c
        p += 1
      }
      var tot = 0L; var i = 0
      while (i < FpWindows) { tot += sums(i); i += 1 }
      val cs = new Array[Long](4)
      i = 0
      while (i < FpWindows) {
        if (sums(i) * FpWindows > tot) cs(i / 16) |= 1L << (i % 16)
        i += 1
      }
      Some((len.toLong, cs))
    }
  }

  private val audioFpSchema = new StructType()
    .add("asset_id", LongType).add("n_samples", LongType)
    .add("c0", LongType).add("c1", LongType)
    .add("c2", LongType).add("c3", LongType)

  /** Partition-batched decode + energy fingerprint over WAV assets: a pure
    * scan-side map — no shuffle; 4 longs per asset regardless of duration,
    * so the downstream dedup join moves ~32 bytes/asset at any scale. */
  def audioFpWavAssets(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFpSchema)
    assets.select(col("asset_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        audioFpBits(r.getAs[Array[Byte]](1)).map { case (n, cs) =>
          Row(r.getLong(0), n, cs(0), cs(1), cs(2), cs(3))
        }
      }
    }(enc)
  }

  /** Frame sampling for "video" payloads: every `stride`-th chunk of the
    * payload becomes a frame with a deterministic fingerprint. Pure column
    * expressions — the explode shape is exactly what a real frame sampler
    * produces. */
  def sampleFrames(assets: DataFrame, nFrames: Int): DataFrame =
    assets.select(col("asset_id"), col("meta.n_bytes").as("n_bytes"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .withColumn("frame_fp", md5(concat(col("asset_id").cast("string"),
        lit(":"), col("frame_idx").cast("string"))))

  // ------------------------------------------------------------ BMP codec

  /** Image tier: the same real-codec discipline as the WAV tier, for the
    * simplest real image container — Windows BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, 24-bit uncompressed, bottom-up rows padded to 4-byte
    * boundaries). Grayscale pixels are stored B=G=R; the decoder validates
    * the magic/format fields, honors the pixel-array offset from the file
    * header, un-reverses the bottom-up row order, and skips row padding —
    * all the things a naive "pixels start at byte 54 in reading order"
    * parser gets wrong. */
  val ImgWidth = 16

  /** Byte-exact 24-bit BMP around a row-major top-down grayscale pixel
    * array (`pixels(y*width + x)`). */
  def encodeBmp24(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bmp: bad dims ${width}x$height for ${pixels.length} pixels")
    val rowBytes = (width * 3 + 3) & ~3
    val imgSize = rowBytes * height
    val bb = ByteBuffer.allocate(54 + imgSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putShort(0).putShort(0)           // reserved
      .putInt(54)                        // pixel array offset
    bb.putInt(40)                        // BITMAPINFOHEADER size
      .putInt(width).putInt(height)      // positive height = bottom-up
      .putShort(1)                       // planes
      .putShort(24)                      // bits per pixel
      .putInt(0)                         // BI_RGB (uncompressed)
      .putInt(imgSize)
      .putInt(2835).putInt(2835)         // 72 DPI in pixels/metre
      .putInt(0).putInt(0)               // palette unused at 24bpp
    var y = height - 1
    while (y >= 0) {                     // rows bottom-up
      var x = 0
      while (x < width) {
        val v = pixels(y * width + x)
        bb.put(v).put(v).put(v)          // B, G, R
        x += 1
      }
      var p = width * 3
      while (p < rowBytes) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Real BMP reader: validates 'BM' + header fields (24bpp, BI_RGB,
    * bottom-up), then walks the padded bottom-up rows into a row-major
    * top-down grayscale array (red channel — the encoder writes B=G=R).
    * Returns (width, height, pixels). */
  def decodeBmp24(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    require(bytes.length >= 54, s"bmp: truncated header (${bytes.length} bytes)")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "bmp: bad magic")
    val pixOff = le32(10)
    require(le32(14) >= 40, "bmp: info header too short")
    val width = le32(18).toInt           // signed in the format; must be > 0
    val height = le32(22).toInt          // negative would mean top-down
    require(width > 0 && height > 0, s"bmp: unsupported dims ${width}x$height")
    require(le16(26) == 1 && le16(28) == 24 && le32(30) == 0,
      s"bmp: unsupported format (planes=${le16(26)} bpp=${le16(28)} comp=${le32(30)}); only 24bpp BI_RGB")
    val rowBytes = (width * 3 + 3) & ~3
    require(pixOff >= 54 && pixOff + rowBytes.toLong * height <= bytes.length,
      s"bmp: pixel array overruns container (${bytes.length} bytes)")
    val px = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val src = pixOff.toInt + (height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        px(y * width + x) = bytes(src + x * 3 + 2) // red channel
        x += 1
      }
      y += 1
    }
    (width, height, px)
  }

  /** Integer-exact statistics of one decoded image: extrema, truncating
    * micro-unit mean, centered second moment, and horizontal edge count
    * (row-wise neighbor pairs with |Δv| ≥ 32 — a real gradient feature that
    * only a correct row/padding walk computes right). */
  final case class BmpStats(width: Int, height: Int, nPx: Long, peak: Int,
                            trough: Int, meanMicro: Long, energy: Long,
                            hEdges: Long)

  def bmpStats(width: Int, height: Int, px: Array[Byte]): BmpStats = {
    var peak = 0; var trough = 255
    var sum = 0L; var energy = 0L; var edges = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = px(y * width + x) & 0xff
        if (v > peak) peak = v
        if (v < trough) trough = v
        sum += v
        val c = v - 128L
        energy += c * c
        if (x > 0) {
          val prev = px(y * width + x - 1) & 0xff
          if (math.abs(v - prev) >= 32) edges += 1
        }
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    BmpStats(width, height, n, peak, trough, sum * 1000000L / n, energy, edges)
  }

  private val bmpAssetSchema = new StructType()
    .add("asset_id", LongType).add("content", BinaryType, nullable = false)

  /** Encode each document's ASCII payload as a real BMP asset: the bytes
    * become row-major grayscale pixels of a `width`-wide image (trailing
    * partial row truncated; docs shorter than one row dropped — the oracle
    * computes the same truncation from `length(text)`). Partition-batched
    * like the WAV path. */
  def asBmpAssets(docs: DataFrame, idCol: String, payloadCol: String,
                  width: Int = ImgWidth): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(bmpAssetSchema)
    docs.filter(length(col(payloadCol).cast("binary")) >= width)
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val h = bytes.length / width
          Row(r.getLong(0), encodeBmp24(java.util.Arrays.copyOf(bytes, width * h), width, h))
        }
      }(enc)
  }

  /** Shot-boundary / keyframe detection — the video-tier consumer of the
    * aHash fingerprint: consecutive frames are perceptually compared and a
    * frame opens a new shot when its Hamming distance to the previous
    * frame's hash exceeds `threshold` (the classic histogram/hash-based
    * cut detector; frame 0 is a keyframe by definition).
    *
    * The fixture has no video column, so a deterministic frame sequence
    * is synthesized per document in both engines identically: frame 0 is
    * the text rendered as the standard 16-wide BMP, frame f applies a
    * single-letter `translate` remap with a +1..+5 code delta (a small
    * "lighting change" — measured 0–4 flipped hash bits between
    * consecutive frames at sf0.01), and docs with `doc_id % 3 = 0` carry
    * ONE planted hard cut (the reversed text; 18+ bits) at a
    * doc_id-derived frame — so both verdict branches are live with a
    * wide margin around the threshold.
    *
    * Scale shape: frames are a bounded explode (`nFrames` ≤ 8 rows/doc),
    * encode→decode→hash is the partition-batched map-only codec path, and
    * the lag window partitions by document with ≤ `nFrames` rows — never
    * a corpus-sized sort. Signatures are 4 longs/frame downstream. */
  def keyframes(docs: DataFrame, idCol: String, textCol: String,
                nFrames: Int = 6, threshold: Int = 10): DataFrame = {
    val sigs = frameSigs(docs, idCol, textCol, nFrames)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("frame_idx")
    sigs
      .withColumn("ham", coalesce(
        (0 to 3).map(c => bit_count(
          col(s"c$c").bitwiseXOR(lag(col(s"c$c"), 1).over(w)))).reduce(_ + _)
          .cast("long"),
        lit(-1L)))
      .select(col(idCol), col("frame_idx"), col("ham"),
        (col("frame_idx") === 0 || col("ham") >= threshold).as("is_key"))
  }

  /** The stateless stage of [[keyframes]]: synthesize the deterministic
    * frame sequence and hash every frame through the BMP codec — a pure
    * scan-side map shared with the streaming twin
    * ([[graft.streaming.StreamOps.keyframeStream]], which replaces the
    * doc-bounded lag window with a per-asset 5-long cursor state).
    * Output: `(idCol, frame_idx, c0..c3)`. */
  def frameSigs(docs: DataFrame, idCol: String, textCol: String,
                nFrames: Int): DataFrame = {
    require(nFrames >= 2 && nFrames <= 8, s"keyframes: bad nFrames $nFrames")
    val docId = col(idCol)
    val text = col(textCol)
    // 7 single-char remaps (frames 1..7 use fromCh(f-1)→toCh(f-1)) so the
    // documented nFrames ≤ 8 bound is actually reachable; frames ≤ 6 keep
    // their original mapping (fixture hashes unchanged)
    val fromCh = "aeiosnr"; val toCh = "bfjptos"
    val frames = (0 until nFrames).map { f =>
      val content =
        when(docId % 3 === 0 && (docId % 5 + 1) === lit(f), reverse(text))
          .otherwise(if (f == 0) text
            else translate(text, fromCh.substring(f - 1, f), toCh.substring(f - 1, f)))
      struct(lit(f.toLong).as("f"), content.as("ft"))
    }
    val fr = docs.filter(length(text) >= 8 * ImgWidth)
      .select(docId, explode(array(frames: _*)).as("x"))
      .select((docId * 8 + col("x.f")).as("aid"), col("x.ft").as("ft"))
    ahashBmpAssets(asBmpAssets(fr, "aid", "ft"))
      .select(
        shiftright(col("asset_id"), 3).as(idCol),
        (col("asset_id") % 8).as("frame_idx"),
        col("c0"), col("c1"), col("c2"), col("c3"))
  }

  /** Nearest-neighbor ×`factor` downsample as a codec-to-codec transform:
    * decode, pick `out(x,y) = in(factor·x, factor·y)`, re-encode. Images
    * whose output would be empty are dropped (matching the oracle's
    * row-count floor). */
  def resizeBmpAssets(assets: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"bmp: bad resize factor $factor")
    val enc = org.apache.spark.sql.Encoders.row(bmpAssetSchema)
    assets.select(col("asset_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, px) = decodeBmp24(r.getAs[Array[Byte]](1))
        val ow = w / factor; val oh = h / factor
        if (ow == 0 || oh == 0) None
        else {
          val out = new Array[Byte](ow * oh)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              out(y * ow + x) = px(y * factor * w + x * factor)
              x += 1
            }
            y += 1
          }
          Some(Row(r.getLong(0), encodeBmp24(out, ow, oh)))
        }
      }
    }(enc)
  }

  // ------------------------------------------------------ perceptual hash

  /** 8×8 average-hash (aHash) of one decoded grayscale image — the classic
    * perceptual fingerprint (Niu & Jiao 2008 survey family): partition the
    * image into an 8×8 grid of equal blocks (truncating the right/bottom
    * remainder), set bit i=gy*8+gx iff that block's mean exceeds the mean
    * over all 64 blocks. All-integer: blocks have EQUAL pixel counts after
    * truncation, so `blockSum * 64 > totalSum` is the exact mean
    * comparison — no division, no floats, bit-reproducible in ANSI SQL.
    *
    * Returned as four 16-bit chunks c(i/16) |= 1 << (i%16) — the repo's
    * portable-SimHash signature layout, so the SAME pigeonhole band join
    * ([[Dedup.chunk4x16Pairs]]) serves image near-dup at scale, and no
    * engine disagrees about bit 63's sign.
    *
    * Returns None when the image has no full 8×8 block grid (width or
    * height < 8 — the oracle recomputes the same floor from `length(text)`). */
  def ahashBits(width: Int, height: Int, px: Array[Byte]): Option[Array[Long]] = {
    val grid = 8
    val bw = width / grid; val bh = height / grid
    if (bw == 0 || bh == 0) None
    else {
      val sums = new Array[Long](grid * grid)
      var gy = 0
      while (gy < grid) {
        var yy = gy * bh
        while (yy < (gy + 1) * bh) {
          var gx = 0
          while (gx < grid) {
            var s = 0L
            var xx = gx * bw
            while (xx < (gx + 1) * bw) { s += px(yy * width + xx) & 0xff; xx += 1 }
            sums(gy * grid + gx) += s
            gx += 1
          }
          yy += 1
        }
        gy += 1
      }
      var tot = 0L; var i = 0
      while (i < sums.length) { tot += sums(i); i += 1 }
      val cs = new Array[Long](4)
      i = 0
      while (i < grid * grid) {
        if (sums(i) * (grid * grid) > tot) cs(i / 16) |= 1L << (i % 16)
        i += 1
      }
      Some(cs)
    }
  }

  private val ahashSchema = new StructType()
    .add("asset_id", LongType)
    .add("c0", LongType).add("c1", LongType)
    .add("c2", LongType).add("c3", LongType)

  /** Partition-batched decode + average-hash over BMP assets: one codec
    * context per partition, images without a full 8×8 grid dropped (same
    * floor as the oracle). Scale shape: a pure scan-side map — no shuffle;
    * the signature is 4 longs per asset regardless of image size, so the
    * downstream dedup join's input is ~32 bytes/asset at any corpus scale. */
  def ahashBmpAssets(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(ahashSchema)
    assets.select(col("asset_id"), col("content")).mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, px) = decodeBmp24(r.getAs[Array[Byte]](1))
        ahashBits(w, h, px).map(cs => Row(r.getLong(0), cs(0), cs(1), cs(2), cs(3)))
      }
    }(enc)
  }

  private val bmpFeatureSchema = new StructType()
    .add("asset_id", LongType).add("n_bytes", LongType)
    .add("width", IntegerType).add("height", IntegerType)
    .add("n_px", LongType).add("peak", IntegerType).add("trough", IntegerType)
    .add("mean_micro", LongType).add("energy", LongType).add("h_edges", LongType)

  /** Partition-batched decode + feature extraction over BMP assets. */
  def extractBmpFeatures(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(bmpFeatureSchema)
    assets.select(col("asset_id"), col("content")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, px) = decodeBmp24(bytes)
        val s = bmpStats(w, h, px)
        Row(r.getLong(0), bytes.length.toLong, s.width, s.height, s.nPx,
          s.peak, s.trough, s.meanMicro, s.energy, s.hEdges)
      }
    }(enc)
  }
}
