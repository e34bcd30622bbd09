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

  /** Real WAV reader: validates RIFF/WAVE magics, walks the (word-aligned)
    * chunk list for `fmt ` and `data`, reads the little-endian format
    * fields, and reduces the PCM samples in one pass. Only PCM / mono /
    * 8-bit payloads are accepted — anything else is a decode error, as a
    * real codec would report. */
  def decodeWav8(bytes: Array[Byte]): WavStats = {
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

  /** Frame sampling for "video" payloads: every `stride`-th chunk of the
    * payload becomes a frame with a deterministic fingerprint. Pure column
    * expressions — the explode shape is exactly what a real frame sampler
    * produces. */
  def sampleFrames(assets: DataFrame, nFrames: Int): DataFrame =
    assets.select(col("asset_id"), col("meta.n_bytes").as("n_bytes"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .withColumn("frame_fp", md5(concat(col("asset_id").cast("string"),
        lit(":"), col("frame_idx").cast("string"))))
}
