package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch decode / feature-extract operators.
  *
  * The Spark-side mechanics are real — schema, partition-wise batch
  * processing (`mapPartitions`, mirroring how a codec library would be
  * invoked once per batch), deterministic output shape — while the codec
  * itself is a STUB (this container has no image/audio libraries): the
  * "decoder" derives features from a seeded hash of the payload bytes.
  * Swap `fakeDecode` for a real codec call and nothing else changes.
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

  val FeatureDim = 8

  /** STUB decoder: deterministic fake features from the payload bytes.
    * Real implementation would decode the image/audio batch here.
    *
    * Feature i is the first 32 bits of md5(payload ++ ":i"), scaled to
    * [0, 1) and narrowed to float — md5-derived (not an engine-internal
    * hash) precisely so an ANSI-SQL oracle can reproduce the stub
    * bit-for-bit and the features query gets a full driver hash check. */
  private[ops] def fakeDecode(payload: Array[Byte]): Array[Float] =
    fakeDecode(java.security.MessageDigest.getInstance("MD5"), payload)

  /** Hot-path form: the payload is absorbed ONCE into `md`, then the digest
    * is cloned per feature suffix (MD5 digests are cloneable) — one payload
    * pass instead of FeatureDim, with the instance owned by the partition. */
  private def fakeDecode(md: java.security.MessageDigest,
                         payload: Array[Byte]): Array[Float] = {
    md.reset()
    md.update(payload)
    Array.tabulate(FeatureDim) { i =>
      val mdi = md.clone().asInstanceOf[java.security.MessageDigest]
      mdi.update(s":$i".getBytes("UTF-8"))
      val d = mdi.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h.toDouble / 4294967296.0).toFloat
    }
  }

  private val featureSchema = new StructType()
    .add("asset_id", LongType).add("n_bytes", IntegerType)
    .add("features", ArrayType(FloatType, containsNull = false))

  /** Partition-batched decode + feature extraction. One decoder
    * instantiation per partition (where a real codec would init its
    * native context), rows streamed through it. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    assets.select(col("asset_id"), col("content")).mapPartitions { rows =>
      // per-partition decoder init (≙ a real codec's native context)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, bytes.length, fakeDecode(md, bytes))
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
