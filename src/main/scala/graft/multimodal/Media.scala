package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque BINARY
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms.
  *
  * The DECODE STEP IS A STUB (clearly marked below): this container
  * has no image/audio codecs, so `decodeStub` derives deterministic
  * fake dimensions/features from the payload bytes. Everything
  * Spark-side — schema, batching, partition sizing, the typed Dataset
  * plumbing — is real and tested; swapping in a real codec changes
  * only the two marked functions.
  */
object Media {

  case class MediaRow(media_id: String, kind: String, payload: Array[Byte])
  case class Decoded(
      media_id: String,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** === STUB === deterministic fake decode: a real build replaces
    * this with an image/audio codec. Dimensions and features are pure
    * functions of the payload bytes so tests are stable.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    if (payload == null || payload.isEmpty) (0, 0, 0)
    else {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < math.min(payload.length, 64)) { h = (h ^ payload(i)) * 0x100000001b3L; i += 1 }
      val w = 64 + (Math.floorMod(h, 512L)).toInt
      val ht = 64 + (Math.floorMod(h >>> 16, 512L)).toInt
      val frames = 1 + (Math.floorMod(h >>> 32, 30L)).toInt
      (w, ht, frames)
    }
  }

  /** === STUB === deterministic fake feature extractor (stands in for
    * an embedding model): 16 floats folded from payload bytes.
    */
  def featuresStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val acc = new Array[Float](dim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    acc
  }

  /** Batched decode over partitions — the real Spark plumbing: one
    * task per partition, codec state amortized across the batch (a
    * real codec would be initialized once per partition here), output
    * a typed Dataset with explicit schema.
    */
  def decode(spark: SparkSession, media: Dataset[MediaRow]): Dataset[Decoded] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init point for a real codec
      it.map { m =>
        val (w, h, f) = decodeStub(m.payload)
        Decoded(m.media_id, m.kind,
          if (m.payload == null) 0L else m.payload.length.toLong,
          w, h, f, featuresStub(m.payload))
      }
    }
  }

  /** Frame sampling: every `stride`-th frame index of a decoded video
    * row — pure column arithmetic over the stubbed n_frames.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 5): DataFrame =
    decoded.select(col("media_id"),
      explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride)))
        .as("frame_idx"))

  /** Synthesize a media table from any binary column (here: html
    * payloads) — lets the plumbing run against the shared corpus
    * without external data.
    */
  def fromBinaryColumn(spark: SparkSession, df: DataFrame, idCol: String,
      binCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("string").as("media_id"),
        lit("image").as("kind"), col(binCol).as("payload"))
      .as[MediaRow]
  }
}
