package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (brief + SURVEY §7 Phase 5): media as an
  * opaque BINARY payload column + typed metadata, processed per-partition
  * in batches — the shape a real decode/feature-extract pipeline has
  * (decoder initialized once per partition, rows streamed through it).
  *
  * The DECODE STEP IS A DETERMINISTIC STUB: this container has no image/
  * audio codecs, so "features" are derived from the md5 of the payload
  * (one double per hex digit). Everything around it — binary schema,
  * per-partition batching, feature vector schema, downstream
  * aggregability — is real and tested; swapping the stub for a JNI/codec
  * call changes one function.
  */
object Multimodal {

  val FeatureDim = 16

  /** Documents as a pseudo-media asset table: payload = utf-8 bytes. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      length(col("text")).as("n_bytes"))

  /** Per-partition batched feature extraction over the binary payload.
    * mapPartitions is deliberate (SURVEY §2 "mapPartitions as a last
    * resort" — this IS the genuine per-partition imperative case: decoder
    * state is per-partition, not per-row). */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      assets.select(col("asset_id").cast("long"), col("payload"))
        .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      // "decoder" init once per partition (stub: an MD5 instance)
      val md = MessageDigest.getInstance("MD5")
      rows.map { case (id, payload) =>
        md.reset()
        val hex = md.digest(payload).map("%02x".format(_)).mkString
        // STUB decode: one feature per hex digit (ascii/100) — replace
        // with a real codec call to productionize.
        val features = hex.take(FeatureDim).map(c => c.toInt / 100.0).toArray
        (id, features)
      }
    }.toDF("asset_id", "features")
  }

  /** Frame sampling over a binary payload — the video-ish 1→N batch
    * shape: every `stride` bytes take a `frameSize`-byte frame, up to
    * `maxFrames` per asset, and emit (asset_id, frame_idx, frame_md5)
    * rows. Per-partition decoder state + flatMap expansion is exactly the
    * contour a real container-parser has; the FRAME DECODE IS THE SAME
    * DECLARED STUB as extractFeatures (md5 in place of pixels). */
  def sampleFrames(
      assets: DataFrame, frameSize: Int = 128, stride: Int = 256,
      maxFrames: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      assets.select(col("asset_id").cast("long"), col("payload"))
        .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition "decoder"
      rows.flatMap { case (id, payload) =>
        Iterator.range(0, maxFrames).flatMap { i =>
          val start = i * stride
          if (start >= payload.length) Iterator.empty
          else {
            md.reset()
            val frame = payload.slice(start, math.min(start + frameSize, payload.length))
            val hex = md.digest(frame).map("%02x".format(_)).mkString
            Iterator.single((id, i, hex))
          }
        }
      }
    }.toDF("asset_id", "frame_idx", "frame_md5")
  }

  /** "Resize" stub: clamp each payload to a byte budget (a real implementation
    * decodes + scales; the plumbing — binary in, binary out, metadata
    * updated — is what downstream operators depend on). */
  def resizePayload(assets: DataFrame, maxBytes: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      assets.select(col("asset_id").cast("long"), col("payload"))
        .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.map { case (id, payload) =>
        (id, payload.take(maxBytes), payload.length, math.min(payload.length, maxBytes))
      }
    }.toDF("asset_id", "payload", "orig_bytes", "n_bytes")
  }
}
