package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (brief + SURVEY §7 Phase 5): media as an
  * opaque BINARY payload column + typed metadata, processed per-partition
  * in batches — the shape a real decode/feature-extract pipeline has
  * (decoder initialized once per partition, rows streamed through it).
  *
  * The codecs are REAL: image assets are genuine PNG images (encoded
  * with `javax.imageio`) and audio assets genuine RIFF/WAV PCM files
  * (encoded with `javax.sound.sampled`) — both pure JVM, no native
  * libs — synthesized deterministically from document bytes. A
  * document's UTF-8 bytes become the pixels of a width-16 8-bit
  * grayscale image (row-major, final row zero-padded) or the samples of
  * an 8-bit mono 8 kHz PCM stream, and `n_bytes` metadata carries the
  * true content length the way a real container records its sample
  * count. Feature extraction, frame sampling and resize all
  * `ImageIO.read` / `AudioSystem.getAudioInputStream` the payload and
  * work on ACTUALLY DECODED samples; because grayscale PNG and PCM WAV
  * are lossless, a DuckDB oracle can replay every statistic from the
  * source text. Remaining mimes (video — no JVM codec exists) fall back
  * to a deterministic md5 fingerprint, kept oracle-verified via the m05
  * fallback entry.
  *
  * Reference capability analog: presto-main feature-extraction scalar
  * surface (presto-ml/src/main/java/com/facebook/presto/ml/MLFunctions
  * .java) + the 1→N batch contour of operator/unnest/UnnestOperator.java.
  */
object Multimodal {

  val FeatureDim = 16
  val ImgWidth = 16
  /** Pixel-histogram bin width: bins 0..9 cover sample values 0..129
    * (ASCII fixture max is 121); brighter pixels clamp into bin 9. */
  val HistBin = 13

  /** Synthesize real PNG assets from documents: payload = PNG encoding of
    * the text bytes as a width-16 grayscale image. Runs per-partition so
    * the encoder (ImageIO plumbing) initializes once per partition. */
  def assets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false) // no temp-file cache on executors
        rows.map { case (id, text) =>
          val content = text.getBytes(StandardCharsets.UTF_8)
          (id, encodePng(content), "image/png", content.length.toLong)
        }
      }.toDF("asset_id", "payload", "mime", "n_bytes")
  }

  /** Synthesize real WAV assets from documents: payload = RIFF/WAV
    * encoding of the text bytes as 8-bit unsigned mono PCM at
    * [[SampleRate]] Hz. Runs per-partition like [[assets]]. */
  def audioAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val content = text.getBytes(StandardCharsets.UTF_8)
          (id, encodeWav(content), "audio/wav", content.length.toLong)
        }
      }.toDF("asset_id", "payload", "mime", "n_bytes")
  }

  /** 8-bit unsigned mono PCM sample rate for synthesized audio assets. */
  val SampleRate = 8000f

  private def pcmFormat: AudioFormat =
    new AudioFormat(SampleRate, 8, 1, /* signed = */ false,
      /* bigEndian = */ false)

  /** Encode content bytes as a RIFF/WAV file — one 8-bit unsigned mono
    * PCM sample per byte. Deterministic and lossless. */
  private[graft] def encodeWav(content: Array[Byte]): Array[Byte] = {
    val in = new AudioInputStream(
      new ByteArrayInputStream(content), pcmFormat, content.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private[graft] final case class DecodedAudio(
      samples: Array[Byte], sampleRate: Float, channels: Int)

  /** Decode a WAV payload back to its PCM samples through the real
    * javax.sound codec (container parse + format negotiation). */
  private[graft] def decodeWav(payload: Array[Byte]): DecodedAudio = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      DecodedAudio(in.readAllBytes(), fmt.getSampleRate, fmt.getChannels)
    } finally in.close()
  }

  /** Decoded audio content: samples trimmed to the `n_bytes` metadata,
    * mirroring [[decodeContent]]. */
  private def decodeAudioContent(
      payload: Array[Byte], nBytes: Long): (DecodedAudio, Array[Byte]) = {
    val d = decodeWav(payload)
    (d, d.samples.take(math.min(nBytes, d.samples.length.toLong).toInt))
  }

  /** Raw-bytes asset table (mime text/plain) — exercises the non-image
    * fallback path of every operator below. */
  def textAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      length(col("text")).cast("long").as("n_bytes"))

  /** Encode content bytes as an 8-bit grayscale PNG, width [[ImgWidth]],
    * row-major, final row zero-padded. Deterministic and lossless. */
  private[graft] def encodePng(content: Array[Byte]): Array[Byte] = {
    val h = math.max(1, (content.length + ImgWidth - 1) / ImgWidth)
    val img = new BufferedImage(ImgWidth, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    val total = ImgWidth * h
    while (i < total) {
      val v = if (i < content.length) content(i) & 0xff else 0
      raster.setSample(i % ImgWidth, i / ImgWidth, 0, v)
      i += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private[graft] final case class Decoded(
      pixels: Array[Byte], width: Int, height: Int)

  /** Decode a PNG payload back to row-major pixel samples. ImageIO.read
    * signals "can't decode" with null — surfaced as a per-row error with
    * the payload size rather than an anonymous NPE failing the stage. */
  private[graft] def decodePng(payload: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null,
      s"undecodable image payload (${payload.length} bytes) for an image/* mime")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = raster.getSample(i % w, i / w, 0).toByte
      i += 1
    }
    Decoded(px, w, h)
  }

  /** Decoded content bytes: pixels trimmed to the true sample count the
    * `n_bytes` metadata carries (drops the final-row zero padding). */
  private def decodeContent(payload: Array[Byte], nBytes: Long): (Decoded, Array[Byte]) = {
    val d = decodePng(payload)
    (d, d.pixels.take(math.min(nBytes, d.pixels.length.toLong).toInt))
  }

  /** Per-partition batched feature extraction over the binary payload.
    * mapPartitions is deliberate (SURVEY §2 "mapPartitions as a last
    * resort" — this IS the genuine per-partition imperative case: decoder
    * state is per-partition, not per-row).
    *
    * image-mime payloads are DECODED with javax.imageio and featurized from
    * real pixels: [width, height, n_content_bytes, mean, min, max,
    * hist0..hist9] where hist_b = fraction of content pixels with
    * sample/13 == b (clamped to bin 9). audio-mime payloads are DECODED
    * with javax.sound.sampled and featurized from real PCM samples with
    * the same layout, [sample_rate, channels, n_samples, mean, min, max,
    * hist0..hist9]. Other mimes get the md5 fallback fingerprint (one
    * double per hex digit / 100). */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], String, Long)] =
      assets.select(
          col("asset_id").cast("long"), col("payload"), col("mime"),
          col("n_bytes").cast("long"))
        .as[(Long, Array[Byte], String, Long)]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5") // fallback fingerprinter
      rows.map { case (id, payload, mime, nBytes) =>
        val features =
          if (mime.startsWith("image/")) {
            val (d, content) = decodeContent(payload, nBytes)
            sampleFeatures(d.width, d.height, content)
          } else if (mime.startsWith("audio/")) {
            val (d, content) = decodeAudioContent(payload, nBytes)
            sampleFeatures(d.sampleRate.toInt, d.channels, content)
          } else md5Features(md, payload)
        (id, features)
      }
    }.toDF("asset_id", "features")
  }

  /** [[FeatureDim]] doubles from actually-decoded 8-bit samples (pixels
    * or PCM): shape fields first, then mean/min/max and the 10-bin
    * histogram over the unsigned sample values. */
  private def sampleFeatures(
      shape0: Int, shape1: Int, content: Array[Byte]): Array[Double] = {
    val f = new Array[Double](FeatureDim)
    f(0) = shape0.toDouble
    f(1) = shape1.toDouble
    f(2) = content.length.toDouble
    if (content.nonEmpty) {
      var sum = 0L
      var mn = 255
      var mx = 0
      val hist = new Array[Long](10)
      var i = 0
      while (i < content.length) {
        val v = content(i) & 0xff
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        hist(math.min(v / HistBin, 9)) += 1
        i += 1
      }
      f(3) = sum.toDouble / content.length
      f(4) = mn.toDouble
      f(5) = mx.toDouble
      var b = 0
      while (b < 10) { f(6 + b) = hist(b).toDouble / content.length; b += 1 }
    }
    f
  }

  /** Fallback fingerprint for non-image mimes: one double per md5 hex
    * digit (ascii/100) — deterministic, oracle-replayable, and honestly
    * NOT a decode (no codec for this mime ships in the JVM). */
  private def md5Features(md: MessageDigest, payload: Array[Byte]): Array[Double] = {
    md.reset()
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    hex.take(FeatureDim).map(c => c.toInt / 100.0).toArray
  }

  /** Frame sampling over the DECODED pixel stream — the video-ish 1→N
    * batch shape: every `stride` content bytes take a `frameSize`-byte
    * frame, up to `maxFrames` per asset, and emit
    * (asset_id, frame_idx, frame_md5) rows. Per-partition decoder state +
    * flatMap expansion is exactly the contour a real container parser
    * has; for image payloads the frames are slices of ImageIO-decoded
    * pixels (trimmed to the true sample count), for other mimes slices of
    * the raw payload. */
  def sampleFrames(
      assets: DataFrame, frameSize: Int = 128, stride: Int = 256,
      maxFrames: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], String, Long)] =
      assets.select(
          col("asset_id").cast("long"), col("payload"), col("mime"),
          col("n_bytes").cast("long"))
        .as[(Long, Array[Byte], String, Long)]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      rows.flatMap { case (id, payload, mime, nBytes) =>
        val content =
          if (mime.startsWith("image/")) decodeContent(payload, nBytes)._2
          else if (mime.startsWith("audio/")) decodeAudioContent(payload, nBytes)._2
          else payload
        Iterator.range(0, maxFrames).flatMap { i =>
          val start = i * stride
          if (start >= content.length) Iterator.empty
          else {
            md.reset()
            val frame =
              content.slice(start, math.min(start + frameSize, content.length))
            val hex = md.digest(frame).map("%02x".format(_)).mkString
            Iterator.single((id, i, hex))
          }
        }
      }
    }.toDF("asset_id", "frame_idx", "frame_md5")
  }

  /** Resize to a byte budget. For image payloads this is a full
    * decode → crop → re-encode roundtrip: ImageIO-decode the pixels, keep
    * the first `maxBytes` content samples, re-encode as a fresh PNG, and
    * report the md5 of the cropped DECODED content (so the oracle verifies
    * the decode(encode(crop(decode(x)))) roundtrip bit-for-bit). Other
    * mimes clamp the raw payload. */
  /** Perceptual row-gradient hash over DECODED pixels (the dHash family,
    * restricted to an exactly-replayable form): the 16-wide image's
    * per-full-row pixel SUMS (exact integers — comparing sums equals
    * comparing means at fixed width), one gradient bit per adjacent-row
    * comparison over the first ≤16 comparisons, rendered as a 0/1
    * string. Near-identical images produce equal hashes; an oracle can
    * regenerate the hash from the source bytes because the PNG round
    * trip is lossless. Decode runs in mapPartitions like the other
    * codec paths — map-side only at any scale. */
  def perceptualHashes(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], Long)] =
      assets.select(
          col("asset_id").cast("long"), col("payload"), col("n_bytes").cast("long"))
        .as[(Long, Array[Byte], Long)]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { case (id, payload, nBytes) =>
        val (d, content) = decodeContent(payload, nBytes)
        val fullRows = content.length / d.width
        val sums = Array.tabulate(fullRows) { r =>
          var acc = 0L
          var c = 0
          while (c < d.width) { acc += content(r * d.width + c) & 0xff; c += 1 }
          acc
        }
        val nBits = math.min(math.max(fullRows - 1, 0), 16)
        val bits = (0 until nBits)
          .map(j => if (sums(j) < sums(j + 1)) '1' else '0').mkString
        (id, bits)
      }
    }.toDF("asset_id", "phash")
  }

  def resizePayload(assets: DataFrame, maxBytes: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], String, Long)] =
      assets.select(
          col("asset_id").cast("long"), col("payload"), col("mime"),
          col("n_bytes").cast("long"))
        .as[(Long, Array[Byte], String, Long)]
    ds.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      rows.map { case (id, payload, mime, nBytes) =>
        val (outPayload, origBytes, newBytes) =
          if (mime.startsWith("image/")) {
            val (_, content) = decodeContent(payload, nBytes)
            val cropped = content.take(maxBytes)
            (encodePng(cropped), content.length.toLong, cropped.length.toLong)
          } else if (mime.startsWith("audio/")) {
            val (_, content) = decodeAudioContent(payload, nBytes)
            val cropped = content.take(maxBytes)
            (encodeWav(cropped), content.length.toLong, cropped.length.toLong)
          } else {
            (payload.take(maxBytes), payload.length.toLong,
              math.min(payload.length, maxBytes).toLong)
          }
        // integrity digest of the DECODED content of the new payload
        md.reset()
        val decodedOut =
          if (mime.startsWith("image/")) decodeContent(outPayload, newBytes)._2
          else if (mime.startsWith("audio/")) decodeAudioContent(outPayload, newBytes)._2
          else outPayload
        val contentMd5 = md.digest(decodedOut).map("%02x".format(_)).mkString
        (id, outPayload, mime, origBytes, newBytes, contentMd5)
      }
    }.toDF("asset_id", "payload", "mime", "orig_bytes", "n_bytes", "content_md5")
  }
}
