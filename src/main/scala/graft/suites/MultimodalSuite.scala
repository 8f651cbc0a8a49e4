package graft.suites

import graft.{Qdef, Tables}
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline corpus: binary asset table → per-partition batched
  * decode + feature extraction → aggregable vectors. Assets are REAL PNGs
  * (javax.imageio) and REAL WAVs (javax.sound.sampled) synthesized
  * deterministically from document bytes (pixels / PCM samples == utf-8
  * bytes, lossless), so DuckDB replays every decoded-sample statistic
  * from the source text — the decode step itself is under oracle
  * verification, not just the plumbing. m05 pins the no-codec md5
  * fallback path; m06/m07 the audio decoder.
  */
object MultimodalSuite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // Features from ACTUALLY DECODED pixels: width/height from the PNG
    // header, mean/min/max/histogram over the decoded samples (trimmed to
    // the true content length carried in metadata). The oracle recomputes
    // all of it from the text bytes — grayscale PNG is lossless, so any
    // encode/decode defect breaks the hash match.
    Qdef.duckOnly(
      "m01_multimodal_features",
      """WITH px AS (
        |  SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text)+1),
        |      j -> ascii(substr(text, j, 1))) AS codes
        |  FROM documents WHERE doc_id < 30
        |)
        |SELECT CAST(doc_id AS BIGINT) AS asset_id,
        |  16 AS n_dims,
        |  CAST(16 AS DOUBLE) AS width,
        |  ceil(n / 16.0) AS height,
        |  round(list_avg(codes), 4) AS px_mean,
        |  CAST(list_min(codes) AS DOUBLE) AS px_min,
        |  CAST(list_max(codes) AS DOUBLE) AS px_max,
        |  round(list_sum(list_transform(codes,
        |    c -> CASE WHEN least(c // 13, 9) = 9 THEN 1 ELSE 0 END))
        |    / CAST(n AS DOUBLE), 4) AS hist9
        |FROM px
        |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      val feats = Multimodal.extractFeatures(
        Multimodal.assets(t(s, dir, "documents").filter(col("doc_id") < 30)))
      feats.select(
          col("asset_id"),
          size(col("features")).as("n_dims"),
          element_at(col("features"), 1).as("width"),
          element_at(col("features"), 2).as("height"),
          round(element_at(col("features"), 4), 4).as("px_mean"),
          element_at(col("features"), 5).as("px_min"),
          element_at(col("features"), 6).as("px_max"),
          round(element_at(col("features"), 16), 4).as("hist9"))
        .orderBy("asset_id")
    },

    // Features are first-class vectors downstream: aggregate them like any
    // embedding column (per-mime centroid of the decoded mean pixel).
    Qdef.duckOnly(
      "m02_multimodal_agg",
      """WITH px AS (
        |  SELECT doc_id,
        |    list_avg(list_transform(range(1, length(text)+1),
        |      j -> ascii(substr(text, j, 1)))) AS m
        |  FROM documents
        |)
        |SELECT 'image/png' AS mime,
        |  CAST(count(*) AS BIGINT) AS n_assets,
        |  round(avg(m), 4) AS avg_px_mean
        |FROM px""".stripMargin) { (s, dir) =>
      val assets = Multimodal.assets(t(s, dir, "documents"))
      Multimodal.extractFeatures(assets)
        .join(assets.select("asset_id", "mime"), "asset_id")
        .groupBy("mime")
        .agg(
          count(lit(1)).as("n_assets"),
          round(avg(element_at(col("features"), 4)), 4).as("avg_px_mean"))
    },

    // Frame sampling over DECODED pixels: every 256 content bytes take a
    // 128-byte frame, max 4 — the 1→N per-partition expansion a video
    // container parser has. Decoded grayscale samples equal the source
    // bytes (lossless PNG + metadata trim), so DuckDB replays the frame
    // digests with substr and they match bit-for-bit.
    Qdef.duckOnly(
      "m03_frame_sample",
      """SELECT doc_id AS asset_id, i AS frame_idx,
        |  md5(substr(text, i * 256 + 1, 128)) AS frame_md5
        |FROM documents, generate_series(0, 3) t(i)
        |WHERE doc_id < 50 AND length(text) > i * 256
        |ORDER BY asset_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.assets(t(s, dir, "documents").filter(col("doc_id") < 50)))
        .orderBy("asset_id", "frame_idx")
    },

    // Resize-to-budget is a decode → crop → re-encode roundtrip; the
    // reported digest is of the DECODED content of the new PNG, so the
    // oracle's md5(substr(text,1,200)) verifies decode∘encode∘crop∘decode
    // end to end.
    Qdef.duckOnly(
      "m04_resize_budget",
      """SELECT doc_id AS asset_id,
        |  CAST(length(text) AS BIGINT) AS orig_bytes,
        |  CAST(least(length(text), 200) AS BIGINT) AS n_bytes,
        |  md5(substr(text, 1, 200)) AS content_md5
        |FROM documents
        |WHERE doc_id < 50
        |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      Multimodal.resizePayload(
          Multimodal.assets(t(s, dir, "documents").filter(col("doc_id") < 50)),
          maxBytes = 200)
        .select(
          col("asset_id"),
          col("orig_bytes"),
          col("n_bytes"),
          col("content_md5"))
        .orderBy("asset_id")
    },

    // Mimes with no JVM codec (text, video) take the documented
    // md5-fingerprint fallback; oracle-pinned so the fallback path stays
    // verified alongside the real decoders.
    Qdef.duckOnly(
      "m05_codec_fallback",
      """SELECT CAST(doc_id AS BIGINT) AS asset_id,
        |  16 AS n_dims,
        |  round(CAST(list_sum(list_transform(generate_series(1, 16),
        |    j -> ascii(substr(md5(text), j, 1)) / 100.0)) AS DOUBLE), 4) AS feat_sum,
        |  round(ascii(substr(md5(text), 1, 1)) / 100.0, 4) AS f1
        |FROM documents
        |WHERE doc_id < 30
        |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      val feats = Multimodal.extractFeatures(
        Multimodal.textAssets(t(s, dir, "documents").filter(col("doc_id") < 30)))
      feats.select(
          col("asset_id"),
          size(col("features")).as("n_dims"),
          round(expr(
            "aggregate(features, CAST(0 AS DOUBLE), (a, x) -> a + x)"), 4)
            .as("feat_sum"),
          round(element_at(col("features"), 1), 4).as("f1"))
        .orderBy("asset_id")
    },

    // Audio features from ACTUALLY DECODED PCM: the payload is a genuine
    // RIFF/WAV file (javax.sound.sampled), one 8-bit unsigned sample per
    // text byte at 8 kHz mono. The decoder parses the real container —
    // format fields (sample_rate, channels) come from the WAV header, the
    // stats from the decoded sample stream — and lossless PCM lets DuckDB
    // replay everything from the source text.
    Qdef.duckOnly(
      "m06_audio_features",
      """WITH px AS (
        |  SELECT doc_id, length(text) AS n,
        |    list_transform(range(1, length(text)+1),
        |      j -> ascii(substr(text, j, 1))) AS codes
        |  FROM documents WHERE doc_id < 30
        |)
        |SELECT CAST(doc_id AS BIGINT) AS asset_id,
        |  CAST(8000 AS DOUBLE) AS sample_rate,
        |  CAST(1 AS DOUBLE) AS channels,
        |  CAST(n AS DOUBLE) AS n_samples,
        |  round(list_avg(codes), 4) AS s_mean,
        |  CAST(list_min(codes) AS DOUBLE) AS s_min,
        |  CAST(list_max(codes) AS DOUBLE) AS s_max
        |FROM px
        |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      val feats = Multimodal.extractFeatures(
        Multimodal.audioAssets(t(s, dir, "documents").filter(col("doc_id") < 30)))
      feats.select(
          col("asset_id"),
          element_at(col("features"), 1).as("sample_rate"),
          element_at(col("features"), 2).as("channels"),
          element_at(col("features"), 3).as("n_samples"),
          round(element_at(col("features"), 4), 4).as("s_mean"),
          element_at(col("features"), 5).as("s_min"),
          element_at(col("features"), 6).as("s_max"))
        .orderBy("asset_id")
    },

    // Audio resize-to-budget: decode → crop samples → re-encode WAV; the
    // digest is of the DECODED samples of the NEW payload, verifying the
    // decode∘encode∘crop∘decode roundtrip through the real codec.
    Qdef.duckOnly(
      "m07_audio_resize",
      """SELECT doc_id AS asset_id,
        |  CAST(length(text) AS BIGINT) AS orig_bytes,
        |  CAST(least(length(text), 200) AS BIGINT) AS n_bytes,
        |  md5(substr(text, 1, 200)) AS content_md5
        |FROM documents
        |WHERE doc_id < 50
        |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      Multimodal.resizePayload(
          Multimodal.audioAssets(t(s, dir, "documents").filter(col("doc_id") < 50)),
          maxBytes = 200)
        .select(
          col("asset_id"),
          col("orig_bytes"),
          col("n_bytes"),
          col("content_md5"))
        .orderBy("asset_id")
    },

    // Perceptual-hash image dedup — the multimodal near-dup pass (dHash
    // family) computed over TRULY DECODED pixels: per-full-row pixel
    // sums of the 16-wide grayscale image, one gradient bit per
    // adjacent-row comparison (≤16 bits). The oracle regenerates every
    // hash from the source text bytes (the PNG round trip is lossless),
    // then both engines aggregate per-source collision stats — exactly
    // the x04 fingerprint contour, but through the codec.
    Qdef.duckOnly(
      "m08_perceptual_dedup",
      """WITH px AS (
        |  SELECT d.doc_id, d.source,
        |    list_transform(range(1, length(d.text) + 1),
        |      j -> ascii(substr(d.text, j, 1))) AS codes
        |  FROM documents d),
        |hashes AS (
        |  SELECT doc_id, source,
        |    array_to_string(list_transform(
        |      range(1, least(greatest(len(codes) // 16 - 1, 0), 16) + 1),
        |      j -> CASE WHEN
        |          list_sum(codes[(j - 1) * 16 + 1 : j * 16]) <
        |          list_sum(codes[j * 16 + 1 : (j + 1) * 16])
        |        THEN '1' ELSE '0' END), '') AS phash
        |  FROM px)
        |SELECT source,
        |  count(*) AS n_assets,
        |  count(DISTINCT phash) AS n_phash,
        |  CAST(count(*) - count(DISTINCT phash) AS BIGINT) AS n_dupes
        |FROM hashes
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Multimodal.perceptualHashes(Multimodal.assets(docs))
        .join(docs.select(col("doc_id"), col("source")),
          col("asset_id") === col("doc_id"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_assets"),
          countDistinct(col("phash")).as("n_phash"),
          (count(lit(1)) - countDistinct(col("phash")))
            .cast("bigint").as("n_dupes"))
        .orderBy("source")
    }
  )
}
