package graft.suites

import graft.{Qdef, Tables}
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline corpus: binary asset table → per-partition batched
  * feature extraction → aggregable vectors. The md5-stub features are
  * reproducible by the oracle (ascii of md5 hex digits / 100), so the
  * whole pipeline — binary encode, partition batching, vector schema —
  * is verified end-to-end even though the codec is faked.
  */
object MultimodalSuite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    Qdef.duckOnly(
      "m01_multimodal_features",
      """SELECT CAST(doc_id AS BIGINT) AS asset_id,
        |  16 AS n_dims,
        |  round(CAST(list_sum(list_transform(generate_series(1, 16),
        |    j -> ascii(substr(md5(text), j, 1)) / 100.0)) AS DOUBLE), 4) AS feat_sum,
        |  round(ascii(substr(md5(text), 1, 1)) / 100.0, 4) AS f1
        |FROM documents
        |WHERE doc_id < 30
        |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      val feats = Multimodal.extractFeatures(
        Multimodal.assets(t(s, dir, "documents").filter(col("doc_id") < 30)))
      feats.select(
          col("asset_id"),
          size(col("features")).as("n_dims"),
          round(expr(
            "aggregate(features, CAST(0 AS DOUBLE), (a, x) -> a + x)"), 4)
            .as("feat_sum"),
          round(element_at(col("features"), 1), 4).as("f1"))
        .orderBy("asset_id")
    },

    // Features are first-class vectors downstream: aggregate them like any
    // embedding column (per-mime centroid of f1).
    Qdef.duckOnly(
      "m02_multimodal_agg",
      """SELECT 'text/plain' AS mime,
        |  CAST(count(*) AS BIGINT) AS n_assets,
        |  round(avg(ascii(substr(md5(text), 1, 1)) / 100.0), 4) AS avg_f1
        |FROM documents""".stripMargin) { (s, dir) =>
      val assets = Multimodal.assets(t(s, dir, "documents"))
      Multimodal.extractFeatures(assets)
        .join(assets.select("asset_id", "mime"), "asset_id")
        .groupBy("mime")
        .agg(
          count(lit(1)).as("n_assets"),
          round(avg(element_at(col("features"), 1)), 4).as("avg_f1"))
    },

    // Frame sampling: every 256 bytes take a 128-byte frame, max 4 — the
    // 1→N per-partition expansion a video container parser has. Fixture
    // text is pure ASCII, so DuckDB replays the byte frames with substr
    // and the frame digests match exactly.
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

    // Resize-to-budget plumbing: metadata reflects the clamp, content is
    // a prefix (verified via md5 of the oracle-side substring).
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
          col("orig_bytes").cast("long"),
          col("n_bytes").cast("long"),
          md5(col("payload")).as("content_md5"))
        .orderBy("asset_id")
    }
  )
}
