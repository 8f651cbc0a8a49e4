package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis corpus over `documents` (north-star LLM-pipeline ops,
  * SURVEY §7 Phase 5): char/word statistics, quality scoring, token
  * classes, content fingerprinting, stopword profiling. All distributed
  * scans + aggregations; no UDFs — everything stays in codegen.
  */
object TextAnalysis {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // Char/word statistics; also validates the n_chars metadata column.
    Qdef(
      "x01_text_stats",
      """SELECT doc_id,
        |  length(text) AS n_char,
        |  CAST(length(text) = n_chars AS BOOLEAN) AS n_chars_ok,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |    AS n_words,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |        / (length(text) - length(replace(text, ' ', '')) + 1), 6)
        |    AS avg_word_len
        |FROM documents
        |WHERE doc_id < 40
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val nWords = length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit(""))) + 1
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(
          col("doc_id"),
          length(col("text")).as("n_char"),
          (length(col("text")) === col("n_chars")).as("n_chars_ok"),
          nWords.cast("bigint").as("n_words"),
          round(length(regexp_replace(col("text"), lit(" "), lit(""))).cast("double") /
            nWords, 6).as("avg_word_len"))
        .orderBy("doc_id")
    },

    // Quality score: stopword ratio + length band — the scoring heuristic
    // pretraining filters use, as a pure-codegen expression.
    Qdef.duckOnly(
      "x02_quality_score",
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id, lang,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  round(CAST(len(list_filter(words, x -> x IN ('the', 'a', 'of', 'and')))
        |      AS DOUBLE) / len(words), 6) AS stopword_ratio,
        |  CAST(len(words) BETWEEN 20 AND 100 AS BOOLEAN) AS length_ok
        |FROM w
        |WHERE doc_id < 40
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"), col("lang"),
          size(col("words")).cast("bigint").as("n_words"),
          round(size(expr(
            "filter(words, x -> x IN ('the', 'a', 'of', 'and'))")).cast("double") /
            size(col("words")), 6).as("stopword_ratio"),
          size(col("words")).between(20, 100).as("length_ok"))
        .orderBy("doc_id")
    },

    // Token-class counts via regex stripping (vowels / spaces / rare
    // chars) — the regex engine differences are neutralized by counting.
    Qdef.duckOnly(
      "x03_token_classes",
      """SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
        |    AS BIGINT) AS n_vowels,
        |  CAST(length(text) - length(regexp_replace(text, '[bcdfg]', '', 'g'))
        |    AS BIGINT) AS n_bcdfg,
        |  CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS BIGINT)
        |    AS n_other
        |FROM documents
        |WHERE doc_id < 40
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(
          col("doc_id"),
          (length(col("text")) -
            length(regexp_replace(col("text"), lit("[aeiou]"), lit(""))))
            .cast("bigint").as("n_vowels"),
          (length(col("text")) -
            length(regexp_replace(col("text"), lit("[bcdfg]"), lit(""))))
            .cast("bigint").as("n_bcdfg"),
          length(regexp_replace(col("text"), lit("[a-z ]"), lit("")))
            .cast("bigint").as("n_other"))
        .orderBy("doc_id")
    },

    // Content fingerprint (md5 of normalized text) + per-source collision
    // stats — the cheap exact-dup detector every ingestion pipeline runs.
    Qdef(
      "x04_fingerprint",
      """SELECT source,
        |  count(*) AS n_docs,
        |  count(DISTINCT md5(lower(text))) AS n_unique,
        |  count(DISTINCT md5(lower(substr(text, 1, 20)))) AS n_prefix_unique
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(lower(col("text")))).as("n_unique"),
          countDistinct(md5(lower(substring(col("text"), 1, 20))))
            .as("n_prefix_unique"))
        .orderBy("source")
    },

    // Per-language marker-token occurrence profile (substring-count via
    // length arithmetic — dialect-neutral).
    Qdef(
      "x05_stopword_profile",
      """SELECT lang,
        |  count(*) AS n_docs,
        |  CAST(sum((length(text) - length(replace(text, ' the ', ''))) / 5)
        |    AS BIGINT) AS the_occurrences,
        |  CAST(sum((length(text) - length(replace(text, 'data', ''))) / 4)
        |    AS BIGINT) AS data_occurrences
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum((length(col("text")) -
            length(regexp_replace(col("text"), lit(" the "), lit("")))) / 5)
            .cast("bigint").as("the_occurrences"),
          sum((length(col("text")) -
            length(regexp_replace(col("text"), lit("data"), lit("")))) / 4)
            .cast("bigint").as("data_occurrences"))
        .orderBy("lang")
    }
  )
}
