package graft.suites

import graft.{Qdef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function corpus (SURVEY §2.8) — string, regex, LIKE, date/time,
  * math, conditional/TRY, JSON, crypto digests, array + HOFs, casts.
  * Reference: 460 @ScalarFunction methods under presto-main/.../operator/
  * scalar/ (StringFunctions.java, DateTimeFunctions.java,
  * MathFunctions.java, JsonFunctions.java, …). Where DuckDB's surface
  * syntax differs (regex flags, list functions, digests) the oracle is
  * DuckDB-dialect and the Spark side uses the native equivalent.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[Qdef] = Seq(

    // String functions over part names (reference: StringFunctions.java).
    Qdef(
      "f01_string_fns",
      """SELECT p_partkey,
        |  length(p_name) AS name_len,
        |  upper(p_name) AS uname,
        |  lower(p_brand) AS lbrand,
        |  substr(p_name, 1, 4) AS prefix,
        |  replace(p_name, ' ', '_') AS snake,
        |  reverse(p_type) AS rev_type,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR(8)), 3, '0') AS padded_size,
        |  trim('  pad  ') AS trimmed
        |FROM part
        |WHERE p_partkey < 30
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") < 30)
        .select(
          col("p_partkey"),
          length(col("p_name")).as("name_len"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          substring(col("p_name"), 1, 4).as("prefix"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
          reverse(col("p_type")).as("rev_type"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          lpad(col("p_size").cast("string"), 3, "0").as("padded_size"),
          trim(lit("  pad  ")).as("trimmed"))
        .orderBy("p_partkey")
    },

    // Regex: extract + global replace (DuckDB needs the 'g' flag Spark
    // applies implicitly — dialects differ, so duckOnly oracle).
    // Reference: JoniRegexpFunctions.java.
    Qdef.duckOnly(
      "f02_regex",
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  length(regexp_replace(text, '[aeiou]', '', 'g')) AS consonant_len,
        |  CAST(regexp_matches(text, 'data|table') AS BOOLEAN) AS mentions_data
        |FROM documents
        |WHERE doc_id < 20
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 20)
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
          length(regexp_replace(col("text"), lit("[aeiou]"), lit(""))).as("consonant_len"),
          col("text").rlike("data|table").as("mentions_data"))
        .orderBy("doc_id")
    },

    // LIKE with prefix / suffix / infix / underscore patterns
    // (reference: LikeFunctions.java — compiled automaton; Spark codegen).
    Qdef(
      "f03_like",
      """SELECT
        |  count(*) FILTER (WHERE p_name LIKE 'red%') AS red_prefix,
        |  count(*) FILTER (WHERE p_name LIKE '%bolt') AS bolt_suffix,
        |  count(*) FILTER (WHERE p_name LIKE '%gear%') AS gear_infix,
        |  count(*) FILTER (WHERE p_brand LIKE 'Brand#_') AS single_digit_brand,
        |  count(*) FILTER (WHERE p_name NOT LIKE '%o%') AS no_o
        |FROM part""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .agg(
          count_if(col("p_name").like("red%")).as("red_prefix"),
          count_if(col("p_name").like("%bolt")).as("bolt_suffix"),
          count_if(col("p_name").like("%gear%")).as("gear_infix"),
          count_if(col("p_brand").like("Brand#_")).as("single_digit_brand"),
          count_if(!col("p_name").like("%o%")).as("no_o"))
    },

    // Date/time functions (reference: DateTimeFunctions.java — 95 fns;
    // the shared-dialect slice avoids format-pattern dialects).
    Qdef(
      "f04_datetime",
      """SELECT
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
        |  CAST(month(o_orderdate) AS INT) AS order_mm,
        |  CAST(day(o_orderdate) AS INT) AS order_dd,
        |  count(*) AS cnt
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY order_month, order_dd""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(
          date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
          year(col("o_orderdate")).cast("bigint").as("order_year"),
          month(col("o_orderdate")).cast("int").as("order_mm"),
          dayofmonth(col("o_orderdate")).cast("int").as("order_dd"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("order_month", "order_dd")
    },

    // Math functions (reference: MathFunctions.java — 110 fns).
    Qdef(
      "f05_math",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_diff,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  round(power(l_quantity, 2), 2) AS qty_sq,
        |  round(ln(l_extendedprice), 6) AS price_ln,
        |  round(log10(l_extendedprice), 6) AS price_log10,
        |  round(exp(l_discount), 6) AS disc_exp,
        |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
        |  CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
        |  greatest(l_quantity, 25.0) AS qty_hi,
        |  least(l_quantity, 25.0) AS qty_lo
        |FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_diff"),
          ceil(col("l_extendedprice")).cast("bigint").as("price_ceil"),
          floor(col("l_extendedprice")).cast("bigint").as("price_floor"),
          round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
          round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          round(log(col("l_extendedprice")), 6).as("price_ln"),
          round(log10(col("l_extendedprice")), 6).as("price_log10"),
          round(exp(col("l_discount")), 6).as("disc_exp"),
          (col("l_orderkey") % 7).cast("bigint").as("key_mod"),
          signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
          greatest(col("l_quantity"), lit(25.0)).as("qty_hi"),
          least(col("l_quantity"), lit(25.0)).as("qty_lo"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Conditionals: CASE / coalesce / nullif / TRY_CAST (error→NULL, the
    // TRY semantics — reference: scalar/TryFunction.java, TryCastFunction.java).
    Qdef(
      "f06_conditional",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS size_class,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  TRY_CAST(o_orderpriority AS INT) AS prio_num,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit
        |FROM orders
        |WHERE o_orderkey < 300
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("size_class"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_or_open"),
          col("o_orderpriority").try_cast("int").as("prio_num"),
          substring(col("o_orderpriority"), 1, 1).try_cast("int").as("prio_digit"))
        .orderBy("o_orderkey")
    },

    // JSON extraction from the events props column (reference:
    // JsonFunctions.java — json_extract_scalar ≍ get_json_object; DuckDB
    // spells it json_extract_string).
    Qdef.duckOnly(
      "f07_json",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
        |  CAST(count(json_extract_string(props, '$.missing')) AS BIGINT) AS missing_cnt
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("int")).cast("bigint").as("k_sum"),
          count(get_json_object(col("props"), "$.missing")).as("missing_cnt"))
        .orderBy("event_type")
    },

    // Crypto digests (reference: VarbinaryFunctions.java — md5, sha256;
    // Spark spells sha256 as sha2(x, 256)).
    Qdef.duckOnly(
      "f08_digests",
      """SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
        |FROM documents WHERE doc_id < 10
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 10)
        .select(
          col("doc_id"),
          md5(col("text")).as("text_md5"),
          sha2(col("text"), 256).as("text_sha256"))
        .orderBy("doc_id")
    },

    // Array functions on a real array column: cardinality, 1-based
    // subscript, element sum (reference: ArrayFunctions + SURVEY §1.2 —
    // Presto arrays are 1-based, so element_at on both sides).
    Qdef.duckOnly(
      "f09_array_fns",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS first_v,
        |  round(CAST(embedding[64] AS DOUBLE), 4) AS last_v,
        |  round(CAST(list_sum(embedding) AS DOUBLE), 4) AS v_sum,
        |  round(CAST(list_max(embedding) AS DOUBLE), 4) AS v_max
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings").filter(col("vec_id") < 20)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_v"),
          round(element_at(col("embedding"), 64).cast("double"), 4).as("last_v"),
          round(expr("aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"), 4)
            .as("v_sum"),
          round(array_max(col("embedding")).cast("double"), 4).as("v_max"))
        .orderBy("vec_id")
    },

    // Higher-order functions: transform / filter / exists over arrays
    // (reference: ArrayTransformFunction.java, ArrayFilterFunction.java —
    // lambdas, SURVEY §2.2).
    Qdef.duckOnly(
      "f10_higher_order",
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
        |  round(CAST(list_sum(list_transform(embedding, x -> abs(x))) AS DOUBLE), 4)
        |    AS l1_norm,
        |  CAST(len(list_filter(embedding, x -> abs(x) > 0.2)) > 0 AS BOOLEAN)
        |    AS has_large
        |FROM embeddings WHERE vec_id < 20
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings").filter(col("vec_id") < 20)
        .select(
          col("vec_id"),
          size(expr("filter(embedding, x -> x > 0)")).as("n_positive"),
          round(expr("aggregate(transform(embedding, x -> abs(CAST(x AS DOUBLE))), CAST(0 AS DOUBLE), (a, x) -> a + x)"), 4)
            .as("l1_norm"),
          expr("exists(embedding, x -> abs(x) > 0.2)").as("has_large"))
        .orderBy("vec_id")
    },

    // date_format through the MySQL-token dialect shim: the Presto pattern
    // '%Y-%m-%d %H:%i:%s' runs as a java.time pattern on Spark and as
    // strftime on DuckDB — three dialects, one result.
    Qdef.duckOnly(
      "f12_date_format_dialect",
      """SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
        |  AS formatted, CAST(count(*) AS BIGINT) AS cnt
        |FROM orders
        |WHERE o_orderkey < 500
        |GROUP BY 1
        |ORDER BY formatted""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(date_format(col("o_orderdate"),
          graft.Engine.prestoDateFormat("%Y-%m-%d %H:%i:%s")).as("formatted"))
        .groupBy("formatted")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("formatted")
    },

    // Map functions: construct, keys/values, subscript, concat
    // (reference: Map*.java — cardinality/keys/values/element_at/concat).
    Qdef.duckOnly(
      "f13_map_functions",
      """SELECT o_orderkey,
        |  'prio,status' AS keys_sorted,
        |  o_orderpriority || ',' || o_orderstatus AS vals_by_key,
        |  o_orderstatus AS status_val,
        |  3 AS n_after_concat
        |FROM orders
        |WHERE o_orderkey < 50
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 50)
        .withColumn("m", map(
          lit("status"), col("o_orderstatus"),
          lit("prio"), col("o_orderpriority")))
        .select(
          col("o_orderkey"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_sorted"),
          concat_ws(",", expr("transform(array_sort(map_keys(m)), k -> element_at(m, k))"))
            .as("vals_by_key"),
          element_at(col("m"), "status").as("status_val"),
          size(map_concat(col("m"), map(lit("extra"), lit("x"))))
            .as("n_after_concat"))
        .orderBy("o_orderkey")
    },

    // Array set operations against a literal vocabulary (reference:
    // ArrayIntersectFunction/ArrayUnionFunction/ArrayExceptFunction).
    Qdef.duckOnly(
      "f14_array_set_ops",
      """WITH l AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents WHERE doc_id < 30)
        |SELECT doc_id,
        |  array_to_string(list_sort(list_intersect(toks, ['the','a','data','table'])), ',')
        |    AS common_words,
        |  CAST(len(list_distinct(list_concat(toks, ['zzz_new']))) AS INT) AS n_union,
        |  CAST(len(list_filter(toks, x -> NOT list_contains(['the','a','data','table'], x)))
        |    AS INT) AS n_except,
        |  CAST(list_contains(toks, 'data') AS BOOLEAN) AS has_data
        |FROM l
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 30)
        .withColumn("toks", array_distinct(split(col("text"), " ")))
        .withColumn("vocab", array(lit("the"), lit("a"), lit("data"), lit("table")))
        .select(
          col("doc_id"),
          concat_ws(",", array_sort(array_intersect(col("toks"), col("vocab"))))
            .as("common_words"),
          size(array_union(col("toks"), array(lit("zzz_new")))).as("n_union"),
          size(array_except(col("toks"), col("vocab"))).as("n_except"),
          array_contains(col("toks"), "data").as("has_data"))
        .orderBy("doc_id")
    },

    // Casts & coercions (reference: per-type operator files, DecimalCasts
    // .java; double→int is avoided — Presto/Spark truncate, DuckDB rounds).
    Qdef(
      "f11_casts",
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR(20)) AS key_str,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18, 2)) AS VARCHAR(32)) AS price_dec,
        |  CAST('123' AS INT) AS parsed_int,
        |  CAST(CAST(o_orderkey AS SMALLINT) AS INT) AS narrow_key
        |FROM orders
        |WHERE o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderdate").cast("date").as("odate"),
          col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_dec"),
          lit("123").cast("int").as("parsed_int"),
          col("o_orderkey").cast("smallint").cast("int").as("narrow_key"))
        .orderBy("o_orderkey")
    },

    // at_timezone / with_timezone + the AT TIME ZONE operator syntax
    // (reference: operator/scalar/DateTimeFunctions.java, SqlBase.g4
    // valueExpression AT timeZoneSpecifier — both return TIMESTAMP WITH
    // TIME ZONE; see README "Time zone semantics" for the TIMESTAMP
    // narrowing). Rendered
    // as wall-clock strings so both engines compare text, and DuckDB's ICU
    // AT TIME ZONE is the independent zone-rules oracle — including
    // America/Los_Angeles DST transitions across the 1992-1998 dates.
    Qdef.duckOnly(
      "f15_at_timezone",
      """SELECT o_orderkey,
        |  strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Los_Angeles',
        |           '%Y-%m-%d %H:%M:%S') AS la_wall,
        |  strftime(CAST((ts AT TIME ZONE 'Asia/Kolkata') AS TIMESTAMP),
        |           '%Y-%m-%d %H:%M:%S') AS utc_of_kolkata_wall
        |FROM (
        |  SELECT o_orderkey,
        |         CAST(o_orderdate AS TIMESTAMP) + (o_orderkey % 24) * INTERVAL 1 HOUR AS ts
        |  FROM orders WHERE o_orderkey < 500) t
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT o_orderkey,
          |  date_format(ts AT TIME ZONE 'America/Los_Angeles',
          |              '%Y-%m-%d %H:%i:%S') AS la_wall,
          |  date_format(with_timezone(ts, 'Asia/Kolkata'),
          |              '%Y-%m-%d %H:%i:%S') AS utc_of_kolkata_wall
          |FROM (
          |  SELECT o_orderkey,
          |         date_add('hour', CAST(o_orderkey % 24 AS INTEGER),
          |                  CAST(o_orderdate AS TIMESTAMP)) AS ts
          |  FROM orders WHERE o_orderkey < 500) t
          |ORDER BY o_orderkey""".stripMargin)
    },

    // to_unixtime / from_unixtime with reference types (reference:
    // DateTimeFunctions.java): DOUBLE epoch seconds out, TIMESTAMP back,
    // and the 2-arg zone form narrowed to its wall clock. DuckDB's
    // epoch()/to_timestamp()/ICU AT TIME ZONE replay all three.
    Qdef.duckOnly(
      "f24_unixtime",
      """SELECT o_orderkey,
        |  CAST(epoch(o_orderdate) AS DOUBLE) AS ut,
        |  CAST(o_orderdate AS TIMESTAMP) AS rt,
        |  CAST(to_timestamp(epoch(o_orderdate)) AT TIME ZONE 'Asia/Tokyo' AS TIMESTAMP) AS tokyo_wall
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        graft.Engine.sql(s, dir,
          """SELECT o_orderkey,
            |  to_unixtime(CAST(o_orderdate AS TIMESTAMP)) AS ut,
            |  from_unixtime(to_unixtime(CAST(o_orderdate AS TIMESTAMP))) AS rt,
            |  from_unixtime(to_unixtime(CAST(o_orderdate AS TIMESTAMP)), 'Asia/Tokyo') AS tokyo_wall
            |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin)
    },

    // Remaining named string/math scalars from SURVEY §2.8 (reference:
    // scalar/StringFunctions.java levenshteinDistance/hammingDistance/
    // normalize/toUtf8/fromUtf8/splitPart, MathFunctions.java
    // widthBucket). DuckDB oracles each natively (hamming, levenshtein,
    // nfc_normalize, encode, split_part); width_bucket replays as a
    // literal. The NFC test composes e + U+0301 and checks it normalizes
    // to the single codepoint é.
    Qdef.duckOnly(
      "f16_string_extras",
      """SELECT
        |  levenshtein('kitten', 'sitting') AS lev,
        |  hamming('toned', 'roses') AS ham,
        |  nfc_normalize('e' || chr(769)) AS nfc,
        |  CAST(length(nfc_normalize('e' || chr(769))) AS BIGINT) AS nfc_len,
        |  'héllo' AS rt,
        |  CAST(octet_length(encode('héllo')) AS BIGINT) AS nbytes,
        |  split_part('a,b,c', ',', 2) AS sp,
        |  CAST(3 AS BIGINT) AS wb,
        |  true AS fin,
        |  false AS fin_inf,
        |  true AS inf_inf,
        |  false AS nan_fin""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT
          |  CAST(levenshtein_distance('kitten', 'sitting') AS BIGINT) AS lev,
          |  hamming_distance('toned', 'roses') AS ham,
          |  normalize(concat('e', '́')) AS nfc,
          |  CAST(length(normalize(concat('e', '́'))) AS BIGINT) AS nfc_len,
          |  from_utf8(to_utf8('héllo')) AS rt,
          |  CAST(length(to_utf8('héllo')) AS BIGINT) AS nbytes,
          |  split_part('a,b,c', ',', 2) AS sp,
          |  width_bucket(5.3E0, 0.0E0, 10.0E0, 5) AS wb,
          |  is_finite(1.5E0) AS fin,
          |  is_finite(infinity()) AS fin_inf,
          |  is_infinite(infinity() * -1) AS inf_inf,
          |  is_finite(nan()) AS nan_fin""".stripMargin)
    },

    // JSON family beyond extraction (reference: scalar/JsonFunctions.java
    // — json_size, typed json_array_contains, json_array_get with
    // negative indexes, json_parse canonicalization). JSON values are
    // canonical text here (no JSON runtime type in Spark); DuckDB's json
    // extension is the independent oracle where it agrees, literals where
    // its dialect differs.
    Qdef.duckOnly(
      "f17_json_pack",
      """SELECT
        |  CAST(json_array_length('[1, 2, 3, 4]') AS BIGINT) AS alen,
        |  CAST(1 AS BIGINT) AS obj_size,
        |  CAST(3 AS BIGINT) AS arr_size,
        |  CAST(0 AS BIGINT) AS scalar_size,
        |  json_contains('[1,2,3]', '2') AS has_num,
        |  json_contains('["x","y"]', '"y"') AS has_str,
        |  true AS has_bool,
        |  false AS has_missing,
        |  '20' AS second_elem,
        |  '30' AS last_elem,
        |  '[1,2,3]' AS canon,
        |  '{"k":1}' AS fmt""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT
          |  CAST(json_array_length('[1, 2, 3, 4]') AS BIGINT) AS alen,
          |  json_size('{"a": {"b": [1,2,3]}}', '$.a') AS obj_size,
          |  json_size('{"a": {"b": [1,2,3]}}', '$.a.b') AS arr_size,
          |  json_size('{"a": 7}', '$.a') AS scalar_size,
          |  json_array_contains('[1,2,3]', 2) AS has_num,
          |  json_array_contains('["x","y"]', 'y') AS has_str,
          |  json_array_contains('[true,false]', false) AS has_bool,
          |  json_array_contains('[1,2,3]', 9) AS has_missing,
          |  json_array_get('[10,20,30]', 1) AS second_elem,
          |  json_array_get('[10,20,30]', -1) AS last_elem,
          |  json_parse('[1, 2,3]') AS canon,
          |  json_format(json_parse('{"k": 1}')) AS fmt""".stripMargin)
    },

    // Array helper pack (reference: scalar/sql/ArraySqlFunctions.java
    // array_sum/array_average/array_frequency/array_duplicates/
    // array_has_duplicates; scalar/ArrayTrimFunction.java) — all
    // order-insensitive reductions over per-order quantity arrays, so the
    // oracle recomputes them relationally without arrays. Shared-dialect:
    // the oracle SQL is plain ANSI, also cross-run through Engine.sql.
    Qdef(
      "f18_array_extras",
      """SELECT l_orderkey,
        |  CAST(sum(q * c) AS BIGINT) AS s,
        |  round(sum(q * c) / CAST(sum(c) AS DOUBLE), 6) AS a,
        |  max(c) > 1 AS has_dup,
        |  CAST(sum(CASE WHEN q = 1 THEN c ELSE 0 END) AS INT) AS freq1,
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS INT) AS dup_cnt
        |FROM (
        |  SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS q, count(*) AS c
        |  FROM lineitem WHERE l_orderkey < 100
        |  GROUP BY l_orderkey, CAST(l_quantity AS BIGINT)) g
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT l_orderkey,
          |  array_sum(arr) AS s,
          |  round(array_average(arr), 6) AS a,
          |  array_has_duplicates(arr) AS has_dup,
          |  coalesce(element_at(array_frequency(arr), CAST(1 AS BIGINT)), 0) AS freq1,
          |  cardinality(array_duplicates(arr)) AS dup_cnt
          |FROM (SELECT l_orderkey, array_agg(CAST(l_quantity AS BIGINT)) AS arr
          |      FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey) t
          |ORDER BY l_orderkey""".stripMargin)
    },

    // Varbinary encoding/hash pack (reference: VarbinaryFunctions.java).
    // The oracle pins the reference's OWN published vectors
    // (presto-main/src/test/.../TestVarbinaryFunctions.java) — the same
    // ground-truth style as k06's RFC HMAC vectors.
    Qdef.duckOnly(
      "f19_binary_pack",
      """SELECT
        |  '6B19' AS hex_rt,
        |  7 AS be32_rt,
        |  CAST(-2 AS BIGINT) AS be64_rt,
        |  CAST(2.5 AS DOUBLE) AS ieee_rt,
        |  '93192FE805BE23041C8318F67EC4F2BC' AS mm128,
        |  '3768826AD382E6CA' AS sp64,
        |  '6BF50919' AS sp32,
        |  CAST(-3750763034362895579 AS BIGINT) AS fnv1_64_empty,
        |  CAST(881334279 AS BIGINT) AS fnv1a_32_vec,
        |  'E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855' AS sha256_empty,
        |  '--8=' AS b64url,
        |  'hi' AS b64_rt""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT
          |  to_hex(from_hex('6b19')) AS hex_rt,
          |  from_big_endian_32(to_big_endian_32(7)) AS be32_rt,
          |  from_big_endian_64(to_big_endian_64(CAST(-2 AS BIGINT))) AS be64_rt,
          |  from_ieee754_64(to_ieee754_64(2.5E0)) AS ieee_rt,
          |  to_hex(murmur3_x64_128(CAST('hashme' AS VARBINARY))) AS mm128,
          |  to_hex(spooky_hash_v2_64(CAST('hello' AS VARBINARY))) AS sp64,
          |  to_hex(spooky_hash_v2_32(CAST('' AS VARBINARY))) AS sp32,
          |  fnv1_64(from_hex('')) AS fnv1_64_empty,
          |  fnv1a_32(from_hex('0919')) AS fnv1a_32_vec,
          |  to_hex(sha256(CAST('' AS VARBINARY))) AS sha256_empty,
          |  to_base64url(from_hex('FBEF')) AS b64url,
          |  CAST(from_base64(to_base64(CAST('hi' AS VARBINARY))) AS VARCHAR) AS b64_rt""".stripMargin)
    },

    // Statistical CDF pack (reference: MathFunctions.java:760-1010 — the
    // reference computes with commons-math3, bundled with Spark, so the
    // closed-form oracle values below are exact or 1e-9-stable).
    Qdef.duckOnly(
      "f20_cdf_pack",
      """SELECT
        |  CAST(0.975002105 AS DOUBLE) AS norm,
        |  CAST(1.959963985 AS DOUBLE) AS inv_norm,
        |  round(1 - exp(-1), 9) AS chi2,
        |  round(1 - exp(-1), 9) AS weib,
        |  CAST(0.75 AS DOUBLE) AS cauchy,
        |  CAST(0.5 AS DOUBLE) AS beta,
        |  CAST(0.623046875 AS DOUBLE) AS binom,
        |  round(exp(-1), 9) AS poisson,
        |  3 AS inv_poisson,
        |  5 AS inv_binom,
        |  CAST(0.3 AS DOUBLE) AS beta_rt,
        |  CAST(1.0 AS DOUBLE) AS cauchy_rt""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT
          |  round(normal_cdf(0E0, 1E0, 1.96E0), 9) AS norm,
          |  round(inverse_normal_cdf(0E0, 1E0, 0.975E0), 9) AS inv_norm,
          |  round(chi_squared_cdf(2E0, 2E0), 9) AS chi2,
          |  round(weibull_cdf(1E0, 2E0, 2E0), 9) AS weib,
          |  round(cauchy_cdf(0E0, 1E0, 1E0), 9) AS cauchy,
          |  round(beta_cdf(2E0, 2E0, 0.5E0), 9) AS beta,
          |  round(binomial_cdf(10, 0.5E0, 5), 9) AS binom,
          |  round(poisson_cdf(1E0, 0), 9) AS poisson,
          |  inverse_poisson_cdf(3E0, 0.5E0) AS inv_poisson,
          |  inverse_binomial_cdf(10, 0.5E0, 0.5E0) AS inv_binom,
          |  round(inverse_beta_cdf(2E0, 5E0, beta_cdf(2E0, 5E0, 0.3E0)), 9) AS beta_rt,
          |  round(inverse_cauchy_cdf(0E0, 1E0, 0.75E0), 9) AS cauchy_rt""".stripMargin)
    },

    // json_extract / is_json_scalar / strrpos / split_to_multimap /
    // format_datetime / parse_datetime / timezone fields /
    // key_sampling_percent (references: JsonFunctions.java,
    // StringFunctions.java, SplitToMultimapFunction.java,
    // DateTimeFunctions.java, sql/SimpleSamplingPercent.java). DuckDB's
    // native json_extract shares the path dialect and oracles those
    // columns directly.
    Qdef.duckOnly(
      "f21_misc_extras",
      """SELECT
        |  CAST(json_extract('{"a": {"b": [10, 20]}}', '$.a.b[1]') AS VARCHAR) AS jx,
        |  CAST(json_extract('{"a": {"b": "x"}}', '$.a.b') AS VARCHAR) AS jx_str,
        |  true AS js_scalar,
        |  false AS js_arr,
        |  CAST(5 AS BIGINT) AS rpos,
        |  CAST(0 AS BIGINT) AS rpos_missing,
        |  '1,3' AS mm_a,
        |  '2024/01/02 03:04' AS fmt,
        |  TIMESTAMP '2024-01-02 03:04:05' AS parsed,
        |  CAST(0 AS BIGINT) AS tz_h,
        |  CAST(0 AS BIGINT) AS tz_m,
        |  CAST(5400000 AS BIGINT) AS dur_ms""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT
          |  json_extract('{"a": {"b": [10, 20]}}', '$.a.b[1]') AS jx,
          |  json_extract('{"a": {"b": "x"}}', '$.a.b') AS jx_str,
          |  is_json_scalar('7') AS js_scalar,
          |  is_json_scalar('[1, 2]') AS js_arr,
          |  strrpos('ababab', 'ab') AS rpos,
          |  strrpos('abc', 'z') AS rpos_missing,
          |  array_join(element_at(split_to_multimap('a=1,b=2,a=3', ',', '='), 'a'), ',') AS mm_a,
          |  format_datetime(TIMESTAMP '2024-01-02 03:04:05', 'yyyy/MM/dd HH:mm') AS fmt,
          |  parse_datetime('2024-01-02 03:04:05', 'yyyy-MM-dd HH:mm:ss') AS parsed,
          |  timezone_hour(TIMESTAMP '2024-01-02 03:04:05') AS tz_h,
          |  timezone_minute(TIMESTAMP '2024-01-02 03:04:05') AS tz_m,
          |  to_milliseconds(parse_duration('90m')) AS dur_ms""".stripMargin)
    },

    // Lambda-taking scalar forms (references: operator/scalar/
    // JoniRegexpReplaceLambdaFunction.java, SplitToMapFunction.java
    // lambda overload, JoniRegexpFunctions.java group-0 defaults,
    // ArrayConcatUtils.java element append) — all through the SQL facade;
    // DuckDB replays each via an equivalent spelling (translate for the
    // vowel-uppercase lambda, direct arithmetic for the merged map value).
    Qdef.duckOnly(
      "f22_lambda_hofs",
      """SELECT doc_id,
        |  translate(text, 'aeiou', 'AEIOU') AS vowels_up,
        |  CASE WHEN regexp_matches(text, '[a-z]+')
        |       THEN regexp_extract(text, '[a-z]+') END AS first_word,
        |  CAST(NULL AS VARCHAR) AS no_match,
        |  CAST(doc_id % 3 AS VARCHAR) || CAST(doc_id % 7 AS VARCHAR) AS a_merged,
        |  'x-' || CAST(doc_id AS VARCHAR) AS arr_elem
        |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT doc_id,
          |  regexp_replace(text, '([aeiou])', x -> upper(x[1])) AS vowels_up,
          |  regexp_extract(text, '[a-z]+') AS first_word,
          |  regexp_extract(text, 'zqzqzq[0-9]+') AS no_match,
          |  element_at(split_to_map(concat('a:', CAST(doc_id % 3 AS VARCHAR), ';b:', CAST(doc_id % 5 AS VARCHAR), ';a:', CAST(doc_id % 7 AS VARCHAR)), ';', ':', (k, v1, v2) -> concat(v1, v2)), 'a') AS a_merged,
          |  array_join(ARRAY['x'] || CAST(doc_id AS VARCHAR), '-') AS arr_elem
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin)
    },

    // reduce_agg (reference: operator/aggregation/ReduceAggregation
    // Function.java): native DeclarativeAggregate splicing the user
    // lambdas into update/merge — DuckDB oracles the sum and max folds
    // directly. (l_quantity is integral-valued, so the BIGINT casts
    // agree between Spark truncation and DuckDB rounding.)
    Qdef.duckOnly(
      "f23_reduce_agg",
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
        |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_max
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      graft.Engine.sql(s, dir,
        """SELECT l_returnflag,
          |  reduce_agg(CAST(l_quantity AS BIGINT), CAST(0 AS BIGINT), (a, b) -> a + b, (a, b) -> a + b) AS qty_sum,
          |  reduce_agg(CAST(l_quantity AS BIGINT), CAST(0 AS BIGINT), (a, b) -> IF(b > a, b, a), (a, b) -> IF(b > a, b, a)) AS qty_max
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }
  )
}
