package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reference documentation examples run VERBATIM through the facade
  * (source: presto-docs/src/main/sphinx/functions (.rst files) — each `SELECT
  * …; -- expected` pair is the reference's own published behavioral
  * contract). Typed IPADDRESS/IPPREFIX/JSON literals exercise the
  * dialect's typed-literal narrowing; results compare against the
  * documented values.
  */
class DocVectorsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def dir = TestSpark.sfDir

  private def one(sql: String): Any =
    Engine.sql(spark, dir, sql).collect()(0).get(0)

  private def seq(sql: String): Seq[Any] =
    one(sql).asInstanceOf[scala.collection.Seq[Any]].toSeq

  test("ip.rst examples") {
    assert(one("SELECT ip_prefix(CAST('192.168.255.255' AS VARCHAR), 9)")
      == "192.128.0.0/9")
    assert(one("SELECT ip_prefix('2001:0db8:85a3:0001:0001:8a2e:0370:7334', 48)")
      == "2001:db8:85a3::/48")
    assert(one("SELECT ip_subnet_min(IPPREFIX '192.168.255.255/9')")
      == "192.128.0.0")
    assert(one("SELECT ip_subnet_min(IPPREFIX '2001:0db8:85a3:0001:0001:8a2e:0370:7334/48')")
      == "2001:db8:85a3::")
    assert(one("SELECT ip_subnet_max(IPPREFIX '192.64.0.0/9')")
      == "192.127.255.255")
    assert(one("SELECT ip_subnet_max(IPPREFIX '2001:0db8:85a3:0001:0001:8a2e:0370:7334/48')")
      == "2001:db8:85a3:ffff:ffff:ffff:ffff:ffff")
    assert(seq("SELECT ip_subnet_range(IPPREFIX '1.2.3.160/24')")
      == Seq("1.2.3.0", "1.2.3.255"))
    assert(seq("SELECT ip_subnet_range(IPPREFIX '64:ff9b::52f4/120')")
      == Seq("64:ff9b::5200", "64:ff9b::52ff"))
    assert(one("SELECT is_subnet_of(IPPREFIX '1.2.3.128/26', IPADDRESS '1.2.3.129')")
      == true)
    assert(one("SELECT is_subnet_of(IPPREFIX '64:fa9b::17/64', IPADDRESS '64:ffff::17')")
      == false)
  }

  test("array.rst examples: lambdas, reduce, ngrams, zip") {
    assert(seq("SELECT filter(ARRAY [5, -6, NULL, 7], x -> x > 0)") == Seq(5, 7))
    assert(one("SELECT reduce(ARRAY [], 0, (s, x) -> s + x, s -> s)") == 0)
    assert(one("SELECT reduce(ARRAY [5, 20, 50], 0, (s, x) -> s + x, s -> s)") == 75)
    assert(one("SELECT reduce(ARRAY [5, 20, NULL, 50], 0, (s, x) -> s + x, s -> s)") == null)
    assert(one("SELECT reduce(ARRAY [5, 20, NULL, 50], 0, (s, x) -> s + COALESCE(x, 0), s -> s)") == 75)
    assert(seq("SELECT transform(ARRAY [5, 6], x -> x + 1)") == Seq(6, 7))
    assert(seq("SELECT transform(ARRAY ['x', 'abc', 'z'], x -> x || '0')")
      == Seq("x0", "abc0", "z0"))
    assert(one("SELECT cardinality(ngrams(ARRAY['foo', 'bar', 'baz', 'foo'], 2))") == 3)
    assert(seq("SELECT zip_with(ARRAY[1, 2], ARRAY[3, 4], (x, y) -> x + y)") == Seq(4, 6))
    // zip: positional row zip with NULL padding
    assert(one("SELECT cardinality(zip(ARRAY[1, 2], ARRAY['1b', null, '3b']))") == 3)
    // the padded second row's second field is NULL (row FIELD access —
    // positional [n] subscripts on rows are untranslatable without types)
    assert(one(
      """SELECT element_at(transform(zip(ARRAY[1, 2], ARRAY['a']), r -> r."1" IS NULL), 2)""")
      == true)
  }

  test("binary.rst / math.rst examples") {
    assert(one("SELECT to_hex(CAST('abc' AS VARBINARY))") == "616263")
    assert(one("SELECT from_big_endian_64(to_big_endian_64(1234567890))") == 1234567890L)
    assert(one("SELECT round(normal_cdf(0, 1, 0), 1)") == 0.5)
    assert(one("SELECT round(beta_cdf(3, 3.6, 0.0), 1)") == 0.0)
    assert(one("SELECT round(beta_cdf(3, 3.6, 1.0), 1)") == 1.0)
  }

  test("lambda.rst / map.rst examples") {
    assert(one("SELECT any_match(ARRAY[1, 2, 3], x -> x > 2)") == true)
    assert(one("SELECT cardinality(map_filter(MAP(ARRAY['k1', 'k2', 'k3'], ARRAY[20, 3, 15]), (k, v) -> v > 10))")
      == 2)
    assert(one("SELECT element_at(transform_values(MAP(ARRAY[1], ARRAY[10]), (k, v) -> v + k), 1)")
      == 11)
    assert(one("SELECT cardinality(multimap_from_entries(ARRAY[(1, 'x'), (2, 'y'), (1, 'z')]))")
      == 2)
  }

  test("conversion.rst JSON cast examples") {
    assert(one("SELECT CAST('abc' AS JSON)") == "\"abc\"")
    assert(one("SELECT CAST(1 AS JSON)") == "1")
    assert(one("SELECT CAST(true AS JSON)") == "true")
    assert(one("SELECT CAST(ARRAY[1, 23, 456] AS JSON)") == "[1,23,456]")
    assert(one("SELECT CAST(ARRAY[1, NULL, 456] AS JSON)") == "[1,null,456]")
    assert(one("SELECT CAST(ARRAY[ARRAY[1, 23], ARRAY[456]] AS JSON)")
      == "[[1,23],[456]]")
    assert(one("SELECT CAST(MAP_FROM_ENTRIES(ARRAY[('k1', 1), ('k2', 23), ('k3', 456)]) AS JSON)")
      == """{"k1":1,"k2":23,"k3":456}""")
    assert(one("SELECT CAST(NULL AS JSON)") == null)
    // JSON → typed values via from_json
    assert(seq("SELECT CAST(JSON '[1,23,456]' AS ARRAY(INTEGER))") == Seq(1, 23, 456))
    assert(seq("SELECT CAST(JSON '[1,null,456]' AS ARRAY(INTEGER))") == Seq(1, null, 456))
    assert(seq("SELECT CAST(JSON '[[1,23],[456]]' AS ARRAY(ARRAY(INTEGER)))")
      .map(_.asInstanceOf[scala.collection.Seq[Int]].toSeq) == Seq(Seq(1, 23), Seq(456)))
    assert(one("SELECT element_at(CAST(JSON '{\"k1\":1,\"k2\":23}' AS MAP(VARCHAR, INTEGER)), 'k2')")
      == 23)
    // object-keyed row cast (positional array→row is a documented gap:
    // from_json maps JSON objects to structs by field name)
    assert(one("SELECT CAST(JSON '{\"v1\":123,\"v2\":\"abc\",\"v3\":true}' AS ROW(v1 BIGINT, v2 VARCHAR, v3 BOOLEAN)).v2")
      == "abc")
    // the standard parse idiom: CAST(json_parse(col) AS typed)
    assert(seq("SELECT CAST(json_parse('[10, 20]') AS ARRAY(BIGINT))") == Seq(10L, 20L))
  }

  test("bitwise.rst / comparison typed-literal examples") {
    assert(one("SELECT bitwise_right_shift_arithmetic(BIGINT '-8', 2)") == -2L)
    assert(one("SELECT bitwise_right_shift(TINYINT '7', 2)") == 1L)
    assert(one("SELECT REAL '1.5' + REAL '2.5'") == 4.0f)
    assert(one("SELECT SMALLINT '32' * SMALLINT '2'") == 64)
    // legacy 3-arg shifts mask to the word size
    assert(one("SELECT bitwise_shift_left(7, 2, 4)") == 12L)
    assert(one("SELECT bitwise_shift_left(7, 2, 64)") == 28L)
    assert(one("SELECT bitwise_logical_shift_right(12, 2, 4)") == 3L)
    // per-type-width shifts (BitwiseFunctions.java overloads): narrow
    // types mask to their width for the logical shift; shift >= 64 is 0
    // (never Java's mod-64); shift 0 returns the value; arithmetic shift
    // of a negative by >= 64 is -1
    assert(one("SELECT bitwise_right_shift(SMALLINT '-8', 2)") == 16382L)
    assert(one("SELECT bitwise_right_shift(TINYINT '-8', 2)") == 62L)
    assert(one("SELECT bitwise_right_shift(8, 70)") == 0L)
    assert(one("SELECT bitwise_right_shift(SMALLINT '-8', 0)") == -8L)
    assert(one("SELECT bitwise_left_shift(TINYINT '-7', 2)") == -28L)
    assert(one("SELECT bitwise_left_shift(SMALLINT '7', 2)") == 28L)
    assert(one("SELECT bitwise_left_shift(TINYINT '7', 64)") == 0L)
    assert(one("SELECT bitwise_right_shift_arithmetic(8, 70)") == 0L)
    assert(one("SELECT bitwise_right_shift_arithmetic(-8, 70)") == -1L)
    // 2-arg bit_count counts within an n-bit word (bitwise.rst examples)
    assert(one("SELECT bit_count(9, 64)") == 2L)
    assert(one("SELECT bit_count(9, 8)") == 2L)
    assert(one("SELECT bit_count(-7, 64)") == 62L)
    assert(one("SELECT bit_count(-7, 8)") == 6L)
  }

  test("datetime.rst AT TIME ZONE operator") {
    // doc example (seconds spelled out — see README TIME/TSWTZ narrowing:
    // the zone-qualified literal renders as a session-zone timestamp, so
    // UTC-session wall-clock matches the documented LA wall-clock)
    assert(one("SELECT TIMESTAMP '2012-10-31 01:00:00 UTC' AT TIME ZONE 'America/Los_Angeles'")
      == java.sql.Timestamp.valueOf("2012-10-30 18:00:00"))
    // interval-offset zone spec (SqlBase.g4 timeZoneSpecifier)
    assert(one("SELECT TIMESTAMP '2012-10-31 01:00:00' AT TIME ZONE INTERVAL '-08:00' HOUR TO MINUTE")
      == java.sql.Timestamp.valueOf("2012-10-30 17:00:00"))
    // operand shapes: call and identifier; 'at' elsewhere stays a word
    assert(one("SELECT CAST('2012-10-31' AS TIMESTAMP) AT TIME ZONE 'Asia/Kolkata'")
      == java.sql.Timestamp.valueOf("2012-10-31 05:30:00"))
    assert(one("SELECT at FROM (SELECT 7 AS at) t") == 7)
    // the doc's seconds-less zone-qualified literal parses verbatim
    assert(one("SELECT TIMESTAMP '2012-10-31 01:00 UTC' AT TIME ZONE 'America/Los_Angeles'")
      == java.sql.Timestamp.valueOf("2012-10-30 18:00:00"))
  }

  test("datetime.rst unixtime round trips") {
    // to_unixtime keeps the fraction (DOUBLE); from_unixtime returns a
    // TIMESTAMP, with the 2-arg zone and 3-arg fixed-offset forms
    // narrowed to their wall clocks (DateTimeFunctions.java fromUnixTime)
    assert(one("SELECT to_unixtime(TIMESTAMP '2024-03-15 10:20:30.500')") == 1.7104980305e9)
    assert(one("SELECT from_unixtime(1710498030.25)")
      == java.sql.Timestamp.valueOf("2024-03-15 10:20:30.25"))
    assert(one("SELECT from_unixtime(1710498030, 'America/Los_Angeles')")
      == java.sql.Timestamp.valueOf("2024-03-15 03:20:30"))
    // offset = hours*60 + minutes, sign from the total: (-5, 30) = -04:30
    assert(one("SELECT from_unixtime(1710498030, 5, 30)")
      == java.sql.Timestamp.valueOf("2024-03-15 15:50:30"))
    assert(one("SELECT from_unixtime(1710498030, -5, 30)")
      == java.sql.Timestamp.valueOf("2024-03-15 05:50:30"))
    // bare localtimestamp keyword resolves (narrowed to current_timestamp)
    assert(one("SELECT localtimestamp") != null)
    assert(one("SELECT localtimestamp(3)") != null)
  }

  test("teradata.rst compatibility functions") {
    // TeradataDateFunctions.java doc-comment examples: formatting always
    // zero-pads two-position fields, parsing accepts single digits
    assert(one("SELECT to_char(TIMESTAMP '1988-04-08 02:03:04', 'yyyy/mm/dd hh24:mi:ss')")
      == "1988/04/08 02:03:04")
    assert(one("SELECT to_timestamp('1988/4/8 2:3:4', 'yyyy/mm/dd hh24:mi:ss')")
      == java.sql.Timestamp.valueOf("1988-04-08 02:03:04"))
    assert(one("SELECT to_date('1988/04/08', 'yyyy/mm/dd')")
      == java.sql.Date.valueOf("1988-04-08"))
    // hh is the 1-12 clock (HOUR_OF_AMPM); yy parses reduced on base 2000
    assert(one("SELECT to_char(TIMESTAMP '1988-04-08 14:03:04', 'hh:mi')") == "02:03")
    assert(one("SELECT to_date('88/04/08', 'yy/mm/dd')")
      == java.sql.Date.valueOf("2088-04-08"))
    // punctuation and whitespace are the only literals; anything else is
    // a loud tokenize error (DateFormat.g4 UNRECOGNIZED)
    assertThrows[Exception](one("SELECT to_char(TIMESTAMP '1988-04-08 02:03:04', 'yyyyabc')"))
    // TeradataStringFunctions.java: index = strpos, char2hexint = UTF-16BE hex
    assert(one("SELECT index('high', 'ig')") == 2L)
    assert(one("SELECT index('high', 'zz')") == 0L)
    assert(one("SELECT char2hexint('Hello')") == "00480065006C006C006F")
  }

  test("conversion.rst typeof and ROW constructor casts") {
    assert(one("SELECT typeof('cat')") == "varchar(3)")
    assert(one("SELECT typeof(123)") == "integer")
    // ROW(…) constructor + named-row cast + positional row→JSON array
    assert(one("SELECT CAST(CAST(ROW(123, 'abc', true) AS ROW(v1 BIGINT, v2 VARCHAR, v3 BOOLEAN)) AS JSON)")
      == """[123,"abc",true]""")
    // JSON ARRAY → row maps positionally (object form maps by name)
    assert(one("""SELECT CAST(JSON '[123,"abc",true]' AS ROW(v1 BIGINT, v2 VARCHAR, v3 BOOLEAN)).v2""")
      == "abc")
    // parse_duration carries millisecond precision like the reference
    assert(one("SELECT to_milliseconds(parse_duration('42.8ms'))") == 43L)
  }

  test("array.rst combinations are positional over duplicate values") {
    // (the registered UDF is string-element-typed; values are positional)
    val dup = one("SELECT combinations(ARRAY[1, 2, 2], 2)")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[String]]]
      .map(_.toSeq).toSeq
    assert(dup == Seq(Seq("1", "2"), Seq("1", "2"), Seq("2", "2")))
    assert(one("SELECT cardinality(combinations(ARRAY[1, 2, 3, 4, 5], 3))") == 10)
  }

  test("comparison.rst quantified comparison examples") {
    assert(one("SELECT 'hello' = ANY (VALUES 'hello', 'world')") == true)
    assert(one("SELECT 21 < ALL (VALUES 19, 20, 21)") == false)
    assert(one("SELECT 42 >= SOME (SELECT 41 UNION ALL SELECT 42 UNION ALL SELECT 43)") == true)
    assert(one("SELECT 19 <= ALL (VALUES 19, 20, 21)") == true)
    assert(one("SELECT 5 > ANY (VALUES 10, 3, 7)") == true)
    assert(one("SELECT 'x' <> ALL (VALUES 'a', 'b')") == true)
    assert(one("SELECT 'a' <> ALL (VALUES 'a', 'b')") == false)
    // three-valued empty-set / NULL-element semantics (round-13
    // closer; reference quantifiedComparison): ALL over an empty
    // relation is TRUE and ANY FALSE regardless of the left side;
    // a satisfied extremum over a NULL-holding set is unknown
    assert(one("SELECT 5 < ALL (SELECT 1 WHERE false)") == true)
    assert(one("SELECT 5 > ANY (SELECT 1 WHERE false)") == false)
    assert(one("SELECT 5 > ALL (VALUES 1, NULL)") == null)
    assert(one("SELECT 15 < ALL (VALUES 10, NULL)") == false)
    assert(one("SELECT 5 > ANY (VALUES 1, NULL)") == true)
    assert(one("SELECT 5 > ANY (VALUES 10, NULL)") == null)
  }

  test("CHAR(n) stays a documented divergence: unpadded in expressions") {
    // The reference's CHAR(n) pads casts to n spaces (presto-common/
    // .../type/Chars.java:33 padSpaces: LENGTH(CAST('hello' AS
    // CHAR(20))) = 20) and compares CHARs pad-INsensitively by
    // padding to the common length (TestCharOperators:
    // cast('foo' as char(3)) = cast('foo' as char(5)) is TRUE).
    // Those two halves need the char LENGTH carried through the type
    // system; Spark erases char(n) to string in expression contexts,
    // so materializing the pad on cast would fix LENGTH while flipping
    // every length-mismatched comparison the OTHER way (measured over
    // the 116 CHAR rows of the replay corpus: eager padding passes
    // FEWER than the unpadded form). Adjudication: keep Spark's
    // unpadded semantics, pinned here; README divergence matrix row.
    assert(one("SELECT LENGTH(CAST('hello' AS CHAR(20)))") == 5)
    assert(one("SELECT CAST('bar' AS CHAR(5)) = 'bar'") == true)
    assert(one("SELECT CAST('foo' AS CHAR(3)) = CAST('foo' AS CHAR(5))") == true)
  }

  test("json.rst examples") {
    assert(one("SELECT is_json_scalar('1')") == true)
    assert(one("SELECT is_json_scalar('[1, 2, 3]')") == false)
    assert(one("SELECT json_array_contains('[1, 2, 3]', 2)") == true)
    assert(one("SELECT json_array_length('[1, 2, 3]')") == 3)
  }

  test("regexp.rst examples: group-0 defaults, NULL on no match, lambda replace") {
    assert(seq("""SELECT regexp_extract_all('1a 2b 14m', '\d+')""")
      == Seq("1", "2", "14"))
    assert(seq("""SELECT regexp_extract_all('1a 2b 14m', '(\d+)([a-z]+)', 2)""")
      == Seq("a", "b", "m"))
    assert(one("""SELECT regexp_extract('1a 2b 14m', '\d+')""") == "1")
    assert(one("""SELECT regexp_extract('1a 2b 14m', '(\d+)([a-z]+)', 2)""") == "a")
    assert(one("SELECT regexp_extract('hello', 'world')") == null)
    assert(one("""SELECT regexp_replace('1a 2b 14m', '\d+[ab] ')""") == "14m")
    assert(one("""SELECT regexp_replace('1a 2b 14m', '(\d+)([ab]) ', '3c$2 ')""")
      == "3ca 3cb 14m")
    // lambda replace (JoniRegexpReplaceLambdaFunction.java semantics)
    assert(one("""SELECT regexp_replace('new york', '(\w)(\w*)', x -> upper(x[1]) || lower(x[2]))""")
      == "New York")
    // zero-width matches advance one character, keeping it in the output
    assert(one("SELECT regexp_replace('abc', '', x -> 'X')") == "XaXbXcX")
    // a NULL lambda result nulls the whole string
    assert(one("""SELECT regexp_replace('ab', '(a)', x -> IF(x[1] = 'a', NULL, x[1]))""")
      == null)
    assert(seq("""SELECT regexp_split('1a 2b 14m', '\s*[a-z]+\s*')""")
      == Seq("1", "2", "14", ""))
  }

  test("array.rst: element concatenation and comparator array_sort") {
    assert(seq("SELECT ARRAY [1] || ARRAY [2]") == Seq(1, 2))
    assert(seq("SELECT ARRAY [1] || 2") == Seq(1, 2))
    assert(seq("SELECT 2 || ARRAY [1]") == Seq(2, 1))
    assert(one("SELECT 'a' || 'b'") == "ab") // plain string concat untouched
    // a LITERAL NULL resolves to the all-array overload with a null
    // argument → NULL (the reference's TestArrayOperators.java:437
    // concat(ARRAY[], …, NULL, …) = null), NOT a null element append
    assert(one("SELECT ARRAY[1] || NULL") == null)
    assert(seq("SELECT array_sort(ARRAY [3, 2, 5, 1, 2], (x, y) -> IF(x < y, 1, IF(x = y, 0, -1)))")
      == Seq(5, 3, 2, 2, 1))
    assert(seq("SELECT array_sort(ARRAY ['bc', 'ab', 'dc'], (x, y) -> IF(x < y, 1, IF(x = y, 0, -1)))")
      == Seq("dc", "bc", "ab"))
  }

  test("map.rst examples") {
    assert(one("SELECT cardinality(map())") == 0)
    assert(one("SELECT element_at(map(ARRAY[1,3], ARRAY[2,4]), 3)") == 4)
    assert(one("SELECT cardinality(map_filter(MAP(ARRAY[], ARRAY[]), (k, v) -> true))") == 0)
    assert(one("SELECT element_at(map_zip_with(MAP(ARRAY[1, 2, 3], ARRAY['a', 'b', 'c']), MAP(ARRAY[1, 2, 3], ARRAY['d', 'e', 'f']), (k, v1, v2) -> concat(v1, v2)), 1)")
      == "ad")
    assert(one("SELECT element_at(transform_keys(MAP(ARRAY [1, 2, 3], ARRAY ['a', 'b', 'c']), (k, v) -> k + 1), 4)")
      == "c")
    assert(one("SELECT element_at(transform_values(MAP(ARRAY [1, 2, 3], ARRAY [10, 20, 30]), (k, v) -> v + k), 3)")
      == 33)
  }

  test("logical.rst three-valued logic examples") {
    assert(one("SELECT CAST(null AS boolean) AND false") == false)
    assert(one("SELECT CAST(null AS boolean) AND true") == null)
    assert(one("SELECT CAST(null AS boolean) OR true") == true)
    assert(one("SELECT CAST(null AS boolean) OR false") == null)
    assert(one("SELECT NOT CAST(null AS boolean)") == null)
  }

  test("aggregate.rst reduce_agg examples") {
    val sum = Engine.sql(spark, dir,
      """SELECT id, reduce_agg(value, 0, (a, b) -> a + b, (a, b) -> a + b) AS r
        |FROM (VALUES (1, 2), (1, 3), (1, 4), (2, 20), (2, 30), (2, 40)) AS t(id, value)
        |GROUP BY id ORDER BY id""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(sum == Seq((1, 9), (2, 90)))
    val prod = Engine.sql(spark, dir,
      """SELECT id, reduce_agg(value, 1, (a, b) -> a * b, (a, b) -> a * b) AS r
        |FROM (VALUES (1, 2), (1, 3), (1, 4), (2, 20), (2, 30), (2, 40)) AS t(id, value)
        |GROUP BY id ORDER BY id""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(prod == Seq((1, 24), (2, 24000)))
    // an empty (all-NULL) group is NULL like the reference, not the seed
    assert(one("SELECT reduce_agg(x, 0, (a, b) -> a + b, (a, b) -> a + b) FROM (VALUES (CAST(NULL AS INTEGER))) AS t(x)")
      == null)
  }

  test("string.rst split_to_map duplicate-key lambda examples") {
    assert(one("SELECT element_at(split_to_map('a:1;b:2;a:3', ';', ':', (k, v1, v2) -> v1), 'a')")
      == "1")
    assert(one("SELECT element_at(split_to_map('a:1;b:2;a:3', ';', ':', (k, v1, v2) -> CONCAT(v1, v2)), 'a')")
      == "13")
    assert(one("SELECT element_at(split_to_map('a:1;b:2;a:3', ';', ':', (k, v1, v2) -> v2), 'b')")
      == "2")
    // v1 carries the PREVIOUS lambda result, which can be NULL — its
    // lambda slot must be nullable or NullPropagation folds coalesce away
    assert(one("SELECT element_at(split_to_map('a:1;a:2;a:3', ';', ':', (k, v1, v2) -> IF(v2 = '2', NULL, coalesce(v1, 'X'))), 'a')")
      == "X")
  }

  test("lambda replace recompiles per-row patterns (cache keys are cloned)") {
    // DISTRIBUTE BY 1 forces the rows through one shuffle partition whose
    // reader reuses its row buffer: equal-length alternating patterns
    // would hit a stale compiled Pattern if the cache key aliased the
    // mutating UTF8String
    val rows = Engine.sql(spark, dir,
      """SELECT regexp_replace(s, p, x -> upper(x[1])) AS r
        |FROM (SELECT * FROM (VALUES ('aaa', '(a)'), ('bbb', '(b)'), ('ccc', '(c)')) AS t(s, p)
        |      DISTRIBUTE BY 1)
        |ORDER BY r""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("AAA", "BBB", "CCC"))
  }

  test("decimal.rst result-type rules: matches, and the two pinned divergences") {
    // addition follows the SQL-standard formula both dialects share
    // (reference docs functions/decimal.rst "precision and scale"):
    // p = max(s1,s2) + max(p1-s1,p2-s2) + 1, s = max(s1,s2)
    assert(one("SELECT typeof(CAST(1.2 AS DECIMAL(3,1)) + CAST(1.25 AS DECIMAL(4,2)))")
      == "decimal(5,2)")
    // typed DECIMAL literals size to their digits, like the reference
    assert(one("SELECT typeof(DECIMAL '1.2')") == "decimal(2,1)")
    assert(one("SELECT typeof(1.25)") == "decimal(3,2)")
    // PINNED DIVERGENCES (documented, value-compatible):
    //  - multiplication: reference p = p1+p2; Spark reserves one more
    //    integral digit (p1+p2+1) — wider type, identical values
    assert(one("SELECT typeof(CAST(1.2 AS DECIMAL(3,1)) * CAST(1.25 AS DECIMAL(4,2)))")
      == "decimal(8,3)")
    //  - division: reference s = max(s1,s2); Spark carries extra scale
    //    (s1 + p2 + 1 capped) — same quotient up to trailing zeros
    assert(one("SELECT typeof(CAST(1.2 AS DECIMAL(3,1)) / CAST(1.25 AS DECIMAL(4,2)))")
      == "decimal(10,6)")
    assert(one("SELECT CAST(CAST(1.2 AS DECIMAL(3,1)) / CAST(1.25 AS DECIMAL(4,2)) AS DECIMAL(6,2))")
      .toString == "0.96")
  }
}
