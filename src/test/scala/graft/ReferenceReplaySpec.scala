package graft

/** Replays the reference's OWN scalar-test assertions through
  * `Engine.sql` (mirroring presto-main's FunctionAssertions: evaluate
  * one expression, compare one value). Two layers:
  *
  *  1. SENTINELS (always run, ~30 cases): one per conformance fix the
  *     round-12 replay campaign landed — LIKE's no-implicit-escape,
  *     standard-SQL literals, NULL-propagating extrema, IEEE float
  *     division, map =/IS DISTINCT FROM, instance-form strpos, lenient
  *     from_utf8, token-strict json_array_contains, … Each sentinel is
  *     an exact (expression, expected) pair from the reference test
  *     files cited in the conformance pack; a regression in any wrapper
  *     or rewrite trips its sentinel by name.
  *
  *  2. FULL SWEEP (opt-in, SPARK_GRAFT_REPLAY=1): all 3259 frozen
  *     simple-literal assertions in reference_assertions.tsv
  *     (tools/extract_ref_asserts.py, 55 reference test files; datetime
  *     files replay under the session zone the reference harness pinned
  *     — TSV column 6). Asserts a pass FLOOR (≥ 3200 — measured 3212
  *     after the three round-16 extensions: +420 assertions closing
  *     JSON scalar-cast token coercions, the UUID facade type,
  *     java.util.regex replacement grammar, sorted-key JSON
  *     canonicalization, BigDecimal truncate; +270 closing the
  *     IPADDRESS/IPPREFIX canonical facade types, interval literal
  *     normalization + varchar render, bare-CHAR truncation,
  *     NULL-argument array_except, reduce initial-state widening; +166
  *     datetime rows closing interval-field rollover EXTRACT,
  *     millisecond TIMESTAMP/TIME varchar renders and CAST(x AS TIME) —
  *     all 166 green; 2368 of 2403 after round 14) rather than
  *     exactness:
  *     the remaining tail is documented divergence families (CHAR(n)
  *     padded semantics/comparisons, FILTER/JOIN-position array
  *     equality, varchar-length-blind typeof, reference-internal test
  *     helpers like "$internal$bind"/"vl"/"invoke", and a handful of
  *     expected-exception assertions the extractor recorded as value
  *     assertions), each listed in README's divergence matrix, not
  *     silent gaps.
  */
class ReferenceReplaySpec extends QueryAssertions {

  private def one(sql: String): Any = {
    val rows = Engine.sql(spark, sfDir, s"SELECT $sql AS v").collect()
    assert(rows.length == 1, s"expected one row for $sql")
    rows(0).get(0)
  }

  private def check(expr: String, expected: Any): Unit = {
    val got = one(expr)
    (expected, got) match {
      case (e: Double, g: Double) =>
        assert(math.abs(g - e) <= math.abs(e) * 1e-9 + 1e-12,
          s"$expr: expected $e, got $g")
      case _ =>
        assert(String.valueOf(got) == String.valueOf(expected),
          s"$expr: expected $expected, got $got")
    }
  }

  test("sentinels: string-literal and LIKE escape semantics") {
    check("'a\\d+'", "a\\d+")                       // backslash is ordinary
    check("'it''s'", "it's")                        // '' doubling still works
    check("'_monkey_' like '\\_monkey\\_'", false)  // no implicit escape
    check("'_monkey_' like '_monkey_' escape ''", true) // empty = no escape
    check("'_monkey_' like '\\_monkey\\_' escape '\\'", true) // explicit kept
  }

  test("sentinels: NULL-propagating extrema and array min/max") {
    check("greatest(5, 4, CAST(NULL AS INTEGER), 3)", null)
    check("least(5, 4, CAST(NULL as DOUBLE), 3)", null)
    check("greatest(-1)", -1)
    check("ARRAY_MIN(ARRAY [NULL, 2, 3])", null)
    check("ARRAY_MAX(ARRAY ['1', '2', NULL])", null)
    check("is_nan(NULL)", null)
  }

  test("sentinels: IEEE float division under ANSI integer semantics") {
    check("is_infinite(1.0E0 / 0.0E0)", true)
    check("is_nan(0.0E0 / 0.0E0)", true)
    check("8.0E0 / 2.0E0", 4.0)
    // integer division-by-zero still RAISES (BigintOperators.java:114)
    intercept[Exception] { one("1 / 0") }
  }

  test("sentinels: integral division is INTEGER typed like the reference") {
    check("5 / 2", 2)                       // IntegerOperators.java divide
    check("-5 / 3", -1)                     // truncates toward zero
    check("BIGINT '7' / 2", 3L)
    check("CAST(5 AS DOUBLE) / 2", 2.5)     // user cast fixes the type
    check("greatest(-1.5E0, -2.3E0, -5/3)", -1.0)
    check("TRY(1/0)", null)
  }

  test("sentinels: float-to-integral casts round half-up like the reference") {
    check("cast(37.7E0 as bigint)", 38L)    // DoubleOperators.java:235
    check("cast(-37.7E0 as bigint)", -38L)
    check("cast(-17.5E0 as integer)", -18)  // HALF_UP is away from zero
    check("cast(2.2E0 as smallint)", 2)
  }

  test("sentinels: try_cast keeps null-on-error through half-up rounding") {
    // TryCastFunction null-on-error contract must survive the
    // FloatCastRoundingRewrite (the rewrite copies the original cast so
    // EvalMode.TRY is preserved)
    check("TRY_CAST(1E30 AS BIGINT)", null)
    check("TRY_CAST(nan() AS INTEGER)", null)
    check("TRY_CAST(37.7E0 AS BIGINT)", 38L)
    check("TRY_CAST(-37.7E0 AS INTEGER)", -38)
  }

  test("sentinels: user-cast double operands take IEEE division") {
    // CAST(i AS DOUBLE) / j is float-rooted by the USER cast even though
    // the pre-coercion child is integral (DoubleOperators.java divide)
    check("is_infinite(CAST(5 AS DOUBLE) / 0)", true)
    check("CAST(5 AS DOUBLE) / 0 > 0", true)
    check("is_nan(CAST(0 AS DOUBLE) / 0)", true)
  }

  test("sentinels: typed-null concat operand appends a NULL element") {
    // reference resolves ARRAY[1] || <typed null> to the element-append
    // overload → [1, NULL]; only the BARE untyped NULL spelling folds
    // the whole concat to NULL (TestArrayOperators:437)
    assert(one("ARRAY[1] || CAST(NULL AS INTEGER)")
      .asInstanceOf[scala.collection.Seq[Any]].toList == List(1, null))
    check("ARRAY[1] || NULL", null)
    check("NULL || ARRAY[2]", null)
  }

  test("sentinels: nested FROM-form substring binds the outer separator") {
    check("SUBSTRING(SUBSTRING('hello' FROM 2) FROM 2)", "llo")
    check("SUBSTRING(SUBSTRING('abcdef' FROM 2 FOR 4) FROM 2 FOR 2)", "cd")
    check("SUBSTRING(' from ' FROM 2 FOR 4)", "from")
  }

  test("sentinels: scalar lambda apply and anonymous row fields") {
    check("apply(5, x -> x + 1)", 6)        // ApplyFunction.java
    check("apply(CAST(NULL AS INTEGER), x -> x IS NULL)", true)
    check("apply(11, x -> apply(x + 7, y -> apply(y * 3, z -> z * 5) + 1) * 2)",
      542)
    check("row(1, 'kittens').field1", "kittens") // TestRowOperators
    check("array[row(1, 2)][1].field1", 2)
    check("CAST(row(1, 2) AS ROW(x INTEGER, y INTEGER)).y", 2)
  }

  test("sentinels: array membership, position instances, intersect") {
    check("CONTAINS(ARRAY ['puppies', 'dogs'], 'dogs')", true)
    check("CONTAINS(ARRAY [1, 2, 3], 5)", false)
    check("ARRAY_POSITION(ARRAY [10, 20, 30, 30], 30, 2)", 4)
    check("ARRAY_POSITION(CAST(ARRAY[] AS ARRAY(BIGINT)), 1, -1)", 0)
    check("ARRAY_POSITION(ARRAY [1.0, 2.0, 3.0, 4.0], 3)", 3)
    check("ARRAYS_OVERLAP(ARRAY [10.1, 9.1], ARRAY [9.09, 9.0])", false)
    check("array_intersect(NULL, ARRAY[NULL])", null)
    check("array_sort(array_intersect(ARRAY[ARRAY[1,2,3], ARRAY[2,3,4]]))[1]", 2)
  }

  test("sentinels: map comparison operators") {
    check("MAP(ARRAY[1,3], ARRAY[2,4]) = MAP(ARRAY[3,1], ARRAY[4,2])", true)
    check("MAP(ARRAY[1], ARRAY[2]) = MAP(ARRAY[1], ARRAY[4])", false)
    check("ARRAY[MAP(ARRAY[1], ARRAY[NULL]) = MAP(ARRAY[1], ARRAY[NULL])][1]", null)
    check("MAP(ARRAY[1], ARRAY[NULL]) IS DISTINCT FROM MAP(ARRAY[1], ARRAY[NULL])",
      false)
    check("MAP(ARRAY[1], ARRAY[NULL]) IS DISTINCT FROM MAP(ARRAY[1], ARRAY[0])",
      true)
    check("MAP(ARRAY[1], ARRAY[2]) IS DISTINCT FROM NULL", true)
  }

  test("sentinels: string function boundary contracts") {
    check("STRPOS('abc/xyz/foo/bar', '/', 3)", 12)
    check("STRRPOS('foobarfoo', 'oo', 2)", 2)
    check("SPLIT_PART('abc', 'abc', 3)", null)
    check("SPLIT_PART('abc', '', 2)", "b")
    check("SUBSTR('Quadratically', -50)", "")
    check("SUBSTR('Quadratically', 0)", "")
    check("LTRIM('  hello  ', 'he ')", "llo  ")
    check("RTRIM('  hello  ', 'lo ')", "  he")
    check("from_utf8(from_hex('58DF'), '#')", "X#")
    check("from_utf8(from_hex('58BF'), '')", "X")
    check("from_base('-9223372036854775808', 10)", Long.MinValue)
  }

  test("sentinels: token-strict JSON membership and canonical format") {
    check("JSON_ARRAY_CONTAINS('[1.0]', 1)", false)
    check("JSON_ARRAY_CONTAINS('[1]', 1.0)", false)
    check("JSON_ARRAY_CONTAINS('[1]', 1)", true)
    check("JSON_FORMAT(JSON '[\"a\", \"b\"]')", """["a","b"]""")
  }

  test("sentinels: concat of arrays with a NULL argument") {
    check("concat(ARRAY[], ARRAY[], NULL, ARRAY[])", null)
    check("cardinality(ARRAY[1] || 2)", 2) // element append still works
  }

  test("sentinels: double/real → varchar renders scientific notation") {
    // TestDoubleOperators.java:180-190 testCastToVarchar /
    // TestRealOperators testCastToVarchar — DoubleOperators.java:255
    check("CAST(37.7E0 AS VARCHAR)", "3.77E1")
    check("CAST(17.1E0 AS VARCHAR)", "1.71E1")
    check("CAST(12e2 AS VARCHAR)", "1.2E3")
    check("CAST(12345678.9e0 AS VARCHAR)", "1.23456789E7")
    check("CAST(0e0 AS VARCHAR)", "0E0")
    check("CAST(-0e0 AS VARCHAR)", "-0E0")
    check("CAST(nan() AS VARCHAR)", "NaN")
    check("CAST(infinity() AS VARCHAR)", "Infinity")
    check("CAST(-infinity() AS VARCHAR)", "-Infinity")
    check("CAST(REAL '12e2' AS VARCHAR)", "1.2E3")
    check("CAST(CAST(755 AS REAL) AS VARCHAR)", "7.55E2")
    // the rendering follows the value through implicit string contexts
    check("concat('v=', CAST(1.5E0 AS VARCHAR))", "v=1.5E0")
  }

  test("sentinels: map subscript raises on missing key, null-propagates") {
    // TestMapOperators.java:549-555 / MapSubscriptOperator.java:129
    check("MAP(ARRAY[1], ARRAY[2])[1]", 2)
    check("MAP(ARRAY['hi'], ARRAY[2])['hi']", 2)
    val e = intercept[Exception] {
      one("MAP(ARRAY[BIGINT '1'], ARRAY[BIGINT '2'])[3]")
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: chain(t.getCause)
    assert(chain(e).exists(_.contains("Key not present in map: 3")),
      s"expected the missing-key error, got ${e.getMessage}")
    // RETURN_NULL_ON_NULL: null key / null map both yield NULL, no raise
    check("MAP(ARRAY['hi'], ARRAY[2])[CAST(NULL AS VARCHAR)]", null)
    check("CAST(NULL AS MAP(VARCHAR, INTEGER))['hi']", null)
    // element_at keeps its own NULL-returning contract
    check("element_at(MAP(ARRAY[1], ARRAY[2]), 3)", null)
  }

  test("sentinels: non-literal LIKE patterns keep no-implicit-escape") {
    // LikeFunctions.java:92 — compiled with only the user-declared
    // escape; a pattern reaching LIKE through an expression must behave
    // like the literal spelling (TestConditions' escape-less contract)
    check("'\\_monkey\\_' like substr('\\_monkey\\_x', 1, 10)", true)
    check("'_monkey_' like substr('\\_monkey\\_x', 1, 10)", false)
    check("'a%b' like concat('a', '\\%b')", false) // backslash is ordinary
    check("'a\\xb' like concat('a', '\\_b')", true) // _ still a wildcard
    check("'_monkey_' like reverse('_yeknom_')", true)
  }

  test("sentinels: quantified comparisons over empty sets and NULLs") {
    // reference sql/query quantified-comparison semantics: ALL over an
    // empty relation is TRUE, ANY/SOME is FALSE, regardless of the left
    // side; a satisfied extremum over a set that also holds NULLs is
    // unknown (three-valued), not a definite answer
    check("5 < ALL (SELECT 1 WHERE false)", true)
    check("5 > ANY (SELECT 1 WHERE false)", false)
    check("CAST(NULL AS INTEGER) < ALL (SELECT 1 WHERE false)", true)
    check("CAST(NULL AS INTEGER) > ANY (SELECT 1 WHERE false)", false)
    check("5 > ALL (VALUES 1, NULL)", null)
    check("15 < ALL (VALUES 10, NULL)", false)
    check("5 < ALL (VALUES 10, NULL)", null)
    check("5 > ANY (VALUES 1, NULL)", true)
    check("5 > ANY (VALUES 10, NULL)", null)
    check("CAST(NULL AS INTEGER) < ALL (VALUES 1, 2)", null)
    // the non-degenerate forms keep their values
    check("21 < ALL (VALUES 19, 20, 21)", false)
    check("19 <= ALL (VALUES 19, 20, 21)", true)
    check("5 > ANY (VALUES 10, 3, 7)", true)
  }

  test("sentinels: 2-arg trim set, DOUBLE PRECISION, anonymous ROW types") {
    // StringFunctions.java trim(string, trim-chars) — Spark's 2-arg
    // builtin takes the arguments SWAPPED
    check("TRIM('  hello  ', ' ')", "hello")
    check("TRIM('  hello  ', 'he ')", "llo")
    check("TRIM(' hello world ', ' x')", "hello world")
    check("TRIM('hello  ', 'l')", "hello  ")
    check("TRIM(BOTH ' ' FROM '  hi  ')", "hi") // grammar form untouched
    check("DOUBLE PRECISION '12.34'", 12.34)
    check("cast('37.7' as double precision)", 37.7)
    // anonymous ROW fields name positionally, like the row() constructor
    check("CAST(CAST(row(2, 'x') AS ROW(BIGINT, VARCHAR)) AS JSON)",
      "[2,\"x\"]")
    check("CAST(row(1.0E0, ARRAY[row(31, 4.1E0), row(32, 4.2E0)]) AS " +
      "ROW(col0 double, col1 array(row(col0 integer, col1 double)))).col1[2].col0",
      32)
  }

  test("sentinels: url parameters, json overflow tokens, null probes, " +
      "ordered map JSON") {
    // UrlFunctions.java:124 — first occurrence, '' for valueless keys
    check("url_extract_parameter('http://e.com/p?k1=v1&k3&k4', 'k3')", "")
    check("url_extract_parameter('http://e.com/p?k1&k1=v1', 'k1')", "")
    check("url_extract_parameter('http://e.com/p?k1=v1&k2=v2', 'k2')", "v2")
    check("url_extract_parameter('http://e.com/p?k1=v1', 'zz')", null)
    // an integer token beyond long range matches nothing (no wrapping)
    check("JSON_ARRAY_CONTAINS('[92233720368547758071]', -9)", false)
    // typed-NULL probe propagates NULL through the instance form
    check("ARRAY_POSITION(ARRAY [1, NULL, 2], CAST(NULL AS BIGINT), 1)", null)
    // map→JSON renders entries in key order; REAL values keep their own
    // shortest form (TestMapOperators / TestArrayOperators)
    check("CAST(MAP(ARRAY[7,5,3,1], ARRAY[8,6,4,2]) AS JSON)",
      "{\"1\":2,\"3\":4,\"5\":6,\"7\":8}")
    check("CAST(CAST(ARRAY[3.14E0] AS ARRAY(REAL)) AS JSON)", "[3.14]")
    // empty-search replace interleaves (StringFunctions.java: the JDK
    // replaceAll('') contract)
    check("REPLACE('abc', '', 'xx')", "xxaxxbxxcxx")
    check("REPLACE('', '', 'xx')", "xx")
    check("REPLACE('abc', 'b', 'x')", "axc")
    check("REPLACE('abc', 'b')", "ac")
    // NAMED-zone TIME literals narrow to the epoch-day UTC instant like
    // the offset form — equality/ordering match the reference's
    // UTC-normalized comparison (TestArrayOperators' TIME wtz rows)
    check("ARRAY [TIME '01:02:03.456 America/Los_Angeles'] = " +
      "ARRAY [TIME '01:02:03.456 America/Los_Angeles']", true)
    check("TIME '01:02:03 America/Los_Angeles' < " +
      "TIME '04:05:06 America/Los_Angeles'", true)
  }

  test("sentinels: JSON 'null' casts to typed NULL for complex targets") {
    // JsonToArrayCast.java:90 / JsonToMapCast / JsonToRowCast — VALUE_NULL
    // returns SQL NULL, not an all-null container
    check("CAST(JSON 'null' AS ARRAY<BIGINT>)", null)
    check("CAST(JSON 'null' AS MAP<BIGINT, BIGINT>)", null)
    check("CAST(JSON 'null' AS ROW(BIGINT))", null)
    check("CAST(CAST(null AS JSON) AS ARRAY<BIGINT>)", null)
    check("CAST(CAST(null AS JSON) AS MAP<BIGINT, BIGINT>)", null)
    // non-null parses still work, angle- and paren-spelled targets alike
    check("CAST(JSON '[1,2]' AS ARRAY(BIGINT))[1]", 1L)
    check("CAST(JSON '{\"7\": 3}' AS MAP<BIGINT, BIGINT>)[7]", 3L)
  }

  test("sentinels: Snowball word_stem — 1-arg English and the 2-arg " +
      "language overload") {
    // TestWordStemFunction.java — the reference wraps org.tartarus
    // Snowball stemmers; 1-arg IS the English one (not Porter 1980)
    check("word_stem('generally')", "general")
    check("word_stem('useful')", "use")
    check("word_stem('authorized', 'en')", "author")
    check("word_stem('accessories', 'en')", "accessori")
    check("word_stem('intensifying', 'en')", "intensifi")
    check("word_stem('continuerait', 'fr')", "continu")
    check("word_stem('torpedearon', 'es')", "torped")
    check("word_stem('quilomtricos', 'pt')", "quilomtr")
    check("word_stem('pronunziare', 'it')", "pronunz")
    check("word_stem('auferstnde', 'de')", "auferstnd")
    val e = intercept[Exception] { one("word_stem('x', 'zz')") }
    assert(String.valueOf(e.getMessage).contains("Unknown stemmer language"))
  }

  test("sentinels: three-valued ARRAY/ROW equality in SELECT position") {
    // TestArrayOperators / TestRowOperators — nested NULLs make the
    // comparison unknown unless a definite inequality exists
    check("ARRAY [1, 2, null] = ARRAY [1, 2, null]", null)
    check("ARRAY [1, 2, null] != ARRAY [1, 2, null]", null)
    check("ARRAY [ARRAY[1], ARRAY[null], ARRAY[3]] = " +
      "ARRAY [ARRAY[1], ARRAY[2], ARRAY[3]]", null)
    check("ARRAY [1, null] = ARRAY [1, 2, null]", false) // cardinality
    check("ARRAY [1, 2] = ARRAY [1, 2]", true)
    check("row(1, CAST(NULL AS INTEGER)) = row(1, 2)", null)
    // ROWs with MAP fields are comparable (Spark alone raises)
    check("row(TRUE, ARRAY [1, 2], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0])) = " +
      "row(TRUE, ARRAY [1, 2], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0]))", true)
    check("row(TRUE, ARRAY [1], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0])) = " +
      "row(TRUE, ARRAY [1, 2], MAP(ARRAY[1, 3], ARRAY[2.0E0, 4.0E0]))", false)
  }

  test("sentinels: round-14 dialect closers — escape null, char literal, " +
      "bare decimal, null map args, array_join rendering, json map keys") {
    check("'monkey' like 'monkey' escape null", null)
    check("'monkey' not like 'monkey' escape null", null)
    check("LTRIM('  hello  ', CHAR ' ')", "hello  ")
    check("typeof(CAST(NULL AS DECIMAL))", "decimal(38,0)")
    check("MAP_CONCAT(MAP(ARRAY[1], ARRAY[-1]), NULL, MAP(ARRAY[3], ARRAY[-3]))",
      null)
    check("map_from_entries(null)", null)
    check("ARRAY_JOIN(ARRAY [1.0, DOUBLE '002.100', 3.3], 'x')",
      "1.0E0x2.1E0x3.3E0")
    // map→JSON orders by the RENDERED key string (TreeMap<String>,
    // JsonUtil.java:597): numeric keys sort lexicographically
    check("CAST(MAP(ARRAY[2,10], ARRAY['a','b']) AS JSON)",
      "{\"10\":\"b\",\"2\":\"a\"}")
    // CASE…END as a quantified-comparison left operand
    check("CASE WHEN true THEN 1 ELSE 2 END < ALL (VALUES 10, NULL)", null)
    check("CASE WHEN true THEN 15 ELSE 2 END < ALL (VALUES 10, NULL)", false)
  }

  test("sentinels: round-16 conformance families (JSON scalar casts, " +
      "UUID, regexp replacement grammar, truncate, sorted-key JSON)") {
    // CAST(json AS scalar) token coercions (TestJsonOperators.java)
    check("cast(JSON '128.9' as BIGINT)", 129L)      // HALF_UP round
    check("cast(JSON '\"128\"' as INTEGER)", 128)    // string token unquoted
    check("cast(JSON 'true' as DOUBLE)", 1.0)
    check("cast(JSON '\"True\"' as BOOLEAN)", true)  // varchar→boolean forms
    check("cast(JSON '128.9' as VARCHAR)", "1.289E2") // scientific render
    check("cast(JSON 'null' as BIGINT)", null)       // JSON null → typed NULL
    // UUID narrowed to canonical lowercase text (TestUuidOperators.java)
    check("CAST('12151FD2-7586-11E9-8F9E-2A86E4085A59' AS UUID)",
      "12151fd2-7586-11e9-8f9e-2a86e4085a59")
    // varbinary source is the reference's two-little-endian-longs storage
    check("CAST(x'E9118675D21F1512595A08E4862A9E8F' AS UUID)",
      "12151fd2-7586-11e9-8f9e-2a86e4085a59")
    // java.util.regex replacement grammar: ${name} resolves, a group
    // that did not participate substitutes '' (AbstractTestRegexp-
    // Functions.java); needs spark.sql.variable.substitute OFF or the
    // TEXT pass eats ${xyz} before the parser sees it
    check("REGEXP_REPLACE('wxyz', '(?<xyz>[xyz])', '${xyz}${xyz}')",
      "wxxyyzz")
    check("REGEXP_REPLACE('wxyz', '(?<w>w)|(?<xyz>[xyz])', '[${w}](${xyz})')",
      "[w]()[](x)[](y)[](z)")
    // non-participating group extracts NULL (Spark builtin returns '')
    check("REGEXP_EXTRACT('rat cat\nbat dog', 'ra(.)|blah(.)(.)', 2)", null)
    // truncate(x, n) is a BigDecimal rescale — the old pow(10, n)
    // algebra returned NaN at large |n| (TestTruncateWithPrecision.java)
    check("truncate(DOUBLE '-1234.56', -500)", 0.0)
    check("truncate(DOUBLE '1234.567', 2)", 1234.56)
    // json_parse canonicalizes with recursively SORTED keys
    // (JsonFunctions.java:147 SORTED_MAPPER)
    check("JSON '{\"b\":2, \"a\":1}'", "{\"a\":1,\"b\":2}")
    check("JSON '{\"a\":1, \"b\":2}' = JSON '{\"b\":2, \"a\":1}'", true)
    // a NULL element nulls the whole array_normalize result
    check("array_normalize(ARRAY[1.0, NULL, 3.0], 1)", null)
  }

  test("sentinels: round-16 second tranche (IPADDRESS/IPPREFIX canon, " +
      "interval normalization/render, bare CHAR, reduce state)") {
    // IPADDRESS canonicalizes on construction (TestIpAddressOperators
    // .java): RFC 5952 compression, lowercase, v4-mapped → dotted quad
    check("CAST('2001:0db8:0000:0000:0000:ff00:0042:8329' AS IPADDRESS)",
      "2001:db8::ff00:42:8329")
    check("CAST('::ffff:1.2.3.4' AS IPADDRESS)", "1.2.3.4")
    check("IPADDRESS '64:ff9b::10.0.0.0'", "64:ff9b::a00:0")
    check("CAST(x'00000000000000000000ffff01020304' AS IPADDRESS)", "1.2.3.4")
    check("IPADDRESS '10.0.0.0' = IPADDRESS '::ffff:a00:0'", true)
    // IPPREFIX masks host bits to the canonical network form
    // (TestIpPrefixOperators.java)
    check("CAST('255.2.3.4/1' AS IPPREFIX)", "128.0.0.0/1")
    check("CAST('ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff/48' AS IPPREFIX)",
      "ffff:ffff:ffff::/48")
    check("CAST(IPPREFIX '2001:db8::ff00:42:8329/64' AS IPADDRESS)",
      "2001:db8::")
    check("CAST(IPADDRESS '::ffff:102:304' AS IPPREFIX)", "1.2.3.4/32")
    // interval literal month overflow normalizes, and CAST(interval AS
    // VARCHAR) renders the bare value (TestIntervalYearMonth/DayTime)
    check("cast(INTERVAL '124-30' YEAR TO MONTH as varchar)", "126-6")
    check("cast(INTERVAL '12 10:45:32.123' DAY TO SECOND as varchar)",
      "12 10:45:32.123")
    // bare CHAR = char(1) truncates to the first code point
    check("cast('bar' as char)", "b")
    // reduce widens an int-literal initial state to the bigint element
    // type like the reference's function resolution does
    check("reduce(ARRAY [123456789012345, NULL, 54321], 0, " +
      "(s, x) -> s + coalesce(x, 0), s -> s)", 123456789066666L)
    // array_except propagates a NULL argument
    check("array_except(NULL, ARRAY[NULL])", null)
  }

  test("sentinels: round-16 datetime tranche (interval-field rollover " +
      "extract, ms renders, CAST AS TIME, zone-pinned replay)") {
    // EXTRACT over a single-unit interval literal reads the normalized
    // field (TestDateTimeFunctionsBase)
    check("extract(minute FROM INTERVAL '247' SECOND)", 4L)
    check("extract(year FROM INTERVAL '29' MONTH)", 2L)
    // TIMESTAMP / TIME literal → varchar renders fixed millisecond
    // precision (TestTimestampBase / TestTimeBase)
    check("cast(TIMESTAMP '2001-1-22 03:04' as varchar)",
      "2001-01-22 03:04:00.000")
    check("cast(TIME '03:04:05.321' as varchar)", "03:04:05.321")
    check("cast(TIME '03:04' as varchar)", "03:04:00.000")
    // CAST(varchar AS TIME) lands on the TIME narrowing's epoch day
    check("cast('03:04:05.321' as time) = TIME '03:04:05.321'", true)
    // the zone-pinned replay protocol itself: this is deterministic in
    // UTC (the spec's default) — the Apia/Berlin pins live in the TSV
    check("hour(TIMESTAMP '2001-08-22 03:04:05.321')", 3L)
  }

  test("full sweep (SPARK_GRAFT_REPLAY=1): frozen reference assertions " +
      "hold the pass floor") {
    assume(sys.env.get("SPARK_GRAFT_REPLAY").contains("1"),
      "full 3259-case sweep is opt-in (minutes of runtime)")
    val dec = java.util.Base64.getDecoder
    def d(s: String) = new String(dec.decode(s), "UTF-8")
    val in = getClass.getResourceAsStream("/reference_assertions.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    var ok = 0
    val failures = collection.mutable.Buffer[String]()
    var activeZone = "UTC"
    for (line <- lines) {
      val parts = line.split("\t", 6)
      val Array(_, exprB, _, kind, expB) = parts.take(5)
      val expr = d(exprB); val expected = d(expB)
      // zone-pinned rows (column 6) replay under the session zone the
      // reference harness ran their file with
      val zone = if (parts.length > 5 && parts(5).nonEmpty) parts(5) else "UTC"
      if (zone != activeZone) {
        spark.conf.set("spark.sql.session.timeZone", zone)
        activeZone = zone
      }
      try {
        val v = one(expr)
        val got = if (v == null) "null" else v.toString
        val matches = kind match {
          case "null" => v == null
          case "num" =>
            v != null && (try {
              val e = BigDecimal(expected.stripSuffix("L"))
              val g = BigDecimal(got)
              e == g || (e != 0 && ((g - e) / e).abs < 1e-9) ||
                (e == 0 && g.abs < 1e-12)
            } catch { case _: Throwable => got == expected.stripSuffix("L") })
          case _ => got == expected
        }
        if (matches) ok += 1 else failures += s"$expr exp=$expected got=$got"
      } catch { case e: Throwable =>
        failures += s"$expr ERR ${String.valueOf(e.getMessage).take(80)}"
      }
    }
    // the session is shared across tests — put the zone back
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    info(s"replay: $ok / ${lines.size} assertions match")
    assert(ok >= 3200,
      s"pass floor broken: $ok of ${lines.size}\n${failures.take(20).mkString("\n")}")
  }
}
