package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `Engine.sql` facade as a USER sees it: a fresh `Engine.session`
  * must expose every custom function and the utility-statement surface
  * (reference: the full registry is visible to every query —
  * presto-main/.../metadata/BuiltInTypeAndFunctionNamespaceManager.java;
  * SHOW/EXPLAIN/SET SESSION from SqlBase.g4:36-135).
  */
class FacadeSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def dir = TestSpark.sfDir

  private def one(sql: String): Any =
    Engine.sql(spark, dir, sql).collect()(0).get(0)

  test("custom aggregates resolve through bare Engine.sql") {
    assert(one("SELECT cardinality(map_union_sum(m)) FROM (SELECT map('a', 1L) AS m)") == 1)
    assert(one("SELECT round(geometric_mean(x), 4) FROM (VALUES (2.0), (8.0)) t(x)")
      == 4.0)
    val hll = one(
      "SELECT hll_cardinality(merge_hll(h)) FROM (SELECT approx_set_agg(xxhash64(CAST(l_orderkey AS STRING))) AS h FROM lineitem)")
    assert(hll.asInstanceOf[Long] > 0)
    val q50 = one(
      "SELECT value_at_quantile(qdigest_agg(o_totalprice), 0.5) FROM orders")
    assert(q50.asInstanceOf[Double] > 0)
    val t50 = one(
      "SELECT td_value_at_quantile(tdigest_agg(o_totalprice), 0.5) FROM orders")
    assert(t50.asInstanceOf[Double] > 0)
    assert(one("SELECT checksum(x) = checksum(x + 0) FROM (VALUES (1L), (2L)) t(x)")
      == true)
    assert(one("SELECT round(entropy(c), 6) FROM (VALUES (1.0), (1.0)) t(c)") == 1.0)
    assert(one("SELECT size(set_agg(x)) FROM (VALUES ('a'), ('a'), ('b')) t(x)") == 2)
    assert(one(
      "SELECT size(set_union(xs)) FROM (VALUES (array('a','b')), (array('b','c'))) t(xs)")
      == 3)
    assert(one(
      "SELECT size(multimap_agg(k, v)) FROM (VALUES ('a', '1'), ('a', '2')) t(k, v)")
      == 1)
    assert(one(
      "SELECT cardinality(numeric_histogram(4L, x)) <= 4 FROM (VALUES (1.0), (2.0), (9.0)) t(x)")
      == true)
  }

  test("sketch families resolve through bare Engine.sql") {
    assert(one(
      "SELECT set_digest_cardinality(make_set_digest(x)) FROM (VALUES ('a'), ('b'), ('a')) t(x)")
      == 2L)
    assert(one(
      "SELECT jaccard_index(make_set_digest(x), make_set_digest(x)) FROM (VALUES ('a')) t(x)")
      == 1.0)
    assert(one(
      "SELECT khll_cardinality(khyperloglog_agg(k, v)) FROM (VALUES ('k1', 'x'), ('k2', 'y')) t(k, v)")
      == 2L)
    assert(one(
      "SELECT size(classification_precision(4L, p, l)) FROM (VALUES (0.9D, true), (0.1D, false)) t(p, l)")
      == 4)
    assert(one(
      "SELECT size(bottom_k_sample(x, 2L)) FROM (VALUES ('a'), ('b'), ('c')) t(x)")
      == 2)
  }

  test("custom scalars resolve through bare Engine.sql") {
    assert(one("SELECT word_stem('motoring')") == "motor")
    assert(one("SELECT length(hex(hmac_sha256(CAST('x' AS BINARY), CAST('k' AS BINARY))))")
      == 64)
    assert(one("SELECT truncate(8.91)") == 8.0)
    assert(one("SELECT truncate(-8.91)") == -8.0)
    assert(one("SELECT truncate(123.456, 1)") == 123.4)
    assert(one("SELECT bitwise_and(12, 10)") == 8L)
    assert(one("SELECT log(8, 2)") == 3.0) // Presto log(number, base)
    assert(one("SELECT cosine_similarity(map('a', 1.0D), map('a', 1.0D))") == 1.0)
    assert(one("SELECT size(ngrams(array('a','b','c'), 2))") == 2)
    assert(one("SELECT size(combinations(array('a','b','c'), 2))") == 3)
    assert(one("SELECT cardinality(split_to_map('a=1,b=2', ',', '='))") == 2)
    assert(one("SELECT element_at(map_normalize(map('a', 1.0D, 'b', 3.0D)), 'b')")
      == 0.75)
    assert(one("SELECT to_iso8601(TIMESTAMP '2024-01-02 03:04:05')")
      == "2024-01-02T03:04:05")
  }

  test("parse_duration returns a day-time interval") {
    assert(one("SELECT parse_duration('90m')")
      == java.time.Duration.ofMinutes(90))
    assert(one("SELECT parse_duration('2.5s')")
      == java.time.Duration.ofMillis(2500))
    assert(one("SELECT TIMESTAMP '2024-01-01 00:00:00' + parse_duration('1.5h')")
      .toString.startsWith("2024-01-01 01:30"))
  }

  test("split takes a literal delimiter like the reference") {
    assert(one("SELECT split('a.b.c', '.')[2]") == "b")
    assert(one("SELECT size(split('a|b|c', '|'))") == 3)
  }

  test("Presto-isms: TRY, ARRAY literal, 1-based subscript, date tokens") {
    assert(one("SELECT TRY(CAST('x' AS INT))") == null)
    assert(one("SELECT ARRAY[10, 20, 30][1]") == 10)
    assert(one("SELECT date_format(TIMESTAMP '2001-02-03 04:05:06', '%Y-%m-%d %H:%i')")
      == "2001-02-03 04:05")
    assert(one("SELECT date_parse('2001-02-03', '%Y-%m-%d')").toString
      .startsWith("2001-02-03"))
  }

  test("approx_percentile dispatches every reference overload shape") {
    // (x, p) — plain percentile
    val med = one("SELECT approx_percentile(x, 0.5) FROM (VALUES (1e0), (2e0), (3e0)) t(x)")
    assert(med == 2.0)
    // (x, 1, p) — integer literal weight of 1 is a WEIGHT, not a
    // percentile: degenerates to the unweighted median
    val w1 = one("SELECT approx_percentile(x, 1, 0.5) FROM (VALUES (1e0), (2e0), (3e0)) t(x)")
    assert(w1 == 2.0)
    // (x, w, p) with a real weight column — weight on the larger value
    // shifts the estimate above the unweighted median (the t-digest
    // interpolates on tiny inputs, so bounds, not equality; c10 certifies
    // the values against an exact row-expansion oracle at scale)
    val wcol = one(
      "SELECT approx_percentile(x, w, 0.5) FROM (VALUES (1e0, 1L), (3e0, 2L)) t(x, w)")
    assert(wcol.asInstanceOf[Double] > 2.0 && wcol.asInstanceOf[Double] <= 3.0)
    // bigint x with weights returns bigint like the reference
    val wint = one(
      "SELECT approx_percentile(x, w, 0.5) FROM (VALUES (10L, 1L), (30L, 2L)) t(x, w)")
    assert(wint.isInstanceOf[Long] && wint.asInstanceOf[Long] > 20L
      && wint.asInstanceOf[Long] <= 30L)
    // (x, p, eps) — fractional accuracy epsilon converts to Spark's
    // integral 1/eps instead of failing analysis
    val acc = one("SELECT approx_percentile(x, 0.5, 0.01) FROM (VALUES (1e0), (2e0), (3e0)) t(x)")
    assert(acc == 2.0)
  }

  test("utility statements: SHOW / DESCRIBE / EXPLAIN / SET SESSION") {
    val tables = Engine.sql(spark, dir, "SHOW TABLES")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(Tables.names.toSet.subsetOf(tables))
    assert(Engine.sql(spark, dir, "SHOW COLUMNS IN orders").count() > 0)
    assert(Engine.sql(spark, dir, "SHOW FUNCTIONS").count() > 100)
    assert(Engine.sql(spark, dir, "DESCRIBE orders").count() > 0)
    val plan = Engine.sql(spark, dir, "EXPLAIN SELECT count(*) FROM orders")
      .collect()(0).getString(0)
    assert(plan.contains("Physical Plan"))
    Engine.sql(spark, dir, "SET SESSION spark.sql.shuffle.partitions = 8")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "8")
  }
}
