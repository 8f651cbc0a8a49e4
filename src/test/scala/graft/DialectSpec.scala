package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the Presto→Spark dialect shim (SURVEY §7 Phase 2). */
class DialectSpec extends AnyFunSuite {

  test("function names rewrite only at call sites") {
    assert(Engine.translate("SELECT approx_distinct(x) FROM t")
      == "SELECT approx_count_distinct(x) FROM t")
    assert(Engine.translate("SELECT strpos(a, 'b') FROM t")
      == "SELECT instr(a, 'b') FROM t")
    assert(Engine.translate("SELECT ARBITRARY(x) FROM t")
      == "SELECT any_value(x) FROM t")
  }

  test("column names that look like function names survive") {
    assert(Engine.translate("SELECT strpos_col, arbitrary FROM t")
      == "SELECT strpos_col, arbitrary FROM t")
    assert(Engine.translate("SELECT my_strpos(x) FROM t")
      == "SELECT my_strpos(x) FROM t")
  }

  test("whitespace before parenthesis is tolerated") {
    assert(Engine.translate("SELECT json_extract_scalar (j, '$.a')")
      == "SELECT get_json_object(j, '$.a')")
  }

  test("string literals are never rewritten") {
    assert(Engine.translate("SELECT strpos(a, 'strpos(x)') FROM t")
      == "SELECT instr(a, 'strpos(x)') FROM t")
    assert(Engine.translate("SELECT 'it''s arbitrary(1)' FROM t")
      == "SELECT 'it''s arbitrary(1)' FROM t")
  }

  test("MySQL date tokens map to java.time patterns") {
    assert(Engine.prestoDateFormat("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Engine.prestoDateFormat("%H:%i:%s") == "HH:mm:ss")
    assert(Engine.prestoDateFormat("%d %b %Y") == "dd MMM yyyy")
    assert(Engine.prestoDateFormat("%Y%%") == "yyyy%")
    // literal letters get quoted so java.time can't eat them
    assert(Engine.prestoDateFormat("at %H") == "'a''t' HH")
  }
}
