#!/usr/bin/env python3
"""Harvest the reference's ENGINE-LEVEL query corpus into a replayable
TSV with frozen DuckDB oracle results.

The reference's primary correctness instrument is differential testing
of full queries against H2 on the TPC-H `tiny` schema
(presto-tests/src/main/java/com/facebook/presto/tests/
AbstractTestQueries.java 353 @Test, AbstractTestAggregations.java 114,
AbstractTestJoinQueries.java 158, + window/order-by files; mechanism
AbstractTestQueryFramework.assertQuery). This tool replays that
instrument: it extracts every `assertQuery("…")` /
`assertQueryOrdered("…")` / `assertQueryReturnsEmptyResult("…")` whose
arguments are pure string literals, runs the EXPECTED side (the H2
rewrite when the test supplies one, else the query itself) in DuckDB
over unprefixed views of /root/testdata/sf0.01 (the reference's `tiny`
IS sf0.01 — presto-tpch TpchMetadata.java:95-99), and freezes the
canonical result into src/test/resources/reference_queries.tsv for
ReferenceQueriesSpec to replay through Engine.sql.

Fixture gap filter: the driver's testdata carries a REDUCED tiny schema
(no partsupp table; no comment/clerk/shippriority/address/phone/
commitdate/receiptdate/shipinstruct/shipmode/mfgr/container columns) —
queries touching those are skipped with a recorded reason, as are
queries needing session state, non-literal args, or nondeterminism
(random/sampled/bare-LIMIT value sets; bare-LIMIT queries degrade to a
row-count-only check instead).

TSV row (tab-separated):
  file  method  b64(actual_sql)  b64(expected_sql|"")  ordered  mode
  n_rows  n_cols  b64(gzip(canonical_rows))
mode ∈ {rows, count, empty}. Canonical cell protocol shared with
ReferenceQueriesSpec: NULL→"NULL", bool→true/false, float/Decimal→
"%.6e" (0→"0", NaN→"NaN"), date→ISO, timestamp→ISO sans trailing .0,
list→[…]; cells joined by \\x01, rows by \\n, unordered rows sorted by
the joined string.
"""
import base64
import datetime
import decimal
import gzip
import math
import re
import sys

import duckdb

REF = ("/root/reference/presto-tests/src/main/java/com/facebook/presto/"
       "tests/")
FILES = [
    "AbstractTestQueries.java",
    "AbstractTestAggregations.java",
    "AbstractTestJoinQueries.java",
    "AbstractTestWindowQueries.java",
    "AbstractTestOrderByQueries.java",
    # round-16 extension: the remaining engine-vs-H2 corpora on the same
    # tiny schema — smoke SELECTs, the index-join query texts (the index
    # is a physical strategy; the SQL is plain orders/lineitem), the
    # repartition-exchange queries, and the SELECT subset of the
    # distributed (write-heavy) suite. Write/DDL asserts self-exclude
    # through the fixture-gap / unreplayable screens.
    "AbstractTestIntegrationSmokeTest.java",
    "AbstractTestIndexedQueries.java",
    "AbstractTestRepartitionQueries.java",
    "AbstractTestDistributedQueries.java",
]
SF_DIR = "/root/testdata/sf0.01"

# unprefixed tiny-schema views over the driver's reduced parquet fixture
VIEWS = {
    "orders": ("SELECT o_orderkey AS orderkey, o_custkey AS custkey, "
               "o_orderstatus AS orderstatus, o_totalprice AS totalprice, "
               "CAST(o_orderdate AS DATE) AS orderdate, "
               "o_orderpriority AS orderpriority FROM "
               f"read_parquet('{SF_DIR}/orders.parquet')"),
    "lineitem": ("SELECT l_orderkey AS orderkey, l_partkey AS partkey, "
                 "l_suppkey AS suppkey, l_linenumber AS linenumber, "
                 "l_quantity AS quantity, l_extendedprice AS extendedprice, "
                 "l_discount AS discount, l_tax AS tax, "
                 "l_returnflag AS returnflag, l_linestatus AS linestatus, "
                 "CAST(l_shipdate AS DATE) AS shipdate FROM "
                 f"read_parquet('{SF_DIR}/lineitem.parquet')"),
    "customer": ("SELECT c_custkey AS custkey, c_name AS name, "
                 "c_nationkey AS nationkey, c_acctbal AS acctbal, "
                 "c_mktsegment AS mktsegment FROM "
                 f"read_parquet('{SF_DIR}/customer.parquet')"),
    "supplier": ("SELECT s_suppkey AS suppkey, s_name AS name, "
                 "s_nationkey AS nationkey, s_acctbal AS acctbal FROM "
                 f"read_parquet('{SF_DIR}/supplier.parquet')"),
    "part": ("SELECT p_partkey AS partkey, p_name AS name, "
             "p_brand AS brand, p_type AS type, p_size AS size, "
             "p_retailprice AS retailprice FROM "
             f"read_parquet('{SF_DIR}/part.parquet')"),
    "nation": ("SELECT n_nationkey AS nationkey, n_name AS name, "
               "n_regionkey AS regionkey FROM "
               f"read_parquet('{SF_DIR}/nation.parquet')"),
    "region": ("SELECT r_regionkey AS regionkey, r_name AS name FROM "
               f"read_parquet('{SF_DIR}/region.parquet')"),
}

TABLE_RE = re.compile(
    r"\b(orders|lineitem|customer|supplier|part|nation|region)\b", re.I)

# identifiers absent from the reduced fixture: any query touching them
# cannot be replayed here (word-boundary match, case-insensitive)
MISSING = re.compile(
    r"\b(partsupp|clerk|shippriority|comment|commitdate|receiptdate|"
    r"shipinstruct|shipmode|address|phone|mfgr|container|availqty|"
    r"supplycost)\b", re.I)
# nondeterministic / environment-dependent / out-of-surface constructs
UNREPLAYABLE = re.compile(
    r"\b(rand|random|tablesample|current_time|current_date|localtime|"
    r"current_timestamp|now\(\)|information_schema|system\.|tpch\.|"
    r"custom_add|custom_is_null|custom_sum|custom_rank|"  # test-only fns
    r"checksum\s*\(|"  # engine-specific hash bytes (SURVEY §1.2: behavior,
    # not byte-compatibility — constant expecteds freeze Presto's hash)
    r"shuffle\s*\(|"
    # SELECTs against tables the TEST's own earlier DDL created
    # (AbstractTestDistributedQueries testInsert/testDelete/view tests,
    # the indexed suite's sys.example) — stateless replay has no such
    # tables; the write surface is covered by w01-w10 instead
    r"test_\w+|tmp_\w+|analyze_test|sys\.\w+)\b", re.I)
ROWCOUNT_ONLY = re.compile(r"\b(limit|fetch)\b", re.I)
MAX_STORED_ROWS = 8192


def java_unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "n":
                out.append("\n"); i += 2
            elif n == "t":
                out.append("\t"); i += 2
            elif n == "r":
                out.append("\r"); i += 2
            elif n == "u" and i + 5 < len(s) + 1:
                out.append(chr(int(s[i + 2:i + 6], 16))); i += 6
            else:
                out.append(n); i += 2
        else:
            out.append(c); i += 1
    return "".join(out)


def scan_call(src: str, start: int):
    """From the '(' at src[start], return (arg_text, end_index_after_');')
    balancing parens and respecting string literals."""
    depth = 0
    i = start
    in_str = False
    while i < len(src):
        c = src[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return src[start + 1:i], i + 1
        i += 1
    return None, len(src)


def split_args(argtext: str):
    """Split top-level comma-separated args (strings/parens respected)."""
    args, depth, in_str, cur = [], 0, False, []
    i = 0
    while i < len(argtext):
        c = argtext[i]
        if in_str:
            cur.append(c)
            if c == "\\":
                cur.append(argtext[i + 1]); i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True; cur.append(c)
        elif c in "([":
            depth += 1; cur.append(c)
        elif c in ")]":
            depth -= 1; cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur).strip()); cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


STR_CONCAT = re.compile(r'^\s*"(?:[^"\\]|\\.)*"(?:\s*\+\s*"(?:[^"\\]|\\.)*")*\s*$',
                        re.S)
STR_LIT = re.compile(r'"((?:[^"\\]|\\.)*)"')


def literal_string(arg: str):
    """If arg is a pure concatenation of string literals, return the
    joined unescaped text; else None."""
    if not STR_CONCAT.match(arg):
        return None
    return java_unescape("".join(m.group(1) for m in STR_LIT.finditer(arg)))


VALUES_END = re.compile(
    r"^(ORDER|LIMIT|OFFSET|FETCH|UNION|EXCEPT|INTERSECT)\b", re.I)


def rewrite_values(sql: str) -> str:
    """H2/Presto allow bare scalar rows — `VALUES 1, 2` — where DuckDB
    requires `VALUES (1), (2)`; parenthesize each top-level item that
    isn't already a fully-parenthesized row constructor. Oracle-side
    only: the actual query text reaches Engine.sql verbatim."""
    out = []
    i = 0
    n = len(sql)
    while i < n:
        m = re.compile(r"\bVALUES\b", re.I).search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i:m.end()])
        j = m.end()
        items = []
        cur = []
        depth = 0
        in_str = False
        end = n
        while j < n:
            c = sql[j]
            if in_str:
                cur.append(c)
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
                cur.append(c)
            elif c == "(":
                depth += 1
                cur.append(c)
            elif c == ")":
                if depth == 0:
                    end = j
                    break
                depth -= 1
                cur.append(c)
            elif c == "," and depth == 0:
                items.append("".join(cur))
                cur = []
            elif depth == 0 and c.isalpha() and \
                    VALUES_END.match(sql[j:]) and \
                    (not cur or not (cur[-1].isalnum() or cur[-1] == "_")):
                end = j
                break
            else:
                cur.append(c)
            j += 1
        if cur or items:
            items.append("".join(cur))

        def wrap(item: str) -> str:
            s = item.strip()
            if s.startswith("(") and s.endswith(")"):
                return " " + s
            return " (" + s + ")"
        out.append(",".join(wrap(it) for it in items))
        if end < n:
            out.append(" ")
        i = end
    return "".join(out)


def duckify(sql: str) -> str:
    """Oracle-side dialect patches: bare VALUES rows; H2's DATEADD."""
    sql = rewrite_values(sql)
    sql = re.sub(r"DATEADD\('(\w+)',\s*(-?\d+),\s*([A-Za-z_][\w.]*)\)",
                 r"(\3 + INTERVAL (\2) \1)", sql, flags=re.I)
    return sql


def canon_cell(v):
    if v is None:
        return "NULL"
    # booleans canonicalize to 1/0: the reference's own comparator is
    # type-lax (H2 BOOLEAN meets Presto BIGINT in e.g. the
    # count(*)-vs-boolean expected rewrites), so 1/true and 0/false
    # must unify here too
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v == 0:
            return "0"
        if math.isnan(v):
            return "NaN"
        return f"{v:.6e}"
    if isinstance(v, datetime.datetime):
        s = v.isoformat(sep=" ")
        return re.sub(r"\.?0+$", "", s) if "." in s else s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}"
                              for k, x in sorted(v.items())) + "}"
    return str(v)


def cells_agree(a: str, b: str) -> bool:
    if a == b:
        return True
    try:
        x, y = float(a), float(b)
        return abs(x - y) <= abs(y) * 1e-6 + 1e-9
    except ValueError:
        return False


def rows_agree(got, want) -> bool:
    """Canonical multiset comparison with numeric tolerance — used to
    certify that a constant expected matches this fixture's data."""
    if len(got) != len(want):
        return False
    g = sorted("\x01".join(canon_cell(c) for c in r) for r in got)
    w = sorted("\x01".join(canon_cell(c) for c in r) for r in want)
    for gr, wr in zip(g, w):
        gc, wc = gr.split("\x01"), wr.split("\x01")
        if len(gc) != len(wc):
            return False
        if not all(cells_agree(x, y) for x, y in zip(gc, wc)):
            return False
    return True


def harvest(path: str):
    src = open(REF + path).read()
    method = "?"
    out = []
    # walk the file, tracking the enclosing test-method name
    events = []
    for m in re.finditer(r"public void (\w+)\s*\(", src):
        events.append((m.start(), "method", m.group(1)))
    for m in re.finditer(
            r"\b(assertQueryOrdered|assertQueryReturnsEmptyResult|"
            r"assertQuery)\s*\(", src):
        events.append((m.start(), "call", (m.group(1), m.end() - 1)))
    events.sort(key=lambda e: e[0])
    for _, kind, payload in events:
        if kind == "method":
            method = payload
            continue
        func, paren = payload
        argtext, _ = scan_call(src, paren)
        if argtext is None:
            continue
        args = split_args(argtext)
        if not args:
            continue
        actual = literal_string(args[0])
        if actual is None:
            out.append((method, func, None, None, "nonliteral"))
            continue
        expected = None
        if func != "assertQueryReturnsEmptyResult" and len(args) >= 2:
            expected = literal_string(args[1])
            if expected is None:
                # second arg is a MaterializedResult / builder — skip
                out.append((method, func, actual, None, "nonliteral-expected"))
                continue
        if len(args) > 2:
            out.append((method, func, actual, expected, "extra-args"))
            continue
        out.append((method, func, actual, expected, None))
    return out


def main(out_path: str) -> None:
    def fresh_con():
        c = duckdb.connect()
        c.execute("SET integer_division = true")  # Presto: int/int is int
        for name, sql in VIEWS.items():
            c.execute(f"CREATE VIEW {name} AS {sql}")
        return c

    con = fresh_con()

    kept = 0
    skips = {}

    def skip(reason):
        skips[reason] = skips.get(reason, 0) + 1

    with open(out_path, "w") as out:
        for f in FILES:
            for method, func, actual, expected, err in harvest(f):
                if err:
                    skip(err)
                    continue
                probe = actual + " " + (expected or "")
                if MISSING.search(probe):
                    skip("fixture-gap")
                    continue
                if UNREPLAYABLE.search(probe):
                    skip("nondeterministic-or-out-of-surface")
                    continue
                ordered = func == "assertQueryOrdered"
                mode = "rows"
                if func == "assertQueryReturnsEmptyResult":
                    mode = "empty"
                elif ROWCOUNT_ONLY.search(actual):
                    # bare LIMIT/FETCH value sets are engine-order
                    # dependent unless fully ordered; keep the count check
                    mode = "count"
                oracle_sql = duckify(
                    expected if expected is not None else actual)
                try:
                    rel = con.execute(oracle_sql)
                    cols = len(rel.description)
                    rows = rel.fetchall()
                except Exception as e:
                    skip("oracle-error")
                    print(f"  oracle-error {f}:{method}: "
                          f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
                    # a failed execute can leave the connection with a
                    # closed pending result that poisons EVERY later
                    # query ("Attempting to execute an unsuccessful or
                    # closed pending query result") — round 16 found the
                    # window/order-by/smoke files silently lost to this;
                    # reconnect so one bad oracle costs one query
                    con = fresh_con()
                    continue
                # fixture-consistency certification: a CONSTANT expected
                # (no table references) against a table-touching actual
                # encodes a value computed on the OFFICIAL dbgen tiny
                # data (or a Presto sketch's own point estimate — "VALUES
                # 14999 // h2 is slow", hard-coded approx_distinct
                # outputs, official nation names). The driver's fixture
                # is a different generator, so such pairs are only
                # replayable when the actual itself, run on THIS fixture,
                # reproduces the constant; otherwise skip.
                if (expected is not None and mode == "rows" and
                        not TABLE_RE.search(expected) and
                        TABLE_RE.search(actual)):
                    try:
                        act_rows = con.execute(duckify(actual)).fetchall()
                    except Exception:
                        skip("constant-expected-unverifiable")
                        continue
                    if not rows_agree(act_rows, rows):
                        skip("data-dependent-expected")
                        continue
                if mode == "rows" and len(rows) > MAX_STORED_ROWS:
                    mode = "count"
                if mode == "rows":
                    crows = ["\x01".join(canon_cell(c) for c in r)
                             for r in rows]
                    if not ordered:
                        crows.sort()
                    blob = base64.b64encode(
                        gzip.compress("\n".join(crows).encode())).decode()
                else:
                    blob = ""

                def b(s):
                    return base64.b64encode(s.encode()).decode()

                out.write("\t".join([
                    f, method, b(actual), b(expected or ""),
                    "1" if ordered else "0", mode,
                    str(len(rows)), str(cols), blob]) + "\n")
                kept += 1
    print(f"wrote {kept} queries to {out_path}")
    for r, n in sorted(skips.items(), key=lambda kv: -kv[1]):
        print(f"  skipped {n:4d}  {r}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "src/test/resources/reference_queries.tsv")
