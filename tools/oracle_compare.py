#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_compare.py <sfDir> <verifyOutDir> [skipRegex]

skipRegex (optional): entry names matching it are skipped — used for
running the gate at sf0.1, where the handful of deliberately brute-force
O(n^2) oracles (d02/d05/d07 replay all document pairs) take hours in
DuckDB while every other oracle stays cheap.

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB against views over the
sfDir parquet tables; compares columns (sorted by name), row counts and
values (floats with relative tolerance 1e-9, else exact) after sorting
rows canonically. Exit 1 on any mismatch.
"""
import decimal
import json
import math
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "NULL"
    # Decimals go through the SAME %.6e float path as floats: the driver's
    # hasher canonicalizes Spark decimal(28,2) and DuckDB DECIMAL(38,2)
    # output columns differently (round 9 shipped 8 red ds* entries that
    # this replica called OK because str(Decimal) hid the divergence, and
    # because reading Spark parquet back THROUGH DuckDB normalizes both
    # sides to one Decimal type first). Treating Decimal as float makes
    # the replica strictly harsher than str() equality, so a raw decimal
    # output column can never again pass locally yet fail the driver.
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v == 0 or math.isnan(v):
            return "0" if v == 0 else "NaN"
        return f"{v:.6e}"
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    skip = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if skip is not None:
        skipped = sorted(n for n in oracles if skip.search(n))
        oracles = {n: s for n, s in oracles.items() if not skip.search(n)}
        print(f"skipping {len(skipped)}: {', '.join(skipped)}")
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            # Reject raw DECIMAL output columns outright: the driver's
            # hasher canonicalizes Spark decimal(28,2) vs DuckDB
            # DECIMAL(38,2) differently, but THIS replica reads the Spark
            # parquet back through DuckDB — normalizing both sides to one
            # Decimal type — so a value compare can never see the driver's
            # divergence. Round 9 shipped 8 red ds* entries this way.
            # The fix is always the n03 pattern: sum exactly in DECIMAL,
            # CAST the final aggregate to DOUBLE in both spellings.
            desc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchall()
            dec_cols = [r[0] for r in desc if str(r[1]).startswith("DECIMAL")]
            if dec_cols:
                failed.append(name)
                print(f"FAIL {name}: raw DECIMAL output column(s) {dec_cols} — "
                      "driver hash canonicalization risk; cast the final "
                      "aggregate to DOUBLE (n03 pattern)")
                continue
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            continue
        if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, o_cols)):
            failed.append(name)
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if len(cs) != len(co):
            failed.append(name)
            print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)}")
        elif cs != co:
            bad = next(i for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            failed.append(name)
            print(f"FAIL {name}: first diff row {bad}:\n  spark : {cs[bad]}\n  oracle: {co[bad]}")
        else:
            print(f"OK   {name} ({len(cs)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} matched")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
