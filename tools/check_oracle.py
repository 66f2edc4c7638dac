#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate.

Runs graft.Verify's output (parquet per query + oracle_sql.json) against
DuckDB over the same sf tables, compares row counts, column-name sets and
values (columns sorted by name, rows sorted, NaN-safe). Dev tool only —
not part of the shipped library.
"""
import json
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

with open(f"{OUT_DIR}/oracle_sql.json") as f:
    oracles = json.load(f)


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda tup: tuple((x is None, str(x)) for x in tup))
    return [cols[i] for i in order], out


ok = fail = 0
for name, sql in sorted(oracles.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        exp = con.execute(sql)
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    gc, gr = canon(got_cols, got_rows)
    ec, er = canon(exp_cols, exp_rows)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}")
        fail += 1
    elif len(gr) != len(er):
        print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
        fail += 1
    elif gr != er:
        bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
        print(f"FAIL {name}: first diff at row {bad}:\n  got {gr[bad]}\n  exp {er[bad]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(gr)} rows)")
        ok += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
