#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
executes the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB
with a view per test table, and compares: columns sorted by name,
rows sorted by all columns, exact value equality (bitwise for floats),
AND exact DuckDB type parity per column. The driver's hash is
type-sensitive, so a value-identical oracle with a wider type (the
round-9 class: un-cast SUM(BIGINT) -> HUGEINT) must fail here too.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in idx]


def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b and math.copysign(1, a) == math.copysign(1, b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(sql)
            want_rows, want_cols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        g, gc = canon(got_rows, got_cols)
        w, wc = canon(want_rows, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_bad += 1
            continue
        # Type parity (driver-hash emulation): DESCRIBE both sides and
        # require identical DuckDB types column-by-column.
        try:
            got_t = dict(r[:2] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall())
            want_t = dict(r[:2] for r in con.execute(f"DESCRIBE ({sql})").fetchall())
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}")
            n_bad += 1
            continue
        # Machine-int widths are mutually compatible: the driver hashes
        # pandas-decoded frames, and TINYINT..BIGINT all coerce to
        # int64 there (r9 evidence: rank() BIGINT oracles vs Spark
        # INTEGER were hash-green). HUGEINT/UHUGEINT and any
        # cross-family drift decode differently and must fail.
        ints = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}

        def tok(t):
            return "INT" if t in ints else t
        tdiff = [(c, got_t.get(c), want_t.get(c))
                 for c in gc if tok(got_t.get(c)) != tok(want_t.get(c))]
        if tdiff:
            print(f"FAIL {name}: type mismatch (spark vs oracle): {tdiff}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_bad += 1
            continue
        bad = None
        for i, (rg, rw) in enumerate(zip(g, w)):
            if not all(eq(a, b) for a, b in zip(rg, rw)):
                bad = (i, rg, rw)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
