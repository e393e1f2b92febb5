#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: for each SparkEntry query,
compare the Spark parquet dump (written by `graft.Verify`) against the DuckDB
result of its oracle SQL on the same testdata tables.

Usage: tools/verify_local.py <sfDir> <verifyOutDir>

Canonicalization mirrors the driver contract (BASELINE.md): columns sorted by
name, then rows sorted, then values compared exactly (floats exact, decimals
by numeric equality, timestamps at microsecond precision).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return ("null",)
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("num", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if v == int(v) and abs(v) < 2**53:
            return ("num", str(decimal.Decimal(int(v))))
        return ("float", repr(v))
    if isinstance(v, int):
        return ("num", str(decimal.Decimal(v)))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(timespec="microseconds"))
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(canon_cell(x) for x in v))
    return ("v", str(v))


def canon_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if subset is not None:
        oracles = {k: v for k, v in oracles.items() if k in subset}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(spark_dir)
        s_cols = tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, s_canon = canon_table(s_cols, s_rows)
        dc, d_canon = canon_table(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={dc}")
            n_fail += 1
            continue
        if len(s_canon) != len(d_canon):
            print(f"FAIL {name}: row count spark={len(s_canon)} duckdb={len(d_canon)}")
            n_fail += 1
            continue
        if s_canon != d_canon:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: ")
            for i, a, b in diffs[:3]:
                print(f"  row {i}\n   spark : {a}\n   duckdb: {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_canon)} rows)")
        n_pass += 1
    # queries without an oracle: rows-only check
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracles:
            n = pq.read_table(d).num_rows
            print(f"INFO {d.name}: no oracle, rows={n}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
