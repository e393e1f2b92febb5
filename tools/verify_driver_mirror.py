#!/usr/bin/env python3
"""Driver-exact replay of the correctness gate.

The driver (per CORRECTNESS_r01.json evidence) loads the Spark parquet via
pyarrow->pandas and the oracle via duckdb .df(), sorts columns by name, sorts
rows, then hash-compares VALUES WITH DTYPES. That makes two divergence classes
invisible to a numeric-equality comparator but fatal to the driver:

  1. Spark DECIMAL output -> pandas object column of decimal.Decimal, while
     DuckDB DECIMAL -> float64.  (r01: q1_agg, parse_decimals_localized, ...)
  2. DuckDB SUM(BIGINT) -> HUGEINT -> float64, while Spark emits int64.
     (r01: revenue_by_nation, stats_agg, window_running, ...)
  3. Array/list columns -> numpy.ndarray cells, which pandas sort_values
     cannot factorize -> driver errors out.  (r01: array_funcs)

This tool mirrors that: it compares pandas dtypes per column AND canonical
values, and flags list/decimal/object-numeric columns as hard failures.

Usage: tools/verify_driver_mirror.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_class(s: pd.Series):
    d = str(s.dtype)
    if d.startswith("datetime64"):
        return "datetime"
    if d in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
             "uint64", "Int64"):
        return "int"
    if d in ("float32", "float64"):
        return "float"
    if d == "bool":
        return "bool"
    if d == "object":
        # classify by first non-null cell
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            import decimal
            import datetime
            if isinstance(v, decimal.Decimal):
                return "DECIMAL_OBJECT"   # driver-fatal vs duckdb float64
            if isinstance(v, (list, tuple, np.ndarray)):
                return "LIST"             # driver-fatal: unhashable
            if isinstance(v, (bytes, bytearray)):
                return "bytes"
            if isinstance(v, datetime.date):
                return "date"
            if isinstance(v, str):
                return "str"
            return f"object:{type(v).__name__}"
        return "all-null"
    return d


def canon_cell(v):
    import datetime
    import decimal
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, float) and math.isnan(v):
        return ("nan",)
    if isinstance(v, (np.floating,)):
        return ("float", repr(float(v)))
    if isinstance(v, float):
        return ("float", repr(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        # duckdb DATE -> pandas datetime64 at midnight; spark date32 ->
        # datetime.date. The driver's compare treats these as equal
        # (date_funcs passed in r01), so canonicalize date == midnight ts.
        return ("ts", v.isoformat() + "T00:00:00")
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", tuple(canon_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return ("v", str(v))


def canon_rows(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(r[c]) for c in cols)
            for r in df.to_dict("records")]
    return cols, sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]

    def fresh_con():
        # one connection PER QUERY: a heavy oracle that OOMs poisons the
        # connection's memory accounting and every later query then fails
        # with a spurious OOM (observed at sf0.1). Bounded budget + spill
        # dir keep big oracles (winnow's ~20M-row windowed expand) honest.
        c = duckdb.connect()
        c.execute("SET memory_limit = '32GB'")
        c.execute("SET temp_directory = '/tmp/duckdb_spill'")
        for t in TABLES:
            p = Path(sf_dir) / f"{t}.parquet"
            if p.exists():
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    # optional arg 3: comma-separated query subset (process isolation for
    # heavy oracles — an OOM'd duckdb can poison the whole process)
    if len(sys.argv) > 3:
        subset = set(sys.argv[3].split(","))
        oracles = {k: v for k, v in oracles.items() if k in subset}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        con = fresh_con()
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = pq.read_table(spark_dir).to_pandas()
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        bad = False
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                  f"duckdb={sorted(ddf.columns)}")
            n_fail += 1
            continue
        for c in sorted(sdf.columns):
            sc, dc = dtype_class(sdf[c]), dtype_class(ddf[c])
            if "DECIMAL_OBJECT" in (sc, dc) or "LIST" in (sc, dc):
                print(f"FAIL {name}: col {c} driver-fatal dtype "
                      f"spark={sc} duckdb={dc}")
                bad = True
            elif sc != dc and {sc, dc} != {"all-null"}:
                # int-vs-float or str-vs-anything => driver hash mismatch
                if {sc, dc} <= {"int", "all-null"} or \
                        {sc, dc} <= {"float", "all-null"} or \
                        {sc, dc} <= {"str", "all-null"} or \
                        {sc, dc} <= {"date", "datetime"}:
                    pass  # tolerate all-null and date-vs-datetime64 pairs
                else:
                    print(f"FAIL {name}: col {c} dtype mismatch "
                          f"spark={sc} duckdb={dc}")
                    bad = True
        if bad:
            n_fail += 1
            continue
        s_cols, s_rows = canon_rows(sdf)
        d_cols, d_rows = canon_rows(ddf)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duckdb={len(d_rows)}")
            n_fail += 1
            continue
        if s_rows != d_rows:
            diffs = [(i, a, b) for i, (a, b)
                     in enumerate(zip(s_rows, d_rows)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first:")
            for i, a, b in diffs[:3]:
                print(f"  row {i}\n   spark : {a}\n   duckdb: {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_rows)} rows)")
        n_pass += 1
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracles:
            print(f"INFO {d.name}: no oracle, rows={pq.read_table(d).num_rows}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
