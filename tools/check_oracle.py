#!/usr/bin/env python3
"""Driver-faithful replica of the DuckDB-oracle correctness gate.

The real driver compares the *pandas materializations* of both sides:
`pd.read_parquet(<spark output>)` vs `duckdb.execute(sql).df()`, sorts
columns by name, and hashes stringified values. That hash is dtype- and
repr-sensitive: DuckDB `sum(BIGINT)` -> HUGEINT -> float64 renders
`151.0` while Spark int64 renders `151`; DuckDB DECIMAL -> float64
renders `194.5` while Spark decimal -> object Decimal renders `194.50`.
Round 2 shipped 14 value-exact queries that the driver rejected because
the old checker read BOTH sides through DuckDB and normalized exactly
these differences away.

This version materializes each side the way the driver does and compares
stringified values (temporals normalized, which the driver also does).
Run BEFORE committing query changes:

    tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/vout
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/vout [prefix]
"""
import sys, os, json, math
import datetime
import decimal
import duckdb
import numpy as np
import pandas as pd


def stringify(v):
    """Canonical per-value string, driver-style: temporals normalized,
    everything else rendered exactly as its pandas repr (so int64 151
    vs float64 151.0 vs Decimal('151.00') all DIFFER)."""
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    if v is pd.NaT:
        return "<null>"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        s = v.isoformat()
        return s[:-9] if s.endswith("T00:00:00") else s
    if isinstance(v, (np.datetime64,)):
        return stringify(pd.Timestamp(v))
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, np.bool_):
        return str(bool(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(stringify(x) for x in v) + "]"
    return str(v)


def frame_rows(df):
    """Column-name-sorted, stringified, row-sorted representation."""
    cols = sorted(df.columns, key=lambda c: c.lower())
    rows = []
    for t in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(stringify(v) for v in t))
    rows.sort()
    return [c.lower() for c in cols], rows


def dtype_summary(df):
    return {c.lower(): str(df[c].dtype) for c in df.columns}


def main(sfdir, outdir, prefix=None):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. SoakData)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    if prefix:
        names = [n for n in names if n.startswith(tuple(prefix.split(",")))]
    n_pass = n_fail = n_noracle = 0
    for name in names:
        try:
            sdf = pd.read_parquet(os.path.join(outdir, name))
        except Exception as e:
            print(f"FAIL {name}: unreadable spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)")
            n_noracle += 1
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = frame_rows(sdf)
        oc, orr = frame_rows(odf)
        if sc != oc:
            print(f"FAIL {name}: schema mismatch spark={sc} duck={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(orr)}")
            n_fail += 1
            continue
        bad = next((i for i, (a, b) in enumerate(zip(sr, orr)) if a != b), None)
        if bad is None:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
        else:
            sd, od = dtype_summary(sdf), dtype_summary(odf)
            dt = {c: (sd[c], od[c]) for c in sd if sd[c] != od.get(c)}
            print(f"FAIL {name}: row {bad}\n  spark={sr[bad]}\n  duck ={orr[bad]}"
                  + (f"\n  dtype diffs: {dt}" if dt else ""))
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
