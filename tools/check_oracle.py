#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, sorts columns by
name, sorts rows, and compares values (exact, plus a relative-tolerance
fallback report for floats). Run BEFORE committing query changes:

    tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/vout
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/vout
"""
import sys, os, json, glob, math
import duckdb

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    rel = con.execute(
        f"SELECT * FROM read_parquet({files!r})")
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    return cols, rows

def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols2 = [cols[i] for i in order]
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            return v
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        return v
    rows2 = sorted([tuple(norm(r[i]) for i in order) for r in rows],
                   key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols2, rows2

def approx_equal(a, b):
    if a == b: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9): return True
    return False

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, d))])
    n_pass = n_fail = n_noracle = 0
    for name in names:
        got = load_result(os.path.join(outdir, name))
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(got[1])} rows)")
            n_noracle += 1; continue
        try:
            rel = con.execute(oracle[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, gr = normalize(*got)
        oc, orr = normalize(ocols, orows)
        if [c.lower() for c in gc] != [c.lower() for c in oc]:
            print(f"FAIL {name}: schema mismatch spark={gc} duck={oc}")
            n_fail += 1; continue
        if len(gr) != len(orr):
            print(f"FAIL {name}: rowcount spark={len(gr)} duck={len(orr)}")
            n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, orr)):
            if a != b:
                if all(approx_equal(x, y) for x, y in zip(a, b)):
                    bad = bad or ("approx", i, a, b)
                else:
                    bad = ("exact", i, a, b); break
        if bad is None:
            print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
        elif bad[0] == "approx":
            print(f"WARN {name}: exact-hash mismatch but within tolerance "
                  f"at row {bad[1]}: {bad[2]} vs {bad[3]}")
            n_fail += 1
        else:
            print(f"FAIL {name}: row {bad[1]} spark={bad[2]} duck={bad[3]}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
