#!/usr/bin/env python3
"""Dev-only local replica of the driver's t2 oracle compare.

NOT part of the shipped Spark library (that is pure Scala under src/).
Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
sf parquet tables, reads the Spark-written parquet from <outdir>/<name>/,
sorts columns by name, and value-compares row by row.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 9)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("dec", str(v.normalize()))
    except Exception:
        pass
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_files[0]}')").fetchall()
            got_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1; continue
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        w = [tuple(norm(r[i]) for i in wi) for r in want]
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        if len(w) != len(g):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1; continue
        bad = next((i for i, (a, b) in enumerate(zip(w, g)) if a != b), None)
        if bad is not None:
            print(f"FAIL {name}: row {bad} oracle={w[bad]} spark={g[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(w)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
