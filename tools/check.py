#!/usr/bin/env python3
"""Dev-only local replica of the driver's t2 oracle compare.

NOT part of the shipped Spark library (that is pure Scala under src/).
Driver-faithful since round 2: the round-1 version value-normalized
Decimals, which let 23 latent representation mismatches ship green.
This replica now mirrors the driver pipeline:
  - Spark output read into pandas via pyarrow (ALL part files);
  - oracle SQL run in DuckDB, fetched as a pandas frame (decimals
    arrive as float64);
  - REJECT any Spark output column whose cells are decimal.Decimal or
    ndarray/list (the driver hash-mismatches the former and crashes on
    the latter) — queries must final-cast to DOUBLE / array_join;
  - columns sorted by name, rows sorted by all columns, values compared
    EXACTLY (floats bitwise, NaN==NaN) — no rounding, no normalization.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob, decimal, datetime
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def repr_problems(df):
    """Columns the driver's comparator can't hash faithfully."""
    bad = []
    for c in df.columns:
        if df[c].dtype != object:
            continue
        for v in df[c].dropna().head(200):
            if isinstance(v, decimal.Decimal):
                bad.append((c, "Decimal")); break
            if isinstance(v, (np.ndarray, list, tuple, dict)):
                bad.append((c, type(v).__name__)); break
    return bad


def canon(df):
    """Driver canonicalization: columns by name, rows by all columns."""
    df = df[sorted(df.columns)]
    # date/datetime columns → datetime64 on both sides so pandas vs
    # duckdb date representations (datetime.date vs datetime64) agree
    for c in df.columns:
        if df[c].dtype == object:
            sample = next((v for v in df[c].dropna().head(5)), None)
            if isinstance(sample, (datetime.date, datetime.datetime)):
                df = df.assign(**{c: pd.to_datetime(df[c])})
        elif str(df[c].dtype).startswith("datetime64"):
            df = df.assign(**{c: df[c].astype("datetime64[us]")})
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def kind_class(s):
    """Driver's hash is dtype-sensitive: int64 vs float64 columns hash
    differently even when values compare equal (q_pivot round 3: DuckDB
    HUGEINT -> float64 wire vs Spark int64). Classify dtypes into the
    groups the hash distinguishes; int widths hash alike, so they share
    a class."""
    k = s.to_numpy().dtype.kind
    if k in "iub":
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    return "object"


def col_equal(a, b):
    """Exact equality; floats bitwise with NaN==NaN; None==None."""
    if len(a) != len(b):
        return False
    av, bv = a.to_numpy(), b.to_numpy()
    if np.issubdtype(av.dtype, np.floating) and \
       np.issubdtype(bv.dtype, np.floating):
        return bool(np.all((av == bv) | (np.isnan(av) & np.isnan(bv))))
    if np.issubdtype(av.dtype, np.number) and \
       np.issubdtype(bv.dtype, np.number):
        return bool(np.all(av == bv))
    return all((x is None and y is None) or
               (x is not None and y is not None and
                not (isinstance(x, float) and isinstance(y, float) and
                     np.isnan(x) and np.isnan(y)) and x == y) or
               (isinstance(x, float) and isinstance(y, float) and
                np.isnan(x) and np.isnan(y)) or
               (pd.isna(x) and pd.isna(y))
               for x, y in zip(a.tolist(), b.tolist()))


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
        spark_files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in spark_files],
                            ignore_index=True)
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        probs = repr_problems(got)
        if probs:
            print(f"FAIL {name}: driver-hostile repr {probs} "
                  f"(cast to DOUBLE / array_join on the Spark side)")
            n_fail += 1; continue
        if sorted(want.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols spark={sorted(got.columns)} "
                  f"oracle={sorted(want.columns)}")
            n_fail += 1; continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            n_fail += 1; continue
        try:
            w, g = canon(want), canon(got)
        except Exception as e:
            print(f"FAIL {name}: comparator sort crashed: {e}")
            n_fail += 1; continue
        kinds = [(c, kind_class(w[c]), kind_class(g[c]))
                 for c in w.columns]
        badk = [(c, kw, kg) for c, kw, kg in kinds if kw != kg]
        if badk:
            for c, kw, kg in badk[:3]:
                print(f"FAIL {name}: col {c} dtype kind oracle={kw} "
                      f"spark={kg} (driver hash is dtype-sensitive; "
                      f"CAST both sides to the same type)")
            n_fail += 1; continue
        bad = [c for c in w.columns if not col_equal(w[c], g[c])]
        if bad:
            for c in bad[:1]:
                diff = next(i for i in range(len(w))
                            if not col_equal(w[c].iloc[i:i+1].reset_index(drop=True),
                                             g[c].iloc[i:i+1].reset_index(drop=True)))
                print(f"FAIL {name}: col {c} row {diff} "
                      f"oracle={w[c].iloc[diff]!r} spark={g[c].iloc[diff]!r}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(w)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
