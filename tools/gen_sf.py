#!/usr/bin/env python3
"""Deterministic scale-factor testdata generator (driver-parallel
tooling, like check.py — NOT part of the Scala library).

Reproduces the SHAPE of the driver's synthetic tables at arbitrary
scale factors so the library's scaling trend can be measured beyond
the provided sf0.1: same schemas, same value domains, same
planted-duplicate rates. Values are NOT byte-identical to the
driver's (its seed stream is unknown) — scale runs are
self-consistent: Verify and check.py are pointed at the SAME generated
dir, so the DuckDB oracle comparison is exact there too.

events.ts is timestamp[us] like the round-8+ driver data; pass --ns
to emit the rounds-1..7 TIMESTAMP(NANOS) shape instead, which
regression-tests Tables.events' legacy nanosAsLong branch.

Usage: python3 tools/gen_sf.py <sf> <outDir> [--ns]   e.g. 1 /tmp/gen_sf1
Row counts at sf=1: lineitem 6M, orders 1.5M, customer 150k, part
200k, supplier 10k, events 1M (15k users), documents 50k,
embeddings 20k.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pathlib import Path

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"])
LANGS = np.array(["en", "en", "en", "en", "de", "es", "fr", "zh"])
SEGS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                 "MACHINERY"])
PRIOS = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                  "5-LOW"])
ETYPES = np.array(["click", "error", "purchase", "signup", "view"])
ADJS = np.array(["large", "hot", "blue", "old", "red", "green", "small",
                 "new", "dark", "pale"])
NOUNS = np.array(["ring", "bolt", "plate", "screw", "wheel", "pin",
                  "gear", "rod", "cap", "disk"])
PTYPES = np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM",
                   "PROMO"])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_MS = 86_400_000


def write(out, name, table):
    pq.write_table(table, str(Path(out) / f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def ts_us(base_ms, offsets_ms):
    # µs like the driver's round-8+ data (Spark loads it as
    # TIMESTAMP_NTZ; the readers cast to the UTC session zone)
    return pa.array(((base_ms + offsets_ms) * 1000).astype("int64"),
                    type=pa.timestamp("us"))


def main(sf: float, out: str, ns_events: bool = False):
    Path(out).mkdir(parents=True, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)
    epoch95 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(
        "int64")
    epoch24 = np.datetime64("2024-01-01").astype("datetime64[ms]").astype(
        "int64")

    write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype="int32"),
                                type=pa.int32()),
        "r_name": pa.array(REGIONS)}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype="int32"),
                                type=pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25) % 5, type=pa.int32())}))

    r = np.random.default_rng(4201)
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(r.integers(0, 25, n_cust),
                                type=pa.int32()),
        "c_acctbal": np.round(r.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(SEGS[r.integers(0, 5, n_cust)])}))

    r = np.random.default_rng(4202)
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(r.integers(0, 25, n_supp),
                                type=pa.int32()),
        "s_acctbal": np.round(r.uniform(-1000, 10_000, n_supp), 2)}))

    r = np.random.default_rng(4203)
    names = np.char.add(np.char.add(ADJS[r.integers(0, 10, n_part)], " "),
                        NOUNS[r.integers(0, 10, n_part)])
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), type=pa.int64()),
        "p_name": pa.array(names),
        "p_brand": pa.array([f"Brand#{b}" for b in
                             r.integers(1, 26, n_part)]),
        "p_type": pa.array(PTYPES[r.integers(0, 6, n_part)]),
        "p_size": pa.array(r.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) * 0.1, 2)}))

    r = np.random.default_rng(4204)
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(r.integers(0, n_cust, n_ord),
                              type=pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "P", "F"])[r.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(r.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": ts_us(epoch95,
                             r.integers(0, 2405, n_ord) * DAY_MS),
        "o_orderpriority": pa.array(PRIOS[r.integers(0, 5, n_ord)])}))

    r = np.random.default_rng(4205)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(r.integers(0, n_ord, n_li),
                               type=pa.int64()),
        "l_partkey": pa.array(r.integers(0, n_part, n_li),
                              type=pa.int64()),
        "l_suppkey": pa.array(r.integers(0, n_supp, n_li),
                              type=pa.int64()),
        "l_linenumber": pa.array(r.integers(1, 8, n_li),
                                 type=pa.int32()),
        "l_quantity": r.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(r.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(r.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(r.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[r.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[r.integers(0, 2, n_li)]),
        "l_shipdate": ts_us(epoch95,
                            r.integers(1, 2500, n_li) * DAY_MS)}))

    # events.ts: timestamp[us] like the round-8+ driver data, or (with
    # --ns) the legacy TIMESTAMP(NANOS) shape the readers special-case
    # via legacy.parquet.nanosAsLong. ns values are µs-aligned in both
    # generations, so the legacy floor-to-µs is lossless.
    r = np.random.default_rng(4206)
    ns = epoch24 * 1_000_000 + (r.integers(0, 30 * 86_400 * 10**6, n_ev,
                                           dtype="int64") * 1000)
    ts_arr = (pa.array(ns, type=pa.timestamp("ns")) if ns_events
              else pa.array(ns // 1000, type=pa.timestamp("us")))
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), type=pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array(r.integers(0, n_users, n_ev),
                            type=pa.int64()),
        "event_type": pa.array(ETYPES[r.integers(0, 5, n_ev)]),
        "value": np.round(r.uniform(0, 560.25, n_ev), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           r.integers(0, 100, n_ev)])}))

    # documents: 8-110 word salads over the 31-word vocab; planted
    # EXACT dup pairs every 619 docs and NEAR dup pairs (every 8th word
    # rewritten => Jaccard well above the 0.5 ngram/cluster threshold)
    # every 211 docs — the same ~0.16% / ~0.5% rates the provided sf0.1
    # exhibits, so candidate volumes scale comparably
    r = np.random.default_rng(4207)
    lens = r.integers(8, 111, n_doc)
    texts = []
    for i in range(n_doc):
        words = VOCAB[r.integers(0, len(VOCAB), lens[i])]
        texts.append(" ".join(words))
    for i in range(1, n_doc):
        if i % 619 == 618:
            texts[i] = texts[i - 1]
        elif i % 211 == 210:
            w = texts[i - 1].split(" ")
            for j in range(0, len(w), 8):
                w[j] = VOCAB[int(r.integers(0, len(VOCAB)))]
            texts[i] = " ".join(w)
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(LANGS[r.integers(0, 8, n_doc)]),
        "source": pa.array([f"src{s}" for s in
                            r.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64())}))

    # embeddings: 64-dim, 10 label clusters (centroid + noise), plus a
    # near-identical pair every 97 vectors for the cosine-dedup family
    r = np.random.default_rng(4208)
    labels = r.integers(0, 10, n_vec)
    cent = r.normal(0, 1, (10, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    emb = 0.12 * cent[labels] + r.normal(0, 0.08, (n_vec, 64))
    for i in range(1, n_vec):
        if i % 97 == 96:
            emb[i] = emb[i - 1] + r.normal(0, 0.001, 64)
    emb32 = emb.astype("float32")
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), type=pa.int64()),
        "embedding": pa.array(list(emb32),
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32())}))


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2], ns_events="--ns" in sys.argv[3:])
