#!/usr/bin/env python3
"""Deterministic CI fixture generator.

Usage: python3 tools/gen_testdata.py <outDir> [sf]

Produces the ten fixture tables with the exact schemas and value domains
the engine's query surface expects (TESTDATA.md). The correctness gate
(tools/compare.py) runs Spark and DuckDB over the SAME parquet files, so
the gate needs schema/domain-compatible deterministic data, not a byte
replica of the round driver's corpus: every oracle either reads the
table or replays arithmetic keyed on the id columns, both of which are
reproduced here. Seeded numpy → same bytes on every run.
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = ("the a spark table scan join order batch stream window dup hash "
         "merge part small fast key sort group query row data slow filter "
         "customer line value agg column big vector").split()
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]

US = 1_000_000


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))


def ts_us(values):
    return pa.array(values, type=pa.timestamp("us"))


def main():
    out = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.001
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    scale = sf / 0.001  # row counts are calibrated at the sf0.001 baseline

    n_region, n_nation = 5, 25
    n_supplier = max(int(10 * scale), 2)
    n_customer = max(int(150 * scale), 10)
    n_part = max(int(200 * scale), 10)
    n_orders = max(int(1500 * scale), 50)
    n_lineitem = max(int(6000 * scale), 200)
    n_events = max(int(1000 * scale), 100)
    n_docs = max(int(500 * scale), 50)

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(n_region), pa.int32()),
        "r_name": REGIONS}))

    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(n_nation), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(n_nation)],
        "n_regionkey": pa.array([i % n_region for i in range(n_nation)], pa.int32())}))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supplier + 1), pa.int64()),
        "s_name": [f"Supplier#{i}" for i in range(1, n_supplier + 1)],
        "s_nationkey": pa.array(rng.integers(0, n_nation, n_supplier), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supplier), 2)}))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(range(1, n_customer + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_customer + 1)],
        "c_nationkey": pa.array(rng.integers(0, n_nation, n_customer), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_customer), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_customer)]}))

    write(out, "part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": [f"part {WORDS[i % len(WORDS)]} {i}" for i in range(1, n_part + 1)],
        "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2)}))

    o_date0 = np.datetime64("1995-01-01", "us").astype("int64")
    o_span = (np.datetime64("2001-11-01", "us") - np.datetime64("1995-01-01", "us")) \
        .astype("int64")
    orderdates = o_date0 + (rng.integers(0, o_span // (86400 * US), n_orders)
                            * 86400 * US)
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(1, n_orders + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_customer + 1, n_orders), pa.int64()),
        "o_orderstatus": [["F", "O", "P"][i] for i in rng.integers(0, 3, n_orders)],
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_orders), 2),
        "o_orderdate": ts_us(orderdates),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_orders)]}))

    li_order = rng.integers(1, n_orders + 1, n_lineitem)
    shipdates = (orderdates[li_order - 1]
                 + rng.integers(1, 120, n_lineitem) * 86400 * US)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(li_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_lineitem), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supplier + 1, n_lineitem), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_lineitem), pa.int32()),
        "l_quantity": np.round(rng.uniform(1, 50, n_lineitem), 0),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_lineitem), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_lineitem), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_lineitem), 2),
        "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, n_lineitem)],
        "l_linestatus": [["F", "O"][i] for i in rng.integers(0, 2, n_lineitem)],
        "l_shipdate": ts_us(shipdates)}))

    ev_t0 = np.datetime64("2024-01-01", "us").astype("int64")
    ev_ts = np.sort(ev_t0 + rng.integers(0, 30 * 86400 * US, n_events))
    write(out, "events", pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": ts_us(ev_ts),
        "user_id": pa.array(rng.integers(0, max(n_events // 10, 5), n_events),
                            pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_events)],
        "value": np.round(rng.uniform(0, 500, n_events), 4),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)]}))

    texts = []
    for i in range(n_docs):
        n_words = int(rng.integers(8, 120))
        words = [WORDS[j] for j in rng.integers(0, len(WORDS), n_words)]
        if i % 20 == 0 and i > 0:  # exact duplicates for the dedup family
            texts.append(texts[i - 1])
        else:
            texts.append(" ".join(words))
    write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, n_docs)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    dim = 64
    base = rng.normal(0, 1, (10, dim))
    labels = rng.integers(0, 10, n_docs)
    vecs = (base[labels] + rng.normal(0, 0.4, (n_docs, dim))).astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_docs), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))

    print(f"wrote sf={sf} fixtures to {out}")


if __name__ == "__main__":
    main()
