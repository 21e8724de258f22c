"""Regenerate a *representative* large-scale fixture set for optimization
measurement (the driver's sf1.0 directory is removed between sessions).

Distributions are reverse-engineered from /root/testdata/sf0.1 (see
OPTIMIZATION_r06.md): same schemas, same vocab/length/dup structure for
documents, unit-norm random embeddings, 30-day event stream, TPC-H-ish
star tables scaled 10x. Seeded, single-row-group parquet files like the
driver's fixtures. Output goes to a separate directory; /root/testdata
itself is never touched.

Usage: python tools/gen_bigdata.py [sf] [outdir]
  sf      scale multiplier relative to sf0.1 (default 10 -> "sf1.0" shape)
  outdir  default /root/bigdata/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
SOURCES = [f"src{i}" for i in range(20)]
SEGMENTS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
PART_ADJ = ["large", "hot", "small", "cold", "dark", "light", "new", "old"]
PART_NOUN = ["ring", "bolt", "nut", "gear", "wheel", "pin", "rod", "cap"]
PART_TYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=1 << 30, compression="snappy")
    print(f"{name}: {table.num_rows} rows -> {path}")


def gen(sf_mult: int, outdir: str) -> None:
    rng = np.random.RandomState(42)
    os.makedirs(outdir, exist_ok=True)

    # --- dims (fixed size) ---
    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
    }))

    n_cust = 15000 * sf_mult
    n_supp = 1000 * sf_mult
    n_part = 20000 * sf_mult
    n_ord = 150000 * sf_mult
    n_ev = 100000 * sf_mult
    n_doc = 5000 * sf_mult
    n_emb = 2000 * sf_mult

    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int64()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.randint(0, 5, n_cust)]),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int64()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{PART_ADJ[rng.randint(8)]} {PART_NOUN[rng.randint(8)]}"
                   for _ in range(n_part)],
        "p_brand": [f"Brand#{rng.randint(1, 26)}" for _ in range(n_part)],
        "p_type": pa.array(np.array(PART_TYPES)[rng.randint(0, 6, n_part)]),
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int64()),
        "p_retailprice": np.round(900.0 + rng.uniform(0, 100, n_part), 2),
    }))

    # --- orders / lineitem ---
    day0 = np.datetime64("1995-01-01")
    odates = day0 + rng.randint(0, 2404, n_ord).astype("timedelta64[D]")
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["P", "O", "F"])[rng.randint(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odates.astype("datetime64[us]")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.randint(0, 5, n_ord)]),
    }))
    lines_per = rng.randint(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(lkey)
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    perm = rng.permutation(n_li)  # fixture rows are not clustered by orderkey
    sdates = day0 + rng.randint(1, 2500, n_li).astype("timedelta64[D]")
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey[perm], pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lnum[perm], pa.int64()),
        "l_quantity": rng.randint(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["N", "R", "A"])[rng.randint(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.randint(0, 2, n_li)]),
        "l_shipdate": pa.array(sdates.astype("datetime64[us]")),
    }))

    # --- events: 30-day stream, exponential gaps, exp-ish values ---
    gaps = rng.exponential(30.0 * 86400 / n_ev, n_ev)
    ts = (np.datetime64("2024-01-01", "us")
          + np.cumsum(gaps * 1e6).astype("timedelta64[us]"))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.randint(0, 1500 * sf_mult // 10, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.randint(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)],
    }))

    # --- documents: 10-100 words from 30-word vocab; 5% near-dups (+" dup"),
    # ~0.3% exact dups ---
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_doc):
        u = rng.rand()
        if i > 10 and u < 0.05:
            src = texts[rng.randint(0, i)]
            texts.append(src + " dup")
        elif i > 10 and u < 0.053:
            texts.append(texts[rng.randint(0, i)])
        else:
            nw = rng.randint(10, 101)
            texts.append(" ".join(vocab[rng.randint(0, 30, nw)]))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array(np.array(SOURCES)[rng.randint(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings: random unit 64-dim float32, labels uniform 0..9 ---
    E = rng.randn(n_emb, 64).astype("float32")
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(E), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_emb), pa.int64()),
    }))

    with open(os.path.join(outdir, "_DONE"), "w") as f:
        f.write("ok\n")


if __name__ == "__main__":
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/bigdata/sf1.0"
    gen(mult, out)
