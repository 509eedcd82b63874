"""Deterministic 10x-scale bench fixture generator (sf1 = 10 x sf0.1).

The driver's read-only testdata stops at sf0.1, where several headline
queries are planning-dominated (BENCH round-2 finding); this generates a
distribution-matched sf1 so per-query deltas exceed host noise. Parameters
are measured from /root/testdata/sf0.1 (row counts, value ranges, category
frequencies, timestamp spans — see the constants below); keys extend the
same dense 0..N-1 patterns. Seed fixed -> bit-stable regeneration.

One DELIBERATE divergence, documented for the bench notes: the documents
vocabulary is expanded from 31 to ~500 tokens. The tiny sf0.1 vocabulary
makes every doc near-collide in MinHash bands (PLANS.md "fixture
pathology") — at 10x rows that degenerates quadratically and would measure
the pathology, not the engine. ~500 tokens restores realistic shingle
cardinality while keeping the same text shape.

Usage: python scripts/make_sf_scaled.py [out_dir] [scale]
       (default /tmp/pyofs_sf1, scale 10)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

_BASE_VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream merge data "
    "join vector customer the"
).split()


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    vocab = np.array(
        _BASE_VOCAB + [f"{w}{i}" for i in range(15) for w in _BASE_VOCAB]
    )
    n_words = rng.integers(8, 101, n)
    langs = rng.choice(
        np.array(["en", "de", "es", "fr", "zh"]),
        n,
        p=[0.412, 0.14, 0.149, 0.149, 0.15],
    )
    texts = []
    for i in range(n):
        texts.append(" ".join(rng.choice(vocab, n_words[i])))
    texts = np.array(texts, dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    ts = t0 + np.sort(rng.integers(0, span_us, n)).astype("timedelta64[us]")
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, 15_000, n), pa.int64()),
            "event_type": pa.array(
                rng.choice(
                    np.array(["click", "error", "purchase", "signup", "view"]), n
                ),
                pa.string(),
            ),
            "value": pa.array(
                np.round(rng.gamma(1.2, 70.0, n), 2), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)], pa.string()
            ),
        }
    )


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)], pa.string()),
            "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10_000, n), 2), pa.float64()
            ),
            "c_mktsegment": pa.array(
                rng.choice(
                    np.array(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
                    ),
                    n,
                ),
                pa.string(),
            ),
        }
    )


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    d0 = np.datetime64("1995-01-01")
    days = rng.integers(0, 2405, n)
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
            "o_orderstatus": pa.array(
                rng.choice(np.array(["O", "P", "F"]), n), pa.string()
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500_000, n), 2), pa.float64()
            ),
            "o_orderdate": pa.array(
                (d0 + days.astype("timedelta64[D]")).astype("datetime64[us]")
            ),
            "o_orderpriority": pa.array(
                rng.choice(np.array([f"{i}-P" for i in range(1, 6)]), n), pa.string()
            ),
        }
    )


def gen_lineitem(rng: np.random.Generator, n: int, n_orders: int, n_parts: int,
                 n_supp: int) -> pa.Table:
    d0 = np.datetime64("1995-01-02")
    days = rng.integers(0, 2500, n)
    return pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_orders, n), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_parts, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
            "l_quantity": pa.array(
                rng.integers(1, 51, n).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105_000, n), 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, n) / 100.0, 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, n) / 100.0, 2), pa.float64()
            ),
            "l_returnflag": pa.array(
                rng.choice(np.array(["A", "N", "R"]), n), pa.string()
            ),
            "l_linestatus": pa.array(
                rng.choice(np.array(["O", "F"]), n), pa.string()
            ),
            "l_shipdate": pa.array(
                (d0 + days.astype("timedelta64[D]")).astype("datetime64[us]")
            ),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    centroids = rng.normal(0, 1, (10, dim))
    labels = rng.integers(0, 10, n)
    vecs = (centroids[labels] + rng.normal(0, 1.0, (n, dim))).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def main(out_dir: str = "/tmp/pyofs_sf1", scale: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260816)
    print(f"generating sf{0.1 * scale:g} at {out_dir} (scale {scale}x of sf0.1)")
    _write(out_dir, "documents", gen_documents(rng, 5_000 * scale))
    _write(out_dir, "events", gen_events(rng, 100_000 * scale))
    n_cust = 15_000 * scale
    _write(out_dir, "customer", gen_customer(rng, n_cust))
    _write(out_dir, "orders", gen_orders(rng, 150_000 * scale, n_cust))
    _write(
        out_dir, "lineitem",
        gen_lineitem(rng, 600_000 * scale, 150_000 * scale, 20_000, 1_000),
    )
    _write(out_dir, "embeddings", gen_embeddings(rng, 2_000 * scale))
    for dim in ("region", "nation", "part", "supplier"):
        shutil.copy(os.path.join(SRC, f"{dim}.parquet"),
                    os.path.join(out_dir, f"{dim}.parquet"))
        print(f"  {dim}: copied dim table")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pyofs_sf1"
    sc = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, sc)
