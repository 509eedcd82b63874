"""Streaming twin of txt_sample_mix (plans/queries_text.py).

The keep decision is a pure function of (doc_id, lang) — append-stable
by design — so the stream needs NO state, no watermark, nothing beyond
an append-mode filter: each micro-batch samples exactly as the batch
query would, failure replays produce identical keeps (the deterministic
hash decides; the checkpoint only tracks file offsets), and a 10^12-row
backfill and its live tail can share one code path.

Expressions are built from the SAME _MIX_KEEP thresholds as the batch
SQL, so batch/stream parity is by construction (and pinned by
tests/test_sample_mix.py::test_streaming_sample_equals_batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.queries_text import _MIX_KEEP, mix_bucket_sql


def _bucket() -> Column:
    # IDENTICAL expression text to the batch SQL (single source of truth:
    # queries_text.mix_bucket_sql) — the round-6 overflow-safe limb-split
    # form, well-defined over the full nonnegative int64 doc_id range
    return F.expr(mix_bucket_sql("doc_id"))


def _keep_n() -> Column:
    expr = F.lit(None).cast("long")
    for lang, k in _MIX_KEEP.items():
        expr = F.when(F.col("lang") == lang, F.lit(k)).otherwise(expr)
    return expr


def sample_mix_stream(docs: DataFrame) -> DataFrame:
    """docs: streaming (or batch) DataFrame with (doc_id long, lang
    string). Returns the sampled stream with the same schema as the
    batch txt_sample_mix query."""
    return (
        docs.select(
            "doc_id",
            "lang",
            _bucket().alias("bucket"),
            _keep_n().alias("keep_n"),
        )
        .where(F.col("keep_n").isNotNull() & (F.col("bucket") < F.col("keep_n")))
        .select(
            "doc_id",
            "lang",
            "bucket",
            (F.lit(4096.0) / F.col("keep_n")).alias("weight"),
        )
    )
