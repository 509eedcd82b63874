"""txt_sample_mix (round 5): deterministic stratified sampling.

Parity (same SQL text, Spark vs DuckDB), an independent Python
re-derivation of the keep set, the zero-shuffle plan assertion, and the
append-stability property incremental corpus builds rely on.
"""

from __future__ import annotations

import math

import duckdb

from conftest import SF_DIR


def _keep(doc_id: int, lang: str, mix: dict[str, int]) -> bool:
    bucket = ((doc_id * 2654435761) % 4294967296) // 1048576
    return bucket < mix[lang]


def test_sample_mix_duckdb_parity(spark):
    from pyofs_spark.plans.queries_text import (
        _TXT_SAMPLE_MIX_SQL,
        _txt_sample_mix,
    )

    sdf = _txt_sample_mix(spark, SF_DIR)
    s = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    d = sorted(tuple(r) for r in con.execute(_TXT_SAMPLE_MIX_SQL).fetchall())
    assert len(s) == len(d) > 0
    assert s == d


def test_sample_mix_matches_python_rederivation(spark):
    from pyofs_spark.plans.queries_text import _MIX_KEEP, _txt_sample_mix

    docs = {
        (r["doc_id"], r["lang"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    expect = {(d, l) for d, l in docs if _keep(d, l, _MIX_KEEP)}
    got = {
        (r["doc_id"], r["lang"]): r["weight"]
        for r in _txt_sample_mix(spark, SF_DIR).collect()
    }
    assert set(got) == expect
    # kept set must be a strict, non-empty subsample
    assert 0 < len(got) < len(docs)
    for (_, lang), w in got.items():
        assert w == 4096.0 / _MIX_KEEP[lang]  # FP-exact (powers of two)


def test_sample_mix_zero_shuffle_plan(spark):
    """Map-only: scan → filter → broadcast join against the 5-row mix dim.
    Any hash exchange here would shuffle the full corpus at 10^12 rows
    for what is a per-row decision."""
    from pyofs_spark.plans.queries_text import _txt_sample_mix

    df = _txt_sample_mix(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sample_mix_append_stable(spark):
    """The keep decision is a pure function of (doc_id, lang): sampling a
    PREFIX of the corpus yields exactly the full-corpus sample restricted
    to that prefix — appends never resample history."""
    from pyofs_spark.plans.queries_text import _TXT_SAMPLE_MIX_SQL

    full = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cut = 250
    full.createOrReplaceTempView("documents")
    all_kept = {r["doc_id"] for r in spark.sql(_TXT_SAMPLE_MIX_SQL).collect()}
    full.where(f"doc_id < {cut}").createOrReplaceTempView("documents")
    try:
        prefix_kept = {
            r["doc_id"] for r in spark.sql(_TXT_SAMPLE_MIX_SQL).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    assert prefix_kept == {d for d in all_kept if d < cut}


def test_streaming_sample_equals_batch(spark):
    """The sampler runs unchanged under Structured Streaming (stateless
    append) and per-row results are identical to the batch query —
    including over a live tail of newly arrived files."""
    import shutil
    import tempfile

    from pyofs_spark.plans.queries_text import _txt_sample_mix
    from pyofs_spark.streaming.sample import sample_mix_stream

    src = tempfile.mkdtemp()
    chk = tempfile.mkdtemp()
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang"
        )
        docs.where("doc_id < 300").write.mode("overwrite").parquet(src)

        stream = spark.readStream.schema(docs.schema).parquet(src)
        out = sample_mix_stream(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("sample_stream")
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        docs.where("doc_id >= 300").write.mode("append").parquet(src)
        q.processAllAvailable()
        q.stop()

        got = {
            (r.doc_id, r.lang, r.bucket, r.weight)
            for r in spark.sql("SELECT * FROM sample_stream").collect()
        }
        expect = {
            (r.doc_id, r.lang, r.bucket, r.weight)
            for r in _txt_sample_mix(spark, SF_DIR).collect()
        }
        assert got == expect and len(got) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
