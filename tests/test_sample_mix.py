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


def test_sample_mix_hash_safe_past_int64_overflow(spark):
    """Round-6 fix (VERDICT r5 #1): the bucket hash must be well-defined
    and engine-identical for doc_ids FAR past the old naive-multiply
    overflow point (doc_id * 2654435761 > 2^63 once doc_id >= ~3.47e9).
    Pins Spark == DuckDB == exact big-int Python at ids straddling the old
    boundary and up to near 2^62, under Spark ANSI mode (which would throw
    on any surviving 64-bit overflow)."""
    from pyofs_spark.plans.queries_text import mix_bucket_sql

    ids = [
        0,
        1,
        4096,
        2**31 - 1,
        3474701542,  # last id the old form could represent
        3474701543,  # first id the old form overflowed on
        2**32 - 1,
        2**32,
        2**40 + 12345,
        2**53 + 7,  # past exact-double territory
        2**62 - 1,
        2**62 + 987654321,
        2**63 - 1,
    ]
    expect = {d: ((d * 2654435761) % 4294967296) // 1048576 for d in ids}

    sql = f"SELECT doc_id, {mix_bucket_sql('doc_id')} AS bucket FROM big_ids"
    old_ansi = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.createDataFrame(
        [(d,) for d in ids], "doc_id long"
    ).createOrReplaceTempView("big_ids")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        got_spark = {r.doc_id: r.bucket for r in spark.sql(sql).collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old_ansi)
    assert got_spark == expect

    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "big_ids", pd.DataFrame({"doc_id": pd.array(ids, dtype="int64")})
    )
    got_duck = dict(con.execute(sql).fetchall())
    assert got_duck == expect
