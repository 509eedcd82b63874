"""txt_repetition (round 5): DuckDB value parity for the rows-only
repetition-quality query — the same rows+schema+hash check the driver's
50-slot window would record, enforced here instead (the window is full
of SURVEY §2 operator oracles; see queries_text.py).

Also a semantics fixture: a maximally repetitive doc and an all-distinct
doc must land at the exact analytic fractions (Gopher repetition-removal
thresholds act on these numbers, so off-by-one n-gram counting would
silently misfilter).
"""

from __future__ import annotations

import math

import duckdb

from conftest import SF_DIR


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(r[i] for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def test_txt_repetition_duckdb_parity(spark):
    from pyofs_spark.plans.queries_text import (
        _TXT_REPETITION_DUCK,
        _txt_repetition,
    )

    sdf = _txt_repetition(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    res = con.execute(_TXT_REPETITION_DUCK)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sv = _norm(s_cols, s_rows)
    dc, dv = _norm(d_cols, d_rows)
    assert sc == dc
    assert len(sv) == len(dv) and len(sv) > 0
    for a, b in zip(sv, dv):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert math.isclose(x, y, rel_tol=0, abs_tol=0), (a, b)
            else:
                assert x == y, (a, b)


def test_txt_crossdoc_shingles_duckdb_parity(spark):
    from pyofs_spark.plans.queries_text import (
        _TXT_CROSSDOC_DUCK,
        _txt_crossdoc_shingles,
    )

    sdf = _txt_crossdoc_shingles(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    res = con.execute(_TXT_CROSSDOC_DUCK)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sv = _norm(s_cols, s_rows)
    dc, dv = _norm(d_cols, d_rows)
    assert sc == dc
    assert len(sv) == len(dv) and len(sv) > 0
    for a, b in zip(sv, dv):
        assert a == b, (a, b)

    # the DF join must stay an equi-join (broadcast or SMJ) — an
    # all-pairs fallback here would be quadratic in the corpus
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_txt_crossdoc_shingles_analytic_fixture(spark):
    """Two docs sharing one exact 5-word span + one unique doc: the shared
    span's instances (and only those) must count as duplicated in both
    holders; the unique doc must land at dup fraction 0."""
    from pyofs_spark.plans.queries_text import _crossdoc_sql

    shared = "alpha beta gamma delta epsilon"
    docs = [
        (1, f"{shared} zeta eta"),        # shingles: shared + 2 others
        (2, f"pre1 pre2 {shared}"),       # shingles: 2 others + shared
        (3, "q w e r t y u"),             # 3 shingles, all unique
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string"
    ).createOrReplaceTempView("documents")
    try:
        got = {
            r["doc_id"]: r.asDict()
            for r in spark.sql(_crossdoc_sql("spark")).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")

    assert got[1]["n_shingles"] == 3 and got[1]["n_dup_shingles"] == 1
    # round6 = floor(x*1e6 + 0.5)/1e6 -> 1/3 lands exactly at 0.333333
    assert got[1]["dup_shingle_frac"] == 0.333333
    assert got[1]["max_doc_freq"] == 2
    assert got[2]["n_dup_shingles"] == 1
    assert got[3]["n_shingles"] == 3
    assert got[3]["n_dup_shingles"] == 0
    assert got[3]["dup_shingle_frac"] == 0.0
    assert got[3]["max_doc_freq"] == 1


def test_txt_repetition_single_shuffle_plan(spark):
    """The exploded words must cross the wire exactly once: both stat
    branches share the gcounts subtree, so AQE reuses the window's
    hash(doc_id) exchange, and no exchange keys on (doc_id, word) —
    a second shuffle of the exploded corpus would dominate at 100 TB."""
    import re

    from pyofs_spark.plans.queries_text import _txt_repetition

    df = _txt_repetition(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for k in keys:
        # every data shuffle partitions on doc_id only (expr-id suffixed)
        assert re.fullmatch(r"doc_id#\d+L, \d+", k), plan
    assert plan.count("ReusedExchange") >= 1, plan


def test_txt_repetition_analytic_fixture(spark):
    from pyofs_spark.plans.queries_text import _repetition_sql

    docs = [
        (1, "a a a a"),          # 4 words, 1 distinct; 3 bigrams all "a a"
        (2, "w x y z"),          # all distinct words AND bigrams
        (3, "a b a b a"),        # bigrams: "a b" x2, "b a" x2 -> top 2/4
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string"
    ).createOrReplaceTempView("documents")
    try:
        got = {
            r["doc_id"]: r.asDict()
            for r in spark.sql(_repetition_sql("spark")).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")

    assert got[1]["n_words"] == 4 and got[1]["n_distinct_words"] == 1
    assert got[1]["top_word_frac"] == 1.0
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["n_bigrams"] == 3 and got[1]["n_distinct_bigrams"] == 1
    assert got[1]["top_bigram_frac"] == 1.0

    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == round(1 / 3 + 1e-7, 6) or math.isclose(
        got[2]["top_bigram_frac"], 0.333333, abs_tol=1e-9
    )

    assert got[3]["n_bigrams"] == 4
    assert got[3]["top_bigram_frac"] == 0.5
    assert got[3]["top_word_frac"] == 0.6


def test_txt_decontaminate_duckdb_parity(spark):
    from pyofs_spark.plans.queries_text import (
        _TXT_DECONTAM_DUCK,
        _txt_decontaminate,
    )

    sdf = _txt_decontaminate(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    res = con.execute(_TXT_DECONTAM_DUCK)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sv = _norm(s_cols, s_rows)
    dc, dv = _norm(d_cols, d_rows)
    assert sc == dc
    assert len(sv) == len(dv) and len(sv) > 0
    for a, b in zip(sv, dv):
        assert a == b, (a, b)


def test_txt_decontaminate_broadcast_plan(spark):
    """The eval-set overlap join must broadcast the benchmark side and
    never reshuffle the corpus-side shingles: every hash exchange keys on
    doc_id only (window + final rollup ride the same clustering) or on
    the benchmark branch's tiny distinct-shingle aggregation — at 10^12
    docs a shingle-keyed corpus shuffle here would dwarf the whole scan."""
    import re

    from pyofs_spark.plans.queries_text import _txt_decontaminate

    df = _txt_decontaminate(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # AQE's toString appends an "== Initial Plan ==" copy; analyze only
    # the final (executed) section or every exchange is counted twice.
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # corpus-side exchanges: doc_id only. The one shingle-keyed exchange
    # allowed is the bench branch's distinct over the 1/97 subset.
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    shingle_keyed = [k for k in keys if "shingle" in k]
    assert len(shingle_keyed) <= 1, plan
    for k in keys:
        assert re.fullmatch(r"(doc_id#\d+L|shingle#\d+), \d+", k), plan


def test_txt_decontaminate_analytic_fixture(spark):
    """doc 0 (id % 97 == 0) donates the benchmark shingles; a scored doc
    repeating one of those spans must count exactly its colliding shingle
    instances; a disjoint doc must score 0 and ship."""
    from pyofs_spark.plans.queries_text import _decontam_sql

    bench_span = "alpha beta gamma delta epsilon"
    docs = [
        (0, f"{bench_span} zeta"),          # benchmark doc: 2 shingles
        (1, f"x1 {bench_span} x2"),         # 3 shingles, 1 collides
        (2, "p q r s t u"),                 # 2 shingles, none collide
        (97, "only one shingle here now"),  # 97 % 97 == 0 -> benchmark, excluded
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string"
    ).createOrReplaceTempView("documents")
    try:
        got = {
            r["doc_id"]: r.asDict()
            for r in spark.sql(_decontam_sql("spark")).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")

    assert set(got) == {1, 2}
    assert got[1]["n_shingles"] == 3 and got[1]["n_contaminated"] == 1
    assert got[1]["contam_frac"] == 0.333333
    assert got[1]["quarantined"] is True
    assert got[2]["n_shingles"] == 2 and got[2]["n_contaminated"] == 0
    assert got[2]["contam_frac"] == 0.0 and got[2]["quarantined"] is False
