"""Registry-level CI checks (round-3 ADVICE):

1. Every oracle-gated query sits inside the external driver's first-50
   checked window (the gate-priority ordering contract).
2. The rows-only queries PAST the window still execute and return >0 rows
   at sf0.001 — without this, a regression that empties or errors one of
   them would be invisible to the driver.
3. The ngram-jaccard document-frequency cap actually bounds per-token
   fanout (a stopword token present in every doc contributes ZERO candidate
   pairs) and runs as a semi-join in the plan.
"""

from __future__ import annotations

from conftest import SF_DIR


def test_oracled_queries_inside_window():
    from pyofs_spark.plans.queries import get_oracles, get_queries

    names = list(get_queries())
    oracles = get_oracles()
    window = set(names[:50])
    missing = [n for n in oracles if n not in window]
    assert not missing, f"oracle-gated queries outside the 50-window: {missing}"


def test_rows_only_queries_execute(spark):
    """The out-of-window (rows-only) queries must run and be non-empty."""
    from pyofs_spark.plans.queries import get_oracles, get_queries

    qs = get_queries()
    oracles = get_oracles()
    for name, fn in qs.items():
        if name in oracles:
            continue  # driver-gated every round
        n = fn(spark, SF_DIR).count()
        assert n > 0, f"{name} returned 0 rows at sf0.001"


def test_ngram_df_cap_bounds_fanout(spark):
    """Stopword-heavy fixture: token 'zz' appears in EVERY doc (df=30 >
    85% cap) so it must be dropped from the inverted index — candidate
    pairs come only from the rare shared tokens, not the all-pairs blowup
    a universal token would cause."""
    from pyofs_spark.plans.queries_text import (
        _JACCARD_PRE_SPARK,
        _JACCARD_TAIL_SPARK,
    )

    rows = []
    for i in range(30):
        words = ["zz", f"uniq{i}a", f"uniq{i}b"]
        if i % 2 == 0:
            words += ["sharedeven1", "sharedeven2", "sharedeven3"]
        rows.append((i * 10, " ".join(words)))
    spark.createDataFrame(rows, "doc_id bigint, text string").createOrReplaceTempView(
        "documents"
    )
    try:
        words = spark.sql(_JACCARD_PRE_SPARK)
        plan = words._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan, "df cap must run as a semi-join"
        toks = {r.w for r in words.collect()}
        assert "zz" not in toks, "universal stopword must be df-capped out"
        assert "sharedeven1" in toks  # df=15 <= 25 survives

        words.createOrReplaceTempView("ng_words_test")
        out = spark.sql(_JACCARD_TAIL_SPARK.replace("ng_words", "ng_words_test"))
        pairs = out.collect()
        # without the cap every pair of the 30 docs shares 'zz' -> C(30,2)
        # candidates; with it, only even-doc pairs share the 3 'sharedeven'
        # tokens (jaccard 3/7 < 0.6 -> filtered) and nothing else
        assert len(pairs) == 0
        # candidate fanout check at the join level: per-token pairs bounded
        # by df^2 of the capped index (15^2), not 30^2
        cand = spark.sql(
            """
            SELECT count(*) AS n FROM ng_words_test a
            JOIN ng_words_test b ON a.w = b.w AND a.doc_id < b.doc_id
            """
        ).collect()[0]["n"]
        assert cand == 3 * (15 * 14 // 2)  # 3 shared tokens, 15 even docs
    finally:
        spark.catalog.dropTempView("documents")
        spark.catalog.dropTempView("ng_words_test")


def test_materialized_views_do_not_clobber(spark):
    """Two invocations of materialized-intermediate queries in one session
    get distinct per-invocation view names (round-3 ADVICE fix) — the
    second run must not poison or reuse the first's view, and results are
    identical across invocations."""
    from pyofs_spark.plans.queries import get_queries

    qs = get_queries()
    a1 = {tuple(r) for r in qs["dedup_ngram_jaccard"](spark, SF_DIR).collect()}
    b1 = {tuple(r) for r in qs["dedup_minhash_lsh"](spark, SF_DIR).collect()}
    a2 = {tuple(r) for r in qs["dedup_ngram_jaccard"](spark, SF_DIR).collect()}
    assert a1 == a2 and len(a1) > 0 and len(b1) > 0
    # round-4 policy: superseded views are dropped with a GENERATION GAP
    # (dropping the immediately-previous view would race a concurrent
    # invocation) — so the catalog stays BOUNDED at _MAT_GAP live views
    # per base name even under many re-runs, but more than one may live
    from pyofs_spark.plans.queries_text import _MAT_GAP

    for _ in range(_MAT_GAP + 3):
        qs["dedup_ngram_jaccard"](spark, SF_DIR).count()
    names = [t.name for t in spark.catalog.listTables()
             if t.name.startswith("ng_words")]
    assert 0 < len(names) <= _MAT_GAP, names
