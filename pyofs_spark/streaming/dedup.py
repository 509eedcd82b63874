"""Stateful streaming exact-dedup — `applyInPandasWithState` custom
operator (SURVEY §2.10 T-family; training-data pipeline requirement).

Semantics: FIRST-SEEN-WINS per normalized key across the whole stream.
Each micro-batch emits one row per NEWLY seen key — (key, canonical_id =
min id within the discovering batch, n_rows seen in that batch); keys
already in state emit nothing, their counters just advance. This is the
streaming twin of the batch `dedup_exact` hash-groupBy (arrival-order
canonicalization instead of global min — the correct online semantics:
at 10^12-page scale you cannot re-canonicalize history).

State: one (canonical_id, n_seen) pair per key, sharded by the groupBy
hash across executors — Spark's state store scales it horizontally and
checkpointing makes the stream resumable (same lineage story as
lineage.py, but engine-managed)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "norm_key string, canonical_id long, n_rows long"
STATE_SCHEMA = "canonical_id long, n_seen long"


def streaming_dedup_first_seen(
    docs: DataFrame,
    key_col: str = "norm_key",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs: streaming DataFrame with (key_col string, id_col long).
    Returns the append-mode stream of first-sightings."""

    def _dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = 0
        mn: int | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            total += len(pdf)
            m = int(pdf[id_col].min())
            mn = m if mn is None else min(mn, m)
        if state.exists:
            canon, seen = state.get
            state.update((canon, seen + total))
            return
        if mn is None:
            return
        state.update((mn, total))
        yield pd.DataFrame(
            {"norm_key": [key[0]], "canonical_id": [mn], "n_rows": [total]}
        )

    return (
        docs.groupBy(key_col)
        .applyInPandasWithState(
            _dedup,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
