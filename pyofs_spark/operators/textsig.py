"""Map-only MinHash signature kernel (round 6, guide §2.4 + §4.2).

The SQL formulation of the signature pipeline
(`plans/queries_text._MINHASH_BODY`) computes word bigram shingles with a
`lead() OVER (PARTITION BY doc_id ORDER BY pos)` window and then
`GROUP BY doc_id` mins — three shuffles of WORD-level rows (posexplode →
window sort → distinct → aggregate). At corpus scale that shuffles the
whole tokenized corpus several times to compute a per-document reduction
that needs no data from any other document.

This kernel computes the identical signatures in ONE map-only pass: each
Arrow batch of (doc_id, text) is tokenized and reduced in vectorized
numpy, no exchange anywhere. Integer semantics are bit-identical to the
SQL form (pinned by tests/test_textsig.py against the SQL body and by the
dedup_minhash_sig/lsh oracle gates):

- split(text, ' ')          == text.split(' ')   (verified incl. trailing
                                                  empties; filter w != '')
- ascii(substring(w, k, 1)) == ord(w[k-1])       (full codepoints,
                                                  verified on astral chars)
- length(w)                 == len(w)            (codepoints both sides)
- all arithmetic in int64; max product 17 * (0x10FFFF*10000*31627) < 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def minhash_sigs_arrow(
    docs: DataFrame,
    perms: list[tuple[int, int]],
    prime: int,
    shingle_mult: int = 31627,
) -> DataFrame:
    """(doc_id, text) -> (doc_id, mh0..mh{n-1}); docs with < 2 non-empty
    words are dropped (same as the SQL form, where their only shingle code
    is NULL and the GROUP BY sees no rows)."""
    n_perm = len(perms)
    schema = "doc_id bigint, " + ", ".join(f"mh{j} bigint" for j in range(n_perm))

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        a_arr = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
        b_arr = np.array([b for _, b in perms], dtype=np.int64)[:, None]
        names = ["doc_id"] + [f"mh{j}" for j in range(n_perm)]
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_ids: list[int] = []
            code_chunks: list[np.ndarray] = []
            starts: list[int] = []
            pos = 0
            for did, text in zip(ids, texts):
                if text is None:
                    continue
                ws = [w for w in text.split(" ") if w]
                if len(ws) < 2:
                    continue
                wc = np.fromiter(
                    (
                        ord(w[0]) * 10000
                        + (ord(w[1]) if len(w) >= 2 else 0) * 100
                        + len(w)
                        for w in ws
                    ),
                    dtype=np.int64,
                    count=len(ws),
                )
                codes = wc[:-1] * shingle_mult + wc[1:]
                out_ids.append(did)
                starts.append(pos)
                code_chunks.append(codes)
                pos += codes.size
            if not out_ids:
                yield pa.record_batch(
                    [pa.array([], pa.int64()) for _ in names], names=names
                )
                continue
            all_codes = np.concatenate(code_chunks)
            # (n_perm, n_codes) permuted hashes, then per-doc segment mins
            vals = (a_arr * all_codes[None, :] + b_arr) % prime
            mins = np.minimum.reduceat(vals, np.array(starts), axis=1)
            yield pa.record_batch(
                [pa.array(out_ids, pa.int64())]
                + [pa.array(mins[j], pa.int64()) for j in range(n_perm)],
                names=names,
            )

    return docs.select("doc_id", "text").mapInArrow(gen, schema)
