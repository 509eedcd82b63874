"""Multi-process concurrent-writer race on the manifest CAS (round 4 —
VERDICT r03 task 6 fallback: no Iceberg runtime jar exists in this
container, so the stand-in's optimistic-concurrency story is TESTED, not
asserted).

Two OS processes hammer `Manifest.commit` (the exact code path
`run_partitioned` publishes through) against one shared root from a
barrier start. Required outcome: version collisions are OBSERVED (the
exclusive-create CAS fired) and NO update is lost — every partition from
both writers resolves through the final snapshot, with exactly one
version per successful commit."""

from __future__ import annotations

import multiprocessing as mp
import shutil
import sys
import tempfile


N_PER_WRITER = 120


def _writer(root: str, tag: str, barrier, q) -> None:
    sys.path.insert(0, "/root/repo")
    from pyofs_spark.lineage import Manifest

    m = Manifest(root)
    barrier.wait()
    for k in range(N_PER_WRITER):
        m.commit(f"{tag}_{k}", {"n_rows": k, "path": f"part_key={tag}_{k}"},
                 max_retries=500)
    q.put((tag, m.collisions))


def test_manifest_cas_two_process_race():
    from pyofs_spark.lineage import Manifest

    root = tempfile.mkdtemp()
    try:
        ctx = mp.get_context("fork")
        barrier = ctx.Barrier(2)
        q = ctx.Queue()
        ps = [
            ctx.Process(target=_writer, args=(root, tag, barrier, q))
            for tag in ("a", "b")
        ]
        for p in ps:
            p.start()
        results = {}
        for _ in ps:
            tag, collisions = q.get(timeout=120)
            results[tag] = collisions
        for p in ps:
            p.join(timeout=30)
            assert p.exitcode == 0

        final = Manifest(root).current()
        # no lost updates: every commit from both writers is visible
        keys = set(final["partitions"])
        want = {f"{t}_{k}" for t in ("a", "b") for k in range(N_PER_WRITER)}
        assert keys == want
        # exactly one version per successful commit (CAS totally ordered)
        assert final["version"] == 2 * N_PER_WRITER
        # the race actually happened: at least one writer lost a CAS
        assert sum(results.values()) > 0, results
    finally:
        shutil.rmtree(root)


def test_manifest_same_process_instances_never_clobber():
    """Round-4 review fix: two Manifest instances in ONE process (e.g.
    two threads) must not generate colliding manifest file names — the
    pid-only uniquifier used to let a loser overwrite the winner's
    'immutable' bucket manifest before the CAS fired."""
    import threading

    from pyofs_spark.lineage import Manifest

    root = tempfile.mkdtemp()
    try:
        ms = [Manifest(root) for _ in range(2)]
        assert ms[0]._token != ms[1]._token
        errs = []

        def hammer(m, tag):
            try:
                for k in range(60):
                    m.commit(f"{tag}_{k}", {"n": k}, max_retries=500)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [
            threading.Thread(target=hammer, args=(m, t))
            for m, t in zip(ms, ("x", "y"))
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(120)
        assert not errs, errs
        final = Manifest(root).current()
        want = {f"{t}_{k}" for t in ("x", "y") for k in range(60)}
        assert set(final["partitions"]) == want  # nothing clobbered
        assert final["version"] == 120
    finally:
        shutil.rmtree(root)
