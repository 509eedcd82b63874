"""Supplementary benchmarks (round 6). bench.py is FROZEN for measurement,
so everything new lives here:

  python bench_extra.py              # rows-only query suite (cold+warm)
  python bench_extra.py --noop       # headline queries, noop-sink isolated
                                     # (guide §1.4: times the computation,
                                     #  not the count() plan pruning)

Both honor $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like bench.py
and print ONE JSON line. The rows-only suite covers the round-5 operators
VERDICT r5 #5 flagged as having no tracked wall-time (txt_repetition,
txt_crossdoc_shingles, txt_decontaminate, dedup_components,
txt_sample_mix) plus the rest of the registry tail.
"""

from __future__ import annotations

import json
import os
import sys
import time

HOST_CPUS = float(os.cpu_count() or 32)

ROWS_ONLY = [
    "txt_repetition",
    "txt_crossdoc_shingles",
    "txt_decontaminate",
    "dedup_components",
    "txt_sample_mix",
    "eng_cosine_lsh",
    "eng_cosine_ivf",
    "eng_cosine_int8",
    "eng_advect_grid",
    "eng_media_features",
]

HEADLINE = [
    "geo_tile_assign",
    "geo_knn_stations",
    "geo_pip_assign",
    "geo_cell_rollup",
    "fld_daily_mean",
    "fld_compose_latest",
    "fld_asof_click",
    "rel_pricing_summary",
    "rel_top_customers",
    "dedup_minhash_lsh",
    "dedup_exact",
    "sim_cosine_topk",
    "txt_quality",
]


def _steal_ticks() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


def run(names: list[str], metric: str, noop: bool) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyofs_spark.session import get_session
    from pyofs_spark.sources.tables import register_views

    import __spark_entry__ as entrymod

    spark = get_session(master=f"local[{cpus}]", app_name="pyofs-bench-extra")
    register_views(spark, sf_dir)
    spark.sql("SELECT count(*) FROM documents").collect()
    qs = entrymod.queries()

    def execute(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    times: dict[str, float] = {}
    warm: dict[str, float] = {}
    steal_fracs: dict[str, float] = {}
    total = 0.0
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        st0 = _steal_ticks()
        t0 = time.time()
        execute(fn(spark, sf_dir))
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
        t0 = time.time()
        execute(fn(spark, sf_dir))
        warm[name] = round(time.time() - t0, 3)
        wall = time.time() - (t0 - dt)
        steal = (_steal_ticks() - st0) / os.sysconf("SC_CLK_TCK")
        steal_fracs[name] = round(steal / (HOST_CPUS * max(wall, 1e-9)), 4)
        print(
            f"# {name}: {dt:.2f}s (warm {warm[name]:.2f}s)", file=sys.stderr
        )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "queries_warm": warm,
                "queries_steal_frac": steal_fracs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    if "--noop" in sys.argv:
        run(HEADLINE, "headline_queries_noop_total_time", noop=True)
    else:
        run(ROWS_ONLY, "rows_only_queries_total_time", noop=False)
