"""Round-6 profiling harness (guide §1): isolate where headline-query time
goes — view registration, planning/analysis, execution (noop sink) — and
dump .explain('formatted') per query. Does NOT touch bench.py.

Usage: python scripts/profile_r6.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

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


def main() -> None:
    from pyofs_spark.session import get_session
    from pyofs_spark.sources.tables import register_views

    import __spark_entry__ as entrymod

    names = sys.argv[1:] or HEADLINE
    plandir = sys.argv[0] and os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
    )
    os.makedirs(plandir, exist_ok=True)
    tag = os.environ.get("PLAN_TAG", "before")

    spark = get_session(master=f"local[{CPUS}]", app_name="pyofs-profile-r6")
    t0 = time.time()
    register_views(spark, SF_DIR)
    print(f"register_views first: {time.time() - t0:.3f}s")
    t0 = time.time()
    register_views(spark, SF_DIR)
    print(f"register_views second: {time.time() - t0:.3f}s")
    spark.sql("SELECT count(*) FROM documents").collect()
    qs = entrymod.queries()

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: build+first-exec")
        # cold-ish: build the DataFrame (analysis) then noop-write (full exec)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t_build = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_noop1 = time.time() - t0
        # warm: rebuild + noop again
        spark.sparkContext.setJobDescription(f"{name}: rebuild+exec")
        t0 = time.time()
        df2 = fn(spark, SF_DIR)
        t_build2 = time.time() - t0
        t0 = time.time()
        df2.write.format("noop").mode("overwrite").save()
        t_noop2 = time.time() - t0
        # count path (what bench times)
        t0 = time.time()
        df2.count()
        t_count = time.time() - t0
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        with open(os.path.join(plandir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df2._jdf.queryExecution().explainString(mode))
        print(
            f"{name}: build {t_build:.2f}/{t_build2:.2f}s "
            f"noop {t_noop1:.2f}/{t_noop2:.2f}s count(warm) {t_count:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
