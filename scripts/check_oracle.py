"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries()[name] on Spark at sf0.01 and the
matching oracle_sql()[name] on DuckDB over the same parquet views; compares
row count, sorted column names, and order-insensitive values (exact equality
— STRICTER than the driver's value hash).

Usage: python scripts/check_oracle.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    """Sort columns by name, then rows — order-insensitive comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def _kind(t: str) -> str:
    """Type CLASS — int-width differences hash equal at the driver (r01
    evidence: knn_rank int32 vs int64 passed), but DuckDB sum(BIGINT)→
    HUGEINT→decimal128 burned round 1. Compare classes only."""
    t = t.lower()
    for k in ("decimal", "timestamp", "date", "bool", "string", "float", "double", "int"):
        if k in t:
            return {"double": "float"}.get(k, k)
    return t


def type_warnings(name, sdf, duck_arrow_schema):
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    warns = []
    for f in duck_arrow_schema:
        st = stypes.get(f.name)
        if st is None:
            continue
        if _kind(st) != _kind(str(f.type)):
            warns.append(f"{f.name}: spark={st} duck_arrow={f.type}")
    return warns


def main() -> int:
    import __spark_entry__ as entrymod
    from pyofs_spark.session import get_session

    only = set(sys.argv[1:])
    spark = get_session(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
            dcols = list(tbl.schema.names)
            drows = [tuple(r.values()) for r in tbl.to_pylist()]
            for w in type_warnings(name, sdf, tbl.schema):
                print(f"TYPEWARN {name}: {w}")
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} value mismatches; first 3:")
            for a, b in bad[:3]:
                print(f"   spark={a}\n   duck ={b}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sr)} rows, {time.time()-t0:.1f}s")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
