"""Dev harness: compare registered Spark queries against their DuckDB oracles.

Usage: python scripts/check_queries.py [name ...]   (default: all with oracles)
Env:   SPARK_GRAFT_TEST_SF (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from gads_etl_spark.catalog import TABLES  # noqa: E402


def canon(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(repr(v) for v in r) for r in pdf[cols].itertuples(index=False))


def main() -> int:
    from gads_etl_spark.session import get_session
    from gads_etl_spark.queries import REGISTRY

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:] or [n for n, q in sorted(REGISTRY.items()) if q.oracle]

    spark = get_session("check-queries", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # Driver fixtures are flat files; Spark-written tiers (e.g. the
        # .localdata/sf1 amplification) are directories of part files.
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            a_pdf = q.fn(spark, sf).toPandas()
            if not q.oracle:
                print(f"{name:34s} rows-only {len(a_pdf):6d} rows ({time.perf_counter()-t0:.1f}s)")
                continue
            e_pdf = con.execute(q.oracle).fetchdf()
        except Exception as exc:
            print(f"{name:34s} ERROR: {exc}")
            failures += 1
            continue
        a, e = canon(a_pdf), canon(e_pdf)
        schema_ok = sorted(a_pdf.columns) == sorted(e_pdf.columns)
        ok = a == e and schema_ok
        print(f"{name:34s} {'MATCH' if ok else 'MISMATCH'} "
              f"spark={len(a)} oracle={len(e)} ({time.perf_counter()-t0:.1f}s)")
        if not ok:
            failures += 1
            if not schema_ok:
                print(f"  cols spark={sorted(a_pdf.columns)} oracle={sorted(e_pdf.columns)}")
            sa, se = set(a), set(e)
            for r in list(sa - se)[:2]:
                print("  only spark:", r)
            for r in list(se - sa)[:2]:
                print("  only duck :", r)
    print(f"{failures} failures / {len(names)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
