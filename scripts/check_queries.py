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


def ulp_match(a_pdf, e_pdf) -> bool:
    """Secondary check when exact repr-match fails: cell-wise equality
    with floats allowed a ~1-ulp relative slack (rel_tol=1e-12).

    Exists for one measured phenomenon (SCALING.md, sf1 q01): decimal
    sums past ~2.8e10 with 6 decimals exceed double's 2^53 exact range in
    micro-units, and DuckDB's decimal->double cast rounds one ulp
    differently than Java BigDecimal while the un-cast decimals are
    bit-identical. 1e-12 is ~4500 ulps yet five orders of magnitude
    below the smallest real defect (one dropped row in a 6M-row sum
    shifts the result by ~3e-7 relative), so this cannot mask a bug —
    only a cast-rounding artifact. Non-float cells stay exact.
    """
    import math

    if sorted(a_pdf.columns) != sorted(e_pdf.columns):
        return False
    if len(a_pdf) != len(e_pdf):
        return False
    cols = sorted(a_pdf.columns)
    a_rows = sorted(a_pdf[cols].itertuples(index=False),
                    key=lambda r: tuple(repr(v) for v in r))
    e_rows = sorted(e_pdf[cols].itertuples(index=False),
                    key=lambda r: tuple(repr(v) for v in r))
    for ra, re_ in zip(a_rows, e_rows):
        for va, ve in zip(ra, re_):
            if isinstance(va, float) and isinstance(ve, float):
                if va != ve and not (
                    math.isnan(va) and math.isnan(ve)
                ) and not math.isclose(va, ve, rel_tol=1e-12, abs_tol=1e-12):
                    return False
            elif repr(va) != repr(ve):
                return False
    return True


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
        label = "MATCH"
        if not ok and schema_ok and ulp_match(a_pdf, e_pdf):
            ok = True
            label = "MATCH~ulp"  # exact but for float cast rounding
        print(f"{name:34s} {label if ok else 'MISMATCH'} "
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
