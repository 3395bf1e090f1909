"""Dev harness: compare registered Spark queries against their DuckDB oracles.

Usage: python scripts/check_queries.py [name ...]   (default: all with oracles)
       python scripts/check_queries.py --sweep sf1   (the SF1_SWEEP cross-family
           list against the 10x tier, .localdata/sf1)
       python scripts/check_queries.py --sweep sf10  (the SF10_SWEEP list
           against the 100x tier, .localdata/sf10)
       python scripts/check_queries.py --json PATH   (also write a per-query
           artifact in the driver's CORRECTNESS schema)
       python scripts/check_queries.py --window r16  (rotating 50-name slice
           at offset (round*50) mod N — covers the registry names the
           driver's fixed alphabetical window never reaches)
Sweep list sizes are len(SF1_SWEEP) / len(SF10_SWEEP) below — printed at
runtime, deliberately not repeated here. Generate tiers first with
scripts/gen_scale_fixture.py (``--factor 100 --dst .localdata/sf10`` for
the 100x tier). ``--sf1-sweep`` remains as an alias for ``--sweep sf1``.
Env:   SPARK_GRAFT_TEST_SF (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from gads_etl_spark.catalog import TABLES  # noqa: E402
from gads_etl_spark.queries import REGISTRY as _REGISTRY  # noqa: E402


def canon(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(repr(v) for v in r) for r in pdf[cols].itertuples(index=False))


#: Above this row count the per-cell repr() canon becomes the sweep's
#: bottleneck (measured: a ~3M-row sf10 sessionization result spent
#: >20 min in canon while the query itself ran in seconds), so large
#: frames take the vectorized path below first.
FAST_CANON_ROWS = 100_000


def fast_frame_equal(a_pdf, e_pdf):
    """Vectorized exact row-multiset equality for LARGE results.

    Returns True/False, or None when the frames aren't eligible
    (array-valued / exotic object cells — those keep the repr canon).
    Semantics mirror ``canon()`` with two documented relaxations, both
    strictly about representation rather than value: datetime columns
    are compared at [ns] resolution regardless of storage unit, and
    integer dtypes are widened to int64 (repr('1') never encoded the
    width either). Nulls: pandas ``Series.equals`` treats None and NaN
    as interchangeable inside object columns, which is the semantic
    null equality both engines mean. Signed zeros: float columns are
    normalized with ``x + 0.0`` on BOTH sides before comparing, so
    -0.0 vs 0.0 is a deliberate, documented relaxation of this path
    (IEEE ``-0.0 == 0.0``; the engines disagree only on the sign bit
    of an arithmetically-zero cell, never on a value). The repr canon
    still distinguishes them for any frame small enough to take it.
    A False from this path is double-checked by the repr canon before
    being reported, so the fast path can only ever ACCEPT multisets
    equal under these documented normalizations or defer — never
    produce a novel verdict of its own.
    """
    cols = sorted(a_pdf.columns)
    if sorted(e_pdf.columns) != cols or len(a_pdf) != len(e_pdf):
        return False
    a, e = a_pdf[cols].copy(), e_pdf[cols].copy()
    for df in (a, e):
        for c in cols:
            kind = df[c].dtype.kind
            if kind == "M":
                df[c] = df[c].astype("datetime64[ns]")
            elif kind in "iu":
                df[c] = df[c].astype("int64")
            elif kind == "f":
                df[c] = df[c] + 0.0  # -0.0 -> 0.0 (documented relaxation)
            elif df[c].dtype == object:
                nn = df[c].dropna()
                if len(nn) and not isinstance(nn.iloc[0], (str, bytes)):
                    return None  # arrays/decimals → repr canon
    a = a.sort_values(cols, kind="mergesort").reset_index(drop=True)
    e = e.sort_values(cols, kind="mergesort").reset_index(drop=True)
    return all(a[c].equals(e[c]) for c in cols)


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


#: sf1 sweep = the FULL registry minus the exclusions below (round 12;
#: the previous curated 60-query list left 99 queries with no
#: 10×-tier record). Every exclusion carries its reason and its
#: evidence elsewhere; anything not listed here MUST pass at sf1.
SF1_EXCLUDED = {
    # Recursive-CTE reachability over the quadratic within-source
    # shingle pair join — the pair CTE alone is Σ|block|² in DuckDB at
    # 50k docs. The components OPERATOR is verified at the 100x tier on
    # a 240M-edge graph (scripts/check_sf10_extras.py); these four stay
    # oracle-checked at sf0.01 where the closure is tractable.
    "ext_dup_clusters": "recursive-CTE closure over quadratic pair join",
    "ext_cluster_dedup": "recursive-CTE closure over quadratic pair join",
    "ext_cluster_best_dedup": "recursive-CTE closure over quadratic pair join",
    "ext_cluster_sizes": "recursive-CTE closure over quadratic pair join",
}
SF1_SWEEP = sorted(n for n in _REGISTRY if n not in SF1_EXCLUDED)

#: sf10 sweep = the FULL registry minus the exclusions below (round 12
#: — previously a curated 36; the 100x tier is 60M lineitem, 10M
#: events, 500k docs, 2M embeddings). Every exclusion names its reason
#: AND where the operator's 100x evidence lives instead; anything not
#: listed MUST pass at sf10.
SF10_EXCLUDED = {
    # The four recursive-CTE component oracles (same as SF1_EXCLUDED);
    # components verified at 240M-edge scale by check_sf10_extras.py.
    **SF1_EXCLUDED,
    # Budget-guarded quadratic recall oracles: at sf10 the Spark side
    # itself raises CandidateBudgetExceeded naming the linear twin
    # (dedup.py:27-54) — running them would test the guard, not parity.
    # Twins ext_minhash_candidates / ext_fuzzy_passjoin's Spark side
    # are swept; recall certification lives at sf0.01/sf0.1.
    "ext_fuzzy_match": "CandidateBudgetExceeded at sf10 by design",
    "ext_tfidf_cosine": "CandidateBudgetExceeded at sf10 by design",
    # PassJoin's ORACLE is the blocked quadratic join itself.
    "ext_fuzzy_passjoin": "oracle IS the budget-guarded quadratic; "
                          "Spark side linear (BENCH_sf10.json), MATCH at sf1",
    # Single-statement oracles intractable in DuckDB at 100x; each has
    # a MATCH-equivalent 100x check in CORRECTNESS_sf10_extras.json.
    "ext_pagerank": "8-level unrolled CTE over 240M edges; "
                    "chunked-iterative MATCH in check_sf10_extras.py",
    "ext_encode_docs": "27M-token list aggregation trips DuckDB "
                       "reservation; sliced full parity in extras",
    "ext_block_pack": "same list-aggregation limit; per-shard parity + "
                      "conservation invariants in extras",
    # Round 13: the last four deferred names, each closed with a
    # restated-oracle extras check (full parity, never a sample):
    "ext_winnow_fingerprint": "one-statement window-min over 165M "
                              "unnested grams cut at >45 min; "
                              "per-doc_id-slice full parity in extras",
    "ext_strip_dup_spans": "DuckDB OOM rebuilding 500k stripped texts "
                           "in one statement; global span table + "
                           "per-slice rebuild parity in extras",
    "ext_shingle_jaccard": "500k shingle lists + 62M intersects in one "
                           "statement; per-source-slice full parity "
                           "in extras",
    # Round 14: the last deferral closed. Full Spark side (~2e9
    # within-label cosines, 1937s) vs the slice-pair chunked oracle —
    # streaming arg_max per chunk (no window materialization) and a
    # fresh DuckDB connection per chunk, the two disk-discipline fixes
    # the round-13 probe's spill death taught; exact decomposition of
    # the argmax, never a sample. MATCH, 10 rows == 10 rows.
    "ext_embedding_neardup": "registered oracle is the all-pairs "
                             "window argmax (DuckDB spill-infeasible "
                             "at 100x); slice-pair streaming-arg_max "
                             "full parity in extras",
}

#: Round 13 closed 7 of the 8 round-12 deferrals: probed-tractable and
#: promoted into the sweep (ev_top_paths 7.6s, ext_sorted_neighborhood
#: 39s after its band join was rewritten as 3 exact rank equi-joins,
#: ext_repetition_filter 145s, ext_semantic_dedup 255s once n_clusters
#: scaled ~sqrt(N)) or given a restated-oracle full-parity check in
#: check_sf10_extras.py and moved to SF10_EXCLUDED with the reason
#: above (winnow, strip_dup_spans, shingle_jaccard; plus the PassJoin
#: three-way certificate). Round 14 closed the last one
#: (ext_embedding_neardup, reason above) — the deferred list is EMPTY:
#: every registry query has a 100x parity record, in the sweep or in
#: extras. The three-way partition (SWEEP ∪ EXCLUDED ∪ DEFERRED ==
#: registry) stays test-pinned, and the empty dict stays so a future
#: deferral has a place to land without re-plumbing.
SF10_DEFERRED: dict[str, str] = {}
SF10_SWEEP = sorted(n for n in _REGISTRY
                    if n not in SF10_EXCLUDED and n not in SF10_DEFERRED)

SWEEPS = {"sf1": SF1_SWEEP, "sf10": SF10_SWEEP}


def _write_records(path: str, records: dict) -> None:
    import json

    with open(path, "w") as fh:
        json.dump(records, fh, indent=1, sort_keys=True)
        fh.write("\n")


def _run_chunked(names: list[str], sf: str, json_path: str | None,
                 chunk: int = 8) -> int:
    """Drive ``names`` through child processes of this script (explicit
    name-list mode, which never chunks), merging their --json records."""
    import json
    import subprocess
    import tempfile

    here = os.path.abspath(__file__)
    merged: dict[str, dict] = {}
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            part_path = tf.name
        env = dict(os.environ, SPARK_GRAFT_TEST_SF=sf)
        # Bound each child's memory envelope: 16g JVM (the harness runs
        # 8 threads, not the bench's 32) + DuckDB's explicit 24GB +
        # transient frames stays well under half the 128GB host, so a
        # chunk can never draw the kernel OOM killer (which silently
        # SIGKILLs mid-chunk and loses its records — observed once with
        # the 31g-JVM default).
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
        subprocess.run([sys.executable, here, *part, "--json", part_path],
                       env=env, check=False)
        try:
            with open(part_path) as fh:
                merged.update(json.load(fh))
        except (OSError, json.JSONDecodeError):
            pass
        finally:
            try:
                os.unlink(part_path)
            except OSError:
                pass
        for n in part:
            merged.setdefault(n, {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": "chunk process crashed",
            })
    failures = sum(1 for v in merged.values()
                   if v["err"] or v["hash_match"] is False)
    print(f"{failures} failures / {len(names)} checked (chunked)")
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {json_path} ({len(merged)} records)")
    return 1 if failures else 0


def main() -> int:
    from gads_etl_spark.session import get_session
    from gads_etl_spark.queries import REGISTRY

    args = sys.argv[1:]
    tier = None
    if "--sf1-sweep" in args:  # back-compat alias
        tier = "sf1"
        args = [a for a in args if a != "--sf1-sweep"]
    if "--sweep" in args:
        i = args.index("--sweep")
        tier = args[i + 1]
        if tier not in SWEEPS:
            print(f"unknown sweep tier {tier!r}; choose from {sorted(SWEEPS)}")
            return 2
        del args[i:i + 2]
    window_round = None
    if "--window" in args:
        # Rotating 50-name slice seeded by round number (round-16,
        # verdict task 4): the driver's own per-round correctness
        # window is FIXED at the 50 alphabetically-first registry names
        # (`ev_*`..`ext_hash_sample`), so ~2/3 of the registry —
        # including every obs_/op_/pq_/q* query — never gets a
        # per-round driver green. This mode slices the full
        # oracle-backed registry at offset (round*50) mod N with
        # wrap-around, so consecutive rounds cover the whole registry
        # every ceil(N/50) rounds. Accepts `--window r16` or
        # `--window 16`; combine with --json to write the
        # CORRECTNESS_window_r{N} artifact.
        i = args.index("--window")
        window_round = int(args[i + 1].lstrip("r"))
        del args[i:i + 2]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i:i + 2]
    default_sf = "/root/testdata/sf0.01"
    if tier:
        default_sf = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata", tier)
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", default_sf)
    names = args or (
        SWEEPS[tier] if tier
        else [n for n, q in sorted(REGISTRY.items()) if q.oracle])
    if window_round is not None and not args:
        full = [n for n, q in sorted(REGISTRY.items()) if q.oracle]
        start = (window_round * 50) % len(full)
        names = (full + full)[start:start + 50]
        print(f"window r{window_round}: names[{start}:{start + 50}] "
              f"of {len(full)} ({names[0]}..{names[-1]})")
    if tier:
        print(f"sweep {tier}: {len(names)} queries vs {sf}")
        # Sweeps run CHUNKED across child processes (~8 queries each):
        # a single long-lived process accumulates un-reclaimable state
        # at the 100x tier until even 2KB DuckDB allocations fail —
        # measured repeatedly on the late sweep queries, each of which
        # runs clean in a fresh process (per-query reconnects, eager
        # frame frees, and an explicit memory_limit all shrank but
        # never closed the window). Process isolation closes it; cost
        # is one Spark startup (~20s) per chunk.
        return _run_chunked(names, sf, json_path)

    spark = get_session("check-queries", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    def fresh_con():
        c = duckdb.connect()
        # Explicit memory ceiling + spill dir: DuckDB's DEFAULT limit
        # prints as 80% of RAM but the EFFECTIVE ceiling collapses to
        # ~10GB once the Spark JVM is resident in the same process tree
        # (measured: the sf10 encode-docs oracle OOMs at 9.9GB RSS
        # under the default yet completes at the same RSS with the
        # limit set explicitly). 48GB covers every sweep oracle with
        # 4x headroom on the 128GB harness; heavier spills go to disk.
        # threads=8: DuckDB's per-operator memory reservation scales
        # with its thread count (default = all 32 cores), which made
        # the list-heavy encode-docs oracle flaky even under a 40GB
        # limit at the 100x tier; at 8 threads it completes in 25s
        # inside 24GB. 40GB keeps headroom for the rest; the harness
        # compares results, so DuckDB wall time is not the metric.
        c.execute("SET threads=8")
        c.execute("SET memory_limit='40GB'")
        c.execute("SET temp_directory='/tmp/duckdb_spill'")
        for t in TABLES:
            # Driver fixtures are flat files; Spark-written tiers (e.g.
            # the .localdata amplifications) are directories of parts.
            p = f"{sf}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    con = fresh_con()

    failures = 0
    records: dict[str, dict] = {}
    for qi, name in enumerate(names):
        if qi:
            # Per-query connection renewal: DuckDB v1.0's buffer manager
            # accumulates tracked state across a long single-connection
            # sweep until 2KB allocations fail at the 100x tier — every
            # wedged query runs clean standalone (e.g. ext_encode_docs:
            # in-sweep OOM vs 27s / 9.7GB fresh). Views over parquet
            # rebuild in milliseconds, so isolation is effectively free.
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            a_pdf = q.fn(spark, sf).toPandas()
            if not q.oracle:
                print(f"{name:34s} rows-only {len(a_pdf):6d} rows ({time.perf_counter()-t0:.1f}s)")
                records[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(a_pdf),
                    "oracle_rows": None, "err": None,
                }
                if json_path:
                    _write_records(json_path, records)
                continue
            e_pdf = con.execute(q.oracle).fetchdf()
        except Exception as exc:
            print(f"{name:34s} ERROR: {exc}")
            failures += 1
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"{type(exc).__name__}: {exc}"[:500],
            }
            # An OOM-killed DuckDB connection stays poisoned (every
            # later allocation fails with 'bad allocation' — measured
            # when one 100x-tier oracle took out the five after it).
            # Contain the blast radius: rebuild the connection. If even
            # that fails the PROCESS is wedged — record the remaining
            # names and stop, so the partial results (and the --json
            # artifact) survive instead of dying in the error path.
            try:
                con.close()
            except Exception:
                pass
            try:
                con = fresh_con()
            except Exception as exc2:
                for rest in names[names.index(name) + 1:]:
                    records[rest] = {
                        "rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": None,
                        "oracle_rows": None,
                        "err": f"process wedged after {name}: {exc2}"[:500],
                    }
                    failures += 1
                    print(f"{rest:34s} SKIPPED (process wedged)")
                break
            if json_path:
                _write_records(json_path, records)
            continue
        n_a, n_e = len(a_pdf), len(e_pdf)
        schema_ok = sorted(a_pdf.columns) == sorted(e_pdf.columns)
        label = "MATCH"
        # Any exception inside the fast path (e.g. a mixed-type object
        # column whose FIRST non-null cell is a str but a later cell is
        # a list, making sort_values raise TypeError) defers to the
        # repr canon rather than crashing the sweep.
        try:
            fast = (fast_frame_equal(a_pdf, e_pdf)
                    if max(n_a, n_e) > FAST_CANON_ROWS else None)
        except Exception:
            fast = None
        if fast:
            ok, a, e = True, None, None
        else:
            # fast=False still lands here: the repr canon has the final
            # word on every reported MISMATCH.
            a, e = canon(a_pdf), canon(e_pdf)
            ok = a == e and schema_ok
            if not ok and schema_ok and ulp_match(a_pdf, e_pdf):
                ok = True
                label = "MATCH~ulp"  # exact but for float cast rounding
        print(f"{name:34s} {label if ok else 'MISMATCH'} "
              f"spark={n_a} oracle={n_e} ({time.perf_counter()-t0:.1f}s)")
        records[name] = {
            "rows_match": n_a == n_e, "schema_match": schema_ok,
            "hash_match": ok, "spark_rows": n_a,
            "oracle_rows": n_e, "err": None,
        }
        if label == "MATCH~ulp":
            # hash_match=True by the documented 1e-12 float tolerance
            # (decimal->double cast rounding only); flagged so the
            # artifact never silently launders the distinction.
            records[name]["ulp"] = True
        if not ok:
            failures += 1
            if not schema_ok:
                print(f"  cols spark={sorted(a_pdf.columns)} oracle={sorted(e_pdf.columns)}")
            sa, se = set(a), set(e)
            for r in list(sa - se)[:2]:
                print("  only spark:", r)
            for r in list(se - sa)[:2]:
                print("  only duck :", r)
        # Free this query's frames BEFORE the next query runs — at the
        # 100x tier a single result is multi-GB and holding it across
        # the next query's toPandas/fetchdf stacks peaks until the
        # process wedges (measured: late-sweep 2KB 'bad allocation'
        # failures with 120GB of system RAM free; flat ~800MB RSS once
        # frames are dropped eagerly).
        del a_pdf, e_pdf, a, e
        gc.collect()
        if json_path:
            # Persist after EVERY query: a process killed mid-run (the
            # kernel OOM killer SIGKILLs without a traceback) must not
            # take its completed records with it — the chunked sweep
            # merges whatever each child managed to write.
            _write_records(json_path, records)
    print(f"{failures} failures / {len(names)} checked")
    if json_path:
        _write_records(json_path, records)
        print(f"wrote {json_path} ({len(records)} records)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
