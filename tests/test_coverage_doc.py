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
