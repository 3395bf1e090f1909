"""The oracle-parity harness itself (scripts/check_queries.py) carries
comparison semantics — the fast vectorized path for large frames must
agree with the repr canon it stands in for, and only ever accept or
defer, never invent a verdict (a False is re-checked by the canon)."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import numpy as np
import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "check_queries",
    Path(__file__).resolve().parent.parent / "scripts" / "check_queries.py")
cq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cq)


def _shuffled(pdf, seed=7):
    return pdf.sample(frac=1, random_state=seed).reset_index(drop=True)


class TestFastFrameEqual:
    def test_accepts_equal_multiset_any_order(self):
        a = pd.DataFrame({
            "x": [3, 1, 2, 2],
            "y": ["c", "a", None, "b"],
            "t": pd.to_datetime(
                ["2024-01-03", "2024-01-01", "2024-01-02", "2024-01-02"]),
            "v": [0.5, np.nan, 1.5, 1.5],
        })
        assert cq.fast_frame_equal(a, _shuffled(a)) is True

    def test_rejects_value_schema_and_count_diffs(self):
        a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
        b = a.copy()
        b.loc[1, "x"] = 99
        assert cq.fast_frame_equal(a, b) is False
        assert cq.fast_frame_equal(a, a.rename(columns={"x": "z"})) is False
        assert cq.fast_frame_equal(a, a.head(2)) is False

    def test_representation_relaxations_match_repr_canon(self):
        # int width and datetime storage unit never survived repr()
        # either — the fast path must not reject what canon accepts.
        a = pd.DataFrame({"x": [1, 2], "t": pd.to_datetime(
            ["2024-01-01", "2024-01-02"])})
        b = a.copy()
        b["x"] = b["x"].astype("int32")
        b["t"] = b["t"].astype("datetime64[us]")
        assert cq.fast_frame_equal(a, _shuffled(b)) is True

    def test_defers_on_array_cells(self):
        a = pd.DataFrame({"x": [[1, 2], [3]], "y": ["a", "b"]})
        assert cq.fast_frame_equal(a, a) is None

    def test_normalizes_signed_zero(self):
        # Documented relaxation: -0.0 vs 0.0 in a float column is a
        # sign-bit-of-zero representation difference, accepted.
        a = pd.DataFrame({"x": [1, 2], "v": [0.0, 1.5]})
        b = pd.DataFrame({"x": [1, 2], "v": [-0.0, 1.5]})
        assert cq.fast_frame_equal(a, b) is True

    def test_mixed_type_object_column_cannot_crash_sweep(self):
        # ADVICE r11: a str-first object column with a later list cell
        # passes the first-non-null eligibility probe, then sort_values
        # raises TypeError. The call site must catch and defer to the
        # repr canon — mirror the call-site guard here.
        a = pd.DataFrame({"y": ["a", [1, 2], "c"], "x": [1, 2, 3]})
        try:
            out = cq.fast_frame_equal(a, _shuffled(a))
        except Exception:
            out = None
        assert out in (None, True)
        src = (Path(__file__).resolve().parent.parent
               / "scripts" / "check_queries.py").read_text()
        assert "except Exception:\n            fast = None" in src

    def test_harness_double_checks_fast_false_with_canon(self):
        # Structural guarantee in source: a False from the fast path
        # must fall through to the repr canon before being reported.
        src = (Path(__file__).resolve().parent.parent
               / "scripts" / "check_queries.py").read_text()
        assert "if fast:" in src and "canon(a_pdf), canon(e_pdf)" in src
