"""Why is ext_fuzzy_passjoin 20.4x for 10x data at the third decade?

The sf100 probe measured 534.7s vs 26.2s at sf10, and the
shuffle-partition treatment (exp_sf100_agg.py) came back FLAT (525.7s
at 128 partitions) — so unlike q18/block_pack this is not the
spill-cliff. The remaining suspect is the candidate stream itself:
the segment equi-join's output is Sigma_g |idx_g| x |probe_g| over
(block, len, seg_idx, seg) key groups, and it is only corpus-linear
while key-group sizes stay bounded. The scale fixture grows each
(p_type, p_brand) block linearly (deliberately — that is how
categorical blocks behave) and separates copies by affine-cipher
translation of p_name; if ciphered segments collide across copies, or
popular same-length segments recur within a copy, group sizes grow
with the factor and the join output grows super-linearly.

This script measures exactly that, per tier: index rows, probe rows
(linear by construction — sanity), candidate-join rows, and verified
output pairs. Candidate counts use the operator's own plan via
``edit_distance_pairs_passjoin(..., _candidates_only=True)`` — no
reimplementation to drift.

Usage: python scripts/exp_passjoin_growth.py [sf10 sf100 ...]
Writes /tmp/exp_passjoin_growth.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from gads_etl_spark.catalog import load_table
    from gads_etl_spark.operators.dedup import edit_distance_pairs_passjoin

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"), "p_name", "p_type", "p_brand")
    t0 = time.perf_counter()
    cand = edit_distance_pairs_passjoin(
        part, block_cols=["p_type", "p_brand"], id_col="pid",
        name_col="p_name", max_dist=2, candidate_budget=None,
        _candidates_only=True)
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    # candidate_budget=None: this probe exists to MEASURE the saturated
    # candidate stream the default-on guard would refuse to run.
    n_pairs = edit_distance_pairs_passjoin(
        part, block_cols=["p_type", "p_brand"], id_col="pid",
        name_col="p_name", max_dist=2, candidate_budget=None).count()
    t_pairs = time.perf_counter() - t0
    n_part = part.count()
    return {
        "part_rows": n_part,
        "candidate_rows": n_cand,
        "candidates_per_part_row": round(n_cand / n_part, 2),
        "verified_pairs": n_pairs,
        "candidate_count_sec": round(t_cand, 1),
        "full_query_sec": round(t_pairs, 1),
    }


def main() -> None:
    from gads_etl_spark.session import get_session

    tiers = sys.argv[1:] or ["sf10", "sf100"]
    spark = get_session("exp-passjoin-growth", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tier in tiers:
        sf_dir = os.path.join(HERE, ".localdata", tier)
        out[tier] = measure(spark, sf_dir)
        print(f"# {tier}: {out[tier]}", file=sys.stderr)
    if "sf10" in out and "sf100" in out:
        out["growth"] = {
            "data_factor": 10,
            "candidate_factor": round(
                out["sf100"]["candidate_rows"]
                / out["sf10"]["candidate_rows"], 2),
            "pair_factor": round(
                out["sf100"]["verified_pairs"]
                / max(out["sf10"]["verified_pairs"], 1), 2),
        }
    with open("/tmp/exp_passjoin_growth.json", "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
