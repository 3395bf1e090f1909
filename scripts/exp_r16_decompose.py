"""Round-16 session-2 decomposition probe: where do the remaining heavy
sf0.1 extras actually spend their wall?

Each candidate query's pipeline is split into named sub-pipelines, each
timed with the noop sink (guide §1.4) after one warmup of the FULL
query (absorbs JVM/codegen startup). Run on a QUIET host:

    python scripts/exp_r16_decompose.py [step ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gads_etl_spark.operators.util import spread  # noqa: E402


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from gads_etl_spark.catalog import load_table
    from gads_etl_spark.operators import dedup as D
    from gads_etl_spark.queries import REGISTRY
    from gads_etl_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("exp-r16-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])

    def run(name, fn, warm=None, n=5):
        import gc

        if only and name.split(":")[0] not in only:
            return
        if warm is not None:
            noop(warm())
        ts = []
        for _ in range(n):
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001
                pass
            ts.append(noop(fn()))
        ts.sort()
        print(f"{name}: med {ts[len(ts) // 2]:.3f}  min {ts[0]:.3f}  "
              f"(runs {['%.2f' % t for t in ts]})", flush=True)

    docs = load_table(spark, sf_dir, "documents")

    # --- ext_simhash_radius -------------------------------------------
    def sim_full():
        return REGISTRY["ext_simhash_radius"].fn(spark, sf_dir)

    off = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = docs.where(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + off)
    union = docs.unionByName(copies)

    run("simhash:full_query", sim_full, warm=sim_full)
    run("simhash:agg_only", lambda: D.simhash(union))
    run("simhash:tokens_explode_only", lambda: spread(
        union.select("doc_id", "text")).select(
        F.col("doc_id"), F.explode(D.tokens(F.col("text"))).alias("tok")))

    # --- ext_minhash_candidates ---------------------------------------
    def mh_full():
        return REGISTRY["ext_minhash_candidates"].fn(spark, sf_dir)

    run("minhash:full_query", mh_full, warm=mh_full)
    run("minhash:band_keys_only", lambda: D.minhash_band_keys(union))
    run("minhash:signatures_only", lambda: D.minhash_signatures(union))
    run("minhash:shingle_hash_only", lambda: spread(
        union.select("doc_id", "text")).select(
        F.col("doc_id"),
        F.explode(D.shingles(F.col("text"), 3)).alias("sh"),
    ).select("doc_id", F.xxhash64("sh").alias("h")))

    # --- ext_winnow_fingerprint ---------------------------------------
    def win_full():
        return REGISTRY["ext_winnow_fingerprint"].fn(spark, sf_dir)

    grams = F.expr(
        "transform(sequence(1, greatest(length(text) - 3, 1)), "
        "i -> md5(substring(text, i, 4)))")
    run("winnow:full_query", win_full, warm=win_full)
    run("winnow:grams_only", lambda: docs.select("doc_id", grams.alias("g")))
    run("winnow:grams_spread", lambda: spread(
        docs.select("doc_id", "text")).select("doc_id", grams.alias("g")))

    # --- ext_trigram_typicality ---------------------------------------
    def tri_full():
        return REGISTRY["ext_trigram_typicality"].fn(spark, sf_dir)

    tri_old = spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, greatest(length(text) - 2, 0)),"
            " i -> substring(lower(text), i, 3))"
        ))).alias("g"))
    tri_new = spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(array(lower(text)), lt_ -> "
            "transform(sequence(1, greatest(length(lt_) - 2, 0)), "
            "i_ -> substring(lt_, i_, 3)))[0]"
        ))).alias("g"))
    run("trigram:full_query", tri_full, warm=tri_full)
    run("trigram:explode_old", lambda: tri_old)
    run("trigram:explode_letbound", lambda: tri_new)

    spark.stop()


if __name__ == "__main__":
    main()
