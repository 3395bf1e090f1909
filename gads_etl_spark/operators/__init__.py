"""Scale-path operators for LLM training-data pipelines.

These are the operations a 100 TB text/embedding corpus pipeline needs that
plain SQL doesn't name: near-duplicate detection (MinHash-LSH, SimHash,
shingle Jaccard), approximate nearest neighbours over embeddings, and
multimodal binary-column plumbing. All are pure DataFrame compositions —
shuffles on content keys, no driver-side loops, no all-pairs joins.

Not present in the reference (it is a Google-Ads ETL, SURVEY.md §2 intro);
mandated by the driver north star (BASELINE.json, SURVEY.md §7.2 step 6).
"""

from gads_etl_spark.operators.dedup import (  # noqa: F401
    CandidateBudgetExceeded,
    blocked_edit_distance_pairs,
    bow_fingerprint,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_signatures,
    shingle_jaccard_pairs,
    shingles,
    simhash,
    tokens,
)
from gads_etl_spark.operators.multimodal import (  # noqa: F401
    as_binary_payload,
    decode_features,
)
from gads_etl_spark.operators.graph import (  # noqa: F401
    cluster_survivors,
    connected_components,
)
from gads_etl_spark.operators.layout import (  # noqa: F401
    compact_small_files,
    write_bucketed,
    write_range_layout,
    write_zorder_layout,
    zorder_code,
)
from gads_etl_spark.operators.rollup import (  # noqa: F401
    hourly_rollup,
    merge_additive,
    refresh_buckets,
)
from gads_etl_spark.operators.sampling import (  # noqa: F401
    deterministic_sample,
    epoch_shuffle,
    pack_sequences,
    read_epoch_shards,
    stratified_hash_sample,
    train_val_test_split,
    write_epoch_shards,
)
from gads_etl_spark.operators.quality import (  # noqa: F401
    mix_to_budget,
    ngram_contamination,
    redact_pii,
    repetition_stats,
)
from gads_etl_spark.operators.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    lsh_topk,
    random_hyperplanes,
    semantic_dedup,
)
from gads_etl_spark.operators.temporal import (  # noqa: F401
    asof_join,
    interval_join,
    scd2_history,
)
