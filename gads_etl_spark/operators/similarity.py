"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with a *broadcast* query side — the
fact-side embedding table is scanned once, never shuffled, and the top-k
per query is a window over (query, score). Scale path: random-hyperplane
LSH — bucket the corpus by sign pattern, equi-join query buckets, rank
within candidates only.

All arithmetic is double-precision, sequential-fold dot products, so the
DuckDB oracle (list_reduce, same fold order) matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gads_etl_spark.operators.util import spread


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential left-fold dot product (deterministic IEEE order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours of each query vector.

    ``broadcast(queries)`` × corpus: the corpus (the 100 TB side) streams
    through map tasks; only |queries| × k rows survive the window. Rank is
    on the score rounded to 6 decimals with id tiebreak, so ordering is
    stable under float noise and engine-independent.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    c = spread(corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_fraction: float = 0.25,
    max_iter: int = 5,
) -> DataFrame:
    """Approximate top-k cosine via IVF (inverted-file) partitioning.

    KMeans centroids partition the corpus (each vector lives in exactly
    one cell); each query probes its ``n_probe`` nearest cells and scores
    only those vectors. The centroid table is tiny and broadcast; corpus
    assignment is one pass; the candidate join is an equi-join on the
    cell id — the classic IVF trade: recall grows with n_probe, cost
    with |cell| × n_probe instead of |corpus|.

    The KMeans fit runs on a seeded SAMPLE with a bounded iteration count
    (same pattern as ``semantic_dedup``): centroid quality only shifts
    which cells candidates land in — recall headroom, never correctness —
    so at 100 TB the iterative fit must not re-scan the full corpus per
    iteration. Assignment of the full corpus stays a single pass.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    train = corpus.sample(fraction=train_fraction, seed=seed).select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=max_iter).fit(train)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell INT, centroid ARRAY<DOUBLE>",
    )

    def assign(df: DataFrame, id_alias: str, vec_alias: str, probes: int) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        rows = df.select(F.col(id_col).alias(id_alias), v.alias(vec_alias))
        d2 = F.aggregate(
            F.zip_with(F.col(vec_alias), F.col("centroid"),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        w = Window.partitionBy(id_alias).orderBy(F.asc("d2"), F.asc("cell"))
        return (
            rows.crossJoin(F.broadcast(centroids))
            .withColumn("d2", d2)
            .withColumn("_cr", F.row_number().over(w))
            .where(F.col("_cr") <= probes)
            .select(id_alias, vec_alias, "cell")
        )

    c = assign(spread(corpus), "neighbor_id", "c_vec", probes=1)
    q = assign(queries, "query_id", "q_vec", probes=n_probe)
    scored = c.join(F.broadcast(q), "cell").select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    train_fraction: float = 0.25,
    max_iter: int = 5,
) -> DataFrame:
    """SemDeDup: cluster-blocked semantic near-duplicate pruning
    (Abbas et al. 2023, arXiv:2303.09540 — public method).

    KMeans cells block the candidate space; within each cell a vector is
    dropped when a LOWER-id cell-mate has cosine >= threshold (greedy
    keep-lowest-id, the standard SemDeDup simplification). Returns the
    surviving corpus rows unchanged.

    Clustering can only MISS pairs, never invent them — cosine does not
    depend on the cell — so false drops are impossible at any clustering,
    and identical vectors always land in the same cell (identical
    centroid distances, deterministic tie-break), so exact duplicates are
    always caught.

    At 100 TB: cost is sum(|cell|^2) instead of |corpus|^2 — grow
    n_clusters ~ sqrt(N) to keep cells bounded; the pair join shuffles on
    the cell id only, and the centroid table stays driver-tiny. KMeans
    fits on a seeded sample with few iterations (clustering quality only
    affects recall headroom, never correctness — see above), so the
    expensive iterative passes never touch the full corpus; assignment is
    one broadcast-join pass. The reference has no embedding operators
    (SURVEY.md: extension mandate).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.sample(fraction=train_fraction, seed=seed).select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=max_iter).fit(train)

    # Cell assignment via model.transform: per-row JVM predict, ZERO
    # shuffle — the alternative (explode corpus × centroids, window-argmin
    # per id) shuffles |corpus| × n_clusters rows each dragging the full
    # vector along. Identical vectors get identical predictions
    # (deterministic lowest-index tie-break), so exact dups still always
    # share a cell.
    v = F.col(vec_col).cast("array<double>")
    cells = model.transform(
        corpus.select(F.col(id_col), v.alias("_v")).withColumn(
            "features", array_to_vector(F.col("_v"))
        )
    ).select(id_col, "_v", F.col("prediction").cast("int").alias("cell"))

    keep = cells.select(F.col(id_col).alias("_keep_id"), F.col("_v").alias("_keep_v"),
                        "cell")
    cand = cells.select(F.col(id_col).alias("_cand_id"), F.col("_v").alias("_cand_v"),
                        "cell")
    dropped = (
        cand.join(keep, "cell")
        .where(F.col("_keep_id") < F.col("_cand_id"))
        .where(cosine(F.col("_keep_v"), F.col("_cand_v")) >= F.lit(threshold))
        .select(F.col("_cand_id").alias(id_col))
        .distinct()
    )
    return corpus.join(dropped, id_col, "left_anti")


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization of an embedding column.

    ``scale = max(|v|)/127``; ``q[i] = floor(v[i]/scale + 0.5)`` (explicit
    round-half-up, so the arithmetic is a pure double expression both
    engines state identically). Values land in [-127, 127] by
    construction — at rest they pack into 1 byte/dim, a 4× memory cut
    for ANN candidate scoring, with the scan-level win that a 100 TB
    float corpus becomes 25 TB of shuffle/broadcast traffic. Scoring
    against quantized vectors dequantizes on the fly (multiply by
    ``scale``); recall loss is negligible for cosine top-k (asserted in
    tests). Zero vectors quantize to all-zero with scale 0.

    Per-row expression work only — no shuffle, no UDF.
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    return df.withColumn(q_col, q).withColumn(scale_col, scale)


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def _bucket(vec: F.Column, planes: list[list[float]], band: range) -> F.Column:
    """Sign pattern of the given plane band as a small integer bucket id."""
    bucket = F.lit(0)
    for j in band:
        plane = F.array(*[F.lit(float(v)) for v in planes[j]])
        bit = F.when(_dot(vec, plane) > 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane LSH banding.

    Corpus vectors are bucketed by the sign pattern of ``n_planes``
    hyperplane projections, split into ``bands`` bands; a query only
    scores corpus vectors sharing at least one band bucket. The join is a
    plain equi-join on (band, bucket) — candidate count is bucket-bounded,
    never |corpus| × |queries|. Recall rises with ``bands`` (multi-probe).
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    per_band = n_planes // bands

    def banded(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        rows = df.select(
            F.col(id_col).alias(id_alias), v.alias(vec_alias),
            *[
                _bucket(v, planes, range(b * per_band, (b + 1) * per_band)).alias(f"bk{b}")
                for b in range(bands)
            ],
        )
        buckets = F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"bk{b}").alias("bucket"))
            for b in range(bands)
        ])
        return rows.select(
            id_alias, vec_alias, F.explode(buckets).alias("bb")
        ).select(id_alias, vec_alias, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    c = banded(corpus, "neighbor_id", "c_vec")
    q = banded(queries, "query_id", "q_vec")
    candidates = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .distinct()
    )
    scored = candidates.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
