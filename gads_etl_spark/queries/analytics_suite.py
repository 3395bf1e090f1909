"""Advanced-analytics suite: iterative graph ranking, closed-form trend
fitting, calendar resampling with interpolation, and epoch shuffling.

Round-9 additions past the reference's surface (the reference has no
graph, regression, gap-fill, or shuffle-plan surface at all — its
analytics stop at per-partition counters, reference src/gads_etl/
pipeline.py:137-210). These are the next operators a team actually
asks an engine for once the basics work: "which items anchor the
co-purchase graph", "what's the revenue trend per market", "fill the
gaps in this series", "give me a reproducible training-epoch order".

Exactness discipline (same as the rest of the registry): every
iterative / fractional computation is arranged so each engine performs
the IDENTICAL exact-integer steps — scaled-integer PageRank with
integral division, OLS from exact decimal sums with one final float
division, interpolation between exact integer anchors — so the value
hashes match bit-for-bit, not approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gads_etl_spark.catalog import load_table
from gads_etl_spark.queries.registry import register

_PR_SCALE = 1_000_000_000_000
_PR_DAMP = 85
_PR_ITERS = 8


def _pagerank_oracle(iters: int = _PR_ITERS) -> str:
    """Unrolled fixed-iteration PageRank in pure SQL.

    Mirrors operators/graph.py:pagerank step for step: HUGEINT holds the
    per-edge product exactly (Spark side: decimal(38,0)); `//` and `div`
    both truncate on positives, so every iteration is bit-identical.

    ``ed`` is referenced once per unrolled iteration; AS MATERIALIZED
    pins DuckDB to compute the edge list ONCE instead of inlining the
    pair self-join into all 8 steps — inlined, the 10x tier recomputes
    a 24M-edge join 8 times and spills >80GB of temp. Materialization
    cannot change values, only evaluation count.
    """
    head = f"""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src),
    ed AS MATERIALIZED (
      SELECT e.src, e.dst, e.w, deg.outw FROM e JOIN deg USING (src)),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    r0 AS (SELECT src AS node, CAST({_PR_SCALE} // n AS BIGINT) AS pr_scaled
           FROM deg CROSS JOIN nn)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
    r{k} AS (
      SELECT ed.dst AS node,
             CAST(((100 - {_PR_DAMP}) * CAST({_PR_SCALE} AS HUGEINT))
                    // (100 * nn.n)
                  + ({_PR_DAMP} * sum((CAST(r.pr_scaled AS HUGEINT) * ed.w)
                                      // ed.outw)) // 100
                  AS BIGINT) AS pr_scaled
      FROM ed JOIN r{k - 1} r ON r.node = ed.src CROSS JOIN nn
      GROUP BY ed.dst, nn.n
    )""")
    tail = f"""
    SELECT node AS part_id, pr_scaled FROM r{iters}"""
    return head + "".join(steps) + tail


@register(
    "ext_pagerank",
    oracle=_pagerank_oracle(),
    tags=("extension", "graph", "iterative"),
)
def ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph: nodes are parts, an
    edge (a, b) weighted by how many orders contain both. 8 power
    iterations, damping 0.85, ranks as exact integers scaled to 1e12
    (operators/graph.py:pagerank — see there for why integer ranks make
    an iterative algorithm oracle-exact).

    Scale shape: pairs expand from one collect_set per order (a single
    l_orderkey exchange; the per-order part set is bounded by
    items-per-order, so the exploded pair count grows linearly with
    orders, never |parts|²); each iteration is one bounded shuffle on
    the node key. Per-iteration cost is O(edges), independent of
    iteration count's history — lineage is truncated by
    localCheckpoint each round.
    """
    from gads_etl_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    # Round 17 (guide §2.3 shuffle fewer bytes): the graph is symmetric
    # by construction — w(a,b) == w(b,a) == #orders containing both —
    # so generate and aggregate only the a < b HALF (the second explode
    # filters the set to p_ > src, halving the Generate output AND the
    # (src,dst) aggregate's exchange: ~180M → ~90M rows at the 100x
    # tier, the dominant exchange of the whole query), then emit each
    # aggregated edge in BOTH directions with one post-aggregate
    # explode — one subtree, so the half-derivation is computed once (a
    # self-union recomputes it: measured 54s vs 27s half-only at sf10).
    # Identical edge multiset — exceptAll-checked at sf0.1 and
    # fingerprint-checked at sf1 (24M edges). Measured staged-derivation
    # wall at sf10: 66s warm → 27s half-only + a map-side explode.
    half = (
        li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode(F.expr("filter(ps, p_ -> p_ > src)")).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    pairs = half.select(F.explode(F.array(
        F.struct(F.col("src"), F.col("dst"), F.col("w")),
        F.struct(F.col("dst").alias("src"), F.col("src").alias("dst"),
                 F.col("w")),
    )).alias("_e")).select("_e.src", "_e.dst", "_e.w")
    pr = pagerank(pairs, weight="w", iterations=_PR_ITERS,
                  damping_pct=_PR_DAMP, scale=_PR_SCALE)
    return pr.select(F.col("node").alias("part_id"), "pr_scaled")


@register(
    "op_trend_fit",
    oracle="""
    WITH monthly AS (
      SELECT n.n_name AS nation,
             CAST((year(o.o_orderdate) - 1992) * 12
                  + (month(o.o_orderdate) - 1) AS BIGINT) AS midx,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), s AS (
      SELECT nation, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(midx) AS HUGEINT) AS sx,
             CAST(sum(cents) AS HUGEINT) AS sy,
             CAST(sum(CAST(midx AS HUGEINT) * cents) AS HUGEINT) AS sxy,
             CAST(sum(CAST(midx AS HUGEINT) * midx) AS HUGEINT) AS sxx
      FROM monthly GROUP BY nation
    )
    SELECT nation, CAST(n AS BIGINT) AS n_points,
           round(CASE WHEN n * sxx - sx * sx <> 0 THEN
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END, 6) AS slope,
           round(CASE WHEN n * sxx - sx * sx <> 0 THEN
                 CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END, 6) AS intercept
    FROM s
    """,
    tags=("operator", "regression", "agg"),
)
def op_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue trend per customer nation: OLS slope/intercept
    (cents per month-index) fit closed-form from exact integer sums
    (operators/timeseries.py:trend_fit — and why not ``regr_slope``,
    whose double accumulator is partition-order-dependent).

    Two-level aggregation: orders roll up to (nation, month) — nation
    (25 rows, bounded) is broadcast; customer joins by key with no
    hint, so AQE broadcasts it at small SF and falls back to a shuffle
    join when it scales — then ~25×84 monthly points reduce to five
    Gram sums per nation. At 100 TB the month rollup is the same
    single exchange; the fit touches one row per (group, month),
    never the facts.
    """
    from gads_etl_spark.operators.timeseries import trend_fit

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(cust.select("c_custkey", "c_nationkey"),
                    orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            ((F.year("o_orderdate") - 1992) * 12
             + (F.month("o_orderdate") - 1)).cast("long").alias("midx"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .alias("cents"))
    )
    return trend_fit(monthly, "midx", "cents", ["nation"]).select(
        "nation", "n_points", "slope", "intercept")


@register(
    "op_resample_interpolate",
    oracle="""
    WITH daily AS (
      SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem
      WHERE l_suppkey % 10 = 1 AND year(l_shipdate) = 1995
      GROUP BY 1, 2
    ), span AS (
      SELECT suppkey, min(day) AS d0, max(day) AS d1
      FROM daily GROUP BY suppkey
    ), cal0 AS (
      SELECT suppkey,
             unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                    CAST(d1 AS TIMESTAMP),
                                    INTERVAL 1 DAY)) AS ts
      FROM span
    ), cal AS (
      SELECT suppkey, CAST(ts AS DATE) AS day FROM cal0
    ), grid AS (
      SELECT c.suppkey, c.day, d.cents
      FROM cal c LEFT JOIN daily d
        ON c.suppkey = d.suppkey AND c.day = d.day
    ), f AS (
      SELECT suppkey, day, cents,
        last_value(cents IGNORE NULLS) OVER
          (PARTITION BY suppkey ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY suppkey ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(cents IGNORE NULLS) OVER
          (PARTITION BY suppkey ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY suppkey ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM grid
    )
    SELECT suppkey, CAST(day AS TIMESTAMP) AS day,
           cents IS NOT NULL AS observed,
           round(CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                 ELSE CAST(pv AS DOUBLE)
                      + CAST(nv - pv AS DOUBLE) * (day - pd) / (nd - pd)
                 END, 6) AS filled_cents
    FROM f
    """,
    tags=("operator", "timeseries", "window"),
)
def op_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily 1995 revenue series per sampled supplier
    (suppkey ≡ 1 mod 10): missing calendar days are generated per key
    and linearly interpolated between the nearest observed days
    (operators/timeseries.py:resample_daily).

    The calendar explodes from each key's own [min, max] span — output
    is Σ span(k), not |keys| × |global calendar| — and interpolation is
    two ordered window passes over that grid, no self-join. Anchors are
    exact integer cents, so interpolated doubles match the oracle
    bit-for-bit.
    """
    from gads_etl_spark.operators.timeseries import resample_daily

    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.where((F.col("l_suppkey") % 10 == 1)
                 & (F.year("l_shipdate") == 1995))
        .groupBy(F.col("l_suppkey").alias("suppkey"),
                 F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
             .alias("cents"))
    )
    out = resample_daily(daily, "suppkey", "day", "cents")
    return out.select(F.col("key").alias("suppkey"),
                      F.col("day").cast("timestamp").alias("day"),
                      "observed",
                      F.col("filled").alias("filled_cents"))


@register(
    "ext_epoch_shuffle",
    oracle="""
    SELECT doc_id,
           substring(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 1)
             AS shard,
           CAST(row_number() OVER (
             PARTITION BY substring(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 1)
             ORDER BY substring(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 8),
                      doc_id) AS BIGINT) AS pos
    FROM documents
    """,
    tags=("extension", "sampling", "training"),
)
def ext_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-epoch shuffle plan: every document gets a seeded
    pseudo-random (shard, pos) — reading shards in order, each in pos
    order, is a reproducible random permutation of the corpus
    (operators/sampling.py:epoch_shuffle).

    The scale point is what it avoids: a trainer-ready global shuffle
    WITHOUT a global sort. Shard choice is a hash digit computed on the
    scan (no exchange); the only sort is within a shard, n_shards-way
    parallel. Epoch 7 here; changing the epoch integer re-permutes
    everything with zero state carried between epochs.
    """
    from gads_etl_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents")
    out = epoch_shuffle(docs.select("doc_id"), "doc_id",
                        epoch=7, n_shards=16)
    return out.select("doc_id", "shard", "pos")
