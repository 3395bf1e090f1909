"""Ranked retrieval: BM25 scoring, deterministic top-k ranking, and
reciprocal-rank fusion of heterogeneous rankings.

The reference has no search surface (its queries are exact composites,
reference src/gads_etl/keys.py); these operators are the engine
extensions a training-data pipeline uses to mine corpora by QUERY —
lexical (BM25 over an inverted-postings shape), dense (cosine over an
embedding column), and the standard way to combine them, RRF
(Cormack, Clarke & Buettcher, SIGIR 2009: reciprocal rank fusion
outperforms Condorcet and individual rank learning methods) — public
method, public constant k=60.

Exactness discipline (the repo convention): every score that crosses an
engine boundary is quantized to integers BEFORE summing — BM25 to
micro-ints, RRF contributions to nano-ints — so ranking and scores are
bit-identical between Spark and any SQL oracle; float summation order
never enters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score (micro-int column ``sm``) for ``terms``.

    Robertson/Lucene formulation. Scale shape: the postings scan filters
    to the query's terms at the source (an IN over a handful of literals
    — pushdown-able, the inverted-index probe of a search engine), df is
    one tiny aggregate, corpus stats (N, avgdl) are two driver scalars a
    real deployment precomputes, per-term scores quantize to micro-ints
    before the per-doc sum.
    """
    from gads_etl_spark.operators.dedup import tokens

    dl = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("dl"))
    n_docs, sum_dl = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
    if not n_docs:
        # Empty corpus: nothing can score. Short-circuit (avgdl is
        # undefined — sum_dl comes back NULL and n_docs 0) with an empty
        # (id, sm) frame of the contracted schema.
        return (docs.select(F.col(id_col))
                .withColumn("sm", F.lit(0).cast("long")).limit(0))
    avgdl = float(sum_dl) / n_docs
    # ONE tokenize pass carries BOTH the exploded terms and the per-doc
    # length (guide §2.4: remove the join, remove its exchange — the
    # previous shape computed dl as a SEPARATE corpus tokenization and
    # attached it by an |corpus|-row equi-join). The token array is
    # LET-BOUND as a generated attribute via a 1-element struct explode
    # (the ext_embedding_quantize idiom) before the term explode: a
    # plain projection would let Catalyst hoist ``size(split(text))``
    # into the Project ABOVE the Generate, re-running the tokenizer on
    # every token row instead of every doc (measured: 2.0s → 4.5s at
    # sf0.1 for the multi variant — worse than the join it replaced);
    # against the bound attribute, dl is an O(1) array-length read per
    # row. dl rides the tf aggregate as a grouping column — constant
    # per doc, so the (id, term) groups are unchanged. The isNotNull
    # filter keeps the old inner-join-on-id semantics (null-id rows
    # never reached the output).
    tf = (
        docs.where(F.col(id_col).isNotNull())
        .select(F.col(id_col),
                F.explode(F.array(F.struct(
                    tokens(F.col(text_col)).alias("toks")))).alias("_b"))
        .select(F.col(id_col),
                F.size("_b.toks").cast("long").alias("dl"),
                F.explode("_b.toks").alias("term"))
        .where(F.col("term").isin(list(terms)))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # df = number of (doc, term) groups per term. The dfq branch
    # deliberately does NOT share an exchange with the scoring branch:
    # phrasing it so both subtrees canonicalize identically (e.g.
    # count(nullif(tf, 0)) to keep tf referenced) makes ReuseExchange /
    # AQE's stage cache dedupe the corpus scan — and was MEASURED 3-5x
    # slower at sf0.1/sf0.01 (ext_bm25_search 1.7s → 5.0s isolated):
    # the reuse serializes the two branches behind one stage chain and
    # interacts pathologically with the runtime broadcast of dfq, while
    # the independent subtrees scan concurrently. Catalyst prunes the
    # count out of this branch (functions=[] distinct-style aggregate),
    # so the recompute is a scan+explode+semi-join feeding a count —
    # cheaper per pass than the scoring leg.
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1)
    scores = (
        tf.join(F.broadcast(dfq), "term")
        .select(
            F.col(id_col),
            F.round(
                # (k1 + 1) computed driver-side as one Python double and
                # injected as a literal: for the default k1=1.2 this is
                # bit-identical to parsing "2.2" (1.2 + 1 == 2.2 exactly
                # in IEEE doubles — both are the nearest double to their
                # decimal), so oracle parity is unchanged, and any other
                # k1 now actually reaches the numerator.
                idf * F.col("tf") * (k1 + 1.0)
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
                * 1_000_000).cast("long").alias("s_micro"),
        )
    )
    return scores.groupBy(id_col).agg(F.sum("s_micro").alias("sm"))


def bm25_scores_multi(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """BM25 over a QUERY RELATION — ``(query_id, term)`` rows — in one
    corpus pass: the batch shape a retrieval pipeline actually runs
    (mine a corpus for hundreds of topics at once), not one job per
    query string.

    Returns ``(query_id, doc_id, sm)`` micro-int scores. Scale shape:
    per-(doc, term) scores are computed ONCE for the union of all query
    terms (the exploded postings are cut to that union by a broadcast
    LEFT SEMI join against the distinct query terms — no driver
    round-trip, and the broadcast keeps the filter map-side), then fan
    out to queries via a broadcast join with the tiny query relation;
    df/idf are per-term and shared across queries. Adding a query adds
    only broadcast-join fan-out, never another corpus scan. The only
    collect left is the two corpus stats scalars a real deployment
    precomputes.
    """
    from gads_etl_spark.operators.dedup import tokens

    q = queries.select(F.col(query_id_col), F.col(term_col).alias("term"))
    dl = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("dl"))
    n_docs, sum_dl = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
    if not n_docs:
        # Empty corpus: avgdl is undefined (sum_dl NULL). An empty query
        # relation needs no guard — the semi-join below yields an empty
        # result of the contracted schema naturally.
        return (docs.select(F.col(id_col)).limit(0)
                .crossJoin(q.select(query_id_col).limit(0))
                .withColumn("sm", F.lit(0).cast("long"))
                .select(query_id_col, id_col, "sm"))
    avgdl = float(sum_dl) / n_docs
    # One tokenize pass for terms AND doc length, with the token array
    # let-bound as a generated attribute — the same restructure as
    # bm25_scores (see the comments there).
    tf = (
        docs.where(F.col(id_col).isNotNull())
        .select(F.col(id_col),
                F.explode(F.array(F.struct(
                    tokens(F.col(text_col)).alias("toks")))).alias("_b"))
        .select(F.col(id_col),
                F.size("_b.toks").cast("long").alias("dl"),
                F.explode("_b.toks").alias("term"))
        .join(F.broadcast(q.select("term").distinct()), "term", "left_semi")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # df = number of (doc, term) groups per term. The dfq branch
    # deliberately does NOT share an exchange with the scoring branch:
    # phrasing it so both subtrees canonicalize identically (e.g.
    # count(nullif(tf, 0)) to keep tf referenced) makes ReuseExchange /
    # AQE's stage cache dedupe the corpus scan — and was MEASURED 3-5x
    # slower at sf0.1/sf0.01 (ext_bm25_search 1.7s → 5.0s isolated):
    # the reuse serializes the two branches behind one stage chain and
    # interacts pathologically with the runtime broadcast of dfq, while
    # the independent subtrees scan concurrently. Catalyst prunes the
    # count out of this branch (functions=[] distinct-style aggregate),
    # so the recompute is a scan+explode+semi-join feeding a count —
    # cheaper per pass than the scoring leg.
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1)
    per_term = (
        tf.join(F.broadcast(dfq), "term")
        .select(
            F.col(id_col), F.col("term"),
            F.round(
                # driver-computed (k1 + 1) literal — see bm25_scores
                idf * F.col("tf") * (k1 + 1.0)
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
                * 1_000_000).cast("long").alias("s_micro"),
        )
    )
    return (
        per_term.join(F.broadcast(q), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.sum("s_micro").alias("sm"))
    )


def ranked_topk(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    k: int = 50,
    descending: bool = True,
) -> DataFrame:
    """Deterministic (id, rank) for the top-``k`` rows by score.

    Two stages so no stage is a scale hazard: a distributed
    TakeOrdered (orderBy + limit — never a single-partition window over
    the corpus) cuts to k rows, then row_number over those k assigns
    ranks. Ties break by ascending id, so the ranking is engine-exact.
    """
    order = [F.desc(score_col) if descending else F.asc(score_col),
             F.asc(id_col)]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")) \
              .select(id_col, "rank")


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion over named (id, rank) lists.

    Each list contributes ``round(1e9 / (k + rank))`` nano-int points
    for the ids it ranks; absent ids contribute 0 (and surface rank 0 in
    the per-list ``rank_<name>`` column — an explicit sentinel rather
    than NULL, so the fused row says which signals fired). The fused
    score is the exact integer sum, so cross-engine ordering is
    bit-stable; no divisor ≤ k + corpus can make 1e9/d land exactly on
    .5 (that needs 2e9/d odd, i.e. d ≥ 2^10), so rounding mode never
    differs between engines either.
    """
    fused = None
    for name, ranked in rankings.items():
        contrib = ranked.select(
            F.col(id_col),
            F.col("rank").cast("long").alias(f"rank_{name}"),
            F.round(F.lit(1e9) / (F.lit(k) + F.col("rank")))
            .cast("long").alias(f"_c_{name}"),
        )
        fused = contrib if fused is None else fused.join(
            contrib, id_col, "full_outer")
    rank_cols = [f"rank_{n}" for n in rankings]
    score = sum((F.coalesce(F.col(f"_c_{n}"), F.lit(0)) for n in rankings),
                F.lit(0))
    return fused.select(
        id_col,
        score.cast("long").alias("rrf_nano"),
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in rank_cols],
    )
