"""sf10 MATCH-equivalent checks for the operators excluded from
``check_queries.py --sweep sf10`` for ORACLE-side reasons only
(round-11 verdict tasks 5 and 7). The Spark side always runs the FULL
registered query (or operator) at the 100x tier; only the DuckDB
oracle is restated in a tractable form — chunked, sliced, or
materialized — never weakened:

- ``ext_pagerank``: the registered unrolled-CTE oracle recomputes an
  8-deep iteration tree in one statement; here every iteration
  materializes a real DuckDB table with IDENTICAL integer arithmetic
  (same scaled-integer floor divisions), so the oracle is chunked,
  not changed. Exact frame compare over all |V| rows.
- connected components (operator-level): no registered CC query has a
  tractable sf10 oracle — their pair generator is the budget-guarded
  quadratic shingle join, and the recursive-CTE reachability closure
  explodes on dense graphs. The OPERATOR
  (operators/graph.py:connected_components) is therefore verified at
  240M-edge scale on the part co-purchase graph (the same edge set as
  ext_pagerank, one dense giant component — the hard case for
  min-label propagation): Spark pointer-jumping labels vs a DuckDB
  materialized min-label fixpoint. Both converge to the same
  well-defined answer (min reachable node id), so MATCH is exact.
- ``ext_encode_docs``: DuckDB v1.0's list-aggregate reservation
  accounting dies building 500k token-id lists in one statement
  (SCALING.md round-11). Encoding is per-document GIVEN the
  vocabulary, so the corpus partitions into 16 ``doc_id % 16`` slices:
  the vocabulary is materialized ONCE as a DuckDB table (DuckDB-
  computed — and itself independently sf10-verified by
  ext_build_vocab in the main sweep), then each slice's encoding is
  verified against the full Spark result restricted to that slice.
  The union of the 16 slices is the whole corpus: FULL parity, not a
  sample.
- ``ext_block_pack``: shards are independent by construction
  (shard = doc_id % 4, the cumulative-offset window partitions by
  shard), so each shard's oracle runs standalone over the materialized
  vocabulary — 4 shard runs = full parity — plus corpus-wide
  conservation invariants that need no lists at all: token
  conservation (sum of block n_tokens == exploded non-empty token
  count), block fullness (every block exactly block_size tokens except
  possibly the last of each shard), and block-id contiguity per shard.

Writes ``CORRECTNESS_sf10_extras.json``; every record carries a
``method`` field so the artifact never launders a restated oracle as
the registered single-statement one.

Usage: python scripts/check_sf10_extras.py [--sf DIR] [names...]
       (default DIR .localdata/sf10; default names = every check in CHECKS)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

import check_queries as cq  # noqa: E402  (canon / fast_frame_equal)
from gads_etl_spark.catalog import TABLES  # noqa: E402

_PR_SCALE = 1_000_000_000_000
_PR_DAMP = 85
_PR_ITERS = 8

#: The vocabulary definition shared by the encode/pack oracles —
#: textually identical to queries/extension_suite.py:_ENCODE_CTE's
#: vocab CTE, materialized here as a real table so 20 slice/shard
#: queries don't recompute the 27M-token group-by.
_VOCAB_SQL = """
    SELECT token,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token ASC) - 1 AS BIGINT)
               AS token_id
    FROM (
        SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        WHERE token <> '' GROUP BY token
    ) WHERE n_occurrences >= 5
"""

#: Per-document encoding restricted by a predicate on doc_id; reads the
#: materialized ``vocab`` table instead of the inline CTE.
_ENC_SLICE_SQL = """
    WITH exploded AS (
        SELECT doc_id, t.pos, t.token
        FROM documents,
             LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS token,
                             generate_subscripts(string_split(lower(text), ' '), 1) AS pos) t
        WHERE t.token <> '' AND {pred}
    ), enc AS (
        SELECT e.doc_id, list(COALESCE(v.token_id, -1) ORDER BY e.pos) AS token_ids
        FROM exploded e LEFT JOIN vocab v ON e.token = v.token
        GROUP BY e.doc_id
    )
"""


def fresh_con(sf: str) -> "duckdb.DuckDBPyConnection":
    c = duckdb.connect()
    # Same memory discipline as check_queries.fresh_con (DuckDB's
    # effective default ceiling collapses beside a resident JVM).
    # Thread count env-overridable for the compute-bound checks (the
    # embedding_neardup chunk loop is pure cosine arithmetic) when the
    # host is otherwise idle.
    c.execute(f"SET threads={int(os.environ.get('SPARK_GRAFT_EXTRAS_DUCKDB_THREADS', '8'))}")
    c.execute("SET memory_limit='40GB'")
    c.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _frames_equal(a_pdf, e_pdf) -> bool:
    try:
        fast = cq.fast_frame_equal(a_pdf, e_pdf)
    except Exception:
        fast = None
    if fast is not None:
        if fast:
            return True
        # fast False → repr canon has the final word (same contract as
        # the main harness).
    return cq.canon(a_pdf) == cq.canon(e_pdf)


def _copurchase_pairs(spark, sf_dir):
    """The part co-purchase edge construction — mirrors
    queries/analytics_suite.py:ext_pagerank so the operator checks run
    on the identical graph."""
    from pyspark.sql import functions as F

    from gads_etl_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def _build_copurchase_tables(con) -> int:
    """Materialize lp → e → deg → ed in DuckDB (the AS MATERIALIZED CTE
    chain of the registered oracle, as real tables); returns |V|."""
    con.execute("""
        CREATE TABLE lp AS
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem""")
    con.execute("""
        CREATE TABLE e AS
        SELECT a.l_partkey AS src, b.l_partkey AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2""")
    con.execute("DROP TABLE lp")
    con.execute("""
        CREATE TABLE deg AS
        SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src""")
    con.execute("""
        CREATE TABLE ed AS
        SELECT e.src, e.dst, e.w, deg.outw FROM e JOIN deg USING (src)""")
    con.execute("DROP TABLE e")
    return con.execute("SELECT count(*) FROM deg").fetchone()[0]


def check_pagerank(spark, sf_dir: str, con) -> dict:
    """ext_pagerank vs a per-iteration-materialized DuckDB oracle."""
    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_pagerank"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = _build_copurchase_tables(con)
    # The teleport term is a pure integer function of (damping, scale,
    # n) — identical floor division in Python and SQL on positives.
    teleport = ((100 - _PR_DAMP) * _PR_SCALE) // (100 * n)
    con.execute(f"""
        CREATE TABLE r0 AS
        SELECT src AS node, CAST({_PR_SCALE} // {n} AS BIGINT) AS pr_scaled
        FROM deg""")
    for k in range(1, _PR_ITERS + 1):
        con.execute(f"""
            CREATE TABLE r{k} AS
            SELECT ed.dst AS node,
                   CAST({teleport}
                        + ({_PR_DAMP} * sum((CAST(r.pr_scaled AS HUGEINT)
                                             * ed.w) // ed.outw)) // 100
                        AS BIGINT) AS pr_scaled
            FROM ed JOIN r{k - 1} r ON r.node = ed.src
            GROUP BY ed.dst""")
        con.execute(f"DROP TABLE r{k - 1}")
    e_pdf = con.execute(
        f"SELECT node AS part_id, pr_scaled FROM r{_PR_ITERS}").fetchdf()
    con.execute(f"DROP TABLE r{_PR_ITERS}")
    t_duck = time.perf_counter() - t0

    ok = _frames_equal(a_pdf, e_pdf)
    return {
        "rows_match": len(a_pdf) == len(e_pdf),
        "schema_match": sorted(a_pdf.columns) == sorted(e_pdf.columns),
        "hash_match": ok, "spark_rows": len(a_pdf),
        "oracle_rows": len(e_pdf), "err": None,
        "method": "chunked-iterative-oracle (per-iteration materialized "
                  "tables, identical scaled-integer arithmetic)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


def check_components(spark, sf_dir: str, con) -> dict:
    """operators/graph.py:connected_components at 240M-edge scale vs a
    DuckDB materialized min-label fixpoint on the same co-purchase
    graph. ``ed`` must already exist (check_pagerank builds it); builds
    it if not."""
    from pyspark.sql import functions as F

    from gads_etl_spark.operators import graph as G

    t0 = time.perf_counter()
    pairs = _copurchase_pairs(spark, sf_dir)
    comps = G.connected_components(pairs, src="src", dst="dst")
    a_pdf = comps.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    ).toPandas()
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    have_ed = con.execute(
        "SELECT count(*) FROM information_schema.tables "
        "WHERE table_name = 'ed'").fetchone()[0]
    if not have_ed:
        _build_copurchase_tables(con)
    con.execute("""
        CREATE TABLE lab AS SELECT DISTINCT src AS node, src AS lbl FROM ed""")
    rounds = 0
    for rounds in range(1, 31):
        con.execute("""
            CREATE TABLE lab_next AS
            SELECT node, min(lbl) AS lbl FROM (
                SELECT node, lbl FROM lab
                UNION ALL
                SELECT e.dst AS node, l.lbl
                FROM lab l JOIN ed e ON e.src = l.node
            ) GROUP BY node""")
        changed = con.execute("""
            SELECT count(*) FROM lab_next n JOIN lab o USING (node)
            WHERE n.lbl <> o.lbl""").fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE lab_next RENAME TO lab")
        if changed == 0:
            break
    e_pdf = con.execute(
        "SELECT node, lbl AS component FROM lab").fetchdf()
    con.execute("DROP TABLE lab")
    t_duck = time.perf_counter() - t0

    ok = _frames_equal(a_pdf, e_pdf)
    return {
        "rows_match": len(a_pdf) == len(e_pdf),
        "schema_match": sorted(a_pdf.columns) == sorted(e_pdf.columns),
        "hash_match": ok, "spark_rows": len(a_pdf),
        "oracle_rows": len(e_pdf), "err": None,
        "method": "operator-level: Spark min-label propagation vs DuckDB "
                  f"materialized fixpoint ({rounds} rounds) on the part "
                  "co-purchase graph (dense giant component)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


def _materialize_vocab(con) -> None:
    con.execute(f"CREATE TABLE vocab AS {_VOCAB_SQL}")


def check_encode_docs(spark, sf_dir: str, con, n_slices: int = 16) -> dict:
    """ext_encode_docs: full Spark run, DuckDB verified slice by slice
    against the materialized vocabulary. Union of slices = full corpus."""
    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_encode_docs"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    _materialize_vocab(con)
    ok, checked, schema_ok = True, 0, True
    for k in range(n_slices):
        sql = (_ENC_SLICE_SQL.format(pred=f"doc_id % {n_slices} = {k}")
               + "SELECT doc_id, array_to_string(token_ids, ' ') "
                 "AS token_ids FROM enc")
        e_slice = con.execute(sql).fetchdf()
        a_slice = a_pdf[a_pdf["doc_id"] % n_slices == k].reset_index(
            drop=True)
        # Documents whose every token is empty-after-split never enter
        # ``exploded``; the Spark side emits them with an empty list.
        # Align: drop empty encodings from the Spark slice.
        a_slice = a_slice[a_slice["token_ids"] != ""].reset_index(drop=True)
        checked += len(e_slice)
        schema_ok = schema_ok and (
            sorted(a_slice.columns) == sorted(e_slice.columns))
        if not _frames_equal(a_slice, e_slice):
            ok = False
            break
        del e_slice, a_slice
        gc.collect()
    con.execute("DROP TABLE vocab")
    t_duck = time.perf_counter() - t0

    n_nonempty = int((a_pdf["token_ids"] != "").sum())
    return {
        "rows_match": checked == n_nonempty,
        "schema_match": schema_ok,
        "hash_match": ok and checked == n_nonempty,
        "spark_rows": len(a_pdf), "oracle_rows": checked, "err": None,
        "method": f"sliced full parity ({n_slices} doc_id slices against "
                  "a once-materialized vocabulary table; union of slices "
                  "= whole corpus; empty encodings compared by count)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


def check_block_pack(spark, sf_dir: str, con, n_shards: int = 4,
                     block_size: int = 64) -> dict:
    """ext_block_pack: full Spark run; per-shard oracle restatement plus
    corpus-wide conservation invariants."""
    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_block_pack"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    _materialize_vocab(con)
    ok = True
    schema_ok = True
    notes = []
    checked = 0
    for s in range(n_shards):
        sql = (_ENC_SLICE_SQL.format(pred=f"doc_id % {n_shards} = {s}") + f"""
            , sh AS (
                SELECT CAST({s} AS BIGINT) AS shard, doc_id, token_ids,
                       CAST(len(token_ids) AS BIGINT) AS l
                FROM enc WHERE len(token_ids) > 0
            ), cum AS (
                SELECT *, COALESCE(SUM(l) OVER (PARTITION BY shard
                           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS s
                FROM sh
            ), spans AS (
                SELECT shard, doc_id, token_ids, l, s,
                       unnest(generate_series(
                           CAST(floor(s / {block_size}) AS BIGINT),
                           CAST(floor((s + l - 1) / {block_size}) AS BIGINT)))
                           AS block_id
                FROM cum
            ), frags AS (
                SELECT shard, block_id,
                       GREATEST(s, block_id * {block_size}) AS lo,
                       LEAST(s + l, (block_id + 1) * {block_size}) AS hi,
                       token_ids, s
                FROM spans
            )
            SELECT shard, block_id,
                   array_to_string(
                       flatten(list(token_ids[CAST(lo - s + 1 AS BIGINT)
                                              :CAST(hi - s AS BIGINT)]
                                    ORDER BY lo)), ' ') AS token_ids,
                   CAST(SUM(hi - lo) AS BIGINT) AS n_tokens
            FROM frags GROUP BY shard, block_id""")
        e_shard = con.execute(sql).fetchdf()
        a_shard = a_pdf[a_pdf["shard"] == s].reset_index(drop=True)
        checked += len(e_shard)
        schema_ok = schema_ok and (
            sorted(a_shard.columns) == sorted(e_shard.columns))
        if not _frames_equal(a_shard, e_shard):
            ok = False
            notes.append(f"shard {s} mismatch")
            break
        del e_shard, a_shard
        gc.collect()

    # Conservation invariants — list-free DuckDB scalars over the FULL
    # corpus, so they hold independently of the per-shard restatement.
    n_tokens_corpus = con.execute("""
        SELECT count(*) FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS token
            FROM documents) WHERE token <> ''""").fetchone()[0]
    con.execute("DROP TABLE vocab")
    spark_tokens = int(a_pdf["n_tokens"].sum())
    if spark_tokens != n_tokens_corpus:
        ok = False
        notes.append(f"token conservation violated: blocks carry "
                     f"{spark_tokens}, corpus has {n_tokens_corpus}")
    # Fullness + contiguity per shard (pandas over the block frame).
    for s, grp in a_pdf.groupby("shard"):
        bids = grp["block_id"].sort_values().to_numpy()
        if not (bids == range(len(bids))).all():
            ok = False
            notes.append(f"shard {s}: block ids not contiguous from 0")
        full = grp[grp["block_id"] < grp["block_id"].max()]
        if not (full["n_tokens"] == block_size).all():
            ok = False
            notes.append(f"shard {s}: non-final block not full")
    t_duck = time.perf_counter() - t0

    return {
        "rows_match": checked == len(a_pdf),
        "schema_match": schema_ok,
        "hash_match": ok and checked == len(a_pdf),
        "spark_rows": len(a_pdf), "oracle_rows": checked,
        "err": "; ".join(notes) or None,
        "method": f"per-shard oracle restatement ({n_shards} independent "
                  "shards over the materialized vocabulary) + corpus-wide "
                  "conservation invariants (token conservation, block "
                  "fullness, block-id contiguity)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


def check_winnow(spark, sf_dir: str, con, n_slices: int = 16) -> dict:
    """ext_winnow_fingerprint: full Spark run; the registered oracle
    re-run per doc_id slice. The oracle's window partitions by doc_id
    (PARTITION BY doc_id), so restricting ``documents`` to a slice
    changes nothing about any row it produces — the restatement is the
    IDENTICAL statement over a partition of its input, and the union of
    the 16 slices is the whole corpus (full parity). The single-
    statement form was cut at >45 min at this tier (165M unnested grams
    in one window sort); each slice sorts ~10M."""
    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_winnow_fingerprint"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    slice_sql = """
        WITH g AS (
            SELECT doc_id, t.i,
                   md5(substring(text, CAST(t.i AS INT), 4)) AS h,
                   greatest(length(text) - 3, 1) AS ng
            FROM documents,
                 LATERAL unnest(generate_series(
                     1, greatest(length(text) - 3, 1))) AS t(i)
            WHERE doc_id % {n} = {k}
        ), w AS (
            SELECT doc_id, i, ng,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                       AS wmin
            FROM g
        ), fp AS (
            SELECT DISTINCT doc_id, wmin FROM w
            WHERE i <= greatest(ng - 3, 1)
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
               min(wmin) AS min_fp, max(wmin) AS max_fp
        FROM fp GROUP BY doc_id
    """
    t0 = time.perf_counter()
    ok, checked, schema_ok = True, 0, True
    for k in range(n_slices):
        e_slice = con.execute(slice_sql.format(n=n_slices, k=k)).fetchdf()
        a_slice = a_pdf[a_pdf["doc_id"] % n_slices == k].reset_index(
            drop=True)
        checked += len(e_slice)
        schema_ok = schema_ok and (
            sorted(a_slice.columns) == sorted(e_slice.columns))
        if not _frames_equal(a_slice, e_slice):
            ok = False
            break
        del e_slice, a_slice
        gc.collect()
    t_duck = time.perf_counter() - t0
    return {
        "rows_match": checked == len(a_pdf), "schema_match": schema_ok,
        "hash_match": ok and checked == len(a_pdf),
        "spark_rows": len(a_pdf), "oracle_rows": checked, "err": None,
        "method": f"registered oracle re-run per doc_id slice "
                  f"({n_slices} slices; window partitions by doc_id so "
                  "slicing is exact; union of slices = whole corpus)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


#: The dup-span detection CTE chain shared by ext_dup_spans /
#: ext_strip_dup_spans oracles — materialized once as a real table for
#: the sliced strip check (cross-document gram counts are global; only
#: the REBUILD decomposes by document).
_SPANS_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(t, i, i + 7), ' ') AS gram
      FROM toks, LATERAL unnest(generate_series(1, greatest(len(t) - 7, 0))) AS u(i)
    ), d AS (
      SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ), h AS (
      SELECT doc_id, pos, pos + 7 AS e FROM g JOIN d USING (gram)
    ), m AS (
      SELECT doc_id, pos, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM h
    ), isl AS (
      SELECT doc_id, pos, e,
             sum(CASE WHEN prev_max IS NULL OR pos > prev_max + 1
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM m
    )
    SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
    FROM isl GROUP BY doc_id, island
"""


def check_strip_dup_spans(spark, sf_dir: str, con,
                          n_slices: int = 16) -> dict:
    """ext_strip_dup_spans: full Spark run; the oracle split into its
    two halves. Span DETECTION is global (cross-document gram counts)
    and is materialized once — the identical CTE chain the registered
    oracle states, and itself sf10-verified by ext_dup_spans in the
    main sweep. Text REBUILD is per-document, so it runs per doc_id
    slice against the materialized spans (the round-12 probe showed
    DuckDB OOMs rebuilding all 500k texts in one statement; each slice
    rebuilds ~31k). Union of slices = whole corpus: full parity."""
    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_strip_dup_spans"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    con.execute(f"CREATE TABLE spans AS {_SPANS_SQL}")
    rebuild_sql = """
        WITH dd AS (
          SELECT doc_id, text FROM documents WHERE doc_id % {n} = {k}
        ), toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM dd
        ), tok AS (
          SELECT doc_id, i AS pos, t[i] AS tok
          FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
        ), keepers AS (
          SELECT tok.doc_id, pos, tok FROM tok
          WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = tok.doc_id
              AND pos BETWEEN s.span_start AND s.span_end)
        ), agg AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS n_kept
          FROM keepers GROUP BY doc_id
        )
        SELECT dd.doc_id, coalesce(agg.clean_text, '') AS clean_text,
               CAST(len(string_split(dd.text, ' ')) - coalesce(agg.n_kept, 0)
                    AS BIGINT) AS n_removed_tokens
        FROM dd LEFT JOIN agg USING (doc_id)
    """
    ok, checked, schema_ok = True, 0, True
    for k in range(n_slices):
        e_slice = con.execute(rebuild_sql.format(n=n_slices, k=k)).fetchdf()
        a_slice = a_pdf[a_pdf["doc_id"] % n_slices == k].reset_index(
            drop=True)
        checked += len(e_slice)
        schema_ok = schema_ok and (
            sorted(a_slice.columns) == sorted(e_slice.columns))
        if not _frames_equal(a_slice, e_slice):
            ok = False
            break
        del e_slice, a_slice
        gc.collect()
    con.execute("DROP TABLE spans")
    t_duck = time.perf_counter() - t0
    return {
        "rows_match": checked == len(a_pdf), "schema_match": schema_ok,
        "hash_match": ok and checked == len(a_pdf),
        "spark_rows": len(a_pdf), "oracle_rows": checked, "err": None,
        "method": f"global span detection materialized once (identical "
                  f"CTE chain; independently sf10-verified by "
                  f"ext_dup_spans), per-document rebuild verified in "
                  f"{n_slices} doc_id slices (full parity)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


def check_embedding_neardup(spark, sf_dir: str, con,
                            n_slices: int = 8) -> dict:
    """ext_embedding_neardup: full Spark run; the oracle's per-label
    argmax decomposed over slice-pair chunks. vec_id % n partitions
    every within-label pair into exactly one (min-slice, max-slice)
    chunk; each chunk yields its per-label best candidate and the
    global per-label argmax is the reduction of the ~n²/2 candidate
    sets under the registered tiebreak (cos desc, a_id, b_id) — an
    exact decomposition of an associative argmax, never a sample.

    The chunked oracle scores with DuckDB's native
    ``list_cosine_similarity`` instead of the registered lambda
    formulation (~5x faster over the tier's ~2e9 pairs); the two are
    verified cell-identical inside this check on a bounded pair subset
    before any chunk runs, and the surviving 10 rows are compared
    against Spark exactly as always.

    Two disk-discipline lessons from the first 100x probe (round 13):
    each chunk reduces via a STREAMING ``arg_max`` aggregate, not a
    ``row_number`` window (the window materializes the chunk's scored
    pairs into temp — the probe exhausted 50 GB of spill), and each
    chunk runs on its OWN connection so any temp a chunk does create
    is released with the connection instead of accumulating across
    the n²/2 loop."""
    import pandas as pd

    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_embedding_neardup"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    # Guard table lives in try/finally: if the guard query itself
    # raises, v must not leak on the shared connection every later
    # check in this run reuses (round-13 advice).
    con.execute("""
        CREATE TABLE v AS
        SELECT label, vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings""")
    # Native-vs-lambda identity guard on a bounded subset (all
    # within-label pairs among the first 2000 vec_ids).
    lam = """
        round(
          list_reduce(list_transform(generate_series(1, 64),
                                     i -> a.emb[i] * b.emb[i]),
                      (acc, x) -> acc + x)
          / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                                             i -> a.emb[i] * a.emb[i]),
                              (acc, x) -> acc + x))
             * sqrt(list_reduce(list_transform(generate_series(1, 64),
                                               i -> b.emb[i] * b.emb[i]),
                                (acc, x) -> acc + x))), 6)
    """
    try:
        bad = con.execute(f"""
            SELECT count(*) FROM v a JOIN v b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE a.vec_id < 2000 AND b.vec_id < 2000
              AND ({lam}) IS DISTINCT FROM
                  round(list_cosine_similarity(a.emb, b.emb), 6)
        """).fetchone()[0]
    finally:
        con.execute("DROP TABLE v")
    if bad:
        return {"rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(a_pdf),
                "oracle_rows": None,
                "err": f"native cosine != lambda on {bad} guard pairs",
                "method": "errored"}
    # Streaming per-chunk reduction: arg_max over the registered total
    # order ((cos_sim, -a_id, -b_id) lexicographic — struct comparison)
    # needs O(|labels|) state instead of materializing the chunk's
    # scored pairs for a window sort. Each chunk gets a fresh
    # connection so whatever temp it creates dies with it.
    chunk_sql = """
        WITH v AS (
            SELECT label, vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        )
        SELECT label,
               -best.na AS a_id, -best.nb AS b_id, best.c AS cos_sim
        FROM (
            -- max over a struct is lexicographic on its fields, so the
            -- key (c, -a_id, -b_id) IS the registered total order (max
            -- cos, then min a_id, then min b_id) and determines the
            -- pair, so no extra payload fields are needed.
            SELECT a.label AS label,
                   max(struct_pack(
                       c := round(list_cosine_similarity(a.emb, b.emb), 6),
                       na := -a.vec_id, nb := -b.vec_id)) AS best
            FROM v a JOIN v b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE least(a.vec_id % {n}, b.vec_id % {n}) = {i}
              AND greatest(a.vec_id % {n}, b.vec_id % {n}) = {j}
            GROUP BY a.label
        )
    """
    cands = []
    for i in range(n_slices):
        for j in range(i, n_slices):
            c = fresh_con(sf_dir)
            try:
                cands.append(c.execute(
                    chunk_sql.format(n=n_slices, i=i, j=j)).fetchdf())
            finally:
                c.close()
            gc.collect()
    allc = pd.concat(cands, ignore_index=True)
    # Reduce to the registered projection under the registered tiebreak.
    allc = allc.sort_values(
        ["label", "cos_sim", "a_id", "b_id"],
        ascending=[True, False, True, True], kind="mergesort")
    e_pdf = allc.groupby("label", as_index=False).head(1).reset_index(
        drop=True)
    t_duck = time.perf_counter() - t0

    ok = _frames_equal(a_pdf, e_pdf)
    return {
        "rows_match": len(a_pdf) == len(e_pdf),
        "schema_match": sorted(a_pdf.columns) == sorted(e_pdf.columns),
        "hash_match": ok, "spark_rows": len(a_pdf),
        "oracle_rows": len(e_pdf), "err": None,
        "method": f"slice-pair chunked STREAMING arg_max ({n_slices} "
                  "vec_id slices, exact partition of all within-label "
                  "pairs; per-chunk fresh connection; native "
                  "list_cosine_similarity guard-verified cell-identical "
                  "to the registered lambda before scoring)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


def check_shingle_jaccard(spark, sf_dir: str, con,
                          n_slices: int = 20) -> dict:
    """ext_shingle_jaccard: full Spark run; the registered oracle re-run
    per source-slice. Pairs only form within a source block (the
    equi-join key: ``a.source = b.source``), so restricting
    ``documents`` to a subset of sources yields exactly the full
    result's pairs among those sources — the restatement is the
    IDENTICAL statement over a partition of its input. Distinct sources
    are hash-assigned to ``n_slices`` chunks (DuckDB's own ``hash()``
    on both sides, so the partition can't skew between engines), and
    the union of the chunks is the whole corpus: full parity. The
    single-statement form builds 500k shingle lists and ~62M
    list_intersects in one pipeline at this tier (2000 blocks of 250
    docs); each chunk handles 1/n of both."""
    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_shingle_jaccard"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    oracle = REGISTRY["ext_shingle_jaccard"].oracle
    # The registered statement verbatim, with documents restricted to
    # one hash slice of sources.
    pred = "hash(source) % {n} = {k}"
    sliced = oracle.replace("FROM documents",
                            "FROM documents WHERE " + pred)
    assert sliced != oracle and sliced.count("WHERE " + pred) == 1

    # The same hash assigns each Spark pair (via its a-side doc) to its
    # slice — one DuckDB scan, merged driver-side.
    doc_slice = con.execute(
        f"SELECT doc_id AS a_id, CAST(hash(source) % {n_slices} AS INT) "
        f"AS _slc FROM documents").fetchdf()
    a_tag = a_pdf.merge(doc_slice, on="a_id", how="left")

    t0 = time.perf_counter()
    ok, checked, schema_ok = True, 0, True
    for k in range(n_slices):
        e_slice = con.execute(sliced.format(n=n_slices, k=k)).fetchdf()
        a_slice = (a_tag[a_tag["_slc"] == k]
                   .drop(columns=["_slc"]).reset_index(drop=True))
        checked += len(e_slice)
        schema_ok = schema_ok and (
            sorted(a_slice.columns) == sorted(e_slice.columns))
        if not _frames_equal(a_slice, e_slice):
            ok = False
            break
        del e_slice, a_slice
        gc.collect()
    t_duck = time.perf_counter() - t0
    return {
        "rows_match": checked == len(a_pdf), "schema_match": schema_ok,
        "hash_match": ok and checked == len(a_pdf),
        "spark_rows": len(a_pdf), "oracle_rows": checked, "err": None,
        "method": f"registered oracle re-run per source-slice "
                  f"({n_slices} hash(source) slices; pairs form only "
                  "within a source, so slicing is exact; union of "
                  "slices = whole corpus)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


def check_passjoin(spark, sf_dir: str, con) -> dict:
    """ext_fuzzy_passjoin at the 100x tier. Its registered oracle IS the
    per-block quadratic join — ~2e10 raw candidate pairs here (150
    (p_type, p_brand) blocks of ~16.5k parts), genuinely intractable in
    any engine — so this check certifies the engine result from three
    independent directions instead of restating the quadratic:

    1. SOUNDNESS, exhaustive: every emitted pair is re-verified by
       DuckDB — same block, canonical a_id < b_id order, no duplicate
       pairs, and ``levenshtein(a_name, b_name)`` equal to the emitted
       edit_dist and <= 2. Linear in |output| (3.7M pairs), and
       levenshtein is recomputed from the raw table, so a wrong pair,
       a wrong distance, or a phantom id all fail loudly.
    2. COMPLETENESS on sampled blocks, exact: for 3 full (p_type,
       p_brand) blocks the registered quadratic oracle runs verbatim
       (one ~16.5k-row block is tractable alone); the engine's pairs
       restricted to those blocks must match the oracle's EXACTLY —
       end-to-end parity on a bounded sub-corpus, segment theory not
       assumed.
    3. COMPLETENESS on planted pairs, corpus-wide: 500 parts get a
       one-character-substitution copy (ids offset by max+1, the
       collision-free convention); PassJoin over part UNION copies must
       recall every planted (original, copy) pair with edit_dist 1 —
       a known-answer subset spanning every block of the full corpus.
    """
    from pyspark.sql import functions as SF

    from gads_etl_spark.catalog import load_table
    from gads_etl_spark.operators.dedup import edit_distance_pairs_passjoin
    from gads_etl_spark.queries import REGISTRY

    t0 = time.perf_counter()
    a_pdf = REGISTRY["ext_fuzzy_passjoin"].fn(spark, sf_dir).toPandas()
    t_spark = time.perf_counter() - t0

    notes = []
    ok = True
    t0 = time.perf_counter()
    con.execute("CREATE TABLE pj AS SELECT * FROM a_pdf")
    # 1. Exhaustive soundness.
    n_bad = con.execute("""
        SELECT count(*) FROM pj
        LEFT JOIN part a ON a.p_partkey = pj.a_id
        LEFT JOIN part b ON b.p_partkey = pj.b_id
        WHERE a.p_partkey IS NULL OR b.p_partkey IS NULL
           OR pj.a_id >= pj.b_id
           OR a.p_type <> b.p_type OR a.p_brand <> b.p_brand
           OR levenshtein(a.p_name, b.p_name) <> pj.edit_dist
           OR pj.edit_dist > 2""").fetchone()[0]
    n_dup = con.execute("""
        SELECT count(*) FROM (
            SELECT a_id, b_id FROM pj GROUP BY 1, 2 HAVING count(*) > 1
        )""").fetchone()[0]
    if n_bad or n_dup:
        ok = False
        notes.append(f"soundness: {n_bad} invalid pairs, {n_dup} dupes")

    # 2. Exact parity on 3 full blocks (first by key order — arbitrary
    # but deterministic).
    blocks = con.execute("""
        SELECT DISTINCT p_type, p_brand FROM part
        ORDER BY p_type, p_brand LIMIT 3""").fetchall()
    checked_block_pairs = 0
    for p_type, p_brand in blocks:
        e_blk = con.execute("""
            SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
                   CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
            FROM part a JOIN part b
              ON a.p_type = b.p_type AND a.p_brand = b.p_brand
             AND a.p_partkey < b.p_partkey
             AND abs(length(a.p_name) - length(b.p_name)) <= 2
             AND levenshtein(a.p_name, b.p_name) <= 2
            WHERE a.p_type = ? AND a.p_brand = ?""",
            [p_type, p_brand]).fetchdf()
        a_blk = con.execute("""
            SELECT pj.* FROM pj JOIN part a ON a.p_partkey = pj.a_id
            WHERE a.p_type = ? AND a.p_brand = ?""",
            [p_type, p_brand]).fetchdf()
        checked_block_pairs += len(e_blk)
        if not _frames_equal(a_blk, e_blk):
            ok = False
            notes.append(f"block ({p_type!r},{p_brand!r}) mismatch: "
                         f"engine {len(a_blk)} vs oracle {len(e_blk)}")
    con.execute("DROP TABLE pj")

    # 3. Planted-pair completeness, corpus-wide.
    part = load_table(spark, sf_dir, "part").select(
        SF.col("p_partkey").alias("pid"), "p_name", "p_type", "p_brand")
    off = part.agg(SF.max("pid")).first()[0] + 1
    planted = (
        part.where(SF.pmod(SF.col("pid"), SF.lit(4000)) == 0)
        .select((SF.col("pid") + off).alias("pid"),
                # One substitution at position 1: 'x' unless it already
                # is one, then 'y' — always exactly 1 edit.
                SF.concat(
                    SF.when(SF.substring("p_name", 1, 1) == "x",
                            SF.lit("y")).otherwise(SF.lit("x")),
                    SF.expr("substring(p_name, 2)")).alias("p_name"),
                "p_type", "p_brand"))
    n_planted = planted.count()
    got = edit_distance_pairs_passjoin(
        part.unionByName(planted), block_cols=["p_type", "p_brand"],
        id_col="pid", name_col="p_name", max_dist=2)
    n_recalled = got.where(
        (SF.col("b_id") - SF.col("a_id") == off)
        & (SF.col("edit_dist") == 1)).count()
    if n_recalled < n_planted:
        ok = False
        notes.append(f"planted recall {n_recalled}/{n_planted}")
    t_duck = time.perf_counter() - t0

    return {
        "rows_match": True, "schema_match": sorted(a_pdf.columns)
                                            == ["a_id", "b_id", "edit_dist"],
        "hash_match": ok, "spark_rows": len(a_pdf),
        "oracle_rows": checked_block_pairs, "err": "; ".join(notes) or None,
        "method": "three-way certificate: exhaustive soundness (every "
                  "emitted pair re-verified incl. levenshtein), exact "
                  "quadratic parity on 3 full blocks, corpus-wide planted-"
                  f"pair recall ({n_planted} one-edit plants)",
        "spark_sec": round(t_spark, 1), "oracle_sec": round(t_duck, 1),
    }


CHECKS = {
    "ext_pagerank": check_pagerank,
    "connected_components": check_components,
    "ext_encode_docs": check_encode_docs,
    "ext_block_pack": check_block_pack,
    "ext_winnow_fingerprint": check_winnow,
    "ext_strip_dup_spans": check_strip_dup_spans,
    "ext_embedding_neardup": check_embedding_neardup,
    "ext_shingle_jaccard": check_shingle_jaccard,
    "ext_fuzzy_passjoin": check_passjoin,
}


def main() -> int:
    argv = sys.argv[1:]
    sf = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".localdata", "sf10")
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    names = [a for a in argv if not a.startswith("--")] or list(CHECKS)
    if not os.path.isdir(sf):
        print(f"{sf} missing — scripts/gen_scale_fixture.py --factor 100 "
              f"--dst {sf}")
        return 2

    from gads_etl_spark.session import get_session

    # 8 threads keeps the usual run inside half the host beside DuckDB;
    # SPARK_GRAFT_EXTRAS_CPUS=32 for the Spark-heavy checks (the
    # embedding_neardup Spark side is ~2e9 interpreted-HOF cosines —
    # 4x threads is 4x wall) when the host is otherwise idle.
    spark = get_session("check-sf10-extras", cpus=int(
        os.environ.get("SPARK_GRAFT_EXTRAS_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    default_sf10 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".localdata", "sf10")
    if out_path is None:
        if os.path.abspath(sf) == os.path.abspath(default_sf10):
            out_path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "CORRECTNESS_sf10_extras.json")
        else:
            # A validation run against some other tier must never
            # overwrite the committed 100x artifact.
            out_path = f"/tmp/sf10_extras_{os.path.basename(sf.rstrip('/'))}.json"
            print(f"non-sf10 --sf: writing {out_path} instead of the "
                  "committed artifact")
    records: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            records = json.load(fh)
        # A renamed or removed check must not leave its stale record in
        # the committed artifact forever (ADVICE r12): keep only keys
        # this script still knows how to (re)produce.
        records = {k: v for k, v in records.items() if k in CHECKS}
    failures = 0
    for name in names:
        # ed is shared between the two graph checks; everything else
        # gets a fresh connection (and the graph pair share one).
        con = fresh_con(sf)
        t0 = time.perf_counter()
        try:
            rec = CHECKS[name](spark, sf, con)
        except Exception as exc:
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None, "err": repr(exc)[:500],
                   "method": "errored"}
        finally:
            try:
                con.close()
            except Exception:
                pass
        records[name] = rec
        status = "MATCH" if rec["hash_match"] else "MISMATCH"
        print(f"{name:28s} {status} spark={rec['spark_rows']} "
              f"oracle={rec['oracle_rows']} "
              f"({time.perf_counter() - t0:.0f}s) err={rec['err']}")
        if not rec["hash_match"]:
            failures += 1
        with open(out_path, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=True)
            fh.write("\n")
        gc.collect()
    print(f"{failures} failures / {len(names)} checked -> {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
