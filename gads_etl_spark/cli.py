"""CLI: the reference's command surface over the Spark engine.

Mirrors the reference Typer app (src/gads_etl/cli.py) command-for-command
with argparse (no extra dependency):

    daily | catch-up
    state inspect | retry | mark-terminal | backfill
    observe state | freshness | retries
    warehouse load
    consume preview

Every command is a thin shell over the batch primitives (ControlPlane,
WarehouseLoader, observe aggregations) — the CLI does argument parsing and
printing, never data logic, so the same operations drive programmatic use.
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date

from pyspark.sql import functions as F


def _date(s: str | None):
    return date.fromisoformat(s) if s else None


def _stores(args):
    from gads_etl_spark.pipeline import PointerStore, StateStore
    from gads_etl_spark.session import get_session

    spark = get_session("gads-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return (
        spark,
        StateStore(spark, args.state_root),
        PointerStore(spark, args.pointer_root),
    )


def _emit(rows, as_json: bool) -> None:
    if as_json:
        print(json.dumps(rows, default=str))
    else:
        for r in rows:
            print("  " + " ".join(f"{k}={v}" for k, v in r.items()))


def cmd_state_inspect(args) -> int:
    _, states, _ = _stores(args)
    df = states.list_states(
        status=args.status, customer_id=args.customer_id,
        query_name=args.query_name, since=_date(args.since),
        until=_date(args.until), limit=args.limit,
    )
    rows = [r.asDict() for r in df.collect()]
    print(f"{len(rows)} partition state record(s)")
    _emit(rows, args.json)
    return 0


def _run_control(args, op) -> int:
    from gads_etl_spark.pipeline import (
        ControlPlane,
        ThresholdExceededError,
        UnfilteredMutationError,
    )

    _, states, _ = _stores(args)
    cp = ControlPlane(states)
    try:
        res = op(cp)
    except (UnfilteredMutationError, ThresholdExceededError) as exc:
        print(str(exc), file=sys.stderr)
        return 1
    print(json.dumps(res.as_dict()))
    return 0


def cmd_state_retry(args) -> int:
    return _run_control(args, lambda cp: cp.retry(
        customer_id=args.customer_id, query_name=args.query_name,
        since=_date(args.since), until=_date(args.until),
        dry_run=args.dry_run, force=args.force,
        clear_terminal=args.clear_terminal,
    ))


def cmd_state_mark_terminal(args) -> int:
    return _run_control(args, lambda cp: cp.mark_terminal(
        customer_id=args.customer_id, query_name=args.query_name,
        since=_date(args.since), until=_date(args.until),
        dry_run=args.dry_run, force=args.force,
    ))


def cmd_state_backfill(args) -> int:
    return _run_control(args, lambda cp: cp.backfill(
        customer_id=args.customer_id, query_name=args.query_name,
        since=_date(args.since), until=_date(args.until),
        dry_run=args.dry_run, force_pending=args.force_pending,
        force=args.force,
    ))


def cmd_warehouse_load(args) -> int:
    from gads_etl_spark.pipeline import WarehouseLoader

    _, states, pointers = _stores(args)
    plan = WarehouseLoader(states, pointers).run()
    c = plan.counts()
    print(
        f"Warehouse reconciliation complete | loads={c['load']} "
        f"replacements={c['replace']} demotions={c['demote']}"
    )
    return 0


def cmd_observe_state(args) -> int:
    _, states, _ = _stores(args)
    df = states.read()
    total = df.count()
    if not total:
        print("No partition state records found.")
        return 0
    print(f"Total logical partitions: {total}")
    print("Status counts:")
    counts = {r["status"]: r["n"] for r in
              df.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    for status in ("pending", "success", "failed"):
        print(f"  {status}: {counts.get(status, 0)}")
    a = F.coalesce(F.col("attempt_count"), F.lit(0))
    stats = df.agg(F.min(a).alias("mn"), F.max(a).alias("mx"),
                   (F.sum(a) / F.count(F.lit(1))).alias("avg")).collect()[0]
    print(f"Attempt counts: min={stats.mn} max={stats.mx} avg={stats.avg:.2f}")
    return 0


def cmd_observe_freshness(args) -> int:
    _, states, _ = _stores(args)
    success = states.read().where(F.col("status") == "success")
    rows = (
        success.groupBy("source", "query_name")
        .agg(F.min("logical_date").alias("earliest"),
             F.max("logical_date").alias("latest"),
             F.countDistinct("logical_date").alias("total"))
        .orderBy("source", "query_name")
        .collect()
    )
    if not rows:
        print("No successful partitions found.")
        return 0
    for r in rows:
        print(f"{r.source} / {r.query_name}")
        print(f"  earliest: {r.earliest}")
        print(f"  latest: {r.latest}")
        print(f"  total_successful_partitions: {r.total}")
    return 0


def cmd_observe_retries(args) -> int:
    _, states, _ = _stores(args)
    df = states.read()
    total = df.count()
    if not total:
        print("No partition state records found.")
        return 0
    failed = F.col("status") == "failed"
    terminal = F.coalesce(F.col("error_message"), F.lit("")).contains("[terminal]")
    a = F.coalesce(F.col("attempt_count"), F.lit(0))
    s = df.agg(
        F.count(F.when(failed, 1)).alias("failed"),
        F.count(F.when(failed & terminal, 1)).alias("terminal"),
        F.count(F.when(failed & ~terminal, 1)).alias("retryable"),
        F.min(a).alias("mn"), F.max(a).alias("mx"),
        (F.sum(a) / F.count(F.lit(1))).alias("avg"),
    ).collect()[0]
    print("Retry overview")
    print(f"  total partitions: {total}")
    print(f"  failed partitions: {s.failed}")
    print(f"  terminal partitions: {s.terminal}")
    print(f"  retryable failed partitions: {s.retryable}")
    print(f"  attempt counts: min={s.mn} max={s.mx} avg={s.avg:.2f}")
    bucket = (F.when(a <= 2, "1-2").when(a <= 5, "3-5")
              .when(a <= 10, "6-10").otherwise("10+"))
    hist = {r["bucket"]: r["n"] for r in
            df.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n")).collect()}
    print("  attempt histogram:")
    for label in ("1-2", "3-5", "6-10", "10+"):
        print(f"    {label}: {hist.get(label, 0)}")
    return 0


def cmd_consume_preview(args) -> int:
    from gads_etl_spark.pipeline.consumer import preview
    from gads_etl_spark.pipeline.raw_sink import RawZone

    spark, _, pointers = _stores(args)
    raw = RawZone(spark, args.raw_root)
    rows = [r.asDict() for r in
            preview(raw, pointers, sample_rows=args.sample_rows).collect()]
    print(f"{len(rows)} preview row(s)")
    _emit(rows, args.json)
    return 0


def _parse_check(spec: str):
    """``kind:args`` check DSL → a dq.py constraint.

    not_null:col | unique:col[+col...] | in_set:col:v1|v2 |
    in_range:col:lo:hi | matches:col:regex
    Range bounds parse as numbers when they look numeric, else strings.
    """
    from gads_etl_spark.operators import dq

    kind, _, rest = spec.partition(":")
    if kind in ("not_null", "unique", "in_set", "in_range", "matches") and not rest:
        raise SystemExit(f"malformed check {spec!r}: expected {kind}:ARGS")
    if kind == "not_null":
        return dq.not_null(rest)
    if kind == "unique":
        return dq.unique(*rest.split("+"))
    if kind == "in_set":
        col, sep, vals = rest.partition(":")
        if not sep or not vals:
            raise SystemExit(
                f"malformed check {spec!r}: expected in_set:COL:V1|V2")
        return dq.in_set(col, tuple(vals.split("|")))
    if kind == "in_range":
        parts = rest.split(":")
        if len(parts) != 3 or not all(parts):
            raise SystemExit(
                f"malformed check {spec!r}: expected in_range:COL:LO:HI")
        col, lo, hi = parts

        def num(x):
            try:
                return int(x)
            except ValueError:
                try:
                    return float(x)
                except ValueError:
                    return x

        return dq.in_range(col, num(lo), num(hi))
    if kind == "matches":
        col, sep, regex = rest.partition(":")
        if not sep or not regex:
            raise SystemExit(
                f"malformed check {spec!r}: expected matches:COL:REGEX")
        return dq.matches(col, regex)
    raise SystemExit(f"unknown check kind {kind!r} in {spec!r}")


def _read_table(args):
    """Session + format-dispatched read of --table for the dq commands."""
    from gads_etl_spark.session import get_session

    spark = get_session("gads-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    reader = spark.read
    return (reader.parquet(args.table) if args.format == "parquet"
            else reader.orc(args.table) if args.format == "orc"
            else reader.json(args.table))


def cmd_dq_check(args) -> int:
    """Run declarative data-quality checks against any table path;
    exit 1 when any check reports violations (the CI-gate contract)."""
    from gads_etl_spark.operators import dq

    df = _read_table(args)
    checks = [_parse_check(s) for s in args.check]
    rows = [r.asDict() for r in dq.run_checks(df, checks).collect()]
    _emit(rows, args.json)
    failed = [r for r in rows if r["n_violations"]]
    print(f"{len(rows) - len(failed)}/{len(rows)} checks passed")
    return 1 if failed else 0


def cmd_dq_profile(args) -> int:
    """One-pass column profile of any table path (HLL distinct counts;
    --exact opts into exact multi-distinct for small tables)."""
    from gads_etl_spark.operators import dq

    df = _read_table(args)
    cols = args.columns.split(",") if args.columns else None
    rows = [r.asDict() for r in
            dq.profile_columns(df, cols, exact_distinct=args.exact).collect()]
    _emit(rows, args.json)
    return 0


def cmd_state_vacuum(args) -> int:
    """Drop old control-table versions (state + pointers), keeping the
    newest N — the retention knob for the versioned ledgers."""
    from gads_etl_spark.pipeline import PointerStore, StateStore
    from gads_etl_spark.session import get_session

    spark = get_session("gads-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    dropped_s = StateStore(spark, args.state_root)._table.vacuum(
        keep=args.keep, retention_ms=args.retention_ms)
    dropped_p = PointerStore(spark, args.pointer_root)._table.vacuum(
        keep=args.keep, retention_ms=args.retention_ms)
    print(f"vacuumed {dropped_s} state version(s), {dropped_p} pointer version(s); "
          f"kept newest {args.keep}")
    return 0


def cmd_corpus_diff(args) -> int:
    """CDC between two table paths: per-class delta counts (and the full
    delta to --out when requested). Exit 0 even when differences exist —
    a diff is information, not a failure."""
    from gads_etl_spark.operators import cdc
    from gads_etl_spark.session import get_session

    spark = get_session("gads-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)
    keys = args.key.split(",")
    compare = args.compare.split(",") if args.compare else None
    delta = cdc.snapshot_diff(old, new, keys, compare_cols=compare)
    if args.out:
        delta.write.mode("errorifexists").parquet(args.out)
        delta = spark.read.parquet(args.out)  # count what was written
    counts = {r["change"]: r["n"] for r in
              delta.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()}
    rows = [{"change": c, "n_keys": counts.get(c, 0)}
            for c in ("added", "removed", "changed")]
    _emit(rows, args.json)
    return 0


def cmd_stream_state(args) -> int:
    """Inspect a streaming checkpoint's keyed state offline: total rows,
    per-partition distribution (state-skew probe), optional batchId
    time travel."""
    from gads_etl_spark.session import get_session
    from gads_etl_spark.streaming.jobs import (
        inspect_stream_state,
        state_partition_profile,
    )

    spark = get_session("gads-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    state = inspect_stream_state(spark, args.checkpoint, batch_id=args.batch_id)
    rows = [r.asDict() for r in
            state_partition_profile(state).orderBy("partition_id").collect()]
    total = sum(r["n_state_rows"] for r in rows)
    print(f"{total} state row(s) across {len(rows)} store partition(s)")
    _emit(rows, args.json)
    return 0


def cmd_curate(args) -> int:
    """Run a YAML-declared curation pipeline over a documents table:
    one write pass, per-step funnel counts measured by Observations
    during that same pass."""
    from gads_etl_spark.pipeline.curation import load_curation_config, run_curation
    from gads_etl_spark.session import get_session

    spark = get_session("gads-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    with open(args.config) as f:
        steps = load_curation_config(f.read())
    docs = spark.read.parquet(args.input)
    result = run_curation(docs, steps)
    result.df.write.mode("errorifexists").parquet(args.output)
    funnel = result.funnel()
    _emit(funnel, args.json)
    print(f"curated {funnel[-1]['rows_out']}/{funnel[0]['rows_out']} rows "
          f"through {len(steps)} step(s) → {args.output}")
    return 0


def _run_sync(args, lookback_days: int | None, target: date) -> int:
    """Shared body of ``daily`` and ``catch-up`` (reference cli.py:40-57:
    catch-up IS a daily sync with the lookback widened to the window)."""
    from gads_etl_spark.pipeline import PointerStore, StateStore
    from gads_etl_spark.pipeline.config import load_config_file
    from gads_etl_spark.pipeline.curated_sink import CuratedZone
    from gads_etl_spark.pipeline.raw_sink import RawZone
    from gads_etl_spark.pipeline.runner import run_daily
    from gads_etl_spark.session import get_session

    spark = get_session("gads-etl-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    config = load_config_file(args.config)

    # One source DataFrame per entity the config's queries extract from,
    # read from --sources-root/<entity>.<format> (the connector stand-in;
    # a live deployment plugs the ads DataSource here). Missing entities
    # stay absent: run_daily's partial-failure accounting marks their
    # partitions failed and the rest proceed — the reference's
    # connector-down behavior, not a crash.
    reader = (spark.read if args.sources_format == "parquet"
              else spark.read.format("json"))
    sources = {}
    source_read_errors: dict[str, str] = {}
    for entity in {q.entity for q in config.queries}:
        path = f"{args.sources_root}/{entity}.{args.sources_format}"
        try:
            sources[entity] = (reader.parquet(path)
                               if args.sources_format == "parquet"
                               else reader.load(path))
        except Exception as exc:  # noqa: BLE001 — absent source ≠ CLI crash
            # Keep the CAUSE: a corrupt file or permission error must be
            # distinguishable from an absent source in the report, not
            # collapse into the downstream "no source" failure.
            source_read_errors[entity] = f"{type(exc).__name__}: {exc}"
            print(f"warning: failed to read source {path}: {exc}",
                  file=sys.stderr)

    report = run_daily(
        spark=spark, config=config, sources=sources,
        raw=RawZone(spark, args.raw_root),
        states=StateStore(spark, args.state_root),
        pointers=PointerStore(spark, args.pointer_root),
        target_date=target,
        curated=(CuratedZone(spark, args.curated_root)
                 if args.curated_root else None),
        run_id=args.run_id,
        lookback_days=lookback_days,
    )
    out = {
        "run_id": report.run_id,
        "extracted": len(report.extracted),
        # Two distinct key namespaces, two fields: extract_errors keys
        # are run/partition identifiers, source_read_errors keys are
        # entity names — consumers parsing keys structurally must never
        # have to sniff a "source:" prefix.
        "extract_errors": {str(k): v for k, v in report.extract_errors.items()},
        "source_read_errors": source_read_errors,
        "validated_success": report.validated_success,
        "validated_failed": report.validated_failed,
        "staged": report.staged,
        "published": report.published,
        "ok": report.ok,
    }
    if args.json:
        print(json.dumps(out, default=str))
    else:
        for k, v in out.items():
            print(f"{k}={v}")
    return 0 if report.ok else 1


def cmd_daily(args) -> int:
    """The reference's primary entry point (`gads-etl daily`): one daily
    incremental sync for --date (default: today)."""
    target = _date(args.date) or date.today()
    return _run_sync(args, lookback_days=None, target=target)


def cmd_catch_up(args) -> int:
    """`gads-etl catch-up [--days N]`: backfill a date window — a daily
    sync whose lookback covers the whole window (reference
    pipeline.py:179-185). --days omitted → the config's
    catch_up_window_days, the reference's `window = days or
    config.metadata.catch_up_window_days` default."""
    from gads_etl_spark.pipeline.config import load_config_file

    target = _date(args.end) or date.today()
    days = args.days or load_config_file(args.config).catch_up_window_days
    return _run_sync(args, lookback_days=days, target=target)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gads-etl-spark")
    p.add_argument("--state-root", default="data/state")
    p.add_argument("--pointer-root", default="data/pointers")
    p.add_argument("--raw-root", default="data/raw")
    p.add_argument("--json", action="store_true")
    sub = p.add_subparsers(dest="cmd", required=True)

    def filters(sp, required_range=False):
        sp.add_argument("--customer-id")
        sp.add_argument("--query-name", required=required_range)
        sp.add_argument("--since", required=required_range)
        sp.add_argument("--until", required=required_range)

    sp = sub.add_parser("state-inspect")
    sp.add_argument("--status")
    filters(sp)
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_state_inspect)

    for name, fn in (("state-retry", cmd_state_retry),
                     ("state-mark-terminal", cmd_state_mark_terminal)):
        sp = sub.add_parser(name)
        filters(sp)
        sp.add_argument("--dry-run", action="store_true")
        sp.add_argument("--force", action="store_true")
        if name == "state-retry":
            sp.add_argument("--clear-terminal", action="store_true")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("state-backfill")
    sp.add_argument("--customer-id", required=True)
    sp.add_argument("--query-name", required=True)
    sp.add_argument("--since", required=True)
    sp.add_argument("--until", required=True)
    sp.add_argument("--dry-run", action="store_true")
    sp.add_argument("--force-pending", action="store_true")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_state_backfill)

    def sync_args(sp):
        sp.add_argument("--config", required=True,
                        help="pipeline YAML (source, customer_ids, queries)")
        sp.add_argument("--sources-root", required=True,
                        help="dir of <entity>.<format> connector stand-ins")
        sp.add_argument("--sources-format", default="parquet",
                        choices=("parquet", "json"))
        sp.add_argument("--curated-root",
                        help="also stage+publish curated copies here")
        sp.add_argument("--run-id", help="override the generated run_id")

    sp = sub.add_parser("daily", help="one daily incremental sync")
    sync_args(sp)
    sp.add_argument("--date", help="target logical date (default: today)")
    sp.set_defaults(fn=cmd_daily)

    sp = sub.add_parser("catch-up", help="backfill a date window")
    sync_args(sp)
    sp.add_argument("--end", help="window end date (default: today)")
    sp.add_argument("--days", type=int, default=None,
                    help="catch-up window length in days "
                         "(default: config catch_up_window_days)")
    sp.set_defaults(fn=cmd_catch_up)

    sub.add_parser("warehouse-load").set_defaults(fn=cmd_warehouse_load)
    sub.add_parser("observe-state").set_defaults(fn=cmd_observe_state)
    sub.add_parser("observe-freshness").set_defaults(fn=cmd_observe_freshness)
    sub.add_parser("observe-retries").set_defaults(fn=cmd_observe_retries)

    sp = sub.add_parser("consume-preview")
    sp.add_argument("--sample-rows", type=int, default=5)
    sp.set_defaults(fn=cmd_consume_preview)

    sp = sub.add_parser("dq-check")
    sp.add_argument("--table", required=True)
    sp.add_argument("--format", default="parquet",
                    choices=("parquet", "orc", "json"))
    sp.add_argument("--check", action="append", required=True,
                    metavar="KIND:ARGS",
                    help="not_null:col | unique:a+b | in_set:col:v1|v2 | "
                         "in_range:col:lo:hi | matches:col:regex")
    sp.set_defaults(fn=cmd_dq_check)

    sp = sub.add_parser("dq-profile")
    sp.add_argument("--table", required=True)
    sp.add_argument("--format", default="parquet",
                    choices=("parquet", "orc", "json"))
    sp.add_argument("--columns", help="comma-separated; default: all")
    sp.add_argument("--exact", action="store_true",
                    help="exact distinct counts (Expand plan) instead of HLL")
    sp.set_defaults(fn=cmd_dq_profile)

    sp = sub.add_parser("state-vacuum")
    sp.add_argument("--keep", type=int, default=5)
    sp.add_argument("--retention-ms", type=int, default=None,
                    help="GC grace for unreferenced data dirs (default 1h; "
                         "0 only when no commit can be in flight)")
    sp.set_defaults(fn=cmd_state_vacuum)

    sp = sub.add_parser("corpus-diff")
    sp.add_argument("--old", required=True)
    sp.add_argument("--new", required=True)
    sp.add_argument("--key", required=True, help="comma-separated key columns")
    sp.add_argument("--compare", help="comma-separated; default: common non-keys")
    sp.add_argument("--out", help="write the full delta to this parquet path")
    sp.set_defaults(fn=cmd_corpus_diff)

    sp = sub.add_parser("stream-state")
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--batch-id", type=int)
    sp.set_defaults(fn=cmd_stream_state)

    sp = sub.add_parser("curate")
    sp.add_argument("--config", required=True)
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_curate)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
