"""Python DataSource simulating the reference's paged Ads-API extraction.

The reference pulls GAQL rows per (customer_id, date) through a paged
``search_stream`` and writes one raw partition per key
(`/root/reference/src/gads_etl/pipeline.py:38-90`). The Spark-native
re-expression is a *data source*, not a driver loop: each (customer,
day) becomes an ``InputPartition``, so a 1000-customer × 90-day backfill
is 90k independent tasks the scheduler spreads over the cluster —
instead of the reference's serial per-customer iteration.

Because this container has no network or Ads credentials, the transport
layer is a deterministic synthetic pager (seeded by customer/date/row
via md5), clearly marked below; the Spark-facing surface — registration,
schema, partition planning, filter pushdown, page iteration — is real
and tested. Swapping ``_page`` for a real API call changes nothing
above it.

Filter pushdown: ``customer_id = '...'`` / ``IN`` and date bounds prune
*partitions* before any task launches — the Python-source equivalent of
partition pruning; unsupported filters are returned to Spark to apply.

Usage::

    spark.dataSource.register(AdsFixtureDataSource)
    df = (spark.read.format("gads_fixture")
          .option("customers", "111,222")
          .option("start_date", "2024-01-01")
          .option("end_date", "2024-01-31")
          .load())
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import date, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "customer_id string, segments_date date, campaign_id bigint, "
    "clicks bigint, impressions bigint, cost_micros bigint"
)

#: Simulated API page size (rows per page); the reader iterates pages
#: exactly like the reference iterates ``stream`` batches.
PAGE_SIZE = 50


@dataclass(frozen=True)
class _CustomerDay(InputPartition):
    customer_id: str
    day: str  # ISO date — InputPartition fields must pickle cheaply


def _rows_for(customer_id: str, day: str, n_rows: int) -> Iterator[tuple]:
    """Deterministic fake of one day's API response (STUB transport).

    Every field derives from md5(customer, day, i) so any engine — and
    any rerun — generates identical rows. A real implementation would
    issue the GAQL request here and yield protobuf-converted rows.
    """
    d = date.fromisoformat(day)
    for i in range(n_rows):
        h = hashlib.md5(f"{customer_id}|{day}|{i}".encode()).hexdigest()
        seed = int(h[:12], 16)
        yield (
            customer_id,
            d,
            seed % 10,                     # campaign_id: 10 campaigns
            seed % 997,                    # clicks
            seed % 997 * 37 % 99991,       # impressions
            (seed % 104729) * 10_000,      # cost_micros
        )


def _pages(customer_id: str, day: str, n_rows: int) -> Iterator[list[tuple]]:
    """Chunk the day's rows into API-shaped pages."""
    page: list[tuple] = []
    for row in _rows_for(customer_id, day, n_rows):
        page.append(row)
        if len(page) == PAGE_SIZE:
            yield page
            page = []
    if page:
        yield page


class AdsFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.customers = [c.strip() for c in options.get("customers", "").split(",") if c.strip()]
        if not self.customers:
            raise ValueError("gads_fixture: 'customers' option is required")
        self.start = date.fromisoformat(options.get("start_date", "2024-01-01"))
        self.end = date.fromisoformat(options.get("end_date", "2024-01-07"))
        if self.end < self.start:
            raise ValueError("gads_fixture: end_date before start_date")
        self.rows_per_day = int(options.get("rows_per_day", "120"))
        #: Set when a pushed predicate proves the scan is empty. We keep the
        #: partition grid non-degenerate (PySpark turns an empty partition
        #: list into a single ``None`` partition and still runs one task —
        #: plan_data_source_read would then call ``read(None)``), and make
        #: ``read`` yield nothing instead.
        self._pruned_empty = False

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune the (customer, day) partition grid from query predicates.

        Accepts customer equality/membership and date-equality filters —
        the ones that map to partition pruning; everything else is
        handed back to Spark to evaluate post-scan.
        """
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("customer_id",):
                self.customers = [c for c in self.customers if c == f.value]
            elif isinstance(f, In) and f.attribute == ("customer_id",):
                keep = {str(v) for v in f.value}
                self.customers = [c for c in self.customers if c in keep]
            elif isinstance(f, EqualTo) and f.attribute == ("segments_date",):
                # A pushed filter may only NARROW the configured range —
                # an equality outside [start, end] must yield zero rows,
                # not conjure days the unfiltered load() would never emit.
                if self.start <= f.value <= self.end:
                    self.start = self.end = f.value
                else:
                    self._pruned_empty = True  # provably zero rows
            else:
                yield f  # unsupported → Spark applies it after the scan

    def partitions(self) -> list[InputPartition]:
        days = []
        d = self.start
        while d <= self.end:
            days.append(d.isoformat())
            d += timedelta(days=1)
        grid = [_CustomerDay(c, day) for c in self.customers for day in days]
        if self._pruned_empty or not grid:
            # Pushdown proved the scan empty — out-of-range date, or a
            # customer equality/IN that matched none of the configured
            # customers. One sentinel partition that read() treats as
            # empty — never an empty list (see _pruned_empty note in
            # __init__).
            return [_CustomerDay("", "")]
        return grid

    def read(self, partition: _CustomerDay) -> Iterator[tuple]:
        if partition is None or not partition.customer_id:
            return
        for page in _pages(partition.customer_id, partition.day, self.rows_per_day):
            yield from page


class AdsFixtureStreamReader(SimpleDataSourceStreamReader):
    """Incremental daily ingest: each micro-batch pulls the next day for
    every customer — the streaming form of the reference's daily
    catch-up loop (`cli.py` daily/catch-up planning), with the offset
    (the last ingested day) checkpointed by Spark instead of hand-rolled
    state. ``end_date`` bounds the replay so ``availableNow`` triggers
    terminate; omit it for a live tail.
    """

    def __init__(self, options: dict):
        self.customers = [c.strip() for c in options.get("customers", "").split(",") if c.strip()]
        if not self.customers:
            raise ValueError("gads_fixture: 'customers' option is required")
        self.start = options.get("start_date", "2024-01-01")
        self.end = options.get("end_date", "2024-01-07")
        self.rows_per_day = int(options.get("rows_per_day", "120"))

    def initialOffset(self) -> dict:
        return {"next_day": self.start}

    def _rows_between(self, start_day: str, end_day: str) -> Iterator[tuple]:
        d = date.fromisoformat(start_day)
        stop = date.fromisoformat(end_day)
        while d < stop:
            for c in self.customers:
                yield from _rows_for(c, d.isoformat(), self.rows_per_day)
            d += timedelta(days=1)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        day = start["next_day"]
        if day > self.end:
            return iter([]), start  # caught up — no new offset
        nxt = (date.fromisoformat(day) + timedelta(days=1)).isoformat()
        # iter(list): Spark's prefetch wrapper needs an iterator it can
        # also copy.copy() for replay — a list-iterator is both; a bare
        # generator is neither.
        return iter(list(self._rows_between(day, nxt))), {"next_day": nxt}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Deterministic replay for recovery: regenerate exactly the
        # committed range (same contract a real API replay would need).
        return self._rows_between(start["next_day"], end["next_day"])


class AdsFixtureDataSource(DataSource):
    """``spark.read.format("gads_fixture")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "gads_fixture"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> AdsFixtureReader:
        return AdsFixtureReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> AdsFixtureStreamReader:
        return AdsFixtureStreamReader(self.options)
