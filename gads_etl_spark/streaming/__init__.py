"""Structured Streaming surface: the batch window queries, streaming.

The reference is batch-only (SURVEY.md §2.9); this module exposes the
streaming-shaped operators (tumbling/sliding/session windows with
watermarks, stateful per-key aggregation) over a file-source stream — the
same expressions as queries.events_suite, so batch results are the oracle
for the streaming path.

Scale notes: file streams + watermarks bound state (late events older than
the watermark are dropped); ``applyInPandasWithState`` holds one Arrow
batch of state per key group, the supported shape for custom stateful
logic at executor scale.
"""

from gads_etl_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    sessionized_stream,
    stateful_user_counters,
    tumbling_counts_stream,
)
