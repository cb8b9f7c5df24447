"""Stateful Structured Streaming operators (beyond-reference surface).

The reference has no stateful streaming (SURVEY.md §2.8 — its watcher
is ingestion-triggered batch), but a training-data event pipeline needs
true incremental state: gap-based sessionization over an unbounded
stream cannot be re-aggregated per micro-batch without reprocessing all
history. ``applyInPandasWithState`` is the Spark primitive for this:
per-key state lives in the state store (checkpointed, partitioned by
the grouping key), each micro-batch touches only keys with new data,
and state size is O(keys), not O(events) — the property that lets the
operator run forever at 100 TB/day.

Design notes:
- State per user is three scalars ``(last_ts, n_sessions, n_events)``
  — constant-size, no event buffering. This requires per-key
  time-ordered arrival ACROSS triggers (in-batch disorder is fine; we
  sort), which ingestion-time file streams provide. For genuinely
  out-of-order sources, add a watermark + event-time timeout and buffer
  one session's tail instead (same API, bigger state).
- Output mode is ``append``; each trigger emits the key's cumulative
  ``(n_sessions, n_events)``. Both counters are monotonic, so the final
  answer per key is ``max()`` over the sink — an idempotent,
  replay-safe reduction (exactly-once without a transactional sink).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SESSION_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_sessions", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

# (last_ts_us, n_sessions, n_events)
SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("last_ts_us", T.LongType()),
    T.StructField("n_sessions", T.LongType()),
    T.StructField("n_events", T.LongType()),
])


def _session_fn(gap_us: int):
    """Build the per-group update function (closure over the gap)."""

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        ts_us = pd.concat([pdf["ts_us"] for pdf in pdfs]).sort_values()
        for t in ts_us:
            t = int(t)
            if last_ts is None or t - last_ts > gap_us:
                n_sessions += 1
            last_ts = t
        n_events += len(ts_us)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events]})

    return update


def sessionize_stream(events: DataFrame, *, gap_seconds: int = 1800,
                      user_col: str = "user_id",
                      ts_us_col: str = "ts_us") -> DataFrame:
    """Per-user gap sessionization over a streaming DataFrame.

    Input: a streaming DF with a long microsecond timestamp column.
    Output (streaming, append): one row per (user, trigger) with the
    user's cumulative session / event counts; reduce with ``max`` per
    user after draining (see module docstring).
    """
    renamed = events.select(
        events[user_col].alias("user_id"), events[ts_us_col].alias("ts_us"))
    return renamed.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds * 1_000_000),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def dedupe_stream(events: DataFrame, keys: list[str], ts_col: str,
                  watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once dedup with BOUNDED state.

    ``dropDuplicatesWithinWatermark``: a key's first arrival passes;
    re-deliveries within the watermark horizon are dropped from the
    state store, and state for keys older than the watermark is
    evicted — so state size is O(keys per horizon), not O(all keys
    ever), which is what lets the operator run forever. (The watcher's
    sink-anti-join dedup (watcher.py) re-reads the sink per batch —
    fine for file-batch cadence, wrong for high-rate streams.)
    """
    return events.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(keys)


# ---------------------------------------------------------------------------
# Running per-user profile with INTEGER-ONLY state: every emission is
# bit-exact against the batch oracle (no float accumulation order to
# drift). ENV BOUNDARY: Spark 4's successor API
# (transformWithStateInPandas — named schema'd state slots, timers,
# TTL) requires google.protobuf, absent from this container; the same
# operator expressed against it crashes the streaming python runner at
# init (ImportError in StateMessage_pb2), so this uses
# applyInPandasWithState, whose semantics are identical for a single
# value-state slot with no timers.
# ---------------------------------------------------------------------------

PROFILE_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_types", T.LongType()),
    T.StructField("first_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
])

# (n_events, seen event types as a sorted ARRAY — bounded by the type
# vocabulary, NOT event volume — first/last event time). An array, not
# a delimiter-joined string: a type containing the delimiter (or an
# empty-string type) would corrupt the distinct count on restore.
PROFILE_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("types", T.ArrayType(T.StringType())),
    T.StructField("first_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
])


def _profile_update(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: Any) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, types, first_us, last_us = state.get
        seen = set(types)
    else:
        n, seen, first_us, last_us = 0, set(), None, None
    for pdf in pdfs:
        if not len(pdf):      # Arrow slicing may yield an empty chunk;
            continue          # int(nan) from min()/max() would raise
        n += len(pdf)
        seen.update(pdf["event_type"].tolist())
        lo = int(pdf["ts_us"].min())
        hi = int(pdf["ts_us"].max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, sorted(seen), first_us, last_us))
    yield pd.DataFrame([{
        "user_id": key[0], "n_events": n, "n_types": len(seen),
        "first_us": first_us, "last_us": last_us,
    }])


def profile_stream(events: DataFrame) -> DataFrame:
    """Cumulative per-user profile (event count, distinct types,
    first/last event time) as a stateful streaming operator.

    Emits the key's cumulative profile at every trigger with data;
    every emitted column is monotone (count, distinct-count, min/max
    time), so the final answer per key is the max-n_events row — the
    same idempotent replay-safe reduction as ``sessionize_stream``.
    State is O(1) per key: three scalars plus a vocabulary-bounded type array.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _profile_update,
        outputStructType=PROFILE_OUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
