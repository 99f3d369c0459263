"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY.md §1.3: batch only);
this pack is the ``readStream`` re-expression of the engine's event
operators — the v2 stretch SURVEY.md §7 designates — so the same
logical pipelines run continuously at cluster scale:

- ``stream_events``: file-source stream with the same nanosecond-
  timestamp normalization as the batch source layer
  (``sources/tables.py::load_table``).
- ``windowed_event_counts``: watermarked tumbling-window counts — the
  streaming twin of the batch ``tumbling_window_events`` query. Late
  rows beyond the watermark are dropped; state is bounded by
  (watermark / slide) windows per key.
- ``sessionize_events``: session windows via the built-in
  ``session_window`` (gap-based) — the streaming twin of the batch
  ``lag_sessionize`` query.
- ``sessionize_stateful``: the same sessionization as a custom stateful
  operator on ``applyInPandasWithState`` — the escape hatch shape for
  semantics the built-in windows can't express (per-key custom state,
  timeout-driven emission).

Scale: all state is keyed and watermark-bounded; shuffle happens once on
the grouping key; sinks should be partitioned by window start for
append-mode compaction. Tests drive these with file sources +
``availableNow`` triggers and assert exact parity against the batch
twins — the recommended way to validate streaming semantics without a
long-running cluster.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Schema of the events table (driver testdata; ts normalized to micros).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession, path: str, nanos: bool = False
) -> DataFrame:
    """File-source stream of event rows from a parquet directory.

    ``nanos=False`` (default) expects microsecond TIMESTAMP parquet —
    data already normalized, e.g. written by the batch layer.
    ``nanos=True`` streams the RAW nanosecond-timestamp shape (the
    driver's ``events.parquet``): ``ts`` is read as int64 nanos and
    truncated to a microsecond timestamp, the same normalization
    ``sources/tables.py::load_table`` applies batch-side. The required
    ``spark.sql.legacy.parquet.nanosAsLong`` conf is set HERE — relying
    on a prior ``load_table`` call having set it made a fresh session's
    first streaming read fail with PARQUET_TYPE_ILLEGAL.
    """
    if not nanos:
        return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType()),  # int64 nanos on disk
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    return (
        spark.readStream.schema(raw_schema)
        .parquet(path)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type.

    Streaming twin of the batch ``tumbling_window_events`` query: same
    grouping, same aggregate; the watermark bounds state and defines the
    late-data cutoff.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user via built-in ``session_window``
    — sessions close when no event arrives for ``gap``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


#: Output schema of the stateful sessionizer.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _make_sessionizer(gap_us: int):
    """Build the per-user session state machine: accumulate
    (start, last, count); emit closed sessions when the event-time gap
    exceeds ``gap_us`` or the state times out between micro-batches."""

    def _sessionize_group(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            # NULL event timestamps reach this operator (the late-row
            # watermark filter keeps them: NULL < watermark is NULL) as
            # NaT, whose .value is int64-min — one such row would open
            # or clamp a session to year 1677. A timestamp-less event
            # has no position on the timeline: drop it, matching the
            # built-in session_window twin (which drops NULL ts rows).
            ts_list.extend(
                int(t.value // 1000) for t in pdf["ts"] if not pd.isna(t)
            )
        ts_list.sort()
        if not ts_list and not state.exists:
            return  # batch carried only timestamp-less rows

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0

        closed: list[tuple[int, int, int]] = []
        for t in ts_list:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                # late cross-batch events (the watermark admits them)
                # can precede the open session: clamp instead of
                # regressing last_us, which produced end < start
                # sessions and spurious splits on the next on-time
                # event. An ultra-late event more than a gap BEFORE
                # session_start still merges (single-open-session
                # state can't retroactively split; the built-in
                # session_window twin is the fully-general path).
                start_us = min(start_us, t)
                last_us, n = max(last_us, t), n + 1

        state.update((start_us, last_us, n))
        # Event-time timeout: flush the open session once the watermark
        # passes last-event + gap. (ProcessingTimeTimeout would make
        # availableNow triggers spin micro-batches re-checking wall-clock
        # timeouts instead of terminating.)
        timeout_ms = last_us // 1000 + gap_us // 1000
        watermark_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, watermark_ms + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return _sessionize_group


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful sessionization on ``applyInPandasWithState``.

    Semantically equivalent to ``sessionize_events`` for in-order data;
    exists as the template for stateful logic the built-in windows can't
    express. State per user is three numbers; timeouts flush idle
    sessions so state never grows unboundedly.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_minutes * 60 * 1_000_000),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: first occurrence per key wins,
    duplicate arrivals within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes, so state is bounded by the duplicate-arrival
    window instead of growing with total distinct keys — the streaming
    twin of the batch ``exact_dedup`` operator (hash the content column
    first for fixed-width state, as in ``operators/dedup.py``).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = -300.0,
    upper_seconds: float = 0.0,
    watermark: str = "2 hours",
    prefix: str = "rng_",
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition — the
    streaming twin of ``operators/joins.py::interval_join`` (same
    inclusive ``left_ts + lower <= right_ts <= left_ts + upper``
    semantics, parity-tested).

    Both sides carry watermarks, and the range condition itself is what
    bounds the join state: Spark evicts buffered rows once the watermark
    passes their join-window, so state is (watermark + range-span) deep
    per key instead of unbounded. This is the canonical two-stream
    correlation shape (click↔error attribution) run continuously.

    The range is written DIRECTLY on the timestamp columns (literal
    interval arithmetic): Spark's state-watermark extraction
    (StreamingJoinHelper) cannot see through ``unix_micros()``-style
    conversions, and with an opaque condition the executed plan shows
    ``state cleanup [ left = null, right = null ]`` — rows are buffered
    forever and the state store grows without bound. The timestamp-
    column form restores eviction (both sides non-null in the plan,
    pinned in ``tests/test_streaming.py``).

    No time-bucketing here: Structured Streaming's symmetric hash join
    keys the shuffle on the equality columns and applies the range as a
    state-eviction predicate, which already avoids the batch all-pairs
    blowup the bucketed batch operator exists to prevent.
    """
    from dask_felleskomponenter_spark.operators.joins import range_bounds_us

    lo_us, hi_us = range_bounds_us(lower_seconds, upper_seconds)

    # Same API-collision guard as the batch twin: a left column already
    # named like a prefixed right column would emit a DUPLICATE column
    # in the output schema — and here the bad schema escapes silently
    # into the sink instead of crashing inside the operator.
    clash = {f"{prefix}{c}" for c in right.columns} & set(left.columns)
    if clash:
        raise ValueError(
            f"prefixed right column(s) {sorted(clash)} collide with "
            f"left columns; pass a different prefix"
        )

    lhs = left.withWatermark(left_ts, watermark).alias("l")
    rename = [
        F.col(f"r.{c}").alias(f"{prefix}{c}") for c in right.columns
    ]
    rhs = right.withWatermark(right_ts, watermark).alias("r")

    cond = None
    for k in on:
        clause = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = clause if cond is None else cond & clause
    l_ts = F.col(f"l.{left_ts}")
    r_ts = F.col(f"r.{right_ts}")
    lo_iv = F.expr(f"make_dt_interval(0, 0, 0, {lo_us} / 1e6)")
    hi_iv = F.expr(f"make_dt_interval(0, 0, 0, {hi_us} / 1e6)")
    cond = cond & (r_ts >= l_ts + lo_iv) & (r_ts <= l_ts + hi_iv)

    return lhs.join(rhs, cond, "inner").select(
        *[F.col(f"l.{c}") for c in left.columns], *rename
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str
) -> DataFrame:
    """Drive a streaming DataFrame to completion on currently-available
    data (``availableNow`` trigger) into an in-memory table; returns the
    materialized result as a batch DataFrame. Test/dev harness — real
    deployments write Delta/Kafka sinks with the same plan."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if _has_aggregate_complete(stream_df) else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def _has_aggregate_complete(df: DataFrame) -> bool:
    # session_window/applyInPandasWithState require append; plain
    # windowed aggregates can use complete for exact test comparisons.
    # Decided by WALKING the analyzed plan's operator and expression
    # trees, not by substring-matching its printed text: a relation
    # path or column literally named 'session_window_events' (or a
    # string literal containing 'Aggregate') must not flip the mode.
    # An earlier camelCase-spelling substring check silently routed
    # session-window streams to complete mode, where the watermark
    # neither drops late rows nor evicts state and checkpoint restarts
    # re-emit every session (pinned in
    # tests/test_streaming.py::test_session_window_stream_uses_append).
    # The plan crosses the Py4J bridge ONCE as JSON and is walked as
    # parsed structure here: per-node/per-expression JVM round-trips
    # cost tens of ms on wide schemas, and raw-text substring checks
    # were spoofable by identifiers merely containing the trigger words.
    # In parsed form the operator kind is the "class" FIELD (a string
    # literal in the data can only ever appear as a "value" field, never
    # as a node class). The analyzer rewrites the SessionWindow
    # expression into timestamp arithmetic whose result attribute it
    # always names exactly 'session_window' with dataType
    # struct<start,end> (its runtime metadata marker does not survive
    # toJSON) — a user column would need that exact generated
    # name-and-shape under an Aggregate to spoof it, which is the
    # session-window contract itself.
    import json as _json

    plan = _json.loads(df._jdf.queryExecution().analyzed().toJSON())
    has_aggregate = False
    stack = [plan]
    while stack:
        node = stack.pop()
        if isinstance(node, list):
            stack.extend(node)
            continue
        if not isinstance(node, dict):
            continue
        cls = node.get("class", "")
        if isinstance(cls, str):
            if cls.endswith(".Aggregate"):
                has_aggregate = True
            elif cls.endswith(".FlatMapGroupsInPandasWithState"):
                return False
            elif (
                cls.endswith(".AttributeReference")
                and node.get("name") == "session_window"
            ):
                dt = node.get("dataType")
                if isinstance(dt, dict) and [
                    f.get("name") for f in dt.get("fields", [])
                ] == ["start", "end"]:
                    return False
        stack.extend(node.values())
    return has_aggregate


def stream_to_jdbc_sync(
    stream_df: DataFrame,
    manager,
    checkpoint_dir: str,
    mode: str = "merge",
    merge_keys: Iterable[str] | None = None,
):
    """Continuous publish: every micro-batch is staged over JDBC and
    published by a ``PostgresSyncManager`` (``sync/postgres.py``) inside
    ``foreachBatch`` — the streaming tail of the reference's sync
    contract (its ``sync_df_to_pgdb`` is batch-only; this runs the same
    staging-write + publish-SQL pair per trigger).

    Default mode is **merge** (keyed upsert/delete): micro-batches are
    increments, and merge accumulates them. ``mode="snapshot"`` is
    TRUNCATE+load — it replaces the WHOLE target with the current batch,
    so across a multi-batch run only the final batch's rows survive;
    opt into it only when every trigger carries a complete snapshot
    (e.g. a Kafka-compacted full-state topic), and the guard below
    makes that opt-in explicit.

    Delivery semantics: the checkpoint gives at-least-once batch
    replay; both publish modes are idempotent re-applied (snapshot is
    TRUNCATE+load, merge is keyed upsert/delete), so the visible effect
    is effectively exactly-once PER BATCH. Connection fan-in per batch
    is bounded by the manager's ``max_connections`` coalesce; no state
    beyond the source offsets is held.

    Returns the started ``StreamingQuery`` (``availableNow`` trigger) —
    callers ``awaitTermination()`` it.
    """
    if mode == "snapshot" and not getattr(
        manager, "allow_streaming_snapshot", False
    ):
        raise ValueError(
            "mode='snapshot' TRUNCATEs the target every micro-batch — "
            "across a multi-batch stream only the last batch survives. "
            "Use mode='merge' (default), or set "
            "manager.allow_streaming_snapshot = True if every trigger "
            "really carries a complete snapshot"
        )
    keys = list(merge_keys) if merge_keys is not None else None
    # Fail at CALL time, not inside foreachBatch on the first
    # micro-batch: by then the query has started and the error surfaces
    # as an opaque StreamingQueryException minutes later.
    if mode not in ("merge", "snapshot"):
        raise ValueError(
            f"unknown mode {mode!r}: expected 'merge' or 'snapshot'"
        )
    if mode == "merge" and not keys:
        raise ValueError(
            "mode='merge' (the default) requires merge_keys — pass the "
            "upsert key columns, or choose mode='snapshot' explicitly"
        )

    def _publish(batch_df: DataFrame, _batch_id: int) -> None:
        manager.sync(batch_df, mode=mode, merge_keys=keys)

    return (
        stream_df.writeStream.foreachBatch(_publish)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_static_dim_join(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: Iterable[str],
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins the
    dimension snapshot — the canonical "attach user/customer attributes
    to an event stream" shape.

    The static side is explicitly ``broadcast``: stream-static joins
    re-evaluate the static plan each micro-batch, and without the hint a
    large-enough dim silently becomes a per-batch shuffle of the stream
    side. Stateless (no watermark needed): rows join against the dim as
    of the batch that processes them. ``how`` inner/left only — right/
    full would need the unmatched-dim side re-emitted per batch, which
    stream-static joins cannot express (use a stream-stream join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"stream-static join supports inner/left, got {how!r}")
    return stream_df.join(F.broadcast(dim_df), on=list(on), how=how)


def _has_protobuf() -> bool:
    """``transformWithStateInPandas`` serializes state via protobuf on
    the Python workers. The vendored mini-runtime (``vendor/google/
    protobuf``, activated by ``vendorshim.ensure_protobuf``) satisfies
    the dependency when the real distribution is absent; this gate only
    stays False if both are unavailable."""
    from dask_felleskomponenter_spark.vendorshim import ensure_protobuf

    if not ensure_protobuf():  # pragma: no cover - vendor dir always ships
        return False
    try:  # pragma: no cover - trivial
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_HAS_TWS_CACHE: bool | None = None


def _tws_available() -> bool:
    """Lazily-cached protobuf probe: importing the streaming package for
    its stateless operators must not pay the vendorshim path mutation
    and protobuf import, and a protobuf installed later in the process
    still flips the gate on first USE (an import-time constant froze
    availability forever)."""
    global _HAS_TWS_CACHE
    if _HAS_TWS_CACHE is None:
        _HAS_TWS_CACHE = _has_protobuf()
    return _HAS_TWS_CACHE


def __getattr__(name: str):
    # PEP 562: `HAS_TWS` stays importable (tests and callers read it)
    # while evaluating lazily on first access.
    if name == "HAS_TWS":
        return _tws_available()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def _col_dtype(df: DataFrame, col: str) -> str:
    """Resolve a column's dtype the way Spark resolves the COLUMN —
    case-insensitively under the default ``spark.sql.caseSensitive=
    false``. A plain ``dict(df.dtypes)[col]`` raises a bare KeyError for
    ``'USER_ID'`` against a ``user_id`` column that ``groupBy`` itself
    accepts (the bug class ``lag_sessionize`` fixed; the TWS operators
    reintroduced it)."""
    dtypes = df.dtypes
    for n, t in dtypes:
        if n == col:
            return t
    # Mirror Spark's own resolution: when two columns differ only by
    # case and neither matches exactly, Spark raises
    # AMBIGUOUS_REFERENCE — silently returning the first match could
    # hand back the WRONG column's dtype.
    ci = [(n, t) for n, t in dtypes if n.lower() == col.lower()]
    if len(ci) > 1:
        raise ValueError(
            f"ambiguous column reference {col!r}: matches "
            f"{[n for n, _ in ci]} case-insensitively (mirroring "
            f"Spark's AMBIGUOUS_REFERENCE)"
        )
    if ci:
        return ci[0][1]
    raise ValueError(
        f"column {col!r} not found; have {[n for n, _ in dtypes]}"
    )


def _require_tws() -> None:
    """Shared gate for the transformWithState operators: one message,
    one place (three operators guard on it)."""
    if not _tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package; "
            "the vendored runtime (vendor/google/protobuf) normally "
            "provides it even without an installed distribution — "
            "sessionize_stateful (applyInPandasWithState) is the "
            "protobuf-free custom-stateful fallback"
        )


def running_totals_stateful(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key running totals on Spark 4's ``transformWithState`` API —
    the successor to ``applyInPandasWithState`` with named state
    variables, TTL, and timers. Groups by ``key_col`` and emits the
    updated (count, sum) for each key every micro-batch; the key's
    column type is preserved in the output schema.

    Requires the ``protobuf`` Python package at runtime (state
    serialization); absent it, raises the documented
    NotImplementedError — ``sessionize_stateful`` remains the
    executable custom-stateful path in bare environments."""
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    key_type = _col_dtype(events, key_col)
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=(
            f"{key_col} {key_type}, n_events bigint, total_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def category_profile_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "category",
    value_col: str = "value",
) -> DataFrame:
    """Per-key category profile on ``transformWithState`` exercising all
    three named-state kinds in one processor:

    - **MapState** ``per_cat``: category → (count, sum) — running
      per-category aggregates updated point-wise;
    - **ListState** ``recent``: the last values seen (bounded to 8 —
      state stays O(1) per key regardless of stream length);
    - **ValueState** ``total``: overall event count.

    ``timeMode="None"`` deliberately: with ``ProcessingTime``,
    ``TransformWithStateExec.shouldRunAnotherBatch`` is unconditionally
    true, so an ``availableNow`` query never terminates — it keeps
    scheduling empty micro-batches forever (measured: 260+ batches on a
    32-file input). Timer-protocol coverage lives in
    ``timer_probe_stateful``, which documents the required explicit
    stop.

    Emits one row per key per batch: total events, number of distinct
    categories, sum over all categories, and the bounded recent-list
    length. The final emission equals the batch aggregate (parity test).
    """
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    recent_cap = 8

    class _CategoryProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._per_cat = handle.getMapState(
                "per_cat", "category STRING", "n BIGINT, total DOUBLE"
            )
            self._recent = handle.getListState("recent", "v DOUBLE")
            # "total" keeps its ORIGINAL 'n BIGINT' schema: widening it
            # in place would fail the state-schema compatibility check
            # on restart from any checkpoint written before the
            # null-sum fix (or silently misread state where evolution
            # is permissive). The null-category value sum lives under a
            # NEW state name instead — missing on old checkpoints reads
            # as 0.0, which matches what those checkpoints had counted.
            self._total = handle.getValueState("total", "n BIGINT")
            # value sum of NULL-category rows: a NULL category is NOT a
            # category (batch countDistinct excludes it — and
            # astype(str) used to mint literal 'None'/'nan' categories
            # here), but its VALUE still counts toward the total sum
            # (batch SUM(value) is category-blind).
            self._null_sum = handle.getValueState("null_sum", "s DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            n_total = self._total.get()[0] if self._total.exists() else 0
            null_sum = (
                self._null_sum.get()[0] if self._null_sum.exists() else 0.0
            )
            tail: list[tuple] = []
            # Pre-aggregate per category IN PANDAS, then one state-server
            # round-trip pair per TOUCHED CATEGORY: the per-row form was
            # 3 RPCs × rows (1M rows → ~3M socket round-trips dominating
            # batch latency); this is 2 RPCs × distinct categories.
            local: dict[str, tuple[int, float]] = {}
            for pdf in rows:
                n_total += len(pdf)
                cats = pdf[cat_col]
                mask = cats.notna()
                null_sum += float(pdf.loc[~mask, value_col].sum() or 0.0)
                grouped = (
                    pdf[mask]
                    .groupby(cats[mask].astype(str))[value_col]
                    .agg(["count", "sum"])
                )
                for cat, row in grouped.iterrows():
                    c0, s0 = local.get(cat, (0, 0.0))
                    local[cat] = (c0 + int(row["count"]), s0 + float(row["sum"]))
                # Only the last recent_cap values can survive — slice
                # BEFORE tupling. The per-row form allocated one tuple
                # per input row just to throw all but 8 away: O(batch)
                # memory per key in an operator advertising O(1) state.
                tail.extend(
                    (float(v),) for v in pdf[value_col].iloc[-recent_cap:]
                )
                del tail[:-recent_cap]
            for cat, (c_new, s_new) in local.items():
                cat_key = (cat,)
                if self._per_cat.containsKey(cat_key):
                    n, total = self._per_cat.getValue(cat_key)
                else:
                    n, total = 0, 0.0
                self._per_cat.updateValue(cat_key, (n + c_new, total + s_new))
            # Bounded recent list: keep only the newest `recent_cap`.
            existing = list(self._recent.get()) if self._recent.exists() else []
            merged = (existing + tail)[-recent_cap:]
            self._recent.put(merged)
            self._total.update((n_total,))
            self._null_sum.update((null_sum,))
            n_cats = 0
            sum_all = null_sum
            for _cat_key, (n, total) in self._per_cat.iterator():
                n_cats += 1
                sum_all += total
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n_total],
                    "n_categories": [n_cats],
                    "sum_value": [sum_all],
                    "n_recent": [len(merged)],
                }
            )

        def close(self) -> None:
            pass

    key_type = _col_dtype(events, key_col)
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_CategoryProfile(),
        outputStructType=(
            f"{key_col} {key_type}, n_events bigint, n_categories bigint, "
            f"sum_value double, n_recent bigint"
        ),
        outputMode="Update",
        timeMode="None",
    )


def timer_probe_stateful(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Timer-protocol conformance probe for ``transformWithState``:
    per input batch each key registers a far-future processing-time
    timer, lists it back from the state server, and deletes it — the
    emitted row carries how many of its own timers the key observed
    before and after, so the test asserts the full register → list →
    delete round-trip succeeded JVM-side.

    MUST be stopped explicitly (``query.stop()`` after the expected
    rows appear): ``timeMode="ProcessingTime"`` makes
    ``shouldRunAnotherBatch`` unconditionally true, so ``availableNow``
    never self-terminates for this plan — that is Spark's contract for
    processing-time timers, not a defect here.
    """
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TimerProbe(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # TTL'd value state: exercises the StateCallCommand.ttl
            # protocol message against the JVM (the one-hour duration
            # never expires within a test run, so output stays
            # deterministic); also proves state and timers coexist.
            self._seen = handle.getValueState(
                "seen", "n BIGINT", ttlDurationMs=3_600_000
            )

        def handleInputRows(self, key, rows, timer_values):
            n = self._seen.get()[0] if self._seen.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._seen.update((n,))
            probe = timer_values.getCurrentProcessingTimeInMs() + 10**11
            self._handle.registerTimer(probe)
            listed_after_register = sum(
                1 for t in self._handle.listTimers() if t == probe
            )
            self._handle.deleteTimer(probe)
            listed_after_delete = sum(
                1 for t in self._handle.listTimers() if t == probe
            )
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_rows": [n],
                    "listed_after_register": [listed_after_register],
                    "listed_after_delete": [listed_after_delete],
                }
            )

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            # Far-future timers never expire within a test run.
            yield from ()

        def close(self) -> None:
            pass

    key_type = _col_dtype(events, key_col)
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_TimerProbe(),
        outputStructType=(
            f"{key_col} {key_type}, n_rows bigint, "
            f"listed_after_register bigint, listed_after_delete bigint"
        ),
        outputMode="Update",
        timeMode="ProcessingTime",
    )


def stream_neardup_ingest(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    history_table: str,
    corpus_path: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    shingle_size: int = 3,
    max_history_bucket_width: int | None = 4096,
):
    """Streaming corpus ingest with cross-batch NEAR-duplicate
    screening: every micro-batch is MinHash-signed, screened against
    the persisted LSH band-bucket history
    (``sources/dedup_store.py::neardup_against_history``) and against
    itself (greedy lowest-id survivors), survivors append to the
    corpus, and their band buckets are recorded — the continuous form
    of the near-dup crawl pipeline (each trigger pays batch-sized cost
    against an unbounded history; the history side of the screen join
    reads bucket-aligned and never shuffles).

    Delivery semantics: checkpointed foreachBatch replays are
    at-least-once. Screening is idempotent (a replayed batch collides
    with its own recorded buckets and yields zero novel rows), so
    duplicates can reach the corpus only if a crash lands exactly
    between the corpus append and the bucket append of one batch — the
    corpus is written FIRST so that window duplicates rather than
    silently drops (same contract as ``stream_dedup_ingest``).

    Near-dup screening is ORDER-SENSITIVE across batches (the first
    batch to ingest a cluster's representative wins); batch boundaries
    are therefore part of the semantics, as with any streaming dedup.

    Returns the started ``StreamingQuery`` (``availableNow`` trigger).
    """
    from dask_felleskomponenter_spark.sources.dedup_store import (
        neardup_against_history,
        record_novel_signatures,
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        # return_buckets materializes the batch's band buckets once, so
        # the record step below reuses them instead of paying the
        # MinHash stage a second time per micro-batch
        novel, buckets = neardup_against_history(
            batch_df.sparkSession,
            batch_df,
            id_col,
            text_col,
            history_table,
            num_hashes=num_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
            shingle_size=shingle_size,
            max_history_bucket_width=max_history_bucket_width,
            return_buckets=True,
        )
        novel = novel.localCheckpoint(eager=True)
        # buckets arrive ALREADY checkpointed: neardup_against_history
        # materializes the returned buckets itself (round 10), cutting
        # their lineage from the history-table scan so the record
        # append below never reads the table it writes and never pays
        # the history screen a second time per micro-batch.
        novel.write.mode("append").parquet(corpus_path)
        record_novel_signatures(
            novel,
            id_col,
            text_col,
            history_table,
            f"batch-{batch_id}",
            n_buckets=n_buckets,
            num_hashes=num_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
            shingle_size=shingle_size,
            buckets_df=buckets,
        )

    return (
        stream_df.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_ingest(
    stream_df: DataFrame,
    id_col: str,
    content_col: str,
    history_table: str,
    corpus_path: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
):
    """Streaming corpus ingest with cross-batch dedup: every micro-batch
    is screened against the bucketed content-hash history
    (``sources/dedup_store.py``), novel documents append to the corpus
    sink, and their hashes are recorded — the continuous form of the
    crawl-ingest pipeline (each trigger pays batch-sized cost against
    an unbounded history).

    Delivery semantics: checkpointed foreachBatch replays are
    at-least-once. Screening is idempotent (a replayed batch finds its
    hashes recorded and yields zero novel rows), so duplicates can reach
    the corpus only if a crash lands exactly between the corpus append
    and the history append of one batch. The corpus is written FIRST so
    that failure mode duplicates rather than silently drops; a
    downstream exact-dedup pass (or a transactional table format making
    the two appends atomic) removes even that window at deployment.

    Returns the started ``StreamingQuery`` (``availableNow`` trigger).
    """
    from dask_felleskomponenter_spark.sources.dedup_store import (
        dedup_against_history,
        record_novel,
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        novel = dedup_against_history(
            batch_df.sparkSession,
            batch_df,
            id_col,
            content_col,
            history_table,
            n_buckets=n_buckets,
            update=False,
        ).localCheckpoint(eager=True)
        novel.write.mode("append").parquet(corpus_path)
        record_novel(
            novel, id_col, history_table, f"batch-{batch_id}", n_buckets
        )

    return (
        stream_df.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
