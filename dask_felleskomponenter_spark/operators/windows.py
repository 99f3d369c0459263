"""Window operators (SURVEY.md §2B window rows — EXT, absent in reference).

All windows shuffle once on their partition keys; at 100 TB the partition
key must be high-cardinality (user_id, order key) so no single partition
exceeds executor memory — never window over a constant. Frames are kept to
``rowsBetween`` where possible (cheaper than range frames, no secondary
sort per peer group).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    keep: int = 1,
    rn_col: str | None = None,
) -> DataFrame:
    """Keep the first ``keep`` rows per partition under a total order.

    The dedup keep-first primitive: ``row_number`` (not ``rank``) so exact
    ties still yield a single survivor; callers must pass a tie-breaking
    total order for determinism.

    ``rn_col`` defaults to a collision-free generated name — a fixed
    ``"_rn"`` default would overwrite (and then drop) a same-named user
    column, the withColumn+drop hazard ``shuffle.fresh_name`` exists for.
    """
    from dask_felleskomponenter_spark.operators.shuffle import (
        as_key_list,
        ensure_absent,
        fresh_name,
    )

    if keep < 1:
        # keep=0 (e.g. an off-by-one from a caller's `k - 1`) would
        # silently empty the whole dataset — the same loud-error policy
        # as the output-column collisions below
        raise ValueError(f"keep must be >= 1, got {keep!r}")
    if rn_col is None:
        rn_col = fresh_name("_rn", df)
    else:
        # an EXPLICIT rn_col naming an existing column would be
        # overwritten with row numbers and then DROPPED — the exact
        # withColumn+drop hazard the fresh_name default exists for
        ensure_absent(rn_col, df, what="rn_col")
    w = Window.partitionBy(*as_key_list(partition_by)).orderBy(*order_by)
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) <= keep)
        .drop(rn_col)
    )


def rank_topn_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-N rows per group, rank exposed in ``rank_col``.

    ``rank_col`` is part of the OUTPUT contract (callers select it by
    name), so unlike ``keep_first``'s internal ``rn_col`` it can't be
    fresh-named away — ``withColumn`` would silently overwrite a
    same-named user column with the rank and then FILTER on it, so a
    collision is a loud error instead (case-insensitive, matching
    Spark's default resolution)."""
    from dask_felleskomponenter_spark.operators.shuffle import (
        as_key_list,
        ensure_absent,
    )

    if n < 1:
        # same silent-empty hazard as keep_first's keep=0
        raise ValueError(f"n must be >= 1, got {n!r}")
    ensure_absent(rank_col, df, what="rank_col")
    w = Window.partitionBy(*as_key_list(partition_by)).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def lag_sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int | float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event for the same user exceeds ``gap_seconds``.

    Classic two-window formulation (lag → boundary flag → running sum),
    one shuffle on ``user_col``. The batch twin of what
    ``F.session_window`` / ``applyInPandasWithState`` does in streaming
    (see ``streaming/ops.py``).

    Boundary semantics: a gap EXACTLY equal to ``gap_seconds`` stays in
    the same session (strict ``>``) — matching both the stateful
    sessionizer AND ``F.session_window`` (probed empirically: native
    windows ``[t, t+gap]`` merge on single-point overlap, so two events
    exactly one gap apart share a session). All three sessionization
    paths agree at the boundary.

    NULL timestamps are DROPPED, matching both streaming twins:
    ``F.session_window``'s
    SessionWindowing rule injects ``ts IS NOT NULL`` silently and the
    stateful sessionizer filters them explicitly — while here a NULL ts
    would make ``lag`` NULL for the row AND its successor, emitting one
    phantom session per NULL row and breaking the three-path agreement
    this docstring claims.
    """
    from decimal import Decimal

    from dask_felleskomponenter_spark.operators.shuffle import (
        ensure_absent,
        fresh_name,
    )

    # session_col is an OUTPUT-contract column (callers select it by
    # name): a collision with existing data — e.g. re-sessionizing an
    # already-sessionized frame — must be loud, never a silent
    # withColumn overwrite (the policy rank_topn_per_group enforces)
    ensure_absent(session_col, df, what="session_col")

    # Gap as an exact day-time interval at microsecond precision —
    # int(gap_seconds) would silently truncate fractional gaps (0.5 → 0,
    # every event its own session), and a seconds-granularity compare
    # would mis-bucket sub-second gaps against any full-precision
    # oracle.
    gap_us = int(round(float(gap_seconds) * 1_000_000))
    if gap_us < 0:
        raise ValueError(f"gap_seconds must be >= 0, got {gap_seconds!r}")
    zero = F.lit(0)
    gap_itv = F.make_dt_interval(
        zero, zero, zero, F.lit(Decimal(gap_us).scaleb(-6))
    )
    # Gaps via direct timestamp subtraction (a day-time interval), NOT a
    # round-trip through unix_micros: for TIMESTAMP_NTZ input that
    # round-trip casts through the SESSION timezone, which is non-uniform
    # across DST transitions — two NTZ wall clocks 2h apart straddling a
    # spring-forward would measure 1h and wrongly share a session.
    # Subtraction is uniform wall-clock (NTZ) / absolute-time (LTZ)
    # arithmetic either way. Strings/dates still cast once, up front.
    # Resolve the dtype the way Spark resolves the COLUMN — case-
    # insensitively (a case-sensitive dict lookup on df.dtypes misses
    # 'TS' for ts_col='ts', spuriously casts TIMESTAMP_NTZ through the
    # session timezone, and reintroduces the DST bug above).
    dtypes = df.dtypes
    dtype = next(
        (t for n, t in dtypes if n == ts_col),
        next((t for n, t in dtypes if n.lower() == ts_col.lower()), ""),
    )
    ts = (
        F.col(ts_col)
        if dtype.startswith("timestamp")
        else F.col(ts_col).cast("timestamp")
    )
    # A session is a time-chain: timestamp-less rows can't chain (see
    # docstring — the streaming twins drop them, and lag() would mint a
    # phantom session per NULL row here). Malformed STRINGS abort
    # loudly under ANSI mode (Spark 4's default); with
    # spark.sql.ansi.enabled=false they cast to NULL and are dropped by
    # this same filter — callers pinning legacy mode trade the loud
    # error for the drop.
    df = df.filter(ts.isNotNull())
    # Order both windows by the CAST timestamp, not the raw column: for
    # string input in a non-lexicographic format ('2024-01-01 9:00:00'
    # sorts after '... 10:00:00' as text) raw-column order would pair
    # lag() with the wrong neighbor — negative gaps never split, and the
    # running sum assigns session ids in text order.
    order_w = Window.partitionBy(user_col).orderBy(ts)
    prev_ts = F.lag(ts).over(order_w)
    is_new = F.when(
        prev_ts.isNull() | ((ts - prev_ts) > gap_itv),
        F.lit(1),
    ).otherwise(F.lit(0))
    run_w = (
        Window.partitionBy(user_col)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flag_col = fresh_name("_new_session", df, extra={session_col})
    return df.withColumn(flag_col, is_new).withColumn(
        session_col, F.sum(flag_col).over(run_w)
    ).drop(flag_col)


def running_total(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    value_col: str | Column,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum per partition (rows-frame running total).

    ``out_col`` is an output-contract column — a collision with an
    existing column raises instead of silently replacing it."""
    from dask_felleskomponenter_spark.operators.shuffle import (
        as_key_list,
        ensure_absent,
    )

    ensure_absent(out_col, df, what="out_col")
    w = (
        Window.partitionBy(*as_key_list(partition_by))
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))
