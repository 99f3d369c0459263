"""Pipeline observability: ``Observation`` metrics riding a single pass.

A 100 TB write job cannot afford a second scan just to report row
counts, null rates, or value ranges — ``df.observe`` attaches aggregate
metrics to the SAME job: each task accumulates them while producing its
output rows, and the driver reads the merged result after the action.
This is the engine-native replacement for the reference's pattern of
``df.count()`` before a write (``sync_df_to_pgdb.py:174`` computes the
DataFrame twice for a log line — SURVEY.md §4 flags it).

Only deterministic aggregates belong here (sum/count/min/max/avg —
Spark enforces no distinct/sketches); metrics are exact because every
row of the single pass feeds them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_observed_metrics(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER an action has run the plan. Example::

        out, obs = with_observed_metrics(
            df, "sync",
            n_rows=F.count(F.lit(1)),
            null_keys=F.sum(F.col("key").isNull().cast("long")),
        )
        manager.sync(out)          # one pass: writes AND measures
        stats = obs.get            # {'n_rows': ..., 'null_keys': ...}
    """
    obs = Observation(name)
    aliased = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *aliased), obs


def profile_numeric_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style numeric profile — one row per column with count /
    null / distinct / min / max / mean — computed in ONE scan of ``df``.

    Shape: a single global aggregate (map-side partials, one merged
    row) followed by a driver-free ``stack`` unpivot of that row into
    per-column rows; the table is never read per column. The only
    scale caveat is ``count_distinct``: N exact distinct aggregates in
    one agg make Catalyst plan an Expand (each input row replicated N
    ways before the shuffle). That is the exact-answer price; swap in
    ``approx_count_distinct`` for the 100 TB profile where a 2% HLL
    error is acceptable and the Expand collapses back to plain
    partials.

    Everything is profiled as DOUBLE so decimal/int columns share one
    output schema (min/max/mean rounded to 6)."""
    from pyspark.sql import functions as F

    if not cols:
        # a dynamically-derived empty list would otherwise reach
        # stack() with the wrong arity and fail with an opaque Catalyst
        # analysis error pointing nowhere near the real cause
        raise ValueError(
            "profile_numeric_columns: cols must be non-empty (the "
            "DataFrame has no columns to profile)"
        )

    # backtick-quoted exact-name resolution, shared with the join/agg
    # helpers: a bare F.col parses a dot as a struct-field accessor, so
    # a column literally named 'price.usd' (or its 'price.usd__nn'
    # aggregate alias) would raise UNRESOLVED_COLUMN
    from dask_felleskomponenter_spark.operators.shuffle import (
        quoted_col as qcol,
    )

    v = {c: qcol(c).cast("double") for c in cols}
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(v[c]).alias(f"{c}__nn"),
            # distinct on the NATIVE column: a double cast would merge
            # bigint/decimal values past 2^53 and silently under-count —
            # the exactness this profile's docstring promises
            F.count_distinct(qcol(c)).alias(f"{c}__nd"),
            F.round(F.min(v[c]), 6).alias(f"{c}__mn"),
            F.round(F.max(v[c]), 6).alias(f"{c}__mx"),
            F.round(F.avg(v[c]), 6).alias(f"{c}__av"),
        ]
    row = df.agg(*aggs)
    per_col = []
    for c in cols:
        per_col += [
            F.lit(c),
            qcol(f"{c}__nn"),
            qcol(f"{c}__nd"),
            qcol(f"{c}__mn"),
            qcol(f"{c}__mx"),
            qcol(f"{c}__av"),
        ]
    return row.select(
        F.col("_n_rows").alias("n_rows"),
        F.stack(F.lit(len(cols)), *per_col).alias(
            "col_name", "n_nonnull", "n_distinct", "min_val", "max_val", "avg_val"
        ),
    ).select(
        "col_name",
        "n_rows",
        "n_nonnull",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        "n_distinct",
        "min_val",
        "max_val",
        "avg_val",
    )
