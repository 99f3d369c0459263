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
