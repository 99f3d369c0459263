"""Incremental aggregate maintenance (materialized-view refresh).

The warehouse pattern the reference's snapshot sync cannot express:
keep a per-key summary table current under append-only batches at cost
O(|batch| + |summary|) instead of re-aggregating the full history. For
decomposable aggregates (SUM / COUNT — and AVG as SUM/COUNT at read
time) the refresh is:

    delta   = batch.groupBy(keys).agg(partials)
    summary = (summary ∪ delta).groupBy(keys).agg(merge partials)

Scale posture: the history table is never read — only the (small,
per-key) summary and the new batch shuffle. The rewrite goes through a
staging path and an atomic-ish swap so a failed refresh never leaves a
half-written summary; a lakehouse table format (Delta/Iceberg) would
replace the swap with a transactional MERGE, with the same dataflow.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: count column maintained alongside the sums — needed to merge AVG and
#: to keep refreshes idempotent-checkable
COUNT_COL = "_n_rows"


def _aggregate(df: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(COUNT_COL),
        *[F.sum(c).alias(c) for c in sum_cols],
    )


def refresh_incremental_summary(
    spark: SparkSession,
    summary_path: str,
    batch_df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Fold one append-only batch into the parquet summary at
    ``summary_path`` (created on first call). Returns the refreshed
    summary DataFrame.

    The merge is a union + re-aggregate of two per-key tables — one
    shuffle of summary-sized data. The new summary is written to a
    staging directory first and swapped in, so readers never observe a
    partial refresh and a crashed job leaves the old summary intact."""
    delta = _aggregate(batch_df, keys, sum_cols)
    if _exists(summary_path):
        old = spark.read.parquet(summary_path)
        combined = (
            old.unionByName(delta)
            .groupBy(*keys)
            .agg(
                F.sum(COUNT_COL).alias(COUNT_COL),
                *[F.sum(c).alias(c) for c in sum_cols],
            )
        )
    else:
        combined = delta

    staging = os.path.join(
        tempfile.gettempdir(), f"summary_staging_{uuid.uuid4().hex}"
    )
    combined.write.mode("overwrite").parquet(staging)
    old_dir = summary_path + ".old"
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    if os.path.exists(summary_path):
        os.rename(summary_path, old_dir)
    shutil.move(staging, summary_path)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    return spark.read.parquet(summary_path)


def summary_with_avg(
    summary: DataFrame, sum_cols: Sequence[str]
) -> DataFrame:
    """Read-time AVG derivation from the maintained partials."""
    out = summary
    for c in sum_cols:
        out = out.withColumn(f"avg_{c}", F.col(c) / F.col(COUNT_COL))
    return out


def _exists(path: str) -> bool:
    return os.path.exists(path)
