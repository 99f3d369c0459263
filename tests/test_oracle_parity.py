"""Local twin of the driver's t2 gate: every declared query with an
oracle must match DuckDB on row count, column names, and values
(order-insensitive, column-name-sorted) at the test scale factor."""

from __future__ import annotations

import math

import pytest

from dask_felleskomponenter_spark.plans import ORACLES, QUERIES


def _normalize(rows: list[dict], cols: list[str]) -> list[tuple]:
    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # collapse -0.0 and fix float repr noise at the edge of the
            # explicit rounding the queries already perform
            return round(v + 0.0, 9)
        if isinstance(v, list):
            return tuple(norm_val(x) for x in v)
        try:  # decimals → float-ish string
            import decimal

            if isinstance(v, decimal.Decimal):
                return round(float(v), 9)
        except Exception:
            pass
        return v

    ordered_cols = sorted(cols)
    return sorted(
        (tuple(norm_val(r[c]) for c in ordered_cols) for r in rows),
        # None-safe total order: LEFT-join queries carry NULL columns and
        # plain tuple comparison raises TypeError on None vs int
        key=lambda t: tuple((x is None, repr(x)) for x in t),
    )


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = sdf.columns

    ddf = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in ddf.description]
    duck_rows = [dict(zip(duck_cols, row)) for row in ddf.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:5]
        pytest.fail(f"{name}: value mismatch; first diffs: {diffs}")


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES.keys()) - set(ORACLES.keys()))
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
