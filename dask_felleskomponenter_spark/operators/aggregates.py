"""Aggregation operators beyond plain groupBy (scale tooling).

``two_phase_salted_agg`` is the standard skew mitigation for heavy-key
aggregation: a pathological key (one user with 10% of a 100 TB event
stream) funnels into a single reducer under plain ``groupBy``. Salting
splits every key into ``salt_buckets`` sub-keys for a first partial
aggregation (spreading the hot key over the cluster), then merges the
partials in a second, tiny aggregation. Only decomposable aggregates
are supported — their merge is exact, so the result is byte-identical
to the unsalted groupBy (oracle-checked in ``plans/queries.py``).

Note AQE's ``skewJoin`` handles skewed *joins*; skewed *aggregation*
over a non-associative pipeline (e.g. collect_list) has no AQE rescue,
which is why the operator restricts to mergeable functions.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: agg name -> (phase-1 partial fn, phase-2 merge fn)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def two_phase_salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof grouped aggregation.

    ``aggs`` maps output column name -> (function, input column) with
    function in {sum, count, min, max}. Result equals
    ``df.groupBy(keys).agg(...)`` exactly; the difference is the
    physical shape: the first shuffle's key space is ``|keys| ×
    salt_buckets`` so no single reducer owns a hot key, and the second
    shuffle moves only ``salt_buckets`` partial rows per key.
    """
    unknown = [f for f, _ in aggs.values() if f not in _MERGEABLE]
    if unknown:
        raise ValueError(
            f"non-decomposable aggregate(s) {unknown}; salting requires "
            f"mergeable functions {sorted(_MERGEABLE)}"
        )
    key_cols = list(keys)
    # Retry-deterministic, map-column-safe per-row salt; rationale in
    # operators/shuffle.py::deterministic_row_salt (shared with
    # joins.salted_join).
    from dask_felleskomponenter_spark.operators.shuffle import (
        deterministic_row_salt,
        fresh_name,
        quoted_col,
    )

    # Keys resolve by EXACT name (quoted_col) in every phase: a bare
    # string key containing a dot ("user.id") groups fine in phase 1
    # but phase 2's groupBy on the PARTIAL — whose output column is the
    # literal name, not a struct — would fail UNRESOLVED_COLUMN where
    # the plain twin succeeds. Exact resolution keeps both phases (and
    # the schema twin below) on the same column.
    key_exprs = [quoted_col(k) for k in key_cols]

    salt_col = fresh_name("_salt", df, extra=set(aggs))
    salt = deterministic_row_salt(df, salt_buckets).alias(salt_col)

    # Partial aliases get the same collision treatment as the salt: a
    # grouping key literally named "_p_<out>" would otherwise make
    # phase 2's merge reference AMBIGUOUS_REFERENCE (or bind the key).
    # Reserving each chosen alias as we go keeps two outputs from
    # resolving to the same fresh name (a df column "_p_a" with outputs
    # "a" and "a0" would otherwise both yield "_p_a0").
    _taken = set(aggs) | {salt_col}
    partial_alias: dict[str, str] = {}
    for out in aggs:
        alias = fresh_name(f"_p_{out}", df, extra=_taken)
        partial_alias[out] = alias
        _taken.add(alias)

    # The merge must reproduce the PLAIN groupBy's result schema, not
    # just its values: sum-of-sum widens decimals twice (decimal(10,2)
    # → (20,2) → (30,2)) and sum-of-count is nullable where count is
    # not — either difference breaks a downstream unionByName /
    # insertInto against the unsalted twin. Resolve the target dtypes
    # from the unsalted plan (schema-only, nothing executes) and cast
    # the merged columns back.
    plain_schema = df.groupBy(*key_exprs).agg(
        *[
            _MERGEABLE[fn][0](quoted_col(col)).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    ).schema

    partial = (
        # quoted_col on the passthrough too: select(*df.columns) feeds
        # raw name strings back into the analyzer, which path-parses a
        # dotted name exactly like the key/input cases above
        df.select(*[quoted_col(c) for c in df.columns], salt)
        .groupBy(*key_exprs, quoted_col(salt_col))
        .agg(
            *[
                # quoted_col on the INPUT too: F.sum("a.b") path-parses
                # a dotted value column exactly like the key case above
                _MERGEABLE[fn][0](quoted_col(col)).alias(partial_alias[out])
                for out, (fn, col) in aggs.items()
            ]
        )
    )
    def merge_col(out: str, fn: str):
        # quoted_col, not a bare string: an output name containing a
        # dot ("p.total") aliases the partial as "_p_p.total", which an
        # unquoted reference parses as struct field 'total' of column
        # '_p_p' — failing where the plain groupBy twin succeeds and
        # breaking the exact-equality contract above.
        merged = _MERGEABLE[fn][1](quoted_col(partial_alias[out]))
        if fn == "count":
            # plain count() is NON-nullable; sum-of-partials is nullable
            # by signature (never by value — every group has a partial
            # row). coalesce with a non-null literal restores the exact
            # nullability, which cast alone cannot.
            merged = F.coalesce(merged, F.lit(0))
        return merged.cast(plain_schema[out].dataType).alias(out)

    return partial.groupBy(*[quoted_col(k) for k in key_cols]).agg(
        *[merge_col(out, fn) for out, (fn, col) in aggs.items()]
    )
