"""Join operators (SURVEY.md §2 J1 + §2B join rows).

The reference's only Spark-side join is a 4-key left-outer equi-join of
catalog views (``governance/main.py:52-58``). Here the full join family is
declared once, with the scale decisions made explicit:

- **Broadcast** small dimensions (``F.broadcast``) so fact-table joins
  never shuffle the fact side. At 100 TB the fact tables (lineitem,
  orders, events) are the only things that should ever move, and even then
  only when the join key differs from the storage partitioning.
- **Sort-merge** for fact⋈fact joins — Catalyst picks it automatically
  once both sides exceed ``autoBroadcastJoinThreshold``; AQE converts to
  broadcast at runtime when a filtered side turns out small.
- **Semi/anti** joins instead of ``IN``/``NOT IN`` subqueries: they
  short-circuit on the build side and never duplicate probe rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Sequence[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Multi-key equi-join; ``on`` is column names or (left, right) pairs."""
    if on and isinstance(on[0], tuple):
        cond = None
        for lc, rc in on:  # type: ignore[misc]
            clause = left[lc] == right[rc]
            cond = clause if cond is None else cond & clause
        return left.join(right, cond, how)
    return left.join(right, list(on), how)  # type: ignore[arg-type]


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Sequence[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side."""
    return equi_join(fact, F.broadcast(dim), on, how)


def semi_join(
    left: DataFrame, right: DataFrame, on: Sequence[str] | Sequence[tuple[str, str]]
) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS)."""
    return equi_join(left, right, on, "left_semi")


def anti_join(
    left: DataFrame, right: DataFrame, on: Sequence[str] | Sequence[tuple[str, str]]
) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return equi_join(left, right, on, "left_anti")
