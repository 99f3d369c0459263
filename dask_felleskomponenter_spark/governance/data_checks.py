"""Data-quality governance: scans over table CONTENT, not metadata.

The reference's governance pack validates metadata only (tags, comment,
codelists); a training-data platform also needs content gates before a
table is promoted. This module adds the first one — a PII scan over
declared text columns — expressed in the same currency as the metadata
checks (``MetadataError`` findings with executable remedies) so both
kinds of finding flow through one reporting path.

Scale: ONE aggregate job over the table regardless of how many columns
are scanned — all per-column hit counts are conditional aggregates in a
single ``agg`` (map-side combined; the shuffle carries one partial row
per partition). No sampling: at 100 TB a sampled PII scan is a
compliance hole, and a full regex pass is scan-bound anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_felleskomponenter_spark.functions.text import PII_PATTERNS
from dask_felleskomponenter_spark.governance.model import MetadataError


def scan_text_pii(
    df: DataFrame,
    columns: list[str],
    table: str | None = None,
) -> list[MetadataError]:
    """Scan ``columns`` for PII; one finding per (column, kind) with at
    least one matching row. The remedy is the executable redaction
    expression (``functions/text.py::redact_pii``) for that column."""
    from dask_felleskomponenter_spark.operators.shuffle import quoted_col

    # The alias round-trip below rsplits on the LAST space, which is
    # only sound while PII kind keys are space-free identifiers —
    # enforce the invariant where it is relied on, not by convention.
    spaced = [k for k in PII_PATTERNS if " " in k]
    if spaced:
        raise ValueError(
            f"PII kind keys must be space-free identifiers, got {spaced}"
        )
    aggs = []
    for col in columns:
        for kind in PII_PATTERNS:
            # existence, not count: regexp_like short-circuits at the
            # first match, where regexp_count would keep scanning a
            # PII-dense document to tally matches nobody consumes.
            # quoted_col: a governance gate must not abort on a legal
            # dotted/backticked column name.
            aggs.append(
                F.sum(
                    F.regexp_like(
                        quoted_col(col), F.lit(PII_PATTERNS[kind])
                    ).cast("long")
                ).alias(f"{col} {kind}")
            )
    if not aggs:
        return []
    row = df.agg(*aggs).first()

    parts = (table or "").split(".")
    if len(parts) == 3:
        catalog, schema, tbl = parts
    elif len(parts) == 2:  # the common 'schema.table' two-part form
        catalog, (schema, tbl) = None, parts
    else:
        catalog, schema, tbl = None, None, table
    findings = []
    for key, n in row.asDict().items():
        col, kind = key.rsplit(" ", 1)  # column names may contain spaces
        if n and n > 0:
            # The remedy must be EXECUTABLE: inside a Spark SQL
            # single-quoted literal the default parser consumes
            # backslashes ('\d' → 'd'), so the regex's backslashes (and
            # any quote) must be escaped or the suggested SQL throws /
            # over-redacts.
            sql_pat = (
                PII_PATTERNS[kind]
                .replace("\\", "\\\\")
                .replace("'", "\\'")
            )
            # identifier escaping for the remedy too: an embedded
            # backtick must be doubled or the suggested SQL is
            # unparseable (unbalanced backtick)
            col_ident = col.replace("`", "``")
            findings.append(
                MetadataError(
                    catalog=catalog,
                    schema=schema,
                    table=tbl,
                    column=col,
                    description=(
                        f"Column '{col}' contains {kind} PII in {n} row(s); "
                        "redact before promotion."
                    ),
                    solution=(
                        f"SELECT regexp_replace(`{col_ident}`, "
                        f"'{sql_pat}', '[{kind.upper()}]') ..."
                    ),
                    for_field=f"pii.{kind}",
                    valid_values=[],
                )
            )
    return findings
