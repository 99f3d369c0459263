"""Cross-batch dedup history store (``sources/dedup_store.py``):
screen incoming batches against the accumulated corpus, bucket-aligned."""

from __future__ import annotations

import io
import re
import uuid
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from dask_felleskomponenter_spark.sources.dedup_store import (
    dedup_against_history,
    history_stats,
)


@pytest.fixture()
def table_name(spark):
    name = f"dedup_history_{uuid.uuid4().hex[:12]}"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _batch(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _novel_ids(spark, rows, table_name, batch_label):
    # update=True is the history-only path (no corpus sink to lose);
    # callers sinking novel rows must use update=False + record_novel.
    out = dedup_against_history(
        spark, _batch(spark, rows), "doc_id", "text", table_name,
        batch_label=batch_label, n_buckets=4, update=True,
    )
    return sorted(r["doc_id"] for r in out.collect())


def test_cross_batch_screening_and_idempotence(spark, table_name):
    # batch 0: a within-batch dup (1,2) — first doc_id survives
    assert _novel_ids(
        spark,
        [(1, "alpha text"), (2, "alpha text"), (3, "beta text")],
        table_name,
        "b0",
    ) == [1, 3]
    # batch 1: one seen-before doc, one new; within-batch order respected
    assert _novel_ids(
        spark,
        [(10, "beta text"), (11, "gamma text")],
        table_name,
        "b1",
    ) == [11]
    # re-ingesting batch 1 verbatim: nothing novel (idempotence)
    assert _novel_ids(
        spark,
        [(10, "beta text"), (11, "gamma text")],
        table_name,
        "b1-again",
    ) == []
    stats = {
        r["ingest_batch"]: r["n_first_seen"]
        for r in history_stats(spark, table_name).collect()
    }
    assert stats == {"b0": 2, "b1": 1}


def test_update_false_leaves_history_untouched(spark, table_name):
    _novel_ids(spark, [(1, "doc one")], table_name, "b0")
    out = dedup_against_history(
        spark, _batch(spark, [(2, "doc two")]), "doc_id", "text",
        table_name, batch_label="dry-run", n_buckets=4, update=False,
    )
    assert [r["doc_id"] for r in out.collect()] == [2]
    # the dry-run must not have recorded anything
    assert _novel_ids(spark, [(2, "doc two")], table_name, "b1") == [2]


def test_history_side_joins_without_exchange(spark, table_name):
    # The whole point of the bucketed layout: the anti-join must shuffle
    # only the incoming batch. Assert the history scan subtree has no
    # Exchange above it and the scan selects buckets.
    _novel_ids(
        spark, [(i, f"seed doc {i}") for i in range(20)], table_name, "b0"
    )
    batch = _batch(spark, [(100, "probe doc"), (101, "seed doc 3")])
    from dask_felleskomponenter_spark.operators.dedup import content_hash
    from dask_felleskomponenter_spark.operators.windows import keep_first

    hashed = keep_first(
        batch.withColumn("content_sha", content_hash("text")),
        partition_by=["content_sha"],
        order_by=[F.col("doc_id")],
    )
    # At test scale AQE would broadcast the kilobyte history (also fine);
    # disable broadcast to surface the big-history plan the layout is
    # for: bucket-aligned sort-merge with no history-side exchange.
    # The zero-shuffle read needs shuffle partitions == bucket count
    # (otherwise Spark shuffles BOTH sides to its preferred partition
    # count) — the deployment recipe the operator docstring states.
    prevs = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        plan_buf = io.StringIO()
        with redirect_stdout(plan_buf):
            hashed.join(
                spark.table(table_name), on="content_sha", how="left_anti"
            ).explain("formatted")
        plan = plan_buf.getvalue()
    finally:
        for k, v in prevs.items():
            spark.conf.set(k, v)
    assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan[:2000]
    assert "Bucketed: true" in plan, plan[:3000]
    # exactly ONE exchange in the whole plan — the batch side's;
    # a second one means the history got shuffled
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:3000]


def test_compact_history_preserves_content_and_bucketing(spark, table_name):
    # three appends → up to 3 file-sets per bucket; compaction must keep
    # every row, stay screened-correct, and leave the table bucketed
    from dask_felleskomponenter_spark.sources.dedup_store import compact_history

    for b in range(3):
        _novel_ids(
            spark,
            [(b * 100 + i, f"doc {b}-{i}") for i in range(10)],
            table_name,
            f"b{b}",
        )
    before = {
        tuple(r)
        for r in spark.table(table_name)
        .select("content_sha", "first_seen_id", "ingest_batch")
        .collect()
    }
    assert compact_history(spark, table_name, n_buckets=4) == 30
    after = {
        tuple(r)
        for r in spark.table(table_name)
        .select("content_sha", "first_seen_id", "ingest_batch")
        .collect()
    }
    assert after == before
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE EXTENDED {table_name}").collect()
    }
    assert desc.get("Num Buckets") == "4", desc
    # screening still works (and is idempotent) against the compacted table
    assert _novel_ids(
        spark, [(999, "doc 1-5"), (1000, "brand new")], table_name, "b3"
    ) == [1000]


def test_null_content_screens_idempotently(spark, table_name):
    # sha2(NULL) is NULL and a NULL join key matches nothing — without
    # the sentinel, a NULL-content row would be "novel" on every replay
    assert _novel_ids(
        spark, [(1, None), (2, "real text")], table_name, "b0"
    ) == [1, 2]
    assert _novel_ids(
        spark, [(5, None), (6, "real text")], table_name, "b0-replay"
    ) == []


def test_interrupted_compaction_swap_recovers(spark, table_name):
    _novel_ids(spark, [(1, "kept doc")], table_name, "b0")
    # crash between the two renames: live name missing, history in __old
    spark.sql(f"ALTER TABLE {table_name} RENAME TO {table_name}__old")
    # the next screening call must recover the history, not restart it
    assert _novel_ids(spark, [(2, "kept doc")], table_name, "b1") == []
    assert not spark.catalog.tableExists(f"{table_name}__old")
    # crash before the final cleanup drop: stale __old beside the live
    spark.sql(
        f"CREATE TABLE {table_name}__old AS SELECT * FROM {table_name}"
    )
    assert _novel_ids(spark, [(3, "kept doc")], table_name, "b2") == []
    assert not spark.catalog.tableExists(f"{table_name}__old")
