"""CSV/JSON ingest tests: Json2Spark-typed reads, permissive corrupt-row
quarantine, strict failfast."""

from __future__ import annotations

import pytest

from dask_felleskomponenter_spark.sources.files import CORRUPT_COL, read_csv, read_json

DOC_SCHEMA = {
    "type": "object",
    "required": ["id"],
    "properties": {
        "id": {"type": "integer"},
        "name": {"type": "string"},
        "score": {"type": "number"},
    },
}


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("id,name,score\n1,alpha,0.5\n2,beta,0.25\nnot-an-int,gamma,x\n")
    return str(p)


@pytest.fixture()
def json_file(tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text('{"id": 1, "name": "alpha", "score": 0.5}\n{"id": "oops"}\n')
    return str(p)


def test_csv_json_schema_typing(spark, csv_file):
    df = read_csv(spark, csv_file, DOC_SCHEMA)
    types = dict(df.dtypes)
    assert types["id"] == "bigint" and types["score"] == "double"
    good = df.filter(df[CORRUPT_COL].isNull()).collect()
    assert {(r["id"], r["name"]) for r in good} == {(1, "alpha"), (2, "beta")}


def test_csv_corrupt_quarantine(spark, csv_file):
    df = read_csv(spark, csv_file, DOC_SCHEMA)
    bad = df.filter(df[CORRUPT_COL].isNotNull()).collect()
    assert len(bad) == 1 and "not-an-int" in bad[0][CORRUPT_COL]


def test_csv_strict_raises(spark, csv_file):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException)):
        read_csv(spark, csv_file, DOC_SCHEMA, strict=True).collect()


def test_json_lines(spark, json_file):
    # cache: Spark disallows queries over raw JSON that reference only
    # the internal corrupt-record column (SPARK-21610)
    df = read_json(spark, json_file, DOC_SCHEMA).cache()
    good = df.filter(df[CORRUPT_COL].isNull()).collect()
    assert [(r["id"], r["name"], r["score"]) for r in good] == [(1, "alpha", 0.5)]
    assert df.filter(df[CORRUPT_COL].isNotNull()).count() == 1


def test_read_jdbc_partitioned_options():
    """read_jdbc (S5 read twin) builds a partition-parallel JDBC scan;
    option-level test mirroring test_sync's no-database style."""
    from unittest.mock import MagicMock

    from dask_felleskomponenter_spark.sources.files import read_jdbc

    spark = MagicMock()
    reader = spark.read.format.return_value
    reader.option.return_value = reader

    df = read_jdbc(
        spark,
        "jdbc:postgresql://h:5432/db",
        "public.tbl",
        partition_column="id",
        lower_bound=0,
        upper_bound=100_000,
        num_partitions=16,
        fetchsize="5000",
    )
    spark.read.format.assert_called_once_with("jdbc")
    opts = dict(c.args for c in reader.option.call_args_list)
    assert opts["url"] == "jdbc:postgresql://h:5432/db"
    assert opts["dbtable"] == "public.tbl"
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "100000"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "5000"
    reader.load.assert_called_once_with()
    assert df is reader.load.return_value


def test_read_jdbc_partition_column_requires_bounds():
    from unittest.mock import MagicMock

    from dask_felleskomponenter_spark.sources.files import read_jdbc

    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(MagicMock(), "jdbc:x", "t", partition_column="id")
