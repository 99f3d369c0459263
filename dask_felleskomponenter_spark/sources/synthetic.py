"""Custom Python data source (Spark 4 DataSource API): deterministic
synthetic document corpora at any scale, no files.

The extension-surface exemplar: where the reference is limited to
catalog tables and JDBC, the open engine can register pure-Python
sources that Spark schedules like any other scan — partition-parallel,
executor-side generation, zero driver data movement. Used for scale
testing (generate a 10 TB corpus by raising two options) and for
fixture corpora with EXACTLY reproducible content: rows depend only on
``(seed, partition, row)``, never on scheduling, so two reads — or two
clusters — produce identical tables.

Register once per session, then it is a normal format::

    spark.dataSource.register(SyntheticDocuments)
    df = (spark.read.format("synthetic_documents")
          .option("n_partitions", 64)
          .option("rows_per_partition", 100_000)
          .option("seed", 7)
          .load())
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_VOCAB = (
    "key value table row scan merge sort hash join filter agg window "
    "batch stream part spark fast slow line the a of to and in is"
).split()

_LANGS = ("en", "de", "es", "fr", "und")


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_partitions = int(options.get("n_partitions", 4))
        self.rows = int(options.get("rows_per_partition", 100))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        p = partition.value
        for i in range(self.rows):
            # shared row generator: the batch reader and the stream
            # reader must draw from the seeded RNG in the SAME order, or
            # identical (seed, partition, row) keys yield different rows
            # and the "micro-batch twin" determinism contract breaks
            lang, text = _doc_row(self.seed, p, i)
            yield (p * self.rows + i, lang, text)


def _doc_row(seed: int, partition: int, row: int) -> tuple:
    """One deterministic document row, keyed by (seed, partition, row):
    content is independent of iteration order and retries."""
    rng = random.Random(f"{seed}:{partition}:{row}")
    n_words = rng.randint(5, 60)
    return rng.choice(_LANGS), " ".join(
        rng.choice(_VOCAB) for _ in range(n_words)
    )


class _StreamReader(DataSourceStreamReader):
    """Micro-batch twin of the batch reader: offsets count whole
    batches, each batch fans out ``n_partitions`` executor-side
    generator partitions, and ``(seed, batch, partition, row)`` keys the
    content — replays after failure produce byte-identical batches
    (the property exactly-once sinks rely on).

    ``max_batches`` bounds the stream so ``availableNow`` terminates;
    production sources would return the real upstream high-watermark
    from ``latestOffset`` instead."""

    def __init__(self, options):
        self.n_partitions = int(options.get("n_partitions", 4))
        self.rows = int(options.get("rows_per_partition", 100))
        self.seed = int(options.get("seed", 0))
        self.max_batches = int(options.get("max_batches", 3))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        return {"batch": self.max_batches}

    def partitions(self, start: dict, end: dict):
        return [
            InputPartition((b, p))
            for b in range(int(start["batch"]), int(end["batch"]))
            for p in range(self.n_partitions)
        ]

    def read(self, partition):
        b, p = partition.value
        base = (b * self.n_partitions + p) * self.rows
        for i in range(self.rows):
            lang, text = _doc_row(self.seed, b * self.n_partitions + p, i)
            yield (base + i, lang, text)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — generation is stateless


class SyntheticDocuments(DataSource):
    """``synthetic_documents`` format: (doc_id, lang, text) rows,
    batch and micro-batch stream (doc_id encodes the batch)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_documents"

    def schema(self) -> str:
        return "doc_id bigint, lang string, text string"

    def reader(self, schema):
        return _Reader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register_synthetic_sources(spark) -> None:
    """Idempotent registration of all custom Python sources."""
    spark.dataSource.register(SyntheticDocuments)
