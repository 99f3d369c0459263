"""Python-worker daemon that pre-imports the heavy numeric stack.

``spark.python.worker.reuse`` must stay ``false`` in this engine
(long-lived reused workers accumulate interpreter state and degrade
late-session pandas stages 5-10x — re-measured this round, see
OPTIMIZATION_r10.md), so every task forks a FRESH worker from the
pyspark daemon. The fork itself is cheap, but the first pandas/Arrow
batch of every task then pays ``import pandas`` + ``import pyarrow``
(~0.3-0.5 s of pure interpreter work) inside the task's critical path —
a per-task constant that multiplies by stages x partitions in the
multimodal/raster/GEMM pipelines.

Forked children inherit the parent's ``sys.modules`` copy-on-write, so
importing the stack ONCE here — in the daemon parent, before any fork —
removes that constant from every worker while keeping fresh-fork
semantics: no worker ever re-enters a dirty interpreter, the daemon
itself runs no task code, and its pages are shared read-only across all
concurrent workers. Wired up via ``spark.python.daemon.module`` (the
standard daemon-override hook, same mechanism PySpark's own coverage
tooling uses) in ``session.get_spark``; a missing numeric stack
degrades to the stock behavior (workers import on demand) rather than
failing the daemon.
"""

from __future__ import annotations

try:  # pragma: no cover - exercised via executor forks, not pytest
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # The Arrow-serializer module every pandas_udf / mapInPandas /
    # applyInPandas worker loads before its first batch; importing it
    # here also pulls the pandas type-conversion helpers.
    import pyspark.sql.pandas.serializers  # noqa: F401
except ImportError:
    # Environments without the numeric stack still get a working
    # daemon; workers that need pandas will fail at UDF time with the
    # stock error, exactly as without this module.
    pass

# pyspark.daemon's module-level code also handles the optional
# ``argv[1]`` worker-module override, so importing it here preserves
# the stock daemon contract unchanged.
from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
