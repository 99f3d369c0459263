#!/usr/bin/env python
"""Capture .explain("formatted") output for declared queries.

Usage:
  python tools/capture_plans.py <suffix> [query ...]

Writes plans/r10/<query>_<suffix>.txt for each named query (default: a
built-in hot list). The plan is the pre-execution formatted plan
(AdaptiveSparkPlan initial plan) — the artifact the optimization round
commits as before/after evidence. Uses SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) so plan shapes match the bench's data layout.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: capture_plans.py <suffix> [query ...]")
    suffix = sys.argv[1]
    names = sys.argv[2:]

    from dask_felleskomponenter_spark.plans import QUERIES
    from dask_felleskomponenter_spark.session import get_spark

    if not names:
        names = list(QUERIES.keys())
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {', '.join(unknown)}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO_ROOT, "plans", os.environ.get("PLANS_ROUND", "r11")
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dfs-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
