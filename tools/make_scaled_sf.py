#!/usr/bin/env python
"""Scale the driver testdata up by integer replication for local
scaling rehearsals (e.g. sf0.1 ×10 → a synthetic "sf1.0").

Usage:
    python tools/make_scaled_sf.py [SRC_SF_DIR] [OUT_DIR] [FACTOR]

Defaults: /root/testdata/sf0.1 → ./.scratch/sf1.0, factor 10.

This is a MEASUREMENT corpus, not new testdata: correctness stays
pinned to the driver-generated files; this exists so per-query scaling
exponents can be observed at ~6M lineitem rows in the sandbox.

Replication must not distort the statistics the engine's cost
actually depends on, so each copy k:

- offsets every entity key by ``k * 10_000_000`` (customer, supplier,
  part, orders, lineitem FKs, events.user_id/event_id, doc_id,
  vec_id) — join fan-outs, group cardinalities per key, and duplicate
  densities all stay exactly sf0.1-shaped while global cardinality
  grows linearly, matching how TPC-H scales (dims `region`/`nation`
  stay fixed);
- rewrites document text for k>0 by suffixing every word with ``~k``
  (n_chars recomputed): shingle sets become disjoint across copies, so
  the near-dup/minhash family sees the SAME duplication ratio at 10×
  volume instead of every document acquiring 9 planted near-twins (a
  quadratic candidate-pair blowup no real crawl has);
- applies a per-copy ORTHOGONAL transform to embeddings for k>0
  (deterministic dimension permutation + sign flips): an isometry, so
  every intra-copy cosine — the cluster structure the similarity
  queries measure — is preserved EXACTLY and unit norms survive
  without renormalization, while cross-copy similarities drop to the
  random-unit-vector level (rms |cos| = 1/√64 ≈ 0.125, far under the
  0.4 pair threshold), so similarity-search cost scales with corpus
  size, not with artificial exact-twin clusters.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

KEY_OFFSET = 10_000_000

#: per-table bigint key columns to offset per copy
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: output files per copy (bounded task counts at local scale)
FILES_PER_COPY = {"lineitem": 4, "orders": 2, "events": 2}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO_ROOT, ".scratch", "sf1.0")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from dask_felleskomponenter_spark.session import get_spark
    from dask_felleskomponenter_spark.sources import load_table

    spark = get_spark(app_name="make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    for name in ("region", "nation"):
        load_table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: copied (fixed dim)")

    for name, keys in OFFSET_COLS.items():
        base = load_table(spark, src, name)
        # LOUD key-range guard: the per-copy offset scheme is only
        # collision-free while every source key fits under KEY_OFFSET.
        # A larger source (e.g. sf10, max o_orderkey 60M > 10M) would
        # silently interleave copy k's offset keys into copy k+1's
        # range — duplicate keys, corrupted join fan-out, and every
        # downstream scaling measurement wrong with no error.
        maxes = base.select(
            *[F.max(F.col(c)).alias(c) for c in keys]
        ).collect()[0]
        for c in keys:
            if maxes[c] is not None and maxes[c] >= KEY_OFFSET:
                raise SystemExit(
                    f"{name}.{c} max key {maxes[c]} >= KEY_OFFSET "
                    f"{KEY_OFFSET}: offset copies would collide — "
                    f"raise KEY_OFFSET for this source"
                )
        dest = os.path.join(out, f"{name}.parquet")
        n_files = FILES_PER_COPY.get(name, 1)
        for k in range(factor):
            df = base
            for c in keys:
                df = df.withColumn(c, F.col(c) + F.lit(k * KEY_OFFSET))
            if name == "documents" and k > 0:
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"~{k}")),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if name == "embeddings" and k > 0:
                import random as _random

                rng = _random.Random(k * 7919)
                dim = 64
                perm = list(range(dim))
                rng.shuffle(perm)
                signs = [rng.choice((1.0, -1.0)) for _ in range(dim)]
                # flat 64-element constructor: whole-stage codegen, no
                # HOF-captured-array re-evaluation
                df = df.withColumn(
                    "embedding",
                    F.array(
                        *[
                            (
                                F.col("embedding")[perm[i]]
                                * F.lit(signs[i])
                            ).cast("float")
                            for i in range(dim)
                        ]
                    ),
                )
            mode = "overwrite" if k == 0 else "append"
            df.coalesce(n_files).write.mode(mode).parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows ({factor} copies)")

    spark.stop()


if __name__ == "__main__":
    main()
