"""Similarity search over embedding columns (LLM-pipeline pack).

Brute-force cosine top-k is the exact baseline (oracle-checkable); the
LSH-bucketed variant is the 100 TB scale path — random-hyperplane buckets
turn the all-rows scan into a bucket-local scan, trading recall for a
~2^bits fan-in reduction. Both use only built-in higher-order functions
(``zip_with`` + ``aggregate``) so the dot products run in the JVM, no
Python in the loop.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_vec(col: str | Column) -> Column:
    """Cast array<float> → array<double> so arithmetic is double-precision
    end-to-end (matches any SQL oracle computing in doubles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _safe_norm(a: Column) -> Column:
    """L2 norm floored at 1e-12 for use as a divisor: a zero vector
    (empty document's embedding) must score 0, not kill the whole query
    with ANSI DIVIDE_BY_ZERO. Mirrors the PQ encoder's ``_norm_expr``.

    TRAP: for an array containing a NULL *element*, ``l2_norm`` is NULL
    and ``greatest(NULL, 1e-12)`` SKIPS the NULL — the floor becomes the
    answer, so anywhere the norm divides individual elements (the index
    builds) one dirty element would turn into a ~1e12-scale normalized
    vector. Pure scorers are safe (their NULL numerator dominates), but
    every build/encode path must exclude such rows first — see
    ``elements_nonnull``."""
    return F.greatest(l2_norm(a), F.lit(1e-12))


def elements_nonnull(col: str | Column) -> Column:
    """True iff the array is non-NULL and contains no NULL element.

    Element-NULL vectors NULL every aggregate built over them (``dot``,
    ``l2_norm``) yet pass a bare ``isNotNull()`` + ``size()`` guard, so
    without this check they would (a) poison centroid/codebook means via
    the ``_safe_norm`` 1e-12 floor and (b) file into valid-looking
    bucket-0 / highest-cell / code-0 slots of a partitioned ANN store.
    All index builds and all bucket/cell/code guards treat them as
    NULL-equivalent."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & F.forall(c, lambda x: x.isNotNull())


def with_vector_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    """Precompute L2 norms once; at scale this is written alongside the
    embeddings so queries never recompute it.

    ``out_col`` is an output-contract column: a collision with existing
    data raises (the ``shuffle.ensure_absent`` policy) — silently
    replacing a precomputed column and persisting the result corrupts a
    store with no error."""
    from dask_felleskomponenter_spark.operators.shuffle import ensure_absent

    ensure_absent(out_col, df, what="out_col")
    return df.withColumn(out_col, l2_norm(as_double_vec(vec_col)))


def literal_vector(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    emb_df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "cosine",
) -> DataFrame:
    """Exact top-k by cosine similarity against one literal query vector.

    One narrow projection + TakeOrderedAndProject: Spark computes the
    per-partition top-k map-side and only k rows per partition reach the
    driver-side merge — no full sort, no shuffle of the scores.
    Deterministic tie-break on ``id_col``.
    """
    q = literal_vector(query_vec)
    qn = max(math.sqrt(sum(float(v) * float(v) for v in query_vec)), 1e-12)
    v = as_double_vec(vec_col)
    cos = dot(v, q) / (_safe_norm(v) * F.lit(qn))
    return (
        emb_df.select(F.col(id_col), cos.alias(score_col))
        # NaN too, not just NULL: one NaN/Inf element makes a NaN score,
        # and Spark sorts NaN GREATEST — a single dirty vector would
        # occupy the #1 slot of every top-k, evicting a real neighbor
        # (the GEMM twin's `>= thr` comparison already drops it)
        .filter(F.col(score_col).isNotNull() & ~F.isnan(score_col))
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(k)
    )


def partition_local_topk(
    scored: DataFrame,
    k: int,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    score_col: str = "cosine",
) -> DataFrame:
    """Shuffle-free top-k pre-reduction: within every input partition,
    keep only the k best rows per query under the total order
    ``(score desc, id asc)``.

    The global top-k under a total order is always contained in the
    union of per-partition top-ks, so following this with a per-query
    merge is exact — but the merge now receives ``k × n_partitions``
    rows per query instead of the full scored set. Without this stage,
    ``Window.partitionBy(query_id)`` funnels all n scored rows into one
    reducer per query: with a handful of queries over a 100 TB table
    that single reducer is the job (VERDICT r2 finding).

    Implementation is an Arrow-batched ``mapInPandas`` over the narrow
    ``(query_id, id, score)`` projection — declarative built-ins cannot
    express a partition-local reduction (a window on
    ``(query_id, spark_partition_id())`` or a groupBy on the same keys
    still inserts an exchange carrying every scored row, because
    Catalyst cannot know the key aligns with the physical partitioning).
    The Python stage only *selects* rows computed JVM-side — scores pass
    through Arrow bit-exact, so oracle parity is unaffected.

    NaN ordering matches Spark's (NaN greatest, so first under desc):
    ``na_position='first'`` below. NULL query ids survive: the final
    window treats NULLs as one ordinary partition, so the pre-reduction
    must too — pandas groupby defaults to ``dropna=True``, which would
    silently delete the whole NULL-key group here (``dropna=False``).
    """
    import pandas as pd

    schema = scored.schema

    def run(batches):
        acc: pd.DataFrame | None = None
        for pdf in batches:
            both = pd.concat([acc, pdf]) if acc is not None else pdf
            both = both.sort_values(
                [score_col, id_col],
                ascending=[False, True],
                na_position="first",
                kind="mergesort",
            )
            acc = both.groupby(query_id_col, sort=False, dropna=False).head(k)
        if acc is not None:
            yield acc

    return scored.mapInPandas(run, schema=schema)


def cosine_topk_per_query(
    emb_df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    score_col: str = "cosine",
    round_digits: int | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact top-k per query row: broadcast the (small) query set against
    the full embedding table, pre-reduce to the per-partition top-k
    (``partition_local_topk``), then merge per query.

    The crossJoin is broadcast-nested-loop with the query side broadcast —
    the embedding table streams through once regardless of query count.
    The final window sees only ``k × n_partitions`` rows per query, so
    no reducer ever holds the full scored set.

    ``round_digits`` rounds the score *before* ranking (cross-engine
    determinism at the top-k boundary); ``rank_col`` exposes the 1-based
    rank instead of dropping it.
    """
    from pyspark.sql import Window

    v = as_double_vec(vec_col)
    qv = as_double_vec(query_vec_col)
    score = dot(v, qv) / (_safe_norm(v) * _safe_norm(qv))
    if round_digits is not None:
        score = F.round(score, round_digits)
    # NULL scores (NULL embedding, length-mismatched zip) are filtered
    # JVM-side, where NULL is still distinguishable from NaN: Arrow
    # hands both to pandas as NaN, and the pre-reduction's NaN-first
    # ordering (correct for real NaN, which Spark sorts greatest) would
    # let NULL rows evict genuine top-k candidates that the final
    # window (NULLs last) then cannot recover.
    scored = (
        emb_df.crossJoin(F.broadcast(query_df))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            score.alias(score_col),
        )
        # NaN filtered with NULL (see cosine_topk): NaN sorts greatest
        # under desc on BOTH the pandas pre-reduction and the final
        # window, so one NaN/Inf-element vector would win every query
        .filter(F.col(score_col).isNotNull() & ~F.isnan(score_col))
    )
    if rank_col:
        from dask_felleskomponenter_spark.operators.shuffle import (
            ensure_absent,
        )

        # rank_col is an output-contract name: renaming _rn onto an
        # existing column would emit a DataFrame with two same-named
        # columns (AMBIGUOUS_REFERENCE at the caller's next select)
        ensure_absent(rank_col, scored, what="rank_col")
    reduced = partition_local_topk(scored, k, id_col, query_id_col, score_col)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    out = reduced.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return (
        out.withColumnRenamed("_rn", rank_col) if rank_col else out.drop("_rn")
    )


def cosine_neardup_pairs(
    emb_df: DataFrame,
    threshold: float,
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "cosine",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (``id_a < id_b``,
    cosine ≥ threshold) via blocked matrix multiply.

    All-pairs cosine is a dense GEMM, and per-pair JVM expressions (or a
    naive crossJoin) would evaluate O(n²) dot products row-at-a-time.
    Instead: vectors are hashed into ``n_blocks`` blocks, every block
    *pair* becomes one ``applyInPandas`` group holding the two blocks'
    rows, and the group computes its similarity tile with one
    numpy ``A @ B.T``. Each vector is replicated to ``n_blocks`` groups
    per side — the standard O(n·√P) data movement of blocked all-pairs —
    and no tile ever exceeds (n/n_blocks)² scores in memory. Scale knob:
    ``n_blocks`` grows with √(cluster cores); skew-free because block
    assignment is a hash of the id.

    Scores are rounded to 9 decimals *before* thresholding so the
    accept/reject decision is reproducible across engines (BLAS vs SQL
    summation order differs in the last ulps).

    ``n_blocks=None`` (the default) derives the block count from the
    session's ``defaultParallelism`` under the Python-stage quarter-width
    rule (``plans/queries.py::python_fanout``): tiles ≈ cores/4, i.e.
    ``n_blocks = max(2, isqrt(cores // 2))``. Every tile is one
    applyInPandas task paying a worker fork + Arrow setup, so tile count
    should track cores — not a constant tuned for either local mode or
    one cluster size; on 32 local cores this picks 4 (10 tiles,
    measured 0.97 s vs 1.21 s at the old fixed 8/36 tiles at sf0.1),
    on a 1024-core cluster 22 (253 tiles) — plus a corpus-size floor
    (√(estimated input bytes / 8 MiB), capped at 256) so a low-core
    machine reading a large corpus still gets memory-bounded tiles
    instead of (n/2)²-score monsters. Block membership only
    partitions WHICH task computes a pair — every pair is still scored
    once from the same normalized vectors — so the result is
    byte-identical for any block count (property-tested).
    """
    import math

    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
    )

    if n_blocks is None:
        try:
            cores = emb_df.sparkSession.sparkContext.defaultParallelism
        except Exception:  # Spark Connect: no sparkContext
            cores = 16
        # Size floor alongside the cores rule: tile memory is
        # data-sized, not core-sized — deriving blocks from cores alone
        # would hand a low-core machine reading a big corpus a tile of
        # (n/2)² scores. √(bytes/8 MiB) keeps per-tile vector payload
        # roughly √-bounded as the input grows (Catalyst's optimized-
        # plan size estimate; parquet scans report real file bytes).
        # Estimates at or above ~1 EiB are Catalyst's "unknown" default
        # — treat as no information, never as a giant corpus. Capped at
        # 256 blocks: beyond that, tile-count scheduling overhead beats
        # any memory relief this heuristic can offer.
        try:
            est_bytes = int(
                emb_df._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes()
            )
        except Exception:  # Spark Connect / stats unavailable
            est_bytes = 0
        if est_bytes >= (1 << 60):
            est_bytes = 0
        size_blocks = min(256, math.isqrt(est_bytes // (8 << 20)))
        n_blocks = max(2, math.isqrt(max(cores, 2) // 2), size_blocks)
    if int(n_blocks) < 1:
        # n_blocks=0 aborts at runtime with an opaque pmod
        # DIVIDE_BY_ZERO deep in the explode stage; negative values emit
        # garbage block keys and silently WRONG pairs
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks!r}")
    # NULL ids raise LOUDLY (graph.py's _nonnull_guard policy): a NULL
    # id passes the vector filter (xxhash64(NULL) is the seed — a real
    # block), then either crashes the pandas tile (string ids: None in
    # `<` comparisons) or worse, Arrow converts the int64-with-null id
    # column to float64 — the NULL becomes NaN and every other id in
    # the tile >= 2^53 is silently ROUNDED, feeding corrupt pair ids to
    # connected_components with no error.
    id_type = emb_df.schema[id_col].dataType
    guarded_id = F.when(F.col(id_col).isNotNull(), F.col(id_col)).otherwise(
        F.raise_error(
            F.lit(
                f"cosine_neardup_pairs: NULL {id_col!r} — ids must be "
                "non-null (a NULL id cannot name a pair); assign ids first"
            )
        ).cast(id_type)
    )
    # NULL embeddings would reach the numpy tile as None (np.stack
    # raises on ragged/None input, killing the whole job) and the JVM
    # scoring paths define them as no-match anyway — filter before the
    # shuffle, mirroring cosine_topk_per_query's null handling. NULL
    # *elements* go too: they'd arrive as NaN/object cells and corrupt
    # the GEMM, where the JVM zip_with twin scores such pairs NULL.
    tagged = emb_df.filter(elements_nonnull(vec_col)).select(
        guarded_id.alias("_id"),
        as_double_vec(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    # Each row explodes into its n_blocks+1 block-pair memberships with
    # PURE ARITHMETIC over a tiny constant sequence — a row in block b
    # is the L side of every pair (b, b2>=b) and the R side of every
    # pair (b1<=b, b), and slot s ∈ [0, n_blocks] maps exactly onto
    # that union: s ∈ [b, n_blocks) are the L memberships (b2 = s), the
    # remaining b+1 slots (s < b, plus s = n_blocks) are the R
    # memberships (b1 = min(s, b)). Same replication as the textbook
    # two-joins-against-a-pair-table formulation, but the corpus (the
    # widest input of the operator) is SCANNED AND PROJECTED ONCE — and
    # unlike a literal membership table (n_blocks² structs in the plan)
    # the whens stay inside whole-stage codegen with no plan-size
    # blowup (the literal form measured 1.6× slower end-to-end).
    s = F.col("_s")
    blk = F.col("_blk")
    is_l = (s >= blk) & (s < n_blocks)
    grouped = tagged.select(
        "_id",
        "_v",
        "_blk",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks))).alias("_s"),
    ).select(
        F.when(is_l, blk)
        .otherwise(F.when(s < blk, s).otherwise(blk))
        .alias("_b1"),
        F.when(is_l, s).otherwise(blk).alias("_b2"),
        "_id",
        "_v",
        F.when(is_l, F.lit("L")).otherwise(F.lit("R")).alias("_side"),
    )

    # id fields take id_col's actual type (fetched above for the NULL
    # guard) — a hardcoded LongType breaks Arrow conversion for
    # string/int32 id columns
    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField(score_col, DoubleType()),
        ]
    )
    thr = float(threshold)

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        lhs = pdf[pdf["_side"] == "L"]
        rhs = pdf[pdf["_side"] == "R"]
        empty = pd.DataFrame({"id_a": [], "id_b": [], score_col: []})
        if lhs.empty or rhs.empty:
            return empty
        same_block = pdf["_b1"].iloc[0] == pdf["_b2"].iloc[0]
        # Ragged corpora: cosine is defined per equal-length pair (the
        # JVM zip_with twin scores a length-mismatched pair NULL = no
        # match), so tile per distinct vector length — a single
        # odd-dimension row must not crash np.stack and kill the job.
        l_len = lhs["_v"].map(len).to_numpy()
        r_len = rhs["_v"].map(len).to_numpy()
        outs = []
        for ln in np.intersect1d(np.unique(l_len), np.unique(r_len)):
            lsub, rsub = lhs[l_len == ln], rhs[r_len == ln]
            a_ids = lsub["_id"].to_numpy()
            b_ids = rsub["_id"].to_numpy()
            a = np.stack(lsub["_v"].to_numpy())
            b = np.stack(rsub["_v"].to_numpy())
            # Zero vectors: floor the norm so 0/0 NaN scores (which
            # compare False against the threshold only by accident and
            # spray runtime warnings) become exact 0 scores — the
            # _safe_norm convention of the JVM-side scorers.
            a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
            b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
            scores = np.round(a @ b.T, 9)
            ia, ib = np.nonzero(scores >= thr)
            id_a, id_b = a_ids[ia], b_ids[ib]
            vals = scores[ia, ib]
            if same_block:
                # same-block tile: both sides hold the same rows, every
                # unordered pair appears twice — keep the upper triangle
                # (also drops self-pairs)
                keep = id_a < id_b
                id_a, id_b, vals = id_a[keep], id_b[keep], vals[keep]
            else:
                # cross-block tile: each unordered pair appears exactly
                # once, but its side order is block order, not id order —
                # emit in canonical (lo, hi) id order instead of filtering
                lo = np.minimum(id_a, id_b)
                id_b = np.maximum(id_a, id_b)
                id_a = lo
            outs.append(
                pd.DataFrame({"id_a": id_a, "id_b": id_b, score_col: vals})
            )
        return pd.concat(outs) if outs else empty

    return grouped.groupBy("_b1", "_b2").applyInPandas(tile, schema=out_schema)


def nearest_cell_col(
    vec_col: Column, centroids: list[list[float]], nrm: Column | None = None
) -> Column:
    """Index of the centroid with the highest cosine similarity to the
    vector — a pure JVM expression (one dot product per centroid,
    ``array_max`` over (score, cell) structs; ties prefer the larger
    cell id deterministically).

    ``nrm``: the vector's L2 norm as an attribute reference (a staged
    column). Without it the ``_safe_norm`` aggregate tree is duplicated
    once per centroid — the exact expression-size blowup the PQ encoder
    stages ``_pq_nrm`` to avoid; callers evaluating this over a table
    (``with_ivf_cell``, the Lloyd passes) stage the norm first."""
    nrm_e = _safe_norm(vec_col) if nrm is None else nrm
    scored = []
    for i, c in enumerate(centroids):
        cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        score = dot(vec_col, literal_vector(c)) / (nrm_e * F.lit(cn))
        scored.append(
            F.struct(score.alias("score"), F.lit(i).alias("cell"))
        )
    return F.array_max(F.array(*scored))["cell"]


def build_ivf_centroids(
    emb_df: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Coarse-quantizer training for an IVF index: deterministic seeding
    (the ``n_cells`` lowest-id vectors) + ``iters`` distributed Lloyd
    steps (assignment is a JVM expression; the mean reduces via
    posexplode → per-(cell, dim) avg, so only ``n_cells × dim`` numbers
    ever reach the driver).

    This is an INDEX-BUILD step — it runs Spark jobs, like writing a
    bucketed table. Never call it inside a query path; persist the
    centroids (they are a tiny plan literal) and the ``with_ivf_cell``
    output, then queries are cell-pruned scans.
    """
    # NULL embeddings: the scorers define them as no-match and skip
    # them; a NULL among the n_cells lowest-id rows would otherwise
    # abort the whole build with a bare TypeError from list(None).
    # Element-NULL embeddings must go too: their _safe_norm floors to
    # 1e-12 (greatest skips the NULL norm) and avg(_x/_n) would average
    # ~1e12-scale values into the cell mean — one dirty row corrupts
    # the whole quantizer.
    emb_df = emb_df.filter(elements_nonnull(vec_col))
    v = as_double_vec(vec_col)
    seeds = (
        emb_df.orderBy(id_col)
        .limit(n_cells)
        .select(v.alias("_v"))
        .collect()
    )
    if len(seeds) < n_cells:
        raise ValueError(
            f"need at least n_cells={n_cells} non-null-embedding rows "
            f"to seed the IVF quantizer, got {len(seeds)}"
        )
    centroids = [list(r["_v"]) for r in seeds]
    dims = {len(c) for c in centroids}
    if len(dims) != 1:
        raise ValueError(
            f"seed embeddings have mixed lengths {sorted(dims)}; the "
            f"quantizer dimension is defined by the corpus — clean "
            f"ragged vectors before building"
        )
    # Ragged rows (length ≠ the seeds' dim) score NULL against every
    # centroid (zip_with NULL-pads), tie to the highest cell, and their
    # posexplode'd dims would misalign that cell's mean — or EXTEND it
    # past dim. Exclude them, matching with_ivf_cell's NULL-cell
    # contract for the same rows at encode time.
    emb_df = emb_df.filter(F.size(F.col(vec_col)) == dims.pop())
    for _ in range(max(0, iters)):
        # Stage the norm once per row (attribute reference) so the
        # assignment expression doesn't duplicate the aggregate tree
        # per centroid — mirrors with_ivf_cell / the PQ encoder.
        assigned = emb_df.select(
            v.alias("_v"), _safe_norm(v).alias("_n")
        ).select(
            nearest_cell_col(
                F.col("_v"), centroids, nrm=F.col("_n")
            ).alias("_cell"),
            "_v",
            "_n",
        )
        # Spherical k-means update: average the NORMALIZED vectors.
        # Assignment is by cosine (magnitude-invariant), so averaging
        # RAW vectors would let one high-magnitude vector drag its
        # cell's direction — the PQ build normalizes before averaging
        # for the same reason, and the two quantizer builds must agree.
        # (The mean of unit vectors is not re-normalized: the cosine
        # argmin is scale-invariant, cf. nearest_cell_col.)
        means = (
            assigned.select(
                "_cell",
                F.posexplode("_v").alias("_dim", "_x"),
                F.col("_n"),
            )
            .groupBy("_cell", "_dim")
            .agg(F.avg(F.col("_x") / F.col("_n")).alias("_m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["_cell"], {})[r["_dim"]] = r["_m"]
        centroids = [
            [cell_dims[d] for d in sorted(cell_dims)]
            if (cell_dims := by_cell.get(i))
            else centroids[i]  # empty cell keeps its previous centroid
            for i in range(n_cells)
        ]
    return centroids


def with_ivf_cell(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Attach the IVF cell id — the materialization step (at scale this
    DataFrame is written partitioned by ``out_col``, mirroring
    ``with_lsh_bucket``). The vector norm is staged as a real column so
    the per-centroid score expressions reference an attribute instead of
    ``n_cells`` copies of the norm's aggregate tree.

    ``out_col`` collisions raise (a precomputed cell column from a
    DIFFERENT centroid family silently replaced and persisted would
    corrupt the cell-partitioned store with no error)."""
    from dask_felleskomponenter_spark.operators.shuffle import (
        ensure_absent,
        fresh_name,
    )

    ensure_absent(out_col, df, what="out_col")
    v = as_double_vec(vec_col)
    ncol = fresh_name("_ivf_nrm", df, extra={out_col})
    staged = df.withColumn(ncol, _safe_norm(v))
    # Same NULL-in/NULL-out contract as with_pq_codes: with a NULL
    # embedding every per-centroid score is NULL, the struct comparison
    # sorts NULL scores equal-smallest, and array_max resolves the tie
    # on the CELL field — NULL rows would land in the highest cell, a
    # valid-looking id that misplaces them in cell-partitioned writes.
    # Ragged vectors (length ≠ centroid dim) hit the exact same mode:
    # zip_with NULL-pads the shorter side, every dot is NULL, and the
    # row lands in the highest cell — so length inequality gets a NULL
    # cell too, consistent with with_lsh_bucket / with_pq_codes. So do
    # element-NULL vectors of the RIGHT length: every dot is NULL the
    # same way, and only elements_nonnull catches them.
    cell = F.when(
        elements_nonnull(vec_col)
        & (F.size(F.col(vec_col)) == len(centroids[0])),
        nearest_cell_col(v, centroids, nrm=F.col(ncol)),
    )
    return staged.withColumn(out_col, cell).drop(ncol)


def ivf_topk(
    cell_df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    score_col: str = "cosine",
) -> DataFrame:
    """IVF query: probe the ``nprobe`` cells whose centroids are nearest
    the query (driver-side arithmetic on the tiny centroid list — no
    Spark action), exact cosine top-k within the probed cells.

    ``nprobe = len(centroids)`` degrades gracefully to exact brute
    force — the property the tests pin. Unlike sign-LSH the quantizer
    is data-adaptive, so recall concentrates probes on real density
    rather than fixed hyperplane orthants.
    """
    if centroids and len(query_vec) != len(centroids[0]):
        # same loud dim-mismatch contract as pq_adc_topk: a truncated
        # zip() dot product selects probe cells from garbage
        # similarities, then cosine_topk NULLs every score and the
        # query returns ZERO rows — read as "no neighbors"
        raise ValueError(
            f"ivf_topk: query dim {len(query_vec)} != centroid dim "
            f"{len(centroids[0])} — wrong table or stale index"
        )
    probe = probed_cells(centroids, query_vec, nprobe)
    in_cells = cell_df.filter(F.col(cell_col).isin(probe)).drop(cell_col)
    return cosine_topk(in_cells, query_vec, k, id_col, vec_col, score_col)


def probed_cells(
    centroids: list[list[float]], query_vec: list[float], nprobe: int
) -> list[int]:
    """Driver-side probe selection for ``ivf_topk``: ids of the
    ``nprobe`` cells whose centroids are most cosine-similar to the
    query (deterministic lower-id tie-break). Pure arithmetic on the
    tiny centroid list — no Spark action. Exposed so tests can assert
    that query results come only from these cells."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0

    def cos(c: list[float]) -> float:
        cn = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        d = sum(float(a) * float(b) for a, b in zip(query_vec, c))
        return d / (cn * qn)

    ranked = sorted(range(len(centroids)), key=lambda i: (-cos(centroids[i]), i))
    return ranked[: max(1, nprobe)]


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side
    constants — tiny, shipped in the plan as literals)."""
    if not 1 <= bits <= 63:
        raise ValueError(
            f"bits must be in [1, 63] (bucket ids pack into a signed "
            f"bigint), got {bits}"
        )
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def signbit_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane, packed into a bigint.

    At most 63 planes: bit 63 is the bigint sign bit, and ``F.lit(2**63)``
    overflows LongType at plan-build time with an opaque literal error —
    validate loudly instead (and the driver-side ``query_bucket`` twin
    computes in unbounded Python ints, so its id could never match a
    wrapped JVM bucket anyway)."""
    if len(planes) > 63:
        raise ValueError(
            f"signbit_bucket packs one bit per plane into a signed "
            f"bigint; got {len(planes)} planes, max 63"
        )
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = F.when(dot(vec_col, literal_vector(plane)) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        bucket = bucket + (bit.cast("long") * F.lit(2**i).cast("long"))
    return bucket


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
    seed: int = 42,
) -> DataFrame:
    """Attach the sign-LSH bucket id as a regular column — the
    materialization step of the ANN scale path.

    At 100 TB this DataFrame is what gets *written*, partitioned (or
    bucketed) by ``bucket_col``, so every later query is a
    partition-pruned read of one bucket instead of recomputing ``bits``
    dot products per row per query. Queries then filter the precomputed
    column (see ``plans/queries.py::ann_lsh_bucketed``).

    ``bucket_col`` collisions raise: silently replacing a bucket column
    from a different plane family (other seed/bits) and persisting it
    corrupts the bucket-partitioned store with no error.
    """
    from dask_felleskomponenter_spark.operators.shuffle import ensure_absent

    ensure_absent(bucket_col, df, what="bucket_col")
    planes = random_hyperplanes(dim, bits, seed)
    # NULL-in/NULL-out, matching with_ivf_cell / with_pq_codes: a NULL
    # or wrong-LENGTH embedding has a NULL dot against every plane
    # (zip_with pads the shorter side with NULLs in BOTH directions —
    # a longer-than-dim vector NULL-pads the dim-length plane just like
    # a short vector NULL-pads itself), and `when(dot >= 0, 1)
    # .otherwise(0)` would quietly turn that into bit 0 per plane —
    # filing every such row inside the GENUINE bucket 0 of the
    # partitioned store, indistinguishable from real members. A
    # dim-length vector with a NULL *element* hits the identical mode
    # (each dot is NULL), so the guard is elements_nonnull, not a bare
    # isNotNull. Exact length equality with no NULL elements is the
    # only input class with a well-defined bucket.
    bucket = F.when(
        elements_nonnull(vec_col) & (F.size(F.col(vec_col)) == dim),
        signbit_bucket(as_double_vec(vec_col), planes),
    )
    return df.withColumn(bucket_col, bucket)


def query_bucket(query_vec: list[float], bits: int = 8, seed: int = 42) -> int:
    """Driver-side sign-LSH bucket id of a literal query vector (same
    hyperplane family as ``with_lsh_bucket``)."""
    planes = random_hyperplanes(len(query_vec), bits, seed)
    b = 0
    for i, plane in enumerate(planes):
        if sum(float(a) * float(p) for a, p in zip(query_vec, plane)) >= 0:
            b += 2**i
    return b


def lsh_bucketed_cosine_topk(
    emb_df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "cosine",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the query's sign-LSH
    bucket.

    Convenience form over an *unbucketed* table — it attaches the bucket
    column on the fly via ``with_lsh_bucket`` and filters it. The scale
    path precomputes ``with_lsh_bucket`` once at write time and filters
    the stored column (single-bucket partition-pruned read); this helper
    exists so small/ad-hoc tables don't need the materialization step.
    """
    from dask_felleskomponenter_spark.operators.shuffle import fresh_name

    # fresh-named: a caller column literally named "_lsh_bucket" (e.g.
    # a precomputed bucket from a different bits/seed family) must not
    # be silently clobbered and recomputed under this helper's family
    bcol = fresh_name("_lsh_bucket", emb_df)
    bucketed = with_lsh_bucket(
        emb_df, len(query_vec), bits, vec_col, bcol, seed
    )
    q_bucket = query_bucket(query_vec, bits, seed)
    in_bucket = bucketed.filter(F.col(bcol) == F.lit(q_bucket)).drop(bcol)
    return cosine_topk(in_bucket, query_vec, k, id_col, vec_col, score_col)


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid — "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011). The third ANN family: LSH
# partitions space by fixed hyperplanes, IVF by learned density; PQ
# COMPRESSES — each L2-normalized vector becomes m sub-codes (one per
# dim/m-dim subspace, k centroids each), so the search structure is
# m log2(k) bits per vector (64 dims × float → 8 bytes at m=8, k=16, a
# 32× reduction) and query time is a table lookup per subspace
# (asymmetric distance computation), never a float dot product against
# raw vectors. At 100 TB the codes table for a trillion vectors fits in
# the page cache of a modest cluster — that is the point.
#
# Hot-path discipline: encode and ADC scoring are per-dimension UNROLLED
# arithmetic expressions (element_at + multiply-add), never zip_with /
# aggregate higher-order functions — HOFs evaluate interpreted and
# re-walk inner arrays (see tests/test_plan_shapes.py and the round-2
# fingerprint rewrite). Codebooks ride the plan as literals (m×k×d
# doubles ≈ 8 KB — broadcast-by-construction).


def _norm_expr(vec_col: Column, dim: int) -> Column:
    """Codegen'd L2 norm: an unrolled sum of squares, zero-guarded.

    ``try_element_at``, not ``element_at``: a single embedding shorter
    than ``dim`` (parquet schemas don't carry array lengths) must read
    as NULL — under Spark 4's default ANSI mode a plain ``element_at``
    past the end ABORTS the whole encode/build job with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    s = None
    for i in range(dim):
        e = F.try_element_at(vec_col, F.lit(i + 1)).cast("double")
        term = e * e
        s = term if s is None else s + term
    return F.greatest(F.sqrt(s), F.lit(1e-12))


def _pq_argmin_cols(
    vec_col: Column, nrm: Column, codebooks: list[list[list[float]]], dim: int
) -> list[Column]:
    """Per-subspace nearest-code columns over the NORMALIZED vector.

    Uses the expanded objective ``||c||²·||v|| − 2⟨v,c⟩`` — the squared
    distance ``d²(v/||v||, c)`` scaled by the positive ``||v||`` and
    shifted by a constant, so the argmin (and its ties) is identical
    while ``nrm`` appears ONCE per centroid as an attribute reference
    instead of a duplicated 64-term tree. Expression size is what keeps
    plan construction fast and the whole thing inside one codegen'd
    projection; ties take the smaller code via struct-ordered
    array_min."""
    m = len(codebooks)
    d = dim // m
    out = []
    for j, cb in enumerate(codebooks):
        scored = []
        for code, c in enumerate(cb):
            dot_jk = None
            for i in range(d):
                # try_element_at: ragged vectors NULL out (then the
                # encode guard voids the row) instead of ANSI-aborting
                term = F.try_element_at(
                    vec_col, F.lit(j * d + i + 1)
                ).cast("double") * F.lit(float(c[i]))
                dot_jk = term if dot_jk is None else dot_jk + term
            c2 = sum(float(x) * float(x) for x in c)
            obj = F.lit(c2) * nrm - F.lit(2.0) * dot_jk
            scored.append(
                F.struct(obj.alias("obj"), F.lit(code).alias("code"))
            )
        out.append(F.array_min(F.array(*scored))["code"])
    return out


def with_pq_codes(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Attach the PQ code array — the encode step a store materializes
    once at write time (``sources/ann_store.py``); queries then scan
    only (id, codes). The norm is staged as a real column so the
    centroid expressions reference an attribute, not copies of the
    norm's expression tree.

    ``out_col`` collisions raise (the with_ivf_cell/with_lsh_bucket
    policy): silently replacing codes from a different codebook family
    and persisting them corrupts the codes store with no error."""
    from dask_felleskomponenter_spark.operators.shuffle import (
        ensure_absent,
        fresh_name,
    )

    ensure_absent(out_col, df, what="out_col")

    ncol = fresh_name("_pq_nrm", df, extra={out_col})
    staged = df.withColumn(ncol, _norm_expr(F.col(vec_col), dim))
    codes = F.array(
        *_pq_argmin_cols(F.col(vec_col), F.col(ncol), codebooks, dim)
    )
    # A NULL embedding — and a RAGGED one, EITHER direction — must
    # encode to NULL codes, not [0]*m: shorter vectors NULL every
    # per-centroid objective (array_min's struct order sorts NULL first,
    # argmin resolves to code 0 everywhere), and a LONGER vector would
    # silently encode from its first dim elements — non-NULL codes for
    # a vector its siblings (with_ivf_cell / with_lsh_bucket) NULL out,
    # which then occupies ADC shortlist slots the exact re-rank can only
    # discard (zip_with scores the length-mismatched pair NULL),
    # shrinking the re-rank pool below ``shortlist`` with no error.
    # Element-NULL vectors of the right length hit the code-0 mode too
    # (NULL objective per centroid), hence elements_nonnull.
    codes = F.when(
        elements_nonnull(vec_col) & (F.size(F.col(vec_col)) == dim), codes
    )
    return staged.withColumn(out_col, codes).drop(ncol)


def build_pq_codebooks(
    emb_df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks over L2-normalized vectors.

    INDEX-BUILD step (runs Spark jobs — never call in a query path).
    Deterministic seeding: subvectors of the ``k`` lowest-id rows. Each
    Lloyd iteration is ONE distributed pass for all m subspaces:
    assignment reuses the encoder's per-subspace argmin columns
    (staged-norm, small expression trees), the assigned subvectors
    explode into (subspace, code, dim, value) and the means reduce via
    a map-side-combinable avg, so only m×k×d numbers reach the driver
    per iteration. Empty clusters keep their previous centroid.
    Production note: PQ training conventionally runs on a bounded
    sample (FAISS trains on ≲256·k points per subquantizer); pass
    ``emb_df.orderBy(id).limit(n)`` for that — the encode step is the
    part that must scale, and does."""
    d = dim // m
    if d * m != dim:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    # NULL embeddings among the k lowest ids would abort the build with
    # a bare TypeError (None is not subscriptable); RAGGED vectors
    # (either direction) and element-NULL vectors poison the means —
    # a NULL element floors _norm_expr to 1e-12 so `unit`/`_sv` blow up
    # to ~1e12 scale, and an over-length vector trains on a truncated
    # prefix the encoder now refuses to code. Keep exactly the input
    # class the encoder encodes.
    emb_df = emb_df.filter(
        elements_nonnull(vec_col) & (F.size(F.col(vec_col)) == dim)
    )
    v = F.col(vec_col)

    staged = emb_df.withColumn("_pq_nrm", _norm_expr(v, dim))
    nrm = F.col("_pq_nrm")
    unit = F.array(
        *[
            F.try_element_at(v, F.lit(i + 1)).cast("double") / nrm
            for i in range(dim)
        ]
    )
    seed_rows = (
        staged.orderBy(id_col).limit(k).select(unit.alias("_u")).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} rows to seed codebooks")
    codebooks = [
        [list(r["_u"][j * d : (j + 1) * d]) for r in seed_rows]
        for j in range(m)
    ]

    for _ in range(max(0, iters)):
        argmins = _pq_argmin_cols(v, nrm, codebooks, dim)
        sub_structs = [
            F.struct(
                F.lit(j).alias("_j"),
                argmins[j].alias("_c"),
                F.array(
                    *[
                        F.element_at(v, j * d + i + 1).cast("double") / nrm
                        for i in range(d)
                    ]
                ).alias("_sv"),
            )
            for j in range(m)
        ]
        assign = staged.select(
            F.explode(F.array(*sub_structs)).alias("_e")
        ).select(
            F.col("_e._j").alias("_j"),
            F.col("_e._c").alias("_c"),
            F.col("_e._sv").alias("_sv"),
        )
        means = (
            assign.select("_j", "_c", F.posexplode("_sv").alias("_i", "_x"))
            .groupBy("_j", "_c", "_i")
            .agg(F.avg("_x").alias("_mu"))
            .collect()
        )
        new_cb = [[list(c) for c in cb] for cb in codebooks]
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r["_j"], r["_c"]), {})[r["_i"]] = r["_mu"]
        for (j, c), dims in got.items():
            new_cb[j][c] = [dims[i] for i in range(d)]
        codebooks = new_cb
    return codebooks


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    score_col: str = "approx_cosine",
) -> DataFrame:
    """Asymmetric distance computation: the query stays un-quantized;
    per subspace the m×|codebook| table of squared distances to every
    centroid is computed DRIVER-SIDE (tiny arithmetic, no Spark
    actions), rides the plan as literals, and each stored vector's
    approximate distance is m table lookups — no per-row float dot
    products anywhere. Scores convert to the cosine estimate
    1 − d²/2 (vectors were encoded normalized) so the ANN family shares
    one output convention; top-k runs as TakeOrderedAndProject."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1e-12
    q = [float(x) / qn for x in query_vec]
    m = len(codebooks)
    # The build path validates dims loudly (build_pq_codebooks raises on
    # dim % m != 0); a mismatched query would otherwise silently
    # truncate the subspace width and score against misaligned slices —
    # valid-looking garbage ranks.
    d = len(codebooks[0][0]) if codebooks and codebooks[0] else 0
    if m * d != len(q):
        raise ValueError(
            f"query dim {len(q)} != m*d = {m}*{d} of the codebooks — "
            "the query must match the encoded vector dimensionality"
        )
    d2 = None
    for j, cb in enumerate(codebooks):
        dtab = [
            sum((q[j * d + i] - float(c[i])) ** 2 for i in range(d))
            for c in cb
        ]
        term = F.element_at(
            literal_vector(dtab), F.element_at(F.col(codes_col), j + 1) + 1
        )
        d2 = term if d2 is None else d2 + term
    # NULL codes (a NULL embedding at encode time) carry no position in
    # the quantized space: exclude them loudly here rather than rely on
    # NULL scores sorting last — with fewer than k real rows they would
    # otherwise pad the result.
    scored = codes_df.filter(F.col(codes_col).isNotNull()).select(
        F.col(id_col),
        F.round(F.lit(1.0) - d2 / F.lit(2.0), 9).alias(score_col),
    )
    return scored.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(k)


def pq_topk_reranked(
    codes_df: DataFrame,
    emb_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    vec_col: str = "embedding",
    score_col: str = "cosine",
) -> DataFrame:
    """Two-stage PQ search — the production shape (FAISS's refine step):
    the compressed codes table produces an ADC shortlist of
    ``shortlist`` candidates (full scan, but of 16-byte codes, not
    256-byte vectors), then ONLY those ids fetch their raw vectors via
    a broadcast semi-join and re-rank by exact cosine. Recall is the
    shortlist's containment probability — at 16×16 codebooks the exact
    top-10 sits in a 100-deep shortlist essentially always — while the
    raw-vector I/O is k-scale, not corpus-scale."""
    cand = pq_adc_topk(
        codes_df,
        codebooks,
        query_vec,
        k=shortlist,
        id_col=id_col,
        codes_col=codes_col,
    ).select(id_col)
    hits = emb_df.join(F.broadcast(cand), on=id_col)
    return cosine_topk(
        hits, query_vec, k=k, id_col=id_col, vec_col=vec_col, score_col=score_col
    )
