"""Deduplication operators (LLM-pipeline pack, SURVEY.md §2B EXT rows).

Exact dedup, MinHash+LSH near-dup, and n-gram Jaccard — all expressed
with JVM-side built-ins (higher-order functions + ``xxhash64``), never
Python UDFs, so the whole pipeline stays inside whole-stage codegen /
vectorized evaluation.

Scale notes (the reason these shapes were chosen):
- Exact dedup groups on a 256-bit content hash, not the content itself —
  the shuffle moves 32 bytes per row instead of whole documents.
- MinHash turns each document into a fixed ``num_hashes × 8``-byte
  signature; LSH banding turns all-pairs O(n²) similarity into a
  band-bucket equi-join whose cost is driven by true collisions only.
- The n-gram Jaccard join explodes *distinct* shingles and re-aggregates;
  it is the exact (oracle-checkable) twin of the MinHash estimate and the
  verification stage after LSH candidate generation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_felleskomponenter_spark.functions.text import (
    tokens_or_null,
    word_shingles,
)
from dask_felleskomponenter_spark.operators.windows import keep_first


def content_hash(col: str | Column, num_bits: int = 256) -> Column:
    """Stable content fingerprint for exact dedup (SHA-2 family)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, num_bits)


def exact_dedup(
    df: DataFrame,
    content_col: str,
    order_by: list[Column],
    hash_out: str | None = None,
) -> DataFrame:
    """Exact duplicate removal: keep the first row (under ``order_by``)
    per distinct value of ``content_col``.

    Grouping key is ``sha2(content, 256)`` so the dedup shuffle carries a
    fixed-width key regardless of document size.
    """
    from dask_felleskomponenter_spark.operators.shuffle import (
        ensure_absent,
        fresh_name,
    )

    # Collision-safe staging name: a fixed "_content_sha" would
    # overwrite (and, below, drop) a same-named user column. An
    # EXPLICIT hash_out naming an existing column must raise for the
    # same reason (keep_first's rn_col policy): exact_dedup(df, 'text',
    # ..., hash_out='doc_id') would silently replace every doc_id with
    # the content hash.
    if hash_out is not None:
        ensure_absent(hash_out, df, what="hash_out")
    hcol = hash_out or fresh_name("_content_sha", df)
    out = keep_first(
        df.withColumn(hcol, content_hash(content_col)),
        partition_by=[hcol],
        order_by=order_by,
    )
    return out if hash_out else out.drop(hcol)




def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
    sig_col: str = "minhash_sig",
) -> DataFrame:
    """MinHash signature per document: ``array<bigint>`` of length
    ``num_hashes``.

    Hash family h_i(s) = xxhash64(s, i) — seeding via a literal second
    argument gives ``num_hashes`` independent 64-bit functions with zero
    driver-side state.

    Shape: explode distinct shingles → ``num_hashes`` codegen'd
    ``min(xxhash64(shingle, i))`` aggregates → reassemble the array.
    Deliberately NOT the nested higher-order-function form
    (``transform(sequence, h -> array_min(transform(shingles, ...)))``):
    nested lambda evaluation falls out of whole-stage codegen and
    re-evaluates the shingle expression per hash index — measured 3.5×
    slower. Here every hash is a flat projection expression and the
    partial min runs map-side, so the shuffle carries exactly
    ``num_hashes × 8`` bytes per document per partition regardless of
    document size.

    Documents whose text is NULL or has zero shingles (empty/whitespace-
    only) keep their row but get a NULL signature, and the banding stage
    drops NULL signatures — so they never enter the LSH join. The
    earlier behavior (one SHARED hash-of-null signature for every such
    doc) was the textbook degenerate hot bucket: a crawl corpus with a
    million blank documents collided them all in every band and the
    candidate self-join went quadratic on exactly the input class
    ``word_shingles``' empty→[] branch exists to keep out of near-dup
    ("exact dedup owns that class"; round-10 review).
    """
    reserved = {"_s", "_tk", *(f"_h{h}" for h in range(num_hashes))}
    if id_col in reserved:
        # select would emit two same-named columns and the groupBy dies
        # with AMBIGUOUS_REFERENCE mid-plan — fail with the real reason
        raise ValueError(
            f"minhash_signatures: id_col {id_col!r} collides with an "
            f"internal staging name; rename the column first"
        )
    if sig_col == id_col:
        raise ValueError("sig_col must differ from id_col")
    # token array staged once (word_shingles' staging note: the shingle
    # HOF evaluates interpreted and re-splits the text per reference)
    inv = df.select(
        F.col(id_col),
        tokens_or_null(text_col).alias("_tk"),
    ).select(
        id_col,
        F.explode_outer(
            word_shingles(None, shingle_size, toks=F.col("_tk"))
        ).alias("_s"),
    )
    # expr strings, not F.min(F.xxhash64(...)) chains: each Column
    # method is a py4j round-trip and the chained form costs ~0.4 s of
    # driver plan-construction per invocation at 64 hashes (same
    # finding as functions/text.py simhash_signatures; results are
    # byte-identical — the SQL literal {h} is the same INT type as
    # F.lit(h), so every xxhash64 seed hashes identically).
    mins = [
        F.expr(f"min(xxhash64(_s, {h})) AS _h{h}") for h in range(num_hashes)
    ]
    sig = F.when(
        F.col("_n") > 0,
        F.array(*[f"_h{h}" for h in range(num_hashes)]),
    )
    return (
        inv.groupBy(id_col)
        .agg(F.count("_s").alias("_n"), *mins)
        .select(F.col(id_col), sig.alias(sig_col))
    )


def lsh_band_buckets(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "minhash_sig",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode signatures into their LSH band buckets: one row per
    (id, band, bucket) where ``bucket = xxhash64(sig-slice, band)``.

    The shared banding projection under ``lsh_candidate_pairs`` (batch
    self-join) and ``streaming/ops.py::stream_neardup_ingest`` (bucket
    join against the persisted band-bucket history).

    Bands are only emitted where the signature actually has
    ``rows_per_band`` values left: a band slicing past the end of the
    signature would hash an EMPTY array — one constant bucket shared by
    every document, silently turning downstream joins quadratic.
    Misconfigured ``bands × rows_per_band > num_hashes`` therefore
    degrades to fewer effective bands (a shallower S-curve) instead of
    a blow-up; size the signature to ``bands * rows_per_band`` for the
    advertised curve.
    """
    if bands < 1 or rows_per_band < 1:
        raise ValueError(
            f"bands={bands} and rows_per_band={rows_per_band} must be >= 1"
        )
    band_structs = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.slice(
                        F.col(sig_col),
                        b * F.lit(rows_per_band) + F.lit(1),
                        F.lit(rows_per_band),
                    ),
                    b,
                ).alias("bucket"),
                (
                    (b + F.lit(1)) * F.lit(rows_per_band)
                    <= F.size(F.col(sig_col))
                ).alias("complete"),
            ),
        ),
        lambda s: s["complete"],
    )
    return sig_df.select(
        F.col(id_col), F.explode(band_structs).alias("bb")
    ).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


#: Default LSH bucket-size cap, the banding twin of
#: ``DEFAULT_MAX_SHINGLE_DF``: a bucket with m members emits m²/2
#: candidate rows, so ONE degenerate bucket (boilerplate-dominated
#: near-identical signatures) turns the self-join quadratic. Buckets
#: over the cap are excluded from pair generation — their members were
#: going to be verified pair-by-pair anyway, which is exactly the work
#: the cap refuses; true duplicate clusters that large belong to exact
#: dedup first.
DEFAULT_MAX_BUCKET_SIZE = 10_000


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "minhash_sig",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """LSH banding: emit candidate pairs (id_a < id_b) whose signatures
    collide in at least one band.

    Each band is hashed to one 64-bit bucket key; the self-join is an
    equi-join on ``(band, bucket)`` — a shuffle on the bucket key, never a
    cartesian product. With b bands of r rows, a pair with Jaccard s
    collides with probability 1-(1-s^r)^b (the standard S-curve).
    Band-overhang handling lives in ``lsh_band_buckets``.

    ``max_bucket_size`` guards the quadratic blow-up of a degenerate hot
    bucket (see ``DEFAULT_MAX_BUCKET_SIZE``); ``None`` restores the
    unbounded join. The count window and the self-join ride ONE pinned
    ``(band, bucket)`` exchange — pinned because the join's pair
    fan-out, not the kilobytes of (id, band, bucket) rows, is the cost
    (the AQE single-task funnel ``shuffle.pinned_repartition``
    documents; its sibling blocked self-joins already pin).
    """
    from pyspark.sql import Window as _W

    from dask_felleskomponenter_spark.operators.shuffle import (
        pinned_repartition,
    )

    exploded = pinned_repartition(
        lsh_band_buckets(sig_df, id_col, sig_col, bands, rows_per_band),
        "band",
        "bucket",
    )
    if max_bucket_size is not None:
        exploded = (
            exploded.withColumn(
                "_bkt_n",
                F.count(F.lit(1)).over(_W.partitionBy("band", "bucket")),
            )
            .filter(F.col("_bkt_n") <= int(max_bucket_size))
            .drop("_bkt_n")
        )

    a = exploded.alias("a")
    b_ = exploded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


#: Default hot-shingle document-frequency cap. Finite BY DEFAULT: one
#: boilerplate shingle with df=N builds an N-element postings array in
#: one executor and emits N² candidate rows — the uncapped path OOMs on
#: exactly the data (web boilerplate) this operator targets. 10k keeps
#: every realistic same-content shingle while bounding any single
#: postings buffer to ~10k entries and its pair fan-out to 10⁸ rows
#: spread across the shuffle.
DEFAULT_MAX_SHINGLE_DF = 10_000


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs (id_a < id_b) with
    ``|A∩B| / |A∪B| >= threshold`` over distinct word shingles.

    Postings-list shape: explode distinct shingles, group by shingle
    into a postings list, generate candidate pairs by a double explode
    of each list, aggregate intersection counts per pair. One shuffle of
    the inverted index (the groupBy) instead of the self-join's two,
    the shingle expression is evaluated once instead of once per join
    side, and documents sharing no shingle never meet.

    Exactness-preserving prunes applied on the default path:
    - singleton postings (df = 1) generate no pairs and are dropped
      *after* set sizes are fixed, so unions still count them;
    - the length-ratio prefilter: ``jaccard(A,B) >= t`` implies
      ``t·|A| <= |B| <= |A|/t``, so size-incompatible candidates die
      before the pair aggregation.

    ``max_shingle_df`` is the hot-shingle cut — a boilerplate phrase
    shared by millions of documents makes any exact scheme quadratic in
    that shingle's document frequency. Shingles with df > cap are
    removed from the *universe*: both from the index and from the
    per-document set sizes, so the result is the exact Jaccard over the
    capped shingle universe (pairs that are similar on distinctive
    content keep their score; pairs related only through boilerplate
    drop out). The df filter runs *before* any postings list
    materializes, so a df=10M shingle never reaches a ``collect_list``
    buffer — it streams through one count window and dies.

    The cap is ON by default (``DEFAULT_MAX_SHINGLE_DF``) because the
    uncapped path is an OOM/skew hazard at scale. Pass
    ``max_shingle_df=None`` only when you can prove the corpus has no
    hot shingles (or cover the blowup) and need the unbounded-universe
    exact semantics; with any cap at or above the corpus's true maximum
    df the two are identical (property-tested in ``tests/test_dedup.py``).
    """
    # Token array staged once in its own (codegen'd) projection: the
    # shingle expression references it ~k+5 times and evaluates
    # interpreted, where every inline reference re-splits the document
    # (word_shingles' staging note; measured 1.55× on this shape).
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            tokens_or_null(text_col).alias("_tk"),
        )
        .select(
            "_id",
            word_shingles(None, shingle_size, toks=F.col("_tk")).alias("_sh"),
        )
        .withColumn("_set_size", F.size("_sh"))
    )

    # Shingle keys are hashed to 64-bit BEFORE the index exchange
    # (guide §2.3 "shuffle keys and metadata instead of payloads"): the
    # df window, the postings groupBy and their sorts then run over
    # 8-byte longs instead of ~25-byte shingle strings — measured
    # wall 4.0 → 2.7 s / CPU 13.2 → 12.1 s on the sf0.1 3-gram shape
    # with byte-identical output. Per-document distinctness is computed
    # on the true strings first (word_shingles' array_distinct), so the
    # hash only carries CROSS-document equality; like the winnowing /
    # MinHash / span operators that already key on xxhash64, a 64-bit
    # collision (P ≈ n²·2⁻⁶⁴ over distinct-shingle count n) would merge
    # two shingle identities — deterministic, verified absent on the
    # oracle corpora at every scale factor.
    inv = base.select(
        "_id", "_set_size", F.explode("_sh").alias("_s")
    ).select("_id", "_set_size", F.xxhash64("_s").alias("_s"))

    from dask_felleskomponenter_spark.operators.shuffle import (
        pinned_repartition as _pin,
    )

    if max_shingle_df is not None:
        # ONE exchange of the inverted index, shared by everything the
        # cap needs. Document frequency is a count window over the
        # shingle key in that exchange's partitioning; the filter, the
        # per-document size correction, and the postings groupBy all
        # ride the SAME hash(_s) layout, so Catalyst inserts no further
        # index-sized exchange (the earlier formulation shuffled the
        # full index three times: by _s for df, by _id for the size
        # recount, by _s again for postings — measured ~60% overhead
        # over the uncapped path with the cap not even biting).
        #
        # Capped set sizes: |capped(A)| = |A| − (# hot shingles in A).
        # The dropped rows (df > cap) aggregate to one (doc, n_dropped)
        # row per document that touches a hot shingle — map-side
        # combinable, and its input subtree shares the index exchange
        # (Spark's ReuseExchange collapses the two reads into one
        # shuffle). The correction joins back map-side as a broadcast:
        # its size is bounded by the number of documents containing at
        # least one over-cap shingle. In a boilerplate-saturated corpus
        # that can approach the corpus row count — the planted-hot
        # stress test (tests/test_scale_stress.py) drives exactly that
        # regime — but each row is 12 bytes of (id, count), so even a
        # 10M-hot-doc correction broadcasts ~120 MB; beyond that scale,
        # raise the cap or pre-strip boilerplate upstream.
        from pyspark.sql import Window as _W

        tagged = _pin(inv, "_s").withColumn(
            "_df", F.count(F.lit(1)).over(_W.partitionBy("_s"))
        )
        kept = tagged.filter(F.col("_df") <= int(max_shingle_df)).drop("_df")
        # count("_set_size"), not count(1): on explode-survivor rows the
        # two are identical (_set_size is size(_sh) of the row's own
        # non-null array — a NULL/empty array emits no index rows), but
        # counting the COLUMN keeps _set_size referenced in this branch,
        # so column pruning projects the same (_id, _set_size, _s) set
        # under both consumers of the pinned exchange and ReuseExchange
        # actually collapses them. With count(1) the drops subtree got
        # its own narrower exchange AND re-ran the whole scan+tokenize+
        # shingle+explode map stage to feed it (measured: 2 single-task
        # 1.1 s map stages instead of 1 at sf0.1 — the "shares the
        # index exchange" claim below was aspirational until this).
        drops = (
            tagged.filter(F.col("_df") > int(max_shingle_df))
            .groupBy("_id")
            .agg(F.count("_set_size").alias("_n_dropped"))
        )
        inv = (
            kept.join(F.broadcast(drops), "_id", "left")
            .withColumn(
                "_set_size",
                F.col("_set_size")
                - F.coalesce(F.col("_n_dropped"), F.lit(0)),
            )
            .drop("_n_dropped")
        )
        # Already hash-partitioned by _s — no exchange below this agg.
        postings = inv.groupBy("_s").agg(
            F.collect_list(F.struct("_id", "_set_size")).alias("_ps")
        )
    else:
        postings = _pin(inv, "_s").groupBy("_s").agg(
            F.collect_list(F.struct("_id", "_set_size")).alias("_ps")
        )

    t = float(threshold)
    cands = (
        postings.filter(F.size("_ps") >= 2)  # singletons cannot pair
        .select(F.explode("_ps").alias("_x"), "_ps")
        .select("_x", F.explode("_ps").alias("_y"))
        .filter(F.col("_x._id") < F.col("_y._id"))
        # Length-ratio prune in DIVISION form, matching the final
        # filter's arithmetic: jaccard ≤ min/max, and double division is
        # monotone in the rational value, so any pair the final
        # I/U >= t test would accept also passes min/max >= t here.
        # The multiplication form (y >= x*t) is NOT lossless: for
        # t=0.1, x=10 it computes 10*0.1 = 1.0000000000000002 and drops
        # a pair whose exact jaccard equals the threshold.
        .filter(
            (F.col("_y._set_size") / F.col("_x._set_size") >= F.lit(t))
            & (F.col("_x._set_size") / F.col("_y._set_size") >= F.lit(t))
        )
    )
    inter = cands.groupBy(
        F.col("_x._id").alias("id_a"),
        F.col("_y._id").alias("id_b"),
        F.col("_x._set_size").alias("size_a"),
        F.col("_y._set_size").alias("size_b"),
    ).agg(F.count(F.lit(1)).alias("intersection"))
    jaccard = F.col("intersection") / (
        F.col("size_a") + F.col("size_b") - F.col("intersection")
    )
    return (
        inter.withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Exact-substring duplicated-span detection (the ExactSubstr pass of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): maximal merges of overlapping/adjacent ``k``-token windows
    each of which appears verbatim in at least two *distinct* documents.
    Every ``k``-gram inside a returned span is cross-document duplicated;
    the merged span AS A WHOLE need not appear verbatim anywhere else
    (its constituent ``k``-grams may be shared with *different* partner
    documents) — callers wanting whole-span verbatim matches must verify
    against the partner text. Unlike document-level Jaccard or MinHash,
    this finds the boilerplate passage *inside* otherwise-unique
    documents — the license header, the navigation chrome, the quoted
    reply — which is what actually gets memorized at pretraining scale.

    Returns one row per maximal span: ``(id, span_start, span_end,
    span_tokens)`` with token-index bounds (``span_end`` exclusive).
    Overlapping and adjacent duplicated ``k``-grams are merged into
    maximal islands, so a 40-token duplicated passage is one row, not 33.

    Shape (no suffix array needed — the postings formulation distributes):
    1. positional ``k``-gram shingles via ``posexplode`` (start index =
       array position, one pass, JVM-side);
    2. cross-document duplication flag per shingle hash as
       ``min(id) != max(id)`` over one hash-partitioned window — a
       purely-internal repeat (same doc twice) does NOT flag, and the
       check keeps no distinct-id set — WindowExec's group buffer is
       12-byte rows and disk-spillable, so a boilerplate shingle in 10M
       documents costs a spill, never an OOM;
    3. flagged start positions merge into maximal spans with the
       classic gaps-and-islands window per document (running max of
       span ends over preceding rows).

    Exactly two shuffles at any scale: hash(shingle) for the dup flag,
    hash(id) for the island merge — both on fixed-width keys. Documents
    shorter than ``k`` tokens are excluded (a whole-doc duplicate of a
    tiny document is exact-dedup's job, not span detection's).

    ``hash_family='md5'`` swaps the 8-byte ``xxhash64`` shingle key for
    DuckDB-portable md5 hex (32 bytes through the shuffle) so the result
    is oracle-checkable; selection semantics are identical modulo hash
    collisions (~2^-64 per pair vs ~2^-128).
    """
    from pyspark.sql import Window as _W

    # validated like lsh_band_buckets: a typo'd family silently hashing
    # with xxhash64 would produce shingle keys that never match the md5
    # oracle the parameter exists for
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(
            f"unknown hash_family {hash_family!r}; "
            f"expected 'xxhash64' or 'md5'"
        )
    hasher = F.md5 if hash_family == "md5" else F.xxhash64
    # Token array staged once (word_shingles' staging note): the k-gram
    # HOF references the array ~k+5 times interpreted, and the
    # token_count filter would re-split a k+6th time. The filter
    # guarantees >= k >= 1 tokens, so the staged array is non-NULL and
    # only word_shingles' main branch runs — semantics unchanged.
    shingled = (
        df.select(
            F.col(id_col).alias("_id"),
            tokens_or_null(text_col).alias("_tk"),
        )
        .filter(F.size("_tk") >= k)
        .select(
            "_id",
            F.posexplode(
                word_shingles(None, k, distinct=False, toks=F.col("_tk"))
            ).alias("_pos", "_sh"),
        )
        .select("_id", "_pos", hasher(F.col("_sh")).alias("_h"))
    )
    wh = _W.partitionBy("_h")
    flagged = (
        shingled.withColumn(
            "_dup",
            F.min("_id").over(wh) != F.max("_id").over(wh),
        )
        .filter(F.col("_dup"))
        .select("_id", "_pos")
    )
    wd = _W.partitionBy("_id").orderBy("_pos")
    prev_end = F.max(F.col("_pos") + k).over(
        wd.rowsBetween(_W.unboundedPreceding, -1)
    )
    islands = flagged.withColumn(
        "_island",
        F.sum(
            F.when(prev_end.isNull() | (F.col("_pos") > prev_end), 1).otherwise(0)
        ).over(wd),
    )
    return (
        islands.groupBy(F.col("_id").alias(id_col), "_island")
        .agg(
            F.min("_pos").alias("span_start"),
            (F.max("_pos") + k).alias("span_end"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start"))
        .drop("_island")
    )
