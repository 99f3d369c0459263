"""Headroom stress: the dedup/CC/fuzzy family at ~10× the bench scale
with PLANTED adversarial hot keys.

The 100 TB risk in this family is never the average document — it is
the one boilerplate shingle shared by half the corpus and the one first
token that heads a million documents. This suite builds a 50k-doc table
(10× the sf0.1 bench corpus) whose skew is deliberately hostile:

- a boilerplate sentence planted in 15 000 documents — over the default
  Jaccard df-cap, so the uncapped path would enqueue C(15k, 2) ≈ 112M
  candidate pairs from those shingles alone;
- a first-token block of 2 000 documents — over FUZZY_MAX_BLOCK, so
  single-key blocking would do 2M levenshtein comparisons in one task;
- 100 planted true near-duplicate pairs and 500 planted 4-cliques whose
  recovery proves the guards cut the BLOWUP, not the RECALL.

Everything is generated with Spark column expressions (no driver-side
row building) and asserted exactly — completion on the test box's
memory budget plus exact planted-structure recovery is the contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_DOCS = 50_000
N_PAIRS = 100  # planted near-dup pairs (i, i + N_PAIRS)
BOILER_LO, BOILER_HI = 200, 15_200  # 15k docs share the boilerplate tail
FUZZY_LO, FUZZY_HI = 20_000, 22_000  # 2k docs share one first token
BOILER = " the quick brown fox jumps over the lazy dog"


@pytest.fixture(scope="module")
def stress_docs(spark, tmp_path_factory):
    i = F.col("id")
    pair_group = (i % (2 * N_PAIRS)) % N_PAIRS  # doc i pairs with i+N_PAIRS
    # group bodies must be FAR apart under edit distance on the 40-char
    # prefix (md5 makes ~26 of the first 40 chars group-unique), while
    # the paired docs stay identical — otherwise "pair4..."/"pair40..."
    # style numbering lands unrelated groups within the fuzzy threshold
    pair_body = F.concat_ws(
        " ",
        F.concat(F.lit("pair"), pair_group.cast("string")),
        F.md5(pair_group.cast("string")),
        *[
            F.concat(F.lit(t), pair_group.cast("string"))
            for t in (
                "alpha", "beta", "gamma", "delta",
                "epsilon", "zeta", "eta", "theta", "iota",
            )
        ],
    )
    # filler must be pairwise FAR under edit distance on the 40-char
    # prefix (structured "u<i>a u<i>b" fillers put docs with similar ids
    # genuinely within the fuzzy threshold) — md5 tokens are ~30 edits
    # apart; doc-unique tokens also give Jaccard df=1 shingles
    filler = F.concat_ws(
        " ",
        F.md5(i.cast("string")),
        F.md5((i + 1_000_000).cast("string")),
        F.md5((i + 2_000_000).cast("string")),
        F.md5((i + 3_000_000).cast("string")),
    )
    fuzzy_group = F.floor((i - FUZZY_LO) / 4)
    fuzzy_body = F.concat(
        F.lit("commonstart "),
        F.md5(fuzzy_group.cast("string")),
        F.lit(" t"),
        (i % 4).cast("string"),
    )
    text = (
        F.when(i < 2 * N_PAIRS, pair_body)
        .when((i >= FUZZY_LO) & (i < FUZZY_HI), fuzzy_body)
        .when(
            (i >= BOILER_LO) & (i < BOILER_HI),
            F.concat(filler, F.lit(BOILER)),
        )
        .otherwise(filler)
    )
    df = spark.range(N_DOCS).select(
        i.alias("doc_id"), text.alias("text"), F.lit("en").alias("lang")
    )
    path = str(tmp_path_factory.mktemp("stress") / "docs")
    df.write.parquet(f"{path}/documents.parquet")
    return path


def test_capped_jaccard_survives_planted_boilerplate(spark, stress_docs):
    """15k docs sharing a sentence must produce ZERO pairs from it (the
    df-cap removes those shingles from the universe) while every planted
    distinctive-content pair survives with its exact score."""
    from dask_felleskomponenter_spark.operators.dedup import (
        DEFAULT_MAX_SHINGLE_DF,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{stress_docs}/documents.parquet")
    assert BOILER_HI - BOILER_LO > DEFAULT_MAX_SHINGLE_DF  # planted > cap
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_size=3, threshold=0.5
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    want = {(g, g + N_PAIRS) for g in range(N_PAIRS)}
    assert set(got) == want
    assert all(j == pytest.approx(1.0) for j in got.values())


def test_fuzzy_match_survives_planted_hot_token_block(spark, stress_docs):
    """A 2000-doc first-token block (2× the cap) must escalate, not go
    quadratic or vanish: all 500 planted 4-cliques and the 100 pair-doc
    matches come back, and nothing else."""
    from dask_felleskomponenter_spark.plans.queries import (
        FUZZY_MAX_BLOCK,
        fuzzy_blocked_match,
    )

    assert FUZZY_HI - FUZZY_LO > FUZZY_MAX_BLOCK  # planted > cap
    rows = fuzzy_blocked_match(spark, stress_docs).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    want = {(g, g + N_PAIRS) for g in range(N_PAIRS)}
    for g in range((FUZZY_HI - FUZZY_LO) // 4):
        members = [FUZZY_LO + 4 * g + k for k in range(4)]
        want |= {
            (a, b) for ai, a in enumerate(members) for b in members[ai + 1 :]
        }
    assert got == want
    assert all(r.distance == 0 for r in rows)  # planted texts identical


def test_connected_components_on_recovered_structure(spark, stress_docs):
    """CC over the fuzzy matches: 500 4-cliques + 100 2-chains must
    resolve to exactly 600 components keyed by their minimum member."""
    from dask_felleskomponenter_spark.operators.graph import (
        connected_components,
    )
    from dask_felleskomponenter_spark.plans.queries import (
        fuzzy_blocked_match,
    )

    edges = fuzzy_blocked_match(spark, stress_docs)
    comp = connected_components(edges)
    sizes = {
        r.component: r.n
        for r in comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(sizes) == 500 + N_PAIRS
    quads = [c for c, n in sizes.items() if n == 4]
    pairs = [c for c, n in sizes.items() if n == 2]
    assert len(quads) == 500 and len(pairs) == N_PAIRS
    # component id is the minimum member
    assert all(FUZZY_LO <= c < FUZZY_HI and (c - FUZZY_LO) % 4 == 0 for c in quads)
    assert sorted(pairs) == list(range(N_PAIRS))


def test_history_store_multi_batch_ingest_and_compaction_at_scale(
    spark, stress_docs
):
    """The cross-batch dedup store under a 10×-bench re-crawl cycle:
    three overlapping 15k–25k-doc batches ingested with the durable
    order (corpus first, then ``record_novel``), a compaction pass over
    the accumulated appends, and then the two claims that must survive
    a POPULATED history — exact novelty counts (the planted identical
    pairs dedup within their batch, overlaps dedup across batches), and
    the screening plan still carrying exactly ONE Exchange (the batch's;
    the ~50k-hash history side reads bucket-aligned)."""
    import io
    import re
    import uuid
    from contextlib import redirect_stdout

    from dask_felleskomponenter_spark.operators.dedup import content_hash
    from dask_felleskomponenter_spark.operators.windows import keep_first
    from dask_felleskomponenter_spark.sources.dedup_store import (
        compact_history,
        dedup_against_history,
        record_novel,
    )

    table = f"stress_history_{uuid.uuid4().hex[:12]}"
    docs = spark.read.parquet(f"{stress_docs}/documents.parquet")
    n_buckets = 8
    try:
        # ids 100-199 duplicate 0-99 within batch 0; later batches
        # overlap the earlier ones by 10k and 10k ids respectively
        batches = [(0, 25_000), (15_000, 40_000), (30_000, N_DOCS)]
        expected_novel = [24_900, 15_000, 10_000]
        for b, (lo, hi) in enumerate(batches):
            batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            novel = dedup_against_history(
                spark, batch, "doc_id", "text", table,
                n_buckets=n_buckets, update=False,
            ).localCheckpoint(eager=True)
            assert novel.count() == expected_novel[b]
            record_novel(novel, "doc_id", table, f"crawl-{b}", n_buckets)
        total = sum(expected_novel)
        assert compact_history(spark, table, n_buckets=n_buckets) == total
        # compaction bounds the file count: one file-set per bucket
        files = [
            r[0]
            for r in spark.sql(
                f"SELECT input_file_name() FROM {table}"
            ).distinct().collect()
        ]
        assert len(files) <= n_buckets
        # a full re-crawl of everything is 100% seen
        assert (
            dedup_against_history(
                spark, docs, "doc_id", "text", table,
                n_buckets=n_buckets, update=False,
            ).count()
            == 0
        )
        # plan pin against the POPULATED compacted history: exactly one
        # Exchange (same recipe as tests/test_dedup_store.py — broadcast
        # off to surface the big-history shape, shuffle partitions ==
        # bucket count for the zero-shuffle bucketed read)
        probe = keep_first(
            # filter, not limit: a limit plans a SinglePartition gather
            # exchange of its own, which would muddy the one-exchange pin
            docs.filter(F.col("doc_id") < 1000).withColumn(
                "content_sha", content_hash("text")
            ),
            partition_by=["content_sha"],
            order_by=[F.col("doc_id")],
        )
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
        spark.conf.set("spark.sql.shuffle.partitions", str(n_buckets))
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                probe.join(
                    spark.table(table), on="content_sha", how="left_anti"
                ).explain("formatted")
            plan = buf.getvalue()
        finally:
            for k, v in prevs.items():
                spark.conf.set(k, v)
        assert "Bucketed: true" in plan, plan[:3000]
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:3000]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__old")
        spark.sql(f"DROP TABLE IF EXISTS {table}__scratch")


def test_duplicated_spans_survive_planted_boilerplate(spark, stress_docs):
    """The ExactSubstr pass on the hostile corpus: the boilerplate tail
    shared by 15k documents concentrates its two 8-gram hashes into
    15k-row window groups (the spill-not-OOM path), and every carrier
    must report EXACTLY the boilerplate span — starts at token 4 (after
    the 4 doc-unique filler tokens), 9 tokens long. The 100 planted
    identical pairs report whole-document spans; nothing else appears."""
    from dask_felleskomponenter_spark.operators.dedup import duplicated_spans

    docs = spark.read.parquet(f"{stress_docs}/documents.parquet")
    spans = duplicated_spans(docs, "doc_id", "text", k=8)
    got = (
        spans.groupBy("span_start", "span_end")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_coords = {(r.span_start, r.span_end): r.n for r in got}
    assert by_coords == {
        (4, 13): BOILER_HI - BOILER_LO,  # boilerplate tail carriers
        (0, 11): 2 * N_PAIRS,  # planted identical pair docs
    }


def test_neardup_history_store_at_scale_with_boilerplate(spark, stress_docs):
    """The LSH band-bucket history under the hostile corpus: ingest the
    50k docs in two overlapping crawls.

    Collision structure of this corpus under MinHash/LSH: the 100
    identical pairs and the fuzzy 4-cliques MUST collapse to their
    minima; the pure-md5-soup fillers share no shingles and MUST all
    survive; the 15k boilerplate docs are ~47% Jaccard-similar to each
    other (the 9-token shared tail dominates their ~13 tokens), so the
    16×4 S-curve fires on a large fraction of them — heavy INTENDED
    collapse whose exact count is probabilistic, asserted as a band.

    Protects the new store where it is most exposed at 100 TB: a
    populated multi-batch history, bucket-aligned screening on a corpus
    whose collision structure is adversarial, and exact idempotence of
    a full re-crawl."""
    import uuid

    from dask_felleskomponenter_spark.sources.dedup_store import (
        neardup_against_history,
        record_novel_signatures,
    )

    table = f"stress_neardup_{uuid.uuid4().hex[:12]}"
    docs = spark.read.parquet(f"{stress_docs}/documents.parquet")
    try:
        def ingest(lo, hi, label):
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            novel = neardup_against_history(
                spark, batch, "doc_id", "text", table
            ).localCheckpoint(eager=True)
            record_novel_signatures(
                novel, "doc_id", "text", table, label, n_buckets=8
            )
            return novel

        first = ingest(0, 30_000, "crawl-0")
        ids = {r.doc_id for r in first.select("doc_id").collect()}
        # pair minima survived, their identical twins did not
        assert all(i in ids for i in range(N_PAIRS))
        assert not any((i + N_PAIRS) in ids for i in range(N_PAIRS))
        # the fuzzy family is near-dup under EDIT DISTANCE, not Jaccard:
        # each 3-token doc carries exactly one (distinct) shingle, so
        # the shingle-based screen must keep ALL of them — dropping any
        # would be false-positive collapse of non-shingle-similar docs
        fuzzy_survivors = {i for i in ids if FUZZY_LO <= i < FUZZY_HI}
        assert fuzzy_survivors == set(range(FUZZY_LO, FUZZY_HI))
        # pure md5-soup fillers share no shingles — ALL survive
        fillers = set(range(15_200, 20_000)) | set(range(22_000, 30_000))
        assert fillers <= ids
        # the boilerplate family collapses heavily (S-curve at ~0.47
        # similarity) but never to nothing and never beyond itself
        boiler_survivors = sum(1 for i in ids if BOILER_LO <= i < BOILER_HI)
        assert 1 <= boiler_survivors < (BOILER_HI - BOILER_LO) // 2

        # crawl 2 re-fetches 10k of crawl 1 plus the 20k tail: the
        # overlap is fully screened, the tail's unique docs survive
        second = ingest(20_000, N_DOCS, "crawl-1")
        n_second = second.count()
        ids2 = {r.doc_id for r in second.select("doc_id").collect()}
        assert not any(i < 30_000 for i in ids2), "overlap must be screened"
        assert n_second == N_DOCS - 30_000

        # full re-crawl of everything: zero novel
        assert (
            neardup_against_history(
                spark, docs, "doc_id", "text", table
            ).count()
            == 0
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
