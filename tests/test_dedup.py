"""Near-dup dedup operator tests: exact Jaccard postings-list join and
the hot-shingle document-frequency cut."""

from __future__ import annotations

import pytest

from dask_felleskomponenter_spark.operators.dedup import ngram_jaccard_pairs


def _pairs(df, **kw):
    return {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", **kw).collect()
    }


def test_cap_above_max_df_is_identity(spark, sf_dir):
    """A document-frequency cap no shingle reaches must not change the
    result (the cut is a pure blacklist, not a rescoring)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = _pairs(docs, shingle_size=3, threshold=0.5)
    capped = _pairs(docs, shingle_size=3, threshold=0.5, max_shingle_df=10**9)
    assert base == capped
    assert base, "oracle-checked query should produce pairs at this SF"


def test_hot_shingle_cut_preserves_distinctive_pairs(spark):
    """Every doc shares a boilerplate phrase; A/B also share distinctive
    content. With the cut, the boilerplate shingles leave the universe:
    the A-B pair survives on its distinctive overlap while pairs related
    only through boilerplate drop out."""
    boiler = "terms of service apply to all"
    distinct_ab = "quick brown foxes jump over lazy dogs tonight"
    rows = [
        (1, f"{distinct_ab} alpha {boiler}"),
        (2, f"{distinct_ab} omega {boiler}"),
        (3, f"unrelated text about gardening and soil {boiler}"),
        (4, f"completely different musings on astronomy {boiler}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    capped = _pairs(docs, shingle_size=3, threshold=0.3, max_shingle_df=3)
    assert (1, 2) in capped
    # boilerplate-only relations must not survive the cut
    for bad in [(3, 4), (1, 3), (1, 4), (2, 3), (2, 4)]:
        assert bad not in capped

    # without the cut the boilerplate inflates every pairing
    uncapped = _pairs(docs, shingle_size=3, threshold=0.3)
    assert (1, 2) in uncapped


def test_cut_scores_are_exact_on_capped_universe(spark):
    """With the cap, jaccard = |A∩B| / |A∪B| computed over shingles with
    df <= cap — verified against a hand-computed value."""
    # A and B: 6 tokens each -> 4 trigram shingles each, sharing 3;
    # plus one boilerplate trigram present in all three docs (df=3).
    a = "w1 w2 w3 w4 w5 bb1 bb2 bb3"
    b = "w0 w2 w3 w4 w5 bb1 bb2 bb3"
    c = "zz yy xx bb1 bb2 bb3"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    got = _pairs(docs, shingle_size=3, threshold=0.1, max_shingle_df=2)
    # capped universe per doc: shingles touching bb* survive if df<=2.
    # trigrams of a: (w1 w2 w3)(w2 w3 w4)(w3 w4 w5)(w4 w5 bb1)(w5 bb1 bb2)(bb1 bb2 bb3)
    # df: (bb1 bb2 bb3) appears in all 3 docs -> cut. All others df<=2.
    # a-set: 5 shingles, b-set: 5 shingles
    # shared: (w2 w3 w4)(w3 w4 w5)(w4 w5 bb1)(w5 bb1 bb2) = 4
    # union = 5 + 5 - 4 = 6 -> jaccard = 4/6
    assert (1, 2) in got
    assert got[(1, 2)] == pytest.approx(4 / 6)


class TestUdx:
    """UDAF/UDTF surfaces (functions/udx.py)."""

    def test_geometric_mean_handles_empty_and_nonpositive(self, spark):
        from dask_felleskomponenter_spark.functions.udx import geometric_mean

        df = spark.createDataFrame(
            [("a", 2.0), ("a", 8.0), ("b", -1.0), ("b", 0.0)],
            "g string, v double",
        )
        got = {
            r["g"]: r["gm"]
            for r in df.groupBy("g").agg(geometric_mean("v").alias("gm")).collect()
        }
        assert got["a"] == pytest.approx(4.0)
        assert got["b"] is None  # no positive values -> SQL-style NULL

    def test_chunk_udtf_rows(self, spark):
        from dask_felleskomponenter_spark.functions.udx import register_udx

        register_udx(spark)
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, ""), (3, None)], "id bigint, text string"
        )
        df.createOrReplaceTempView("_t_chunks")
        rows = spark.sql(
            "SELECT id, c.* FROM _t_chunks, LATERAL chunk_document(text, 3, 2) c"
            " ORDER BY id, chunk_index"
        ).collect()
        got = [(r["id"], r["chunk_index"], r["chunk_text"], r["n_tokens"]) for r in rows]
        assert got == [
            (1, 0, "a b c", 3),
            (1, 1, "c d e", 3),
            (1, 2, "e", 1),
            (2, 0, "", 1),  # empty text -> one empty token chunk
            # id=3 (NULL text) yields no rows
        ]


def test_fingerprint_df_matches_column_form(spark, sf_dir):
    """The DataFrame-op fingerprint (posexplode + window-lead) must be
    value-identical to the interpreted column form, including short and
    empty documents."""
    from pyspark.sql import functions as F

    from dask_felleskomponenter_spark.functions import text as TX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    extra = spark.createDataFrame(
        [(9001, ""), (9002, "one two"), (9003, "   "), (9004, "a b c d e f g h i")],
        "doc_id bigint, text string",
    )
    docs = docs.select("doc_id", "text").unionByName(extra)
    col_form = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", TX.rolling_fingerprint_md5("text").alias("fp")
        ).collect()
    }
    df_form = {
        r["doc_id"]: r["fingerprint"]
        for r in TX.rolling_fingerprint_df(docs, "doc_id", "text").collect()
    }
    assert col_form == df_form

    xx_col = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", TX.rolling_fingerprint("text").alias("fp")
        ).collect()
    }
    xx_df = {
        r["doc_id"]: r["fingerprint"]
        for r in TX.rolling_fingerprint_df(
            docs, "doc_id", "text", hash_fn=F.xxhash64
        ).collect()
    }
    assert xx_col == xx_df
