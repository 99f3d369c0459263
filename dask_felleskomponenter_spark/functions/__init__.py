from dask_felleskomponenter_spark.functions.text import (
    char_count,
    token_count,
    bpe_ish_token_count,
    punct_ratio,
    stopword_ratio,
    quality_score,
    language_id,
    simhash64,
    rolling_fingerprint,
)

__all__ = [
    "char_count",
    "token_count",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "language_id",
    "simhash64",
    "rolling_fingerprint",
]
