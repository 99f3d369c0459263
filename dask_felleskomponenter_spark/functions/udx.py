"""User-defined aggregate and table functions (SURVEY.md §2B UDAF/UDTF).

The reference has no UDAF/UDTF counterpart (its only UDFs are scalar —
``udfs/udf_tools.py:49``, ``udf_conversions.py:12``); these close the
checklist category with the two Python-native surfaces open Spark
offers, both Arrow-friendly and both oracle-expressible:

- **UDAF**: a grouped-aggregate ``pandas_udf`` — the whole group's
  column arrives as one Arrow-backed series, the return is one scalar.
  Vectorized (numpy over the batch), and partial-aggregation-free by
  contract, so use it for aggregates Catalyst lacks, not for sums.
- **UDTF**: a Python user-defined *table* function (one input row →
  many output rows) — the training-pipeline chunking shape: documents
  exploded into overlapping token windows for context-length-bounded
  model input.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """Grouped-agg UDAF: geometric mean of the positive values of the
    group; NULL when the group has none (SQL aggregate convention —
    a returned NaN would surface as NULL through Arrow anyway).

    The log values are sorted before the mean so the result is
    bit-deterministic regardless of shuffle arrival order — grouped-agg
    UDFs see the whole group at once but in partition order.
    """
    import numpy as np

    x = v.dropna()
    x = x[x > 0]
    if x.empty:
        return None
    logs = np.sort(np.log(x.to_numpy(dtype="float64")))
    return float(np.exp(logs.mean()))


# ASCII \s (re.ASCII pins Python's otherwise-Unicode \s to Java's
# accept set [ \t\n\x0B\f\r]) plus the explicit \p{Z} separator block
# (Python re has no \p{} classes): NBSP/ideographic/thin spaces split
# tokens identically on all three surfaces (Spark [\s\p{Z}], DuckDB
# [\s\x0b\p{Z}], here). Pinning ASCII matters because Python's \s also
# matches U+0085/U+001C-1F, which neither Java \s nor \p{Z} covers.
_WS = re.compile(
    r"[\s\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+",
    re.ASCII,
)


@udtf(returnType="chunk_index int, chunk_text string, n_tokens int")
class ChunkDocument:
    """UDTF: split a document into overlapping token-window chunks.

    ``eval(text, chunk_size, stride)`` yields one row per chunk:
    token windows ``[s, s + chunk_size)`` for ``s = 0, stride, 2·stride,
    … < n_tokens``. Tokenization is the engine-wide whitespace class —
    ASCII ``\\s`` plus the ``\\p{Z}`` separator block (``_WS`` above, the
    mirror of Spark's ``[\\s\\p{Z}]+`` in ``text.tokens()`` and the
    oracles' ``[\\s\\x0b\\p{Z}]+``) — with empty tokens dropped, so the
    DuckDB oracle can reproduce chunks exactly; a bare ``\\s+`` split
    would reintroduce the NBSP/ideographic-space divergence fixed in
    round 9. None text AND zero-token text
    (empty/whitespace-only) yield no rows — a document with no tokens
    has no chunks (LATERAL-join semantics drop the document).
    """

    def eval(self, text: str | None, chunk_size: int, stride: int):
        if text is None:
            return
        if chunk_size is None or stride is None:
            # a SQL NULL parameter would otherwise surface as an opaque
            # `NoneType <= int` TypeError from the comparison below
            raise ValueError(
                "chunk_document: chunk_size and stride must not be NULL"
            )
        if stride <= 0 or chunk_size <= 0:
            # raise, don't hang: s += stride would never advance and the
            # executor task spins forever on the SQL-registered surface
            raise ValueError(
                f"chunk_size and stride must be positive, got "
                f"chunk_size={chunk_size}, stride={stride}"
            )
        # split-then-drop-empties, the engine-wide tokenization
        # (text.tokens() / the oracles' list_filter'd split): phantom
        # ''-tokens from tab/newline/VT padding previously chunked as
        # real tokens, and a blank document got a single empty chunk
        toks = [t for t in _WS.split(text) if t != ""]
        n = len(toks)
        s = 0
        while s < n:
            chunk = toks[s : s + chunk_size]
            yield (s // stride, " ".join(chunk), len(chunk))
            s += stride


def register_udx(spark) -> None:
    """Register both surfaces for SQL use (U4 registry pattern)."""
    spark.udf.register("geometric_mean", geometric_mean)
    spark.udtf.register("chunk_document", ChunkDocument)
