"""Targeted record erasure (right-to-be-forgotten) over parquet stores.

The compliance operation every training-data platform needs: remove all
rows for a set of subject keys WITHOUT rewriting the whole table. Files
are selected by their parquet column statistics — a file whose
``[min, max]`` key range cannot contain any requested key is left
byte-identical — so on a key-sorted / z-ordered layout
(``sources/tables.py::write_sorted_shards`` / ``write_zordered``) the
rewrite cost is O(files actually containing the subjects), not O(table).

This driver-side implementation rewrites the few affected files with
pyarrow (one footer read per file, one rewrite per hit). At cluster
scale the same selection predicate drives a distributed variant
(binaryFile listing → per-file rewrite tasks); the statistics-pruning
contract — untouched files stay byte-identical — is what the tests pin.
"""

from __future__ import annotations

import os
from collections.abc import Sequence


def erase_keys_parquet(
    path: str,
    key_col: str,
    keys: Sequence,
) -> dict:
    """Delete every row whose ``key_col`` is in ``keys`` from the
    parquet directory at ``path``. Returns a report dict:
    ``{files_total, files_rewritten, rows_deleted}``.

    Files are skipped via row-group min/max statistics; affected files
    are rewritten in place through a temp file + atomic rename, so a
    crash leaves either the old or the new complete file, never a
    truncated one."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key_set = set(keys)
    if not key_set:
        return {"files_total": 0, "files_rewritten": 0, "rows_deleted": 0}
    lo, hi = min(key_set), max(key_set)

    files = sorted(
        os.path.join(dp, f)
        for dp, _dn, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    rewritten = 0
    deleted = 0
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index(key_col)
        overlap = False
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or st.min is None:
                overlap = True  # no stats — must check the data
                break
            # range check first (cheap), then exact membership on read
            if st.max >= lo and st.min <= hi:
                overlap = True
                break
        if not overlap:
            continue
        table = pq.read_table(f)
        mask = pc.is_in(table[key_col], value_set=pa.array(sorted(key_set)))
        n_hit = pc.sum(mask).as_py() or 0
        if n_hit == 0:
            continue  # range overlapped but no exact key present
        kept = table.filter(pc.invert(mask))
        tmp = f + ".rewrite.tmp"
        pq.write_table(kept, tmp)
        os.replace(tmp, f)
        # Hadoop's local FS keeps .<name>.crc sidecars; a stale one
        # fails the next read with ChecksumException
        crc = os.path.join(
            os.path.dirname(f), "." + os.path.basename(f) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        rewritten += 1
        deleted += n_hit
    return {
        "files_total": len(files),
        "files_rewritten": rewritten,
        "rows_deleted": deleted,
    }
