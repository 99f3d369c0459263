"""Targeted record erasure (right-to-be-forgotten) over parquet stores.

The compliance operation every training-data platform needs: remove all
rows for a set of subject keys WITHOUT rewriting the whole table. Files
are selected by their parquet column statistics — a file whose
``[min, max]`` key range cannot contain any requested key is left
byte-identical — so on a key-sorted / z-ordered layout
(``sources/tables.py::write_sorted_shards`` / ``write_zordered``) the
rewrite cost is O(files actually containing the subjects), not O(table).

This driver-side implementation rewrites the few affected files with
pyarrow (one footer read per file, one streamed rewrite per hit);
memory is bounded by one record batch, not the file size, so a single
multi-GB file cannot exhaust the driver. At cluster scale the same
selection predicate drives a distributed variant (binaryFile listing →
per-file rewrite tasks); the statistics-pruning contract — untouched
files stay byte-identical — is what the tests pin.
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

    import bisect

    from dask_felleskomponenter_spark.ioutil import path_mutex

    key_set = set(keys)
    if not key_set:
        return {"files_total": 0, "files_rewritten": 0, "rows_deleted": 0}
    sorted_keys = sorted(key_set)

    # Serialize whole-directory erasure runs (same host-level advisory
    # lock as the sync swaps): two overlapping runs would each rewrite
    # from the pre-run file they opened, so the last replace RESURRECTS
    # the other run's deleted subject rows — and the tmp-reaper below
    # would delete a live run's in-flight tmp. Under the mutex, any tmp
    # present at entry is necessarily crash residue.
    with path_mutex(path):
        return _erase_keys_locked(path, key_col, sorted_keys, pa, pc, pq, bisect)


def _erase_keys_locked(path, key_col, sorted_keys, pa, pc, pq, bisect) -> dict:
    files = []
    for dp, _dn, fs in os.walk(path):
        for f in fs:
            if f.endswith(".rewrite.tmp"):
                # crash residue from an interrupted erasure run — the
                # swap never happened, the original file is intact, and
                # a leftover tmp must not linger (pre-round-6 runs used
                # a Spark-visible name; reap those too)
                os.remove(os.path.join(dp, f))
            elif f.endswith(".parquet"):
                files.append(os.path.join(dp, f))
    files.sort()
    value_set = pa.array(sorted_keys)
    rewritten = 0
    deleted = 0
    for f in files:
        md = pq.read_metadata(f)
        if key_col not in md.schema.names:
            # schema evolution: files written before the key column
            # existed hold no subject rows — skip, don't abort the
            # compliance run halfway with a bare ValueError
            continue
        idx = md.schema.names.index(key_col)
        overlap = False
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or st.min is None:
                overlap = True  # no stats — must check the data
                break
            # per-key overlap, not the [min(keys), max(keys)] envelope:
            # with subjects at both ends of a sorted table the envelope
            # covers EVERY file and erasure degrades to a full-table
            # rewrite — bisect finds whether any individual key falls
            # in this row group's [min, max]
            j = bisect.bisect_left(sorted_keys, st.min)
            if j < len(sorted_keys) and sorted_keys[j] <= st.max:
                overlap = True
                break
        if not overlap:
            continue
        # Stream batch-by-batch: never materialize the whole file on
        # the driver. The tmp file is only swapped in when a key was
        # actually present, preserving the byte-identical guarantee for
        # files whose stats range overlapped but held no subject key.
        pf = pq.ParquetFile(f)
        # Dot-prefixed tmp name: Spark/Hadoop hide '.'/'_' files, so a
        # hard crash between writer close and os.replace leaves residue
        # that no reader ever sees — a visible `<f>.rewrite.tmp` would
        # be read as data (duplicating, or even RESURRECTING, the rows
        # this compliance operation must delete).
        tmp = os.path.join(
            os.path.dirname(f), "." + os.path.basename(f) + ".rewrite.tmp"
        )
        n_hit = 0
        try:
            with pq.ParquetWriter(tmp, pf.schema_arrow) as writer:
                # 64k-row batches: driver memory is bounded by one batch
                # regardless of file size; each batch lands as its own
                # row group in the rewrite
                for batch in pf.iter_batches(batch_size=65536):
                    mask = pc.is_in(batch[key_col], value_set=value_set)
                    hits = pc.sum(mask).as_py() or 0
                    n_hit += hits
                    if hits:
                        batch = batch.filter(pc.invert(mask))
                    if batch.num_rows:
                        writer.write_batch(batch)
            if n_hit == 0:
                os.remove(tmp)
                continue  # range overlapped but no exact key present
            # Hadoop's local FS keeps .<name>.crc sidecars; a stale one
            # fails the next read with ChecksumException. Remove it
            # BEFORE the replace: a crash between replace and a
            # later removal would leave the mismatching sidecar against
            # the new bytes — the exact failure this guards against —
            # while a missing sidecar is always harmless.
            crc = os.path.join(
                os.path.dirname(f), "." + os.path.basename(f) + ".crc"
            )
            if os.path.exists(crc):
                os.remove(crc)
            os.replace(tmp, f)
        finally:
            pf.close()  # all paths — a mid-rewrite error must not leak the fd
            if os.path.exists(tmp):
                os.remove(tmp)
        rewritten += 1
        deleted += n_hit
    # parquet summary sidecars (written by some writers) would advertise
    # pre-erasure statistics/row counts — stale after any rewrite
    if rewritten:
        for side in ("_metadata", "_common_metadata"):
            p = os.path.join(path, side)
            if os.path.exists(p):
                os.remove(p)
    return {
        "files_total": len(files),
        "files_rewritten": rewritten,
        "rows_deleted": deleted,
    }
