"""Targeted record erasure (right-to-be-forgotten) over parquet stores.

The compliance operation every training-data platform needs: remove all
rows for a set of subject keys WITHOUT rewriting the whole table. Files
are selected by their parquet column statistics — a file whose
``[min, max]`` key range cannot contain any requested key is left
byte-identical — so on a key-sorted / z-ordered layout
(``sources/tables.py::write_sorted_shards`` / ``write_zordered``) the
rewrite cost is O(files actually containing the subjects), not O(table).

This driver-side implementation rewrites the few affected files with
pyarrow (the footer is parsed once per file and reused; stats-surviving
files get a key-column-only presence scan before any write happens);
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
    parquet directory (or single parquet file) at ``path``. Returns a
    report dict: ``{files_total, files_rewritten, rows_deleted}``.

    Files are skipped via row-group min/max statistics; stats-surviving
    files get a key-column-only presence scan (one column read, zero
    writes) and only files actually holding a subject are rewritten —
    in place through a fsync'd temp file + atomic rename, so a crash
    (including power loss) leaves either the old or the new complete
    file, never a truncated one.

    ``key_col`` must name a top-level primitive column: a compliance
    run must never silently resolve a same-named NESTED leaf (e.g.
    ``s.k`` when erasing by ``k``) — that would prune against the wrong
    statistics and leave subject rows on disk with a clean report."""
    if isinstance(keys, (str, bytes)):
        # 'alice' would become the set of its CHARACTERS: no real key
        # matches a single character, so the run reports an all-zero
        # SUCCESS while the subject stays on disk — the exact clean-
        # report-over-unerased-data mode the path guard below exists for
        raise TypeError(
            f"keys must be a sequence of key values, got the string "
            f"{keys!r} — pass [{keys!r}]"
        )
    key_set = set(keys)
    if not key_set:
        return {"files_total": 0, "files_rewritten": 0, "rows_deleted": 0}
    if not (os.path.isdir(path) or os.path.isfile(path)):
        # A missing/typo'd path would otherwise walk nothing and report
        # an all-zero SUCCESS — the worst failure mode for an erasure
        # API (caller believes the subjects are gone).
        raise FileNotFoundError(
            f"erase_keys_parquet: {path!r} is not a directory or file"
        )
    sorted_keys = sorted(key_set)

    from dask_felleskomponenter_spark.ioutil import path_mutex

    # Serialize whole-directory erasure runs (same host-level advisory
    # lock as the sync swaps): two overlapping runs would each rewrite
    # from the pre-run file they opened, so the last replace RESURRECTS
    # the other run's deleted subject rows — and the tmp-reaper below
    # would delete a live run's in-flight tmp. Under the mutex, any tmp
    # present at entry is necessarily crash residue.
    with path_mutex(path):
        return _erase_keys_locked(path, key_col, sorted_keys)


def _fsync_file(p: str) -> None:
    fd = os.open(p, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_dir(p: str) -> None:
    try:
        fd = os.open(p, os.O_RDONLY)
    except OSError:  # pragma: no cover — platform without dir-open
        return
    try:
        os.fsync(fd)
    except OSError:  # pragma: no cover
        pass
    finally:
        os.close(fd)


def _erase_keys_locked(path: str, key_col: str, sorted_keys: list) -> dict:
    import bisect

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = []
    if os.path.isfile(path):
        files.append(path)
        # single-file targets: os.walk(file) yields NOTHING, so the
        # tmp-reaper below never saw this file's own crash residue — a
        # full PRE-erasure copy of the bytes (the subject rows included)
        # lingering indefinitely, a retention leak directory runs clean
        # up. Reap the sibling tmp explicitly.
        tmp = os.path.join(
            os.path.dirname(path) or ".",
            "." + os.path.basename(path) + ".rewrite.tmp",
        )
        if os.path.exists(tmp):
            os.remove(tmp)
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
        # Top-level presence guard on the ARROW schema: the flattened
        # leaf-name list (md.schema.names) also contains nested struct
        # leaves, so a bare `key_col in names` would accept a file
        # where only `s.key_col` exists and later KeyError mid-run.
        arrow_schema = md.schema.to_arrow_schema()
        if key_col not in arrow_schema.names:
            # schema evolution: files written before the key column
            # existed hold no subject rows — skip, don't abort the
            # compliance run halfway with a bare ValueError
            continue
        # Physical column index by FULL dotted path, never by leaf
        # name: with columns s:struct<k> and a top-level k, the leaf
        # list holds two 'k's and index() would return the NESTED one —
        # pruning against the wrong statistics silently leaves subject
        # rows on disk. A top-level primitive column's path is exactly
        # its name.
        idx = next(
            (
                i
                for i in range(md.num_columns)
                if md.schema.column(i).path == key_col
            ),
            None,
        )
        if idx is None:
            raise ValueError(
                f"erase_keys_parquet: {key_col!r} in {f} is not a "
                "top-level primitive column (nested/struct keys are "
                "not supported)"
            )
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
        # Reuse the already-parsed footer (metadata=md): the default
        # constructor would re-read and re-parse it — double metadata
        # I/O on many-small-file stores.
        pf = pq.ParquetFile(f, metadata=md)
        try:
            # Presence pre-scan, key column ONLY (one column decoded,
            # zero writes): a stats range can overlap without any exact
            # key present — on an unsorted layout that is MOST files,
            # and rewriting each to a tmp that is then thrown away
            # turns an O(1) deletion into O(table) write I/O.
            present = False
            for batch in pf.iter_batches(batch_size=65536, columns=[key_col]):
                hits = pc.sum(
                    pc.is_in(batch[key_col], value_set=value_set)
                ).as_py()
                if hits:
                    present = True
                    break
            if not present:
                continue  # byte-identical guarantee: no write happened
            # Stream batch-by-batch: never materialize the whole file
            # on the driver. Dot-prefixed tmp name: Spark/Hadoop hide
            # '.'/'_' files, so a hard crash between writer close and
            # os.replace leaves residue no reader ever sees — a visible
            # `<f>.rewrite.tmp` would be read as data (duplicating, or
            # even RESURRECTING, the rows this compliance operation
            # must delete).
            tmp = os.path.join(
                os.path.dirname(f), "." + os.path.basename(f) + ".rewrite.tmp"
            )
            n_hit = 0
            try:
                with pq.ParquetWriter(tmp, pf.schema_arrow) as writer:
                    # 64k-row batches: driver memory is bounded by one
                    # batch regardless of file size; each batch lands as
                    # its own row group in the rewrite
                    for batch in pf.iter_batches(batch_size=65536):
                        mask = pc.is_in(batch[key_col], value_set=value_set)
                        hits = pc.sum(mask).as_py() or 0
                        n_hit += hits
                        if hits:
                            batch = batch.filter(pc.invert(mask))
                        if batch.num_rows:
                            writer.write_batch(batch)
                # fsync BEFORE the rename: os.replace is atomic against
                # process crash, but on a power loss the journal can
                # commit the rename before the data blocks flush,
                # leaving a truncated file under the final name — both
                # the old and the new bytes gone. fsync(tmp) then
                # fsync(parent dir) is what makes the docstring's
                # "old or new complete file, never truncated" true.
                _fsync_file(tmp)
                # Hadoop's local FS keeps .<name>.crc sidecars; a stale
                # one fails the next read with ChecksumException.
                # Remove it BEFORE the replace: a crash between replace
                # and a later removal would leave the mismatching
                # sidecar against the new bytes — the exact failure
                # this guards against — while a missing sidecar is
                # always harmless.
                crc = os.path.join(
                    os.path.dirname(f), "." + os.path.basename(f) + ".crc"
                )
                if os.path.exists(crc):
                    os.remove(crc)
                os.replace(tmp, f)
                _fsync_dir(os.path.dirname(f) or ".")
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
        finally:
            pf.close()  # all paths — an error must not leak the fd
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
