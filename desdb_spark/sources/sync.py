"""Distributed bulk transfer — desdb's des-sync scripts re-expressed
(SURVEY.md §2A A10).

Reference parity: ``des-sync-red`` / ``des-sync-coadd`` rsynced run
directories from the DES archive, single-node, list-then-fetch
[desdb:bin/des-sync-* — reconstructed, SURVEY.md §0]. The engine's form:
a *DataFrame of (src, dst) pairs* (usually produced by the path-template
operators) executed with ``foreachPartition`` — each executor task copies
its slice, so transfer parallelism scales with the cluster, and the
result DataFrame is a per-file manifest (copied/skipped/failed + bytes)
that downstream queries can join.

Scale notes: idempotent by design (size-match skip, like rsync); failures
are rows, not exceptions, so one bad file can't kill a 10 M-file sync;
repartition(n) sizes the copy parallelism independently of the manifest's
partitioning. Local-filesystem copy here; on a cluster the same shape
drives object-store SDK calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MANIFEST_SCHEMA = "src string, dst string, status string, n_bytes long, error string"


def sync_files(pairs: DataFrame, parallelism: int = 32) -> DataFrame:
    """Copy src→dst for every row of ``pairs`` (columns: src, dst).

    Returns the manifest DataFrame (status: copied | skipped | failed).
    """

    def copy_partition(rows):
        import os
        import shutil

        for r in rows:
            src, dst = r.src, r.dst
            try:
                size = os.path.getsize(src)
                if os.path.exists(dst) and os.path.getsize(dst) == size:
                    yield (src, dst, "skipped", size, None)
                    continue
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(src, dst)
                yield (src, dst, "copied", size, None)
            except Exception as e:  # noqa: BLE001 — failures become manifest rows
                yield (src, dst, "failed", 0, f"{type(e).__name__}: {e}")

    return (
        pairs.select("src", "dst")
        .repartition(parallelism)
        .rdd.mapPartitions(copy_partition)
        .toDF(MANIFEST_SCHEMA)
    )
