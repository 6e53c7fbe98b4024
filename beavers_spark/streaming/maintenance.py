"""State-table maintenance: small-file compaction for append-only state.

Every ``foreachBatch`` appender (``IncrementalNearDedup`` state/pairs,
``IncrementalIVFIndex`` cells) writes one file set per micro-batch;
after thousands of batches the file count — not the data volume — starts
to dominate scan planning and open() overhead. ``compact_parquet``
rewrites a state directory to a bounded number of files, preserving
partition columns (rows stay in their ``cell=``/``__bucket=``
directories) and any ``_*.json`` sidecars (e.g. persisted IVF
centroids).

The rewrite is swap-based: the compacted copy is fully written next to
the live directory before the swap, so a crash DURING the rewrite leaves
the original untouched. The swap itself is two renames — Python/POSIX
has no atomic directory exchange — so there is a brief window where the
live path does not exist: a concurrent reader can hit path-not-found
(retry it), and a crash between the renames leaves the data in
``.__compact_old``. ``recover_compaction`` (called automatically on the
next compaction) restores from that directory; run it at startup if
readers start before maintenance. Schedule compaction between triggers
or whenever ``input_files()`` grows past taste — correctness never
depends on it.

Durability scope: this module (and the IVF centroid sidecar) uses
driver-local ``os``/``open``/``shutil`` file APIs, so state directories
must live on a POSIX-visible path (local disk, NFS). On an object store
(S3/HDFS/abfs) route the sidecar I/O through the Hadoop FileSystem API
(``spark._jvm.org.apache.hadoop.fs.FileSystem``) instead — otherwise the
watermark is never found and replayed batches double-apply.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclasses.dataclass
class WaveMetrics:
    """Per-wave write accounting for foreachBatch state writers — the
    durable-state twin of the driver-loop metrics (``CycleMetrics`` /
    ``DagMetrics``; reference kafka.py:399-446 ExecutionMetrics
    discipline). ``bytes`` is the wave's rewrite volume and
    ``max_files_per_partition`` the worst bucket/wave directory — the
    two numbers that tell an operator whether ``n_buckets`` is sized so
    one bucket stays an executor-comfortable rewrite, and when
    compaction is due."""

    batch_id: int
    partitions: int  # touched bucket / wave directories
    files: int  # data files across those directories
    bytes: int  # bytes across those directories (rewritten this wave)
    max_files_per_partition: int


def partition_stats(
    spark: SparkSession, dirs: Sequence[str]
) -> tuple[int, int, int]:
    """(files, bytes, max_files_in_one_dir) over ``dirs``, counting
    non-hidden data files only. Hadoop FileSystem API, so the same call
    works on local paths, HDFS, or an object store; a missing directory
    counts as empty (a touched bucket can legitimately not exist yet on
    the first wave). Driver-side listing of ONLY the named directories —
    O(touched buckets), never a full-table walk."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    files = total = mx = 0
    for d in dirs:
        hpath = jvm.org.apache.hadoop.fs.Path(d)
        fs = hpath.getFileSystem(conf)
        if not fs.exists(hpath):
            continue
        n = 0
        for status in fs.listStatus(hpath):
            name = status.getPath().getName()
            if status.isFile() and not name.startswith(("_", ".")):
                n += 1
                total += status.getLen()
        files += n
        mx = max(mx, n)
    return files, total, mx


def table_exists(spark: SparkSession, path: str) -> bool:
    """Cheap state-existence probe via the Hadoop FileSystem API — no
    ``DataFrameReader`` probe, no exception control flow, no orphan Java
    stack trace in the logs when the answer is simply "not yet" (and no
    risk of a real read failure being swallowed as "missing").

    Scheme-agnostic: resolves through the session's Hadoop configuration,
    so the same call works on local paths, HDFS, or an object store.
    True only if ``path`` exists and holds at least one non-hidden entry
    (a data file or partition directory) — a directory containing only
    ``_``-sidecars (e.g. a ``BatchWatermark`` written before the first
    parquet commit) is "no table yet", matching what
    ``spark.read.parquet`` would conclude.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


class BatchWatermark:
    """Replay guard for ``foreachBatch`` state writers.

    Structured Streaming re-invokes ``foreachBatch`` with the SAME
    ``batch_id`` after a crash/restart (its offset log commits after the
    sink runs). For sinks whose apply step is not idempotent — merge-in
    aggregates, append-mode state — re-running a batch corrupts state.
    The watermark records the highest applied batch id in a ``_``-sidecar
    (invisible to Spark's parquet reader, preserved by
    ``compact_parquet``); writers skip any batch at or below it.

    Scope, honestly: this makes replays after CLEAN restarts and
    post-commit crashes exactly-once. A crash in the middle of a batch's
    writes (after some output, before ``mark``) still re-applies the
    whole batch — full atomicity would need staged directory commits per
    output. Batch ids are monotonic per checkpoint, which is what makes
    a single high-watermark sufficient.
    """

    def __init__(self, state_dir: str) -> None:
        self.state_dir = state_dir
        self.file = os.path.join(state_dir, "_last_batch.json")

    def is_applied(self, batch_id: int) -> bool:
        if not os.path.exists(self.file):
            return False
        with open(self.file) as fh:
            return batch_id <= json.load(fh)["last_batch"]

    def mark(self, batch_id: int) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        with open(self.file, "w") as fh:
            json.dump({"last_batch": batch_id}, fh)


def recover_compaction(path: str) -> bool:
    """Restore a table lost to a crash between compact_parquet's two
    renames: if ``path`` is missing but ``path.__compact_old`` exists,
    rename it back. Returns True if a recovery happened. Idempotent;
    call at startup when readers may precede maintenance."""
    old = path.rstrip("/") + ".__compact_old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_by: str | None = None,
    files_per_partition: int = 1,
    transform=None,
) -> int:
    """Rewrite a parquet directory with a bounded file count.

    Returns the number of data files after compaction. With
    ``partition_by``, each partition directory is rewritten to at most
    ``files_per_partition`` files (repartition on the partition column
    keeps the shuffle aligned with the directory layout); without it the
    whole table is coalesced. ``transform`` (DataFrame -> DataFrame), if
    given, is applied before the rewrite — the hook for layout changes
    that must ride the same swap, e.g. coarsening a wave-partition
    column so a hive-partitioned table stays hive-partitioned.

    The swap is NOT atomic (see module docstring): readers racing the
    two renames must tolerate a transient path-not-found.
    """
    recover_compaction(path)
    df = spark.read.parquet(path)
    if transform is not None:
        df = transform(df)
    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    if partition_by:
        (
            df.repartition(files_per_partition, F.col(partition_by))
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(tmp)
        )
    else:
        df.coalesce(files_per_partition).write.mode("overwrite").parquet(tmp)

    # carry sidecar metadata (e.g. _centroids.json) — Spark ignores
    # underscore-prefixed files, but our operators depend on them
    for name in os.listdir(path):
        if name.startswith("_") and name.endswith(".json"):
            shutil.copy2(os.path.join(path, name), os.path.join(tmp, name))

    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(spark.read.parquet(path).inputFiles())
