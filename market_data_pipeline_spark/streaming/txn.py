"""Exactly-once commit protocol for foreachBatch read-modify-write stores
on plain parquet — the manifest-pointer trick transactional table formats
use, reduced to its core.

``foreachBatch`` is at-least-once: after a crash between the sink write
and the checkpoint commit, Structured Streaming REPLAYS the batch with the
same ``batch_id``. A naive read-modify-write store then double-applies the
batch (a CMS merge double-counts, an admission append duplicates docs).
The fix needs two properties:

1. **Idempotent data writes** — every batch writes to its OWN directory
   keyed by ``batch_id`` (``v=<id>`` for versioned sketch stores,
   ``batch=<id>`` for append stores), so a replayed attempt overwrites the
   same bytes instead of appending beside them.
2. **Atomic visibility** — a batch's directory becomes part of the store
   only when its zero-byte ``_COMMIT.<id>`` marker exists. Marker creation
   is a single filesystem create — atomic on local, HDFS and object
   stores — and readers resolve the store as "data dirs with markers".

Crash matrix: die before the data dir is complete → replay overwrites it;
die after data but before the marker → replay overwrites + marks; die
after the marker but before the checkpoint commit → replay sees the
marker and SKIPS. Every path applies the batch exactly once.

Contract: a store is bound to ONE checkpoint lineage (batch ids restart
at 0 under a fresh checkpoint — the same txn-version contract Delta's
idempotent writes have). Single writer per store, as with any streaming
sink. All paths go through the Hadoop FileSystem API so remote URIs
(hdfs://, s3a://, dbfs:/) behave identically to local ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MARKER = "_COMMIT."


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path-constructor) for ``path``'s scheme."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jvm.org.apache.hadoop.fs.Path


def committed_ids(spark: SparkSession, store_path: str) -> list[int]:
    """Sorted batch ids with a ``_COMMIT.<id>`` marker under the store."""
    fs, mkpath = _fs(spark, store_path)
    root = mkpath(store_path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(_MARKER):
            try:
                out.append(int(name[len(_MARKER):]))
            except ValueError:
                continue
    return sorted(out)


def is_committed(spark: SparkSession, store_path: str, batch_id: int) -> bool:
    fs, mkpath = _fs(spark, store_path)
    return fs.exists(mkpath(f"{store_path}/{_MARKER}{batch_id}"))


def mark_committed(spark: SparkSession, store_path: str, batch_id: int) -> None:
    """Atomically publish ``batch_id``: create its zero-byte marker."""
    fs, mkpath = _fs(spark, store_path)
    fs.create(mkpath(f"{store_path}/{_MARKER}{batch_id}"), True).close()


def data_dir(store_path: str, prefix: str, batch_id: int) -> str:
    return f"{store_path}/{prefix}{batch_id}"


def read_versioned(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Latest committed version of a versioned (overwrite-style) store, or
    None before the first commit. Reads exactly one ``v=<id>`` directory —
    the one the highest marker points at."""
    ids = committed_ids(spark, store_path)
    if not ids:
        return None
    return spark.read.parquet(data_dir(store_path, "v=", ids[-1]))


def read_appended(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Union of all committed batches of an append-style store, or None
    before the first commit. Uncommitted directories (a crashed attempt's
    half-written output) are invisible by construction."""
    ids = committed_ids(spark, store_path)
    if not ids:
        return None
    return spark.read.parquet(*[data_dir(store_path, "batch=", i) for i in ids])


def gc_versions(
    spark: SparkSession, store_path: str, keep_last: int = 2
) -> None:
    """Drop version dirs (and markers) older than the newest ``keep_last``
    commits — versioned stores stay O(keep_last · sketch_size) on disk.
    Never called for append stores (every committed batch IS the data)."""
    ids = committed_ids(spark, store_path)
    if len(ids) <= keep_last:
        return
    fs, mkpath = _fs(spark, store_path)
    for i in ids[:-keep_last]:
        # delete the marker FIRST so a reader racing the GC can only ever
        # resolve to a dir that still exists
        fs.delete(mkpath(f"{store_path}/{_MARKER}{i}"), False)
        fs.delete(mkpath(data_dir(store_path, "v=", i)), True)
