"""Per-session memoized parquet scans for write-once benchmark inputs.

r14 optimization round, generalizing the olap ``_scan`` finding (VERDICT
r13 #2 adjudication): every ``spark.read.parquet`` call pays ~135 ms of
driver-side DataFrame construction (file listing + footer schema read)
before any task runs, and the bench's timed region rebuilds each query's
plan from scratch per run — so repeated scans of the same immutable path
were costing more than some queries' entire execution.  One scan
DataFrame per (applicationId, path) removes the redundancy for the whole
registry (documents/embeddings/events and the TPC-H dirs).

This is a LAZY-PLAN memo, not a data cache: the returned DataFrame is an
unexecuted scan, every action still reads the parquet files, and
``spark.catalog.clearCache()`` (the bench's cold-cache rule) is
unaffected because nothing here is persisted.  Entries of stopped
sessions are dropped when a new applicationId first misses.

Scope guard, same as the olap original: only call this for write-once
directories (the driver testdata and TPC-H dirs).  A memoized scan pins
its file listing, which would silently miss late-arriving files on
mutable dirs — the streaming stores and CLI user paths keep plain
``spark.read.parquet``.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_SCAN_CACHE: dict[tuple[str, str], DataFrame] = {}
#: Concurrent first calls must not race the stale-app clear against an
#: insert (same guard the olap original grew in review).
_SCAN_LOCK = threading.Lock()


def memo_parquet_scan(spark: SparkSession, path: str) -> DataFrame:
    """The session's memoized scan DataFrame for ``path`` (write-once dirs
    only — see module docstring)."""
    app = spark.sparkContext.applicationId
    key = (app, path)
    with _SCAN_LOCK:
        df = _SCAN_CACHE.get(key)
        if df is None:
            if any(k[0] != app for k in _SCAN_CACHE):
                _SCAN_CACHE.clear()
            df = spark.read.parquet(path)
            _SCAN_CACHE[key] = df
    return df
