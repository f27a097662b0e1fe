"""Custom Python data source (Spark 4 DataSource API) [EXT].

The reference ingests only CSV buffers (`main.py:102,151`); this module
exercises the engine's *source extension point*: a first-class
`spark.read.format(...)` source implemented in Python, with proper
partition planning so the scan parallelizes across executors like any
built-in source.

`HashStreamSource` generates a deterministic keyed row stream —
`(i, bucket, payload_hash)` for i in [0, n) — the synthetic-source shape
used to smoke-load pipelines without external systems.  Determinism
makes it oracle-checkable: `payload_hash` is the top-60-bit md5 integer
of the row index (the same md5_60 the dedup/cleaning operators use), so
DuckDB replays the exact table from `generate_series`.

Scale notes:

* `partitions()` splits [0, n) into `num_partitions` contiguous ranges —
  each `InputPartition` is read independently, so a 10^12-row synthetic
  load spreads over the cluster instead of serializing through one task
  (the naive single-`read()` generator source is exactly the
  one-task-reads-everything trap).
* The reader yields plain tuples; Spark batches them through Arrow.  No
  state is shared across partitions — a retried task regenerates its
  range bit-identically (same retry-safety argument as the seeded
  hashes in `operators/cleaning.py`).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _positive_option(options, key: str, default: int) -> int:
    v = int(options.get(key, default))
    if v < 1:
        raise ValueError(f"hashstream option {key!r} must be >= 1, got {v}")
    return v


class _HashStreamReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        if self.n < 0:
            raise ValueError(f"hashstream option 'n' must be >= 0, got {self.n}")
        self.num_partitions = _positive_option(options, "numpartitions", 8)
        self.buckets = _positive_option(options, "buckets", 16)

    def partitions(self):
        if self.n == 0:
            # n=0 is a valid empty scan; an empty partition list would
            # make the runner fall back to read(None)
            return [_RangePartition(0, 0)]
        step = max(1, -(-self.n // self.num_partitions))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            h = _md5_60(str(i))
            yield (i, h % self.buckets, h)


class _HashStreamStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic row stream: the
    offset IS the row index, so `read(start)` emits
    ``[start, start + rows_per_batch)`` and advances — Spark checkpoints
    the offset JSON, and recovery (or a re-read between committed
    offsets via `readBetweenOffsets`) regenerates rows bit-identically
    because content is a pure function of the index.  `n` caps the
    stream so availableNow terminates."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        if self.n < 0:
            raise ValueError(f"hashstream option 'n' must be >= 0, got {self.n}")
        self.rows_per_batch = _positive_option(options, "rowsperbatch", 100)
        self.buckets = _positive_option(options, "buckets", 16)

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, start: int, end: int):
        rows = []
        for i in range(start, end):
            h = _md5_60(str(i))
            rows.append((i, h % self.buckets, h))
        return rows

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.rows_per_batch, self.n)
        return iter(self._rows(lo, hi)), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["i"], end["i"]))


class HashStreamSource(DataSource):
    """`spark.read.format("hashstream")` / `spark.readStream.format(
    "hashstream")` after `spark.dataSource.register(HashStreamSource)`.

    Options: ``n`` (row count / stream cap), ``numPartitions`` (batch
    scan parallelism), ``buckets`` (bucket modulus), ``rowsPerBatch``
    (streaming micro-batch size)."""

    @classmethod
    def name(cls) -> str:
        return "hashstream"

    def schema(self) -> str:
        return "i bigint, bucket bigint, payload_hash bigint"

    def reader(self, schema) -> _HashStreamReader:
        return _HashStreamReader(self.options)

    def simpleStreamReader(self, schema) -> _HashStreamStreamReader:
        return _HashStreamStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of every custom Python source."""
    spark.dataSource.register(HashStreamSource)
