"""WebDataset tar-shard READER as a PySpark Python DataSource (Spark 4
``pyspark.sql.datasource`` API) — the read half of
``operators/multimodal.py::write_webdataset``.

WebDataset's contract is sequential tar streaming with one shard per
worker (no random access, storage-friendly at 100 TB); this source maps
that contract onto Spark's partition model directly: ONE InputPartition
per shard tar, so read parallelism == shard count and each task streams
its archive start-to-finish exactly once. Schema:

    (doc_id long, shard_id int, member_idx int, n_bytes long,
     payload binary)

Usage::

    spark.dataSource.register(WebDatasetSource)
    df = spark.read.format("webdataset").option("path", shard_dir).load()

At deploy scale the ``path`` glob lists an object-store prefix; member
names follow the writer's ``{doc_id}.bin`` convention (WebDataset's
basename-keying rule — the writer's basename-collision guard keeps names
unique per shard).

Visibility contract (both halves rely on it): the writer stages each
archive as ``shard-NNNNN.tar.tmp`` and renames on close, so a tar that
matches ``shard-*.tar`` is COMPLETE — no reader can ever stream a
half-written archive. Readers therefore treat presence as commit.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = (
    "doc_id long, shard_id int, member_idx int, n_bytes long, payload binary"
)


def _list_shards(path: str) -> list[str]:
    import glob
    import os

    if not os.path.isdir(path):
        raise FileNotFoundError(f"webdataset path {path!r} is not a directory")
    return sorted(glob.glob(os.path.join(path, "shard-*.tar")))


def _iter_tar(path: str):
    """(doc_id, shard_id, member_idx, n_bytes, payload) rows of ONE shard —
    the single member-iteration loop both the batch and stream readers
    share. ``next()`` streaming iteration, not ``getmembers()``: one
    sequential pass, no full-index materialization — the WebDataset
    access pattern the format exists for."""
    import os
    import re
    import tarfile

    shard = int(re.search(r"shard-(\d+)\.tar$", os.path.basename(path)).group(1))
    with tarfile.open(path, "r") as tf:
        idx = 0
        member = tf.next()
        while member is not None:
            if member.isfile():
                data = tf.extractfile(member).read()
                doc_id = int(member.name.rsplit(".", 1)[0])
                yield (doc_id, shard, idx, len(data), data)
                idx += 1
            member = tf.next()


class WebDatasetSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "WebDatasetReader":
        return WebDatasetReader(self.options)

    def simpleStreamReader(self, schema) -> "WebDatasetStreamReader":
        return WebDatasetStreamReader(self.options)


class WebDatasetStreamReader(SimpleDataSourceStreamReader):
    """Streaming half: each micro-batch picks up shard tars that appeared
    since the last committed offset — the "training shards land on the
    store as they're produced" ingestion pattern.

    Offset = {"files": [consumed shard basenames, sorted]} — a SET, not
    a count: parallel producers finish shards out of name order, so a
    count over the sorted listing would skip a lower-numbered shard that
    lands after a higher-numbered one was consumed. The set offset makes
    each batch exactly ``listing - consumed``, whatever the landing
    order; the writer's rename-on-close staging guarantees every listed
    tar is complete. Offset size tracks the shard count (shards are
    bounded, coarse units — thousands, not millions; document rotation/
    archival if a feed ever exceeds that). ``readBetweenOffsets`` replays
    ``end.files - start.files`` — checkpoint recovery re-reads exactly
    the uncommitted shards, nothing twice. The simple reader API runs on
    the driver; per batch it streams only the NEW archives, so driver
    work is O(new shards) not O(directory)."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("webdataset source requires option('path', ...)")
        self.path = path

    def initialOffset(self):
        return {"files": []}

    def _new_since(self, consumed: list[str]) -> list[str]:
        import os

        seen = set(consumed)
        return [
            p for p in _list_shards(self.path)
            if os.path.basename(p) not in seen
        ]

    def read(self, start):
        import os

        new = self._new_since(start["files"])
        end = {
            "files": sorted(
                set(start["files"]) | {os.path.basename(p) for p in new}
            )
        }
        return self._rows(new), end

    def readBetweenOffsets(self, start, end):
        import os

        want = set(end["files"]) - set(start["files"])
        paths = [
            p for p in _list_shards(self.path)
            if os.path.basename(p) in want
        ]
        return self._rows(paths)

    @staticmethod
    def _rows(paths):
        # a LIST iterator, not a generator: the simple-reader runtime
        # copy.copy()s the cached iterator for prefetch replay, and
        # generators aren't copyable
        out = []
        for path in paths:
            out.extend(_iter_tar(path))
        return iter(out)


class WebDatasetReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("webdataset source requires option('path', ...)")
        self.path = path

    def partitions(self):
        shards = _list_shards(self.path)
        if not shards:
            # an existing directory with zero shards is an EMPTY dataset
            # (e.g. an export of an empty table), not an error — yield one
            # no-op partition so the scan returns an empty typed frame,
            # the same contract as StateStore.read on an empty store. A
            # missing directory still raises (config typo ≠ empty data).
            return [InputPartition(None)]
        return [InputPartition(s) for s in shards]

    def read(self, partition):
        if partition.value is None:
            return
        yield from _iter_tar(partition.value)
