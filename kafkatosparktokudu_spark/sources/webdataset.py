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

    Offset = {"seen": N} over the LEXICOGRAPHICALLY SORTED shard list;
    the writer's shard-NNNNN.tar naming makes sort order == production
    order, and shards are immutable once written (tar close is the
    commit), so a count offset is exact. ``readBetweenOffsets`` replays
    any [start, end) window from the same listing — checkpoint recovery
    re-reads exactly the uncommitted shards, nothing twice. The simple
    reader API runs on the driver; per batch it streams only the NEW
    archives, so driver work is O(new shards) not O(directory)."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("webdataset source requires option('path', ...)")
        self.path = path

    def _shards(self):
        import glob
        import os

        return sorted(glob.glob(os.path.join(self.path, "shard-*.tar")))

    def initialOffset(self):
        return {"seen": 0}

    def read(self, start):
        shards = self._shards()
        rows = self._rows(shards[start["seen"] :])
        return rows, {"seen": len(shards)}

    def readBetweenOffsets(self, start, end):
        shards = self._shards()
        return self._rows(shards[start["seen"] : end["seen"]])

    @staticmethod
    def _rows(paths):
        import os
        import re
        import tarfile

        out = []
        for path in paths:
            shard = int(
                re.search(r"shard-(\d+)\.tar$", os.path.basename(path)).group(1)
            )
            with tarfile.open(path, "r") as tf:
                idx = 0
                member = tf.next()
                while member is not None:
                    if member.isfile():
                        data = tf.extractfile(member).read()
                        doc_id = int(member.name.rsplit(".", 1)[0])
                        out.append((doc_id, shard, idx, len(data), data))
                        idx += 1
                    member = tf.next()
        return iter(out)


class WebDatasetReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("webdataset source requires option('path', ...)")
        self.path = path

    def partitions(self):
        import glob
        import os

        shards = sorted(glob.glob(os.path.join(self.path, "shard-*.tar")))
        if not shards:
            raise FileNotFoundError(
                f"no shard-*.tar under {self.path!r} (writer contract: "
                "write_webdataset names shards shard-NNNNN.tar)"
            )
        return [InputPartition(s) for s in shards]

    def read(self, partition):
        import os
        import re
        import tarfile

        path = partition.value
        shard = int(re.search(r"shard-(\d+)\.tar$", os.path.basename(path)).group(1))
        with tarfile.open(path, "r") as tf:
            # next() streaming iteration, not getmembers(): one sequential
            # pass, no full-index materialization — the WebDataset access
            # pattern the format exists for.
            idx = 0
            member = tf.next()
            while member is not None:
                if member.isfile():
                    data = tf.extractfile(member).read()
                    doc_id = int(member.name.rsplit(".", 1)[0])
                    yield (doc_id, shard, idx, len(data), data)
                    idx += 1
                member = tf.next()
