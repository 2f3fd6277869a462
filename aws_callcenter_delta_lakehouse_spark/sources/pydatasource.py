"""Python Data Source API (Spark 4): a custom batch source the engine
registers like any built-in format — the extension point for reading
systems Spark has no connector for (internal doc stores, feature
services) without leaving the DataFrame surface.

The example source generates deterministic synthetic documents with
real partition planning (``partitions()`` -> one ``InputPartition`` per
shard, each read independently by an executor), so the scan
parallelizes exactly like a file source.

The classes are defined INSIDE the factory: cloudpickle then serializes
them BY VALUE, so executors never import this package (Python workers
do not inherit the driver's sys.path — learned round 1)."""

from __future__ import annotations


def make_synthetic_docs_source():
    """Return a self-contained DataSource class for
    ``spark.dataSource.register``; read back with
    ``spark.read.format("synthetic_docs").option("numdocs", N)
    .option("partitions", P).load()``."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("numdocs", 100))
            self.parts = int(options.get("partitions", 4))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            shard = partition.value
            # round-robin shard ownership: deterministic, disjoint, and
            # every doc_id in [0, n) appears exactly once across shards
            for doc_id in range(shard, self.n, self.parts):
                yield (
                    doc_id,
                    shard,
                    f"synthetic document {doc_id} body word{doc_id % 7}",
                )

    class SyntheticDocs(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_docs"

        def schema(self):
            return "doc_id BIGINT, shard INT, text STRING"

        def reader(self, schema):
            return _Reader(self.options)

    return SyntheticDocs


def make_synthetic_stream_source():
    """Return a self-contained STREAMING DataSource class (Spark 4
    ``DataSourceStreamReader``) — the extension point for streaming
    systems Spark has no connector for, with real offset tracking and
    per-partition planning (one ``InputPartition`` per shard and batch
    range, read independently by executors, exactly like a Kafka
    topic-partition).

    Offsets are ``{"batch": N}``. ``latestOffset`` reports the end of
    AVAILABLE data (``maxbatches``) — never per-reader-instance state:
    offsets must be derivable from the external system alone, because
    on restart Spark hands the restored offset to ``partitions()`` but
    a fresh reader object answers ``latestOffset()``; a reader-local
    counter would restart behind the checkpoint and re-emit committed
    batches (verified the hard way in the resume test). Register and
    read back with
    ``spark.readStream.format("synthetic_stream").option(...)``."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _StreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.rows_per_batch = int(options.get("rowsperbatch", 10))
            self.parts = int(options.get("partitions", 2))
            self.max_batches = int(options.get("maxbatches", 3))

        def initialOffset(self):
            return {"batch": 0}

        def latestOffset(self):
            # the "external system's" current end — stateless in the
            # reader, stable across restarts
            return {"batch": self.max_batches}

        def partitions(self, start, end):
            return [
                InputPartition((shard, start["batch"], end["batch"]))
                for shard in range(self.parts)
            ]

        def read(self, partition):
            shard, lo, hi = partition.value
            # executors own disjoint row ranges per batch; ids are
            # globally unique and deterministic across retries
            for batch in range(lo, hi):
                for i in range(shard, self.rows_per_batch, self.parts):
                    yield (batch, shard, batch * self.rows_per_batch + i)

        def commit(self, end):
            pass

    class SyntheticStream(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_stream"

        def schema(self):
            return "batch INT, shard INT, event_id BIGINT"

        def streamReader(self, schema):
            return _StreamReader(self.options)

    return SyntheticStream
