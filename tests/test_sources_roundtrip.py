"""Source/sink format coverage: ORC, JSON, CSV roundtrips preserve data
(the engine is format-agnostic beyond its parquet default)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.catalog import load_table
from tests.conftest import SF001


def test_orc_json_csv_roundtrips(spark, tmp_path):
    src = load_table(spark, SF001, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    n, total = src.count(), src.agg(F.sum("o_orderkey")).collect()[0][0]

    orc = str(tmp_path / "orders_orc")
    src.write.orc(orc)
    got = spark.read.orc(orc)
    assert got.count() == n and got.agg(F.sum("o_orderkey")).collect()[0][0] == total

    js = str(tmp_path / "orders_json")
    src.write.json(js)
    got = spark.read.schema(src.schema).json(js)
    assert got.count() == n and got.agg(F.sum("o_orderkey")).collect()[0][0] == total

    csv = str(tmp_path / "orders_csv")
    src.write.option("header", True).csv(csv)
    got = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
    ).csv(csv, header=True)
    assert got.count() == n and got.agg(F.sum("o_orderkey")).collect()[0][0] == total


def test_python_datasource_partitioned_scan(spark):
    """Spark 4 Python Data Source API: the synthetic source plans one
    InputPartition per shard (real scan parallelism) and yields each
    doc_id exactly once with the declared schema."""
    from aws_callcenter_delta_lakehouse_spark.sources.pydatasource import (
        make_synthetic_docs_source,
    )

    spark.dataSource.register(make_synthetic_docs_source())
    df = (
        spark.read.format("synthetic_docs")
        .option("numdocs", 97)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 97
    assert {r.doc_id for r in rows} == set(range(97))
    assert all(r.shard == r.doc_id % 5 for r in rows)
    assert all(r.text.startswith("synthetic document") for r in rows)


def test_python_streaming_datasource_drains_bounded_stream(spark):
    """Spark 4 streaming Python Data Source: offset tracking advances
    one batch per trigger, partitions plan per (shard, batch range),
    and a full drain yields every (batch, row) exactly once."""
    from aws_callcenter_delta_lakehouse_spark.sources.pydatasource import (
        make_synthetic_stream_source,
    )
    from aws_callcenter_delta_lakehouse_spark.streaming.streams import (
        run_to_memory,
    )

    spark.dataSource.register(make_synthetic_stream_source())
    stream = (
        spark.readStream.format("synthetic_stream")
        .option("rowsperbatch", 10)
        .option("partitions", 2)
        .option("maxbatches", 3)
        .load()
    )
    out = run_to_memory(stream, "pystream_sink", output_mode="append")
    rows = out.collect()
    assert len(rows) == 30
    assert {r.batch for r in rows} == {0, 1, 2}
    assert {r.shard for r in rows} == {0, 1}
    assert sorted(r.event_id for r in rows) == list(range(30))


def test_python_streaming_datasource_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once resume: a restarted query on the same checkpoint
    continues from the committed offset — a fresh reader object starts
    its own counter at 0, but the checkpointed offset wins, so the
    second run emits NO duplicate batches."""
    from aws_callcenter_delta_lakehouse_spark.sources.pydatasource import (
        make_synthetic_stream_source,
    )

    spark.dataSource.register(make_synthetic_stream_source())
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.format("synthetic_stream")
            .option("rowsperbatch", 6)
            .option("partitions", 2)
            .option("maxbatches", 2)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    first = spark.read.parquet(out_dir).count()
    assert first == 12
    run_once()  # fresh reader, same checkpoint
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 12, "restart must not re-emit committed batches"
    assert sorted(r.event_id for r in rows) == list(range(12))
