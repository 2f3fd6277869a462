"""Property tests for the Bloom incremental-dedup operator (rows-only in
the registry: xxhash64 has no DuckDB analogue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_callcenter_delta_lakehouse_spark.catalog import load_table
from aws_callcenter_delta_lakehouse_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)
from tests.conftest import SF01


def test_bloom_no_false_negatives(spark):
    """Every inserted key must probe positive — the Bloom guarantee."""
    docs = load_table(spark, SF01, "documents").select("doc_id", "text")
    bloom = bloom_build(docs, "text")
    flags = bloom_probe(docs, bloom, "text", "doc_id")
    assert flags.where(~F.col("maybe_seen")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Keys never inserted should almost never probe positive
    (m=2^20 bits, k=4, n=500 inserts -> FP rate ~1e-11)."""
    docs = load_table(spark, SF01, "documents").select("doc_id", "text")
    bloom = bloom_build(docs, "text")
    unseen = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" :unseen-suffix")).alias("text")
    )
    flags = bloom_probe(unseen, bloom, "text", "doc_id")
    n = flags.count()
    fp = flags.where("maybe_seen").count()
    assert fp / n < 0.05


def test_bloom_probe_is_broadcast_no_batch_shuffle(spark):
    """The bitmap side must broadcast: the probe plan contains a
    BroadcastHashJoin and no SortMergeJoin."""
    docs = load_table(spark, SF01, "documents").select("doc_id", "text")
    bloom = bloom_build(docs, "text")
    plan = (
        bloom_probe(docs, bloom, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_query_flags_reingested_docs(spark):
    """In the registered query, every re-ingested old doc (doc_id % 10
    == 0) must be flagged maybe_seen."""
    from aws_callcenter_delta_lakehouse_spark.plans.all import REGISTRY

    df = REGISTRY["dedup_bloom_incremental"].fn(spark, SF01)
    reingested = df.where(F.col("doc_id") % 10 == 0)
    assert reingested.count() > 0
    assert reingested.where(~F.col("maybe_seen")).count() == 0
