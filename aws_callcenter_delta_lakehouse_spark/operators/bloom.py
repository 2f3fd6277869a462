"""Distributed Bloom filter for incremental (cross-batch) dedup.

Engine extension surface (BASELINE.json north star; no counterpart in the
reference — its dedup surface is per-batch MERGE key uniqueness,
01_silver_delta_upsert.py:104-108). The incremental-ingest question a
100 TB pipeline asks: "which of today's documents were (probably)
already in the corpus?" without joining today's batch against the full
history.

The filter is a plain DataFrame of ``(word_idx, bits)`` rows — an
m-bit bitmap sharded into 64-bit words — built with one explode + one
``bit_or`` hash aggregate, so it is computed fully distributed (no
driver-side state, unlike ``DataFrame.stat.bloomFilter`` which collects
the sketch to the driver). Probing broadcasts the bitmap (m = 2^20 bits
is 128 KiB — trivially broadcastable; size m for the corpus cardinality)
and needs no shuffle on the batch side at all.

Guarantee: no false negatives (every key previously inserted probes
positive); false-positive rate ~ (1 - e^(-k*n/m))^k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bit_positions(
    key: F.Column, m_bits: int, k: int, portable: bool = False
) -> F.Column:
    """Array of k bit positions in [0, m_bits) via independently seeded
    hashes — JVM-side, no Python. Default xxhash64 (cheapest);
    ``portable=True`` uses the low 60 bits of md5 with a seed prefix —
    the same value in any engine with md5 (DuckDB/Trino), which makes
    bloom semantics (including false positives) oracle-checkable."""
    if portable:
        return F.array(
            *[
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{seed}|"), key)), 1, 15
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                    F.lit(m_bits),
                )
                for seed in range(k)
            ]
        )
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in range(k)]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Aggregate the corpus into a sharded bitmap: ``(word_idx, bits)``
    with at most ``m_bits / 64`` rows. One explode (k rows per input
    row, integers only — the key never shuffles) + one ``bit_or``
    aggregate with map-side partial combine."""
    pos = df.select(
        F.explode(
            _bit_positions(F.col(key_col), m_bits, k, portable=portable)
        ).alias("bitpos")
    )
    return (
        pos.select(
            (F.col("bitpos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Flag each batch row with ``maybe_seen``: true iff all k probe
    bits are set; returns ``(id, maybe_seen)``. The bitmap side is
    broadcast, so the batch side never shuffles its payload — the key
    is hashed in place and only (id, k integers) flow onward; the final
    per-id aggregate has exactly k map-side-combinable rows per id."""
    probes = batch.select(
        id_col,
        F.explode(
            _bit_positions(F.col(key_col), m_bits, k, portable=portable)
        ).alias("bitpos"),
    ).select(
        id_col,
        (F.col("bitpos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 64 AS INT))").alias("mask"),
    )
    hit = probes.join(F.broadcast(bloom), "word_idx", "left").select(
        id_col,
        (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0)
        .cast("int")
        .alias("hit"),
    )
    return hit.groupBy(id_col).agg((F.sum("hit") == F.lit(k)).alias("maybe_seen"))
