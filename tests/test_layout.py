"""Data-skipping layout: clustered writes produce disjoint per-file key
ranges (prunable); naive writes don't."""

from __future__ import annotations

from aws_callcenter_delta_lakehouse_spark.catalog import load_table
from aws_callcenter_delta_lakehouse_spark.sources.layout import (
    file_key_ranges,
    write_clustered,
)
from tests.conftest import SF01


def _overlap_fraction(ranges):
    """Fraction of file pairs whose key ranges overlap."""
    n, overlapping = 0, 0
    for i in range(len(ranges)):
        for j in range(i + 1, len(ranges)):
            n += 1
            (a_lo, a_hi), (b_lo, b_hi) = ranges[i], ranges[j]
            if a_lo <= b_hi and b_lo <= a_hi:
                overlapping += 1
    return overlapping / n if n else 0.0


def test_clustered_write_gives_disjoint_file_ranges(spark, tmp_path):
    li = load_table(spark, SF01, "lineitem")

    naive = str(tmp_path / "naive")
    li.repartition(8).write.parquet(naive)
    clustered = str(tmp_path / "clustered")
    write_clustered(li, clustered, ["l_orderkey"], num_files=8)

    naive_ranges = file_key_ranges(naive, "l_orderkey")
    clus_ranges = file_key_ranges(clustered, "l_orderkey")
    assert len(clus_ranges) >= 4
    # round-robin files all span ~the full key range; clustered are disjoint
    assert _overlap_fraction(naive_ranges) > 0.9
    assert _overlap_fraction(clus_ranges) == 0.0

    # row preservation
    assert spark.read.parquet(clustered).count() == li.count()
