"""Write-layout optimization for data skipping (Z-order-lite).

Parquet readers prune row groups/files whose min/max stats exclude the
predicate — but stats only help if values are clustered. Delta's
OPTIMIZE ZORDER clusters multi-dimensionally; the single-key
equivalent in stock Spark is range-repartition + in-partition sort on
the skip key, which gives each output file a tight, disjoint key range.

At 100 TB this is the difference between a point-lookup scanning every
file and scanning one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    num_files: int = 8,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Range-partition on ``cluster_by`` into ``num_files`` chunks, sort
    within each, write. Every output file covers a disjoint key range,
    so min/max stats prune point and range predicates."""
    out = df.repartitionByRange(num_files, *[F.col(c) for c in cluster_by])
    out = out.sortWithinPartitions(*cluster_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file — the stats the reader
    prunes with; exposed for tests/inspection."""
    import glob as _glob

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        md = pq.read_metadata(f)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges
