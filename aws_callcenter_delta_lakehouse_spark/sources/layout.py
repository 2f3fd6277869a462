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


def write_stats_manifest(path: str, columns: Sequence[str]) -> str:
    """Scan the parquet footers ONCE after a write and persist per-file
    min/max for ``columns`` as ``_stats_manifest.json`` — the
    data-skipping index a table format (Delta/Iceberg) keeps in its
    log, so reads never re-open every footer. Driver-side work is
    O(#files), the same as a Delta log replay."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as pq

    entries = []
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        stats: dict = {}
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema in columns and col.statistics is not None:
                    s = col.statistics
                    lo, hi = stats.get(col.path_in_schema, (None, None))
                    stats[col.path_in_schema] = (
                        s.min if lo is None else min(lo, s.min),
                        s.max if hi is None else max(hi, s.max),
                    )
        entries.append({"file": f, "stats": {c: list(v) for c, v in stats.items()}})
    manifest = f"{path}/_stats_manifest.json"
    with open(manifest, "w") as fh:
        _json.dump(entries, fh)
    return manifest


def pruned_file_list(
    path: str, column: str, lo=None, hi=None
) -> tuple[list[str], int]:
    """Files whose [min, max] for ``column`` intersects [lo, hi]
    (None = unbounded), plus the total file count. Uses the stats
    manifest when present, parquet footers otherwise. A file with no
    stats for the column is always kept (never skip blind)."""
    import glob as _glob
    import json as _json
    import os as _os

    manifest = f"{path}/_stats_manifest.json"
    if _os.path.exists(manifest):
        with open(manifest) as fh:
            entries = _json.load(fh)
    else:
        entries = [
            {"file": f, "stats": {}}
            for f in sorted(_glob.glob(f"{path}/*.parquet"))
        ]
        # no manifest: fall back to per-file footer stats
        import pyarrow.parquet as pq

        for e in entries:
            md = pq.read_metadata(e["file"])
            lo_f, hi_f = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics is not None:
                        s = col.statistics
                        lo_f = s.min if lo_f is None else min(lo_f, s.min)
                        hi_f = s.max if hi_f is None else max(hi_f, s.max)
            if lo_f is not None:
                e["stats"] = {column: [lo_f, hi_f]}

    total = len(entries)
    keep = []
    for e in entries:
        st = e["stats"].get(column)
        if st is None:
            keep.append(e["file"])
            continue
        f_lo, f_hi = st
        if (hi is not None and f_lo > hi) or (lo is not None and f_hi < lo):
            continue
        keep.append(e["file"])
    return keep, total


def read_with_skipping(spark, path: str, column: str, lo=None, hi=None):
    """Point/range read that prunes files by min/max stats BEFORE Spark
    lists them, then applies the exact predicate to the survivors —
    what a Delta/Iceberg reader does with its log stats. Returns the
    filtered DataFrame; pruning effectiveness is observable via
    ``pruned_file_list``."""
    files, _total = pruned_file_list(path, column, lo, hi)
    df = spark.read.parquet(*files)
    c = F.col(column)
    if lo is not None:
        df = df.filter(c >= lo)
    if hi is not None:
        df = df.filter(c <= hi)
    return df
