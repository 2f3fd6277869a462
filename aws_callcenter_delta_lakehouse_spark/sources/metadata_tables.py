"""Queryable metadata tables — the Iceberg/Trino ``t$files`` /
``t$partitions`` / ``t$snapshots`` convention over managed tables.

DESCRIBE HISTORY / DETAIL / SHOW PARTITIONS answer point questions;
metadata TABLES make the same information a RELATION, so operational
queries compose with plain SQL ("partitions whose file count exceeds
N", "bytes added per day", "small-file ratio per partition") instead
of requiring client-side scripting. Iceberg exposes these as
``db.table.files`` / ``.snapshots``; Trino as ``"t$partitions"``;
Delta approximates with DESCRIBE DETAIL + operationMetrics. The SQL
front-end rewrites ``FROM name$kind`` over registry names to these
relations (:mod:`sources.sql_dml`).

Costs: ``snapshots`` is O(versions) marker reads (zero file I/O);
``partitions``/``files`` walk the live snapshot's directory entries,
plus one parquet FOOTER read per file for row counts — metadata-only,
the same listing OPTIMIZE planning does; no Spark jobs are launched
for the collection itself (results come back as small local
DataFrames — metadata cardinality, not data cardinality). On an
object store the walk is the manifest listing.

Row counts in ``files``/``partitions`` are PHYSICAL (pre
deletion-vector), like Iceberg's files table; the ``dv`` column on
``snapshots``' live row tells a reader when logical counts differ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import managed_table
from .managed_table import (
    _CDF_DIR,
    _DELTA_HISTORY_DIR,
    _DELTA_LOG_DIR,
    _DV_DIR,
    _fs,
    _read_marker,
)

_SKIP_DIRS = {_DV_DIR, _CDF_DIR, _DELTA_LOG_DIR, _DELTA_HISTORY_DIR}


def _parquet_rows(fpath: str) -> int:
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(fpath).metadata.num_rows)


def _live_files(path: str) -> list[tuple[str, list[str], int, int]]:
    """(relative path, partition values, size_bytes, n_rows) for every
    live data file, Hive partition values decoded like SHOW PARTITIONS
    (``__HIVE_DEFAULT_PARTITION__`` -> None)."""
    from urllib.parse import unquote

    out = []
    for root, dirs, files in os.walk(path):
        rel_root = os.path.relpath(root, path)
        parts = [] if rel_root == "." else rel_root.split(os.sep)
        if any(p in _SKIP_DIRS for p in parts):
            continue
        dirs[:] = [d for d in dirs if d not in _SKIP_DIRS]
        vals = [
            unquote(p.split("=", 1)[1]) for p in parts if "=" in p
        ]
        vals = [
            None if v == "__HIVE_DEFAULT_PARTITION__" else v for v in vals
        ]
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            out.append(
                (
                    os.path.relpath(fp, path),
                    vals,
                    _fs().getsize(fp),
                    _parquet_rows(fp),
                )
            )
    return out


def _partition_cols(path: str) -> list[str]:
    marker = _read_marker(path) or {}
    return list(marker.get("partition_by") or [])


def files_table(spark: SparkSession, path: str) -> DataFrame:
    """One row per live data file: partition columns (string-typed,
    like SHOW PARTITIONS), ``file_path`` (snapshot-relative),
    ``size_bytes``, ``n_rows`` (physical)."""
    managed_table.recover(path)
    pby = _partition_cols(path)
    rows = [
        tuple(vals) + (rel, int(size), int(nrows))
        for rel, vals, size, nrows in _live_files(path)
    ]
    schema = ", ".join(
        [f"`{c}` string" for c in pby]
        + ["file_path string", "size_bytes bigint", "n_rows bigint"]
    )
    return spark.createDataFrame(rows, schema)


def partitions_table(spark: SparkSession, path: str) -> DataFrame:
    """One row per live partition: partition columns + ``n_files``,
    ``n_rows`` (physical), ``size_bytes``. Unpartitioned tables get a
    single row with no partition columns."""
    managed_table.recover(path)
    pby = _partition_cols(path)
    agg: dict[tuple, list[int]] = {}
    for _rel, vals, size, nrows in _live_files(path):
        key = tuple(vals)
        cur = agg.setdefault(key, [0, 0, 0])
        cur[0] += 1
        cur[1] += nrows
        cur[2] += size
    rows = [
        key + (c[0], c[1], c[2]) for key, c in sorted(
            agg.items(), key=lambda kv: tuple("" if v is None else v
                                              for v in kv[0])
        )
    ]
    schema = ", ".join(
        [f"`{c}` string" for c in pby]
        + ["n_files bigint", "n_rows bigint", "size_bytes bigint"]
    )
    return spark.createDataFrame(rows, schema)


def snapshots_table(spark: SparkSession, path: str) -> DataFrame:
    """One row per retained version — ``history()`` (O(versions) marker
    reads) re-exported under the metadata-table naming."""
    return managed_table.history(spark, path)


METADATA_KINDS = {
    "files": files_table,
    "partitions": partitions_table,
    "snapshots": snapshots_table,
}
