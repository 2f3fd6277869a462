"""COPY INTO — idempotent file ingest (the Delta SQL command).

The reference's ingest is "CSV files land in source/, the Glue job
loads them" (``/root/reference/glue_jobs/01_silver_delta_upsert.py:96``
reads whatever is there); re-running the job re-reads every file, and
idempotency comes from the MERGE key. ``COPY INTO`` is the keyless
version real Delta offers for exactly this shape: each SOURCE FILE
loads at most once, so re-running after new files land appends only
the new ones, and a retry after a crash never duplicates.

Mechanics: the set of already-loaded source paths lives in the table
property ``copyInto.loaded``, committed ATOMICALLY with the appended
rows (``append_rows(extra_properties=)`` merges it into the staged
marker, which publishes in the same rename as the data) — a crash
anywhere leaves either (rows + updated set) or (neither). The loaded
set is keyed by absolute source path; a file that is rewritten in
place under the same name is NOT re-loaded (same as Delta, which keys
on path within the source). Set growth is bounded by source-file
count; ``reset_copy_into(path)`` clears it when a source directory is
recycled.

Concurrency contract: idempotency is per-INVOCATION-sequence, not
per-file-across-writers — two copy_into calls racing on the SAME
source both see the pre-commit loaded set and would double-load
(blind appends commute, so neither loses the CAS). Run one COPY INTO
writer per table, the same single-ingestor shape as the reference's
scheduled Glue job; crash-retry of that one writer is safe.

Scale shape: listing is driver metadata; the data read is one Spark
scan of ONLY the new files; the append is the O(appended) hardlink
commit. Schema: columns are aligned to the table BY NAME and cast to
the table's exact types (missing nullable columns fill NULL), so a
CSV with header or a parquet written by another engine lands
enforceable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import managed_table
from .fs import get_fs as _fs

LOADED_PROP = "copyInto.loaded"

_FORMATS = {"parquet": "parquet", "csv": "csv", "json": "json"}


def copy_into(
    spark: SparkSession,
    path: str,
    source: str,
    file_format: str = "parquet",
    pattern: str | None = None,
    format_options: dict | None = None,
) -> dict:
    """Load every not-yet-loaded file under ``source`` (a directory, a
    file, or a glob) into the managed table at ``path``; returns
    ``{"loaded_files", "skipped_files", "rows"}``. Idempotent per
    source file — see the module docstring."""
    fmt = _FORMATS.get(file_format.lower())
    if fmt is None:
        raise ValueError(
            f"copy_into: FILEFORMAT {file_format!r} not supported "
            f"(one of {sorted(_FORMATS)})"
        )
    marker = managed_table._read_marker(path)
    if not marker:
        raise ValueError(f"{path} is not a managed table")

    if _fs().isdir(source):
        glob_pat = os.path.join(source, pattern or "**/*")
        candidates = [
            f for f in _fs().glob(glob_pat, recursive=True) if _fs().isfile(f)
        ]
    elif _fs().isfile(source):
        candidates = [source]
    else:
        candidates = [f for f in _fs().glob(source) if _fs().isfile(f)]
    candidates = sorted(
        os.path.abspath(f)
        for f in candidates
        if not os.path.basename(f).startswith(("_", "."))
    )
    if not candidates:
        raise ValueError(
            f"copy_into: no files match {source!r}"
            + (f" pattern {pattern!r}" if pattern else "")
        )
    loaded = set(
        (marker.get("properties") or {}).get(LOADED_PROP) or []
    )
    new = [f for f in candidates if f not in loaded]
    if not new:
        return {
            "loaded_files": 0,
            "skipped_files": len(candidates),
            "rows": 0,
        }

    reader = spark.read.format(fmt)
    for k, v in (format_options or {}).items():
        reader = reader.option(k, v)
    src_df = reader.load(new)

    # align BY NAME to the table's logical schema, cast to exact types;
    # missing columns fill typed NULL (same contract as SQL INSERT with
    # a column list) — unknown source columns refuse loudly
    table_schema = managed_table.read(spark, path).schema
    by_name = {f.name: f for f in table_schema.fields}
    unknown = [c for c in src_df.columns if c not in by_name]
    if unknown:
        raise ValueError(
            f"copy_into: source column(s) {unknown} not in the table "
            f"schema {sorted(by_name)} — rename or project in the source"
        )
    aligned = src_df.select(
        *[
            F.col(f.name).cast(f.dataType)
            if f.name in src_df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in table_schema.fields
        ]
    )
    rows_before = int(
        (managed_table._read_marker(path).get("stats") or {}).get("n_rows", 0)
    )
    managed_table.append_rows(
        spark,
        aligned,
        path,
        extra_properties={LOADED_PROP: sorted(loaded | set(new))},
    )
    rows_after = int(
        (managed_table._read_marker(path).get("stats") or {}).get("n_rows", 0)
    )
    return {
        "loaded_files": len(new),
        "skipped_files": len(candidates) - len(new),
        # from the marker stats (no extra scan of the source)
        "rows": rows_after - rows_before,
    }


def reset_copy_into(path: str) -> None:
    """Forget the loaded-file set (e.g. the source directory was
    recycled with fresh files under old names). Metadata-only."""
    managed_table.set_table_property(path, LOADED_PROP, [])
