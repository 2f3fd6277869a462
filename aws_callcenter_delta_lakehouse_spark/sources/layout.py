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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fs import get_fs as _fs


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
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(_fs().glob(f"{path}/*.parquet")):
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
    import json as _json

    import pyarrow.parquet as pq

    entries = []
    for f in sorted(_fs().glob(f"{path}/*.parquet")):
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
    # atomic replace: a torn manifest would otherwise make every read
    # throw until rebuilt (readers fail OPEN on a missing manifest but
    # not on unparseable JSON)
    _fs().write_atomic(manifest, _json.dumps(entries))
    return manifest


def pruned_file_list(
    path: str, column: str, lo=None, hi=None
) -> tuple[list[str], int]:
    """Files whose [min, max] for ``column`` intersects [lo, hi]
    (None = unbounded), plus the total file count. Uses the stats
    manifest when present, parquet footers otherwise. A file with no
    stats for the column is always kept (never skip blind).

    Staleness-safe in both directions: the CURRENT listing is the
    source of truth and manifest stats are matched to it by BASENAME —
    a file appended after the manifest was written has no stats and is
    always kept (fail open, like the bloom reader), a manifest entry
    whose file is gone contributes nothing, and a manifest written in
    a staging dir keeps working after the commit rename moves the
    directory."""
    import json as _json
    import os as _os

    listed = sorted(_fs().glob(f"{path}/*.parquet"))
    entries = [{"file": f, "stats": {}} for f in listed]
    manifest = f"{path}/_stats_manifest.json"
    loaded = None
    if _fs().exists(manifest):
        try:
            loaded = _json.loads(_fs().read_text(manifest))
        except _json.JSONDecodeError:  # torn manifest: fail OPEN
            loaded = None
    if loaded is not None:
        by_base = {
            _os.path.basename(e["file"]): e.get("stats", {}) for e in loaded
        }
        for e in entries:
            e["stats"] = by_base.get(_os.path.basename(e["file"]), {})
    else:
        # no (or torn) manifest: fall back to per-file footer stats
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
    ``pruned_file_list``. Returns an EMPTY DataFrame (correct schema)
    when every file is pruned."""
    files, _total = pruned_file_list(path, column, lo, hi)
    if not files:
        return spark.read.parquet(path).filter(F.lit(False))
    df = spark.read.parquet(*files)
    c = F.col(column)
    if lo is not None:
        df = df.filter(c >= lo)
    if hi is not None:
        df = df.filter(c <= hi)
    return df


def write_bloom_manifest(
    spark,
    path: str,
    columns: Sequence[str],
    num_bits: int = 16384,
    num_hashes: int = 5,
) -> str:
    """Per-file BLOOM FILTERS for equality skipping on columns the
    sort order does NOT cluster — the companion index to the min/max
    manifest (Delta's bloom filter index / Parquet bloom filters play
    the same role). min/max stats prune range predicates on the
    clustered key; a point lookup on any OTHER column still touches
    every file unless a bloom says "definitely not here".

    Built DISTRIBUTEDLY in one pass over ALL columns: each value
    contributes its ``num_hashes`` bit positions (xxhash64 with
    per-hash salt) tagged with its column name, one (file, column)
    aggregate dedups positions with map-side partial combine, and the
    positions are folded into the ``num_bits/8``-byte bitmap ON THE
    EXECUTORS (Arrow-batched UDF) — only one base64 string per
    (file, column) ever reaches the driver, O(#files * #cols * 2KB),
    same traffic as a Delta log-stats write. No false negatives by
    construction; false-positive rate is set by num_bits/num_hashes.
    """
    import json as _json

    files = sorted(_fs().glob(f"{path}/*.parquet"))
    # empty/no-parquet directory -> empty-files manifest (a zero-arg
    # spark.read.parquet() raises), mirroring update_bloom_manifest's
    # `if new_files:` guard
    manifest_entries = (
        _bloom_entries_for_files(spark, files, columns, num_bits, num_hashes)
        if files
        else {}
    )
    manifest = f"{path}/_bloom_manifest.json"
    # atomic replace, same contract as the stats manifest
    _fs().write_atomic(
        manifest,
        _json.dumps(
            {
                "num_bits": num_bits,
                "num_hashes": num_hashes,
                "files": manifest_entries,
            }
        ),
    )
    return manifest


def bloom_pruned_file_list(
    spark, path: str, column: str, value
) -> tuple[list[str], int]:
    """Files whose bloom for ``column`` MIGHT contain ``value`` (plus
    files without a bloom — never skip blind), and the total count.
    The probe hashes through a 1-row Spark job so driver and executor
    hashing can never diverge."""
    import base64 as _b64
    import json as _json
    import os as _os

    manifest = f"{path}/_bloom_manifest.json"
    all_files = sorted(
        f for f in _fs().glob(f"{path}/*.parquet")
    )
    if not _fs().exists(manifest):
        return all_files, len(all_files)
    try:
        m = _json.loads(_fs().read_text(manifest))
    except _json.JSONDecodeError:  # torn manifest: fail OPEN, skip nothing
        return all_files, len(all_files)
    nb, nh = m["num_bits"], m["num_hashes"]
    # xxhash64 is TYPE-sensitive: an int literal probing a bigint
    # column would hash differently and false-negative every file —
    # cast the probe to the column's actual type first
    col_type = spark.read.parquet(path).schema[column].dataType
    probe_lit = F.lit(value).cast(col_type)
    probe = (
        spark.range(1)
        .select(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(i), probe_lit), F.lit(nb))
                    for i in range(nh)
                ]
            ).alias("p")
        )
        .first()["p"]
    )
    # basename-keyed index built once: O(F) total, not O(F^2) pairwise
    # scans (manifest stats attach by basename — rename-proof, same
    # contract as the min/max manifest)
    by_base = {_os.path.basename(k): v for k, v in m["files"].items()}
    keep = []
    for f in all_files:
        entry = by_base.get(_os.path.basename(f))
        bm64 = (entry or {}).get(column)
        if bm64 is None:
            keep.append(f)
            continue
        bm = _b64.b64decode(bm64)
        if all(bm[p // 8] & (1 << (p % 8)) for p in probe):
            keep.append(f)
    return keep, len(all_files)


def read_with_bloom_skipping(spark, path: str, column: str, value):
    """Equality read that consults the bloom manifest before listing
    files, then applies the exact predicate to the survivors. Returns
    an EMPTY DataFrame (correct schema) when every file is pruned."""
    files, _total = bloom_pruned_file_list(spark, path, column, value)
    if not files:
        return (
            spark.read.parquet(path).filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(F.col(column) == value)


def update_stats_manifest(path: str, columns: Sequence[str]) -> dict:
    """INCREMENTAL refresh of ``_stats_manifest.json``: scan footers
    only for files the manifest doesn't know yet (appends), drop
    entries whose file is gone (compaction/vacuum), keep everything
    else untouched. O(new + removed) instead of O(all files) — on a
    100 TB table where a daily append adds 0.1% of files, the full
    rescan is 1000x more footer reads than this. Returns counts.

    Safe under the reader's fail-open contract either way: a file the
    manifest misses is simply never skipped."""
    import json as _json
    import os as _os

    import pyarrow.parquet as pq

    manifest = f"{path}/_stats_manifest.json"
    entries = []
    if _fs().exists(manifest):
        try:
            entries = _json.loads(_fs().read_text(manifest))
        except _json.JSONDecodeError:  # torn: rebuild from scratch
            entries = []
    listed = {
        _os.path.basename(f): f
        for f in sorted(_fs().glob(f"{path}/*.parquet"))
    }
    known = {_os.path.basename(e["file"]) for e in entries}
    kept = [e for e in entries if _os.path.basename(e["file"]) in listed]
    removed = len(entries) - len(kept)
    added = 0
    for base, f in listed.items():
        if base in known:
            continue
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
        kept.append(
            {"file": f, "stats": {c: list(v) for c, v in stats.items()}}
        )
        added += 1
    _fs().write_atomic(manifest, _json.dumps(kept))
    return {
        "added": added,
        "removed": removed,
        "total": len(kept),
    }


def update_bloom_manifest(
    spark,
    path: str,
    columns: Sequence[str],
    num_bits: int = 16384,
    num_hashes: int = 5,
) -> dict:
    """INCREMENTAL bloom refresh: build bitmaps ONLY for files the
    manifest doesn't cover (per-file blooms are independent, so the
    merge is a dict update), drop entries for vanished files. The Spark
    job reads just the new files — on an append-mostly table the daily
    cost is proportional to the append, not the corpus. Returns counts.

    Parameter changes (num_bits/num_hashes) require the full rebuild
    (``write_bloom_manifest``) — mixing geometries in one manifest
    would corrupt probes, so this function refuses."""
    import json as _json
    import os as _os

    manifest = f"{path}/_bloom_manifest.json"
    m = {"num_bits": num_bits, "num_hashes": num_hashes, "files": {}}
    if _fs().exists(manifest):
        try:
            m = _json.loads(_fs().read_text(manifest))
        except _json.JSONDecodeError:  # torn: rebuild from scratch
            pass
    if m["num_bits"] != num_bits or m["num_hashes"] != num_hashes:
        raise ValueError(
            "bloom geometry changed (num_bits/num_hashes): run "
            "write_bloom_manifest for a full rebuild instead"
        )
    listed = {
        _os.path.basename(f): f
        for f in sorted(_fs().glob(f"{path}/*.parquet"))
    }
    old_files = m.get("files", {})
    kept = {
        k: v
        for k, v in old_files.items()
        if _os.path.basename(k) in listed
    }
    known = {_os.path.basename(k) for k in kept}
    new_files = [f for b, f in listed.items() if b not in known]
    if new_files:
        # same executor-side fold as the full build, restricted to the
        # new files; write_bloom_manifest over a path always scans the
        # whole dir, so inline the fold here with an explicit file list
        tmp_entries = _bloom_entries_for_files(
            spark, new_files, columns, num_bits, num_hashes
        )
        kept.update(tmp_entries)
    m["files"] = kept
    _fs().write_atomic(manifest, _json.dumps(m))
    return {
        "added": len(new_files),
        "removed": len(old_files) - len(
            [k for k in old_files if _os.path.basename(k) in listed]
        ),
        "total": len(kept),
    }


def _bloom_entries_for_files(
    spark,
    files: list[str],
    columns: Sequence[str],
    num_bits: int,
    num_hashes: int,
) -> dict:
    """Executor-side bloom fold over an explicit file list; returns
    {file: {column: base64_bitmap}} — shared by the full and
    incremental builders."""
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    nb = num_bits

    @_pandas_udf("string")
    def _fold_bitmap(positions: pd.Series) -> pd.Series:
        import base64

        import pandas

        out = []
        for pos_list in positions:
            bm = bytearray(nb // 8)
            for p in pos_list:
                p = int(p)
                bm[p // 8] |= 1 << (p % 8)
            out.append(base64.b64encode(bytes(bm)).decode())
        return pandas.Series(out)

    tagged = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("__c"),
                    F.pmod(
                        F.xxhash64(F.lit(i), F.col(c)), F.lit(num_bits)
                    ).alias("__p"),
                )
                for c in columns
                for i in range(num_hashes)
            ]
        )
    ).alias("__cp")
    rows = (
        spark.read.parquet(*files)
        .select(F.input_file_name().alias("__f"), *columns)
        .select("__f", tagged)
        .select(
            "__f",
            F.col("__cp.__c").alias("__c"),
            F.col("__cp.__p").alias("__p"),
        )
        .groupBy("__f", "__c")
        .agg(F.collect_set("__p").alias("__bits"))
        .select("__f", "__c", _fold_bitmap(F.col("__bits")).alias("__bm"))
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        entry = out.setdefault(
            r["__f"].replace("file:", "").replace("//", "/"), {}
        )
        entry[r["__c"]] = r["__bm"]
    return out
