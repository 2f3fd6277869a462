"""TableFS seam contract (r5 verdict #4): the managed-table protocol's
local-FS assumption is a tested interface, not an ambient dependency.

Two halves:
- a STATIC no-bypass scan — the four protocol modules must not touch
  os/shutil/glob/open mutating-or-listing primitives directly (path
  algebra like os.path.join is allowed); any future edit that bypasses
  the seam fails here;
- a DYNAMIC swap test — install a tracing TableFS and run the full
  protocol surface (commit, merge, compact, clone, vacuum, catalog
  transaction); every storage side effect must be observed through the
  seam and the results must stay correct.
"""

from __future__ import annotations

import inspect
import re

from aws_callcenter_delta_lakehouse_spark.sources import (
    fs as table_fs,
)
from aws_callcenter_delta_lakehouse_spark.sources import (
    layout,
    maintenance,
    managed_table as mt,
    txn_catalog,
)

# mutating / listing primitives that MUST go through the seam
_FORBIDDEN = re.compile(
    r"(?<!``)(?:"
    r"shutil\.\w+\(|glob\.glob\(|os\.rename\(|os\.replace\(|os\.fsync\(|"
    r"os\.link\(|os\.makedirs\(|os\.listdir\(|os\.walk\(|os\.remove\(|"
    r"os\.path\.exists\(|os\.path\.isdir\(|os\.path\.isfile\(|"
    r"os\.path\.getsize\(|os\.path\.getmtime\(|(?<![\w.])open\("
    r")"
)


def test_no_fs_bypass_in_protocol_modules():
    for mod in (mt, maintenance, layout, txn_catalog):
        src = inspect.getsource(mod)
        hits = [
            (i + 1, line.strip())
            for i, line in enumerate(src.splitlines())
            if _FORBIDDEN.search(line)
        ]
        assert not hits, f"{mod.__name__} bypasses the TableFS seam: {hits}"


class _TracingFS(table_fs.LocalTableFS):
    """LocalTableFS that records every op kind it serves."""

    def __init__(self):
        self.ops: set[str] = set()

    def __getattribute__(self, name):
        attr = super().__getattribute__(name)
        if name.startswith("_") or not callable(attr):
            return attr

        def traced(*a, **kw):
            object.__getattribute__(self, "ops").add(name)
            return attr(*a, **kw)

        return traced


def test_protocol_runs_through_swapped_fs(spark, tmp_path):
    """Swap the seam for a tracer and exercise the whole protocol: the
    storage ops must be observed through it (proving dispatch really is
    late-bound) and every result must stay correct."""
    tracer = _TracingFS()
    prev = table_fs.set_fs(tracer)
    try:
        path = str(tmp_path / "t")
        mt.commit_overwrite(
            spark.range(0, 40).selectExpr("id", "id * 2 AS v"),
            path,
            keys=("id",),
            txn={"last_epoch": 1},
        )
        mt.merge_upsert(
            spark, path,
            spark.createDataFrame([(1, 99), (100, 5)], "id long, v long"),
            keys=("id",),
        )
        assert mt.read(spark, path).count() == 41
        assert mt.table_version(path) == 1
        maintenance.compact(spark, path, target_file_bytes=1 << 30)
        assert mt.read(spark, path).count() == 41
        assert maintenance.vacuum(path, retain_history=True) == []
        assert maintenance.vacuum(path) == [f"{path}__history"]
        clone = str(tmp_path / "c")
        mt.clone_table(path, clone)
        assert mt.read(spark, clone).count() == 41

        cat = str(tmp_path / "cat")
        txn_catalog.commit_tables(
            {"t2": (spark.range(3).selectExpr("id"), str(tmp_path / "t2"), ("id",))},
            cat,
        )
        assert txn_catalog.read_table(spark, cat, "t2").count() == 3

        # the protocol's storage side effects all flowed through the seam
        expected = {
            "write_atomic", "read_text", "exists", "glob", "rename_dir",
            "rmtree", "getsize", "isfile", "fsync_dir", "makedirs",
            "link_or_copy",
        }
        missing = expected - tracer.ops
        assert not missing, f"ops that bypassed the seam: {missing}"
    finally:
        table_fs.set_fs(prev)
