"""Multi-table ATOMIC commits via a versioned catalog pointer —
cross-table snapshot isolation for the managed-table layer.

Single-table commits are already atomic (``commit_overwrite``'s
stage-and-swap), but a pipeline that publishes SEVERAL tables per run
(Silver + exception sink + Gold rollup; or the LSH index's bucket +
shingle pair) has a crash window between the per-table swaps in which
readers see table A at the new version and table B at the old one.
The fix is the one every multi-table format converges on (Iceberg
REST-catalog transactions, Delta coordinated commits): data commits
are PREPARED per table, and a single atomic pointer write — the
catalog manifest — makes all of them visible at once.

Protocol:

1. each table commits through the normal atomic ``commit_overwrite``
   (its new version exists but nothing references it yet);
2. a manifest ``{name: {path, version}}`` is PUT-IF-ABSENT to
   ``<catalog>/v{N}.json`` — THIS atomic create is the commit point
   (Delta's numbered log entry); ``_latest.json`` is then refreshed as
   a read cache (readers resolve max(cache, newest versioned), so a
   crash between the two leaves the transaction committed and the
   cache one behind).

A crash anywhere before the versioned-manifest create leaves the
catalog at the OLD versions of EVERY table — consistent, never mixed;
the orphaned new table versions are unreferenced history that
``vacuum`` can retire.
Readers resolve through the manifest with ``read_table`` (or pin a
``snapshot()`` for a multi-query consistent session), so they observe
either the whole transaction or none of it.

Retention: a pinned manifest references historical table versions, so
``commit_overwrite(max_history=...)`` must retain at least as many
versions as the catalog keeps manifests readers still use.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from . import managed_table as mt
from .fs import get_fs as _fs


class CatalogConflictError(RuntimeError):
    """The catalog advanced past ``expected_version`` — re-read and retry."""


def _latest_path(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, "_latest.json")


def _load_latest(catalog_dir: str) -> dict | None:
    """The committed catalog payload. The VERSIONED manifests are the
    LOG OF RECORD — their put-if-absent create is the commit point,
    exactly like Delta's numbered ``_delta_log`` entries — while
    ``_latest.json`` is a read cache that can lag one commit (a crash
    between the versioned write and the pointer flip) or tear. Resolve
    to the highest-version payload among the cache and the newest
    parseable versioned manifest, so a lagging or torn cache can never
    hide a committed transaction or take the catalog down."""
    best = None
    p = _latest_path(catalog_dir)
    if _fs().exists(p):
        try:
            best = json.loads(_fs().read_text(p))
        except json.JSONDecodeError:
            best = None
    for vf in sorted(
        _fs().glob(os.path.join(catalog_dir, "v*.json")), reverse=True
    ):
        try:
            payload = json.loads(_fs().read_text(vf))
        except json.JSONDecodeError:  # pragma: no cover - torn versioned
            continue
        if best is None or int(payload["version"]) > int(best["version"]):
            best = payload
        break  # the highest parseable versioned manifest suffices
    return best


def catalog_version(catalog_dir: str) -> int:
    """Current catalog version; -1 before the first commit."""
    payload = _load_latest(catalog_dir)
    return -1 if payload is None else int(payload["version"])


def read_manifest(catalog_dir: str, version: int | None = None) -> dict:
    """The table->(path, version) map of a catalog version (default:
    latest). Empty dict before the first commit."""
    if version is None:
        payload = _load_latest(catalog_dir)
        return {} if payload is None else payload["tables"]
    return json.loads(
        _fs().read_text(os.path.join(catalog_dir, f"v{version:06d}.json"))
    )["tables"]


def catalog_txn(catalog_dir: str) -> dict:
    """Application txn metadata committed atomically WITH the catalog
    pointer (the multi-table analogue of ``managed_table.table_txn``):
    whatever dict the latest ``commit_tables(txn=...)`` carried. A
    streaming sink records its epoch here, so replay-skip covers ALL
    tables of the transaction at once."""
    payload = _load_latest(catalog_dir)
    return {} if payload is None else payload.get("txn", {})


def commit_tables(
    updates: dict[str, tuple[DataFrame, str, tuple]],
    catalog_dir: str,
    expected_version: int | None = None,
    txn: dict | None = None,
) -> int:
    """Atomically publish new snapshots of several tables.

    ``updates``: {table_name: (df, table_path, keys)}. Tables in the
    current manifest but absent from ``updates`` carry forward at
    their pinned versions. Returns the new catalog version.

    ``expected_version``: optimistic concurrency at the CATALOG level —
    raises :class:`CatalogConflictError` (before any data is written)
    if another transaction committed first.

    Cross-process safe: the versioned manifest is published with a
    PUT-IF-ABSENT (``write_exclusive`` — hard-link create, the local
    analogue of a conditional PUT), so when two writers race to the
    same catalog version EXACTLY ONE wins; the loser raises
    :class:`CatalogConflictError` before touching ``_latest`` and its
    prepared table snapshots stay unreferenced history (readers resolve
    through the manifest, so they never see them; ``vacuum`` retires
    them).
    """
    _fs().makedirs(catalog_dir, exist_ok=True)
    current = catalog_version(catalog_dir)
    if expected_version is not None and current != expected_version:
        raise CatalogConflictError(
            f"catalog at v{current}, expected v{expected_version}"
        )
    manifest = dict(read_manifest(catalog_dir))

    # phase 1: prepare — each table's snapshot commits atomically but
    # stays unreferenced until the pointer flips
    for name, (df, path, keys) in updates.items():
        mt.commit_overwrite(df, path, keys=tuple(keys))
        manifest[name] = {"path": path, "version": mt.table_version(path)}

    # phase 2: publish — one atomic pointer write makes all visible
    new_version = current + 1
    payload = {"version": new_version, "tables": manifest, "txn": txn or {}}
    versioned = os.path.join(catalog_dir, f"v{new_version:06d}.json")
    try:
        _fs().write_exclusive(versioned, json.dumps(payload))
    except FileExistsError:
        raise CatalogConflictError(
            f"catalog v{new_version} was committed by another writer; "
            "re-read and retry"
        ) from None
    _fs().write_atomic(_latest_path(catalog_dir), json.dumps(payload))
    return new_version


def snapshot(catalog_dir: str) -> dict:
    """Pin the current manifest for a multi-query consistent session:
    every ``read_table(..., manifest=snap)`` then reads the SAME
    catalog version no matter how many transactions land meanwhile."""
    return read_manifest(catalog_dir)


def read_table(
    spark: SparkSession,
    catalog_dir: str,
    name: str,
    manifest: dict | None = None,
) -> DataFrame:
    """Read a table AT ITS CATALOG-PINNED VERSION (not the table's
    HEAD — a prepared-but-unpublished transaction may have advanced
    the head past the catalog)."""
    m = manifest if manifest is not None else read_manifest(catalog_dir)
    if name not in m:
        raise KeyError(f"table {name!r} not in catalog {catalog_dir}")
    entry = m[name]
    head = mt.table_version(entry["path"])
    if head == entry["version"]:
        return mt.read(spark, entry["path"])
    return mt.read(spark, entry["path"], version=entry["version"])


# ---------------------------------------------------------------------------
# Name registry (metastore-lite): identifier -> table path
# ---------------------------------------------------------------------------
# The reference addresses tables by CATALOG NAME through Glue/Athena
# (`/root/reference/sql/athena_queries.sql:14` queries
# `callcenter_analytics.<table>`), while the engine's storage layer is
# path-based. This registry is the thin metastore between the two: one
# small JSON file PER NAME (`<registry>/names/<identifier>.json`), so
# concurrent registrations of DIFFERENT names never race a shared file,
# and CREATE-if-absent uses the same put-if-absent primitive as the
# commit protocol (`write_exclusive` — conditional PUT on object
# stores). Identifiers are case-insensitive, like Spark/Glue.
#
# Scale note: resolution is one O(1) file read per lookup; listing is a
# directory scan of names (metadata, never data). At any fleet size the
# registry is the cheapest component in the system — exactly why every
# lakehouse (Glue, Unity, Iceberg REST) fronts paths with a tiny
# catalog service.

_NAMES_DIR = "names"


class TableNameError(KeyError):
    """Unknown (or already-registered) table name."""


def _name_file(registry_dir: str, name: str) -> str:
    ident = name.strip().lower()
    if not ident or any(ch in ident for ch in "/\\\0"):
        raise ValueError(f"invalid table identifier {name!r}")
    return os.path.join(registry_dir, _NAMES_DIR, f"{ident}.json")


def register_table_name(
    registry_dir: str, name: str, path: str, replace: bool = False
) -> None:
    """Bind ``name`` (e.g. ``callcenter_analytics.silver_calls``) to a
    managed-table path. ``replace=False`` is CREATE semantics: raises
    :class:`TableNameError` if the name is already bound (atomic
    put-if-absent — two racing creators resolve to exactly one
    winner); ``replace=True`` re-points the name (CREATE OR REPLACE)."""
    f = _name_file(registry_dir, name)
    _fs().makedirs(os.path.dirname(f), exist_ok=True)
    payload = json.dumps({"name": name.strip().lower(), "path": path})
    if replace:
        _fs().write_atomic(f, payload)
        return
    try:
        _fs().write_exclusive(f, payload)
    except FileExistsError:
        raise TableNameError(
            f"table name {name!r} is already registered "
            f"(-> {resolve_table_name(registry_dir, name)}); use "
            "replace=True to re-point it"
        ) from None


def resolve_table_name(registry_dir: str, name: str) -> str:
    """Name -> path; raises :class:`TableNameError` when unbound or
    when the name is bound to a VIEW (views have no path — they are
    resolved by the SQL front-end's rewriter, and cannot be a DML
    target)."""
    f = _name_file(registry_dir, name)
    if not _fs().exists(f):
        raise TableNameError(
            f"unknown table name {name!r} (registry: {registry_dir}; "
            f"known: {sorted(list_table_names(registry_dir))})"
        )
    payload = json.loads(_fs().read_text(f))
    if "path" not in payload:
        raise TableNameError(
            f"{name!r} is a registered VIEW, not a table — it can be "
            "read in SQL but not used as a DML/DDL target"
        )
    return payload["path"]


def unregister_table_name(registry_dir: str, name: str) -> None:
    """DROP the name binding (the table's data is untouched — exactly
    dropping an EXTERNAL table). Refuses a VIEW binding — the mirror
    of :func:`unregister_view_name`'s guard, matching Spark/Delta's
    'use DROP VIEW instead' behavior."""
    f = _name_file(registry_dir, name)
    if not _fs().exists(f):
        raise TableNameError(f"unknown table name {name!r}")
    entry = json.loads(_fs().read_text(f))
    if "view_sql" in entry:
        raise TableNameError(
            f"{name!r} is a registered VIEW, not a table — use DROP VIEW"
        )
    _fs().remove(f)


def list_table_names(registry_dir: str) -> dict[str, str]:
    """{identifier: path} for every registered name."""
    d = os.path.join(registry_dir, _NAMES_DIR)
    if not _fs().isdir(d):
        return {}
    out = {}
    for fn in sorted(_fs().listdir(d)):
        if not fn.endswith(".json"):
            continue
        try:
            payload = json.loads(_fs().read_text(os.path.join(d, fn)))
        except json.JSONDecodeError:  # pragma: no cover - torn admin write
            continue
        if "path" in payload:  # view entries list via list_view_names
            out[payload["name"]] = payload["path"]
    return out


# -- logical views -----------------------------------------------------------
# A name can bind to a VIEW (stored SQL text) instead of a table path.
# Views are resolved by the SQL front-end's passthrough rewriter
# (sources/sql_dml.py), which recursively rewrites the stored SELECT —
# so a view sees the LIVE state of every table it references at query
# time, exactly like a metastore view. Distinct from
# delta_api.register_sql_view, which creates raw parquet views in a
# single SparkSession's catalog.


def register_view_name(
    registry_dir: str, name: str, sql: str, replace: bool = False
) -> None:
    """Bind ``name`` to a stored SELECT (CREATE [OR REPLACE] VIEW).
    Same put-if-absent create semantics as :func:`register_table_name`;
    a name already bound to a TABLE refuses (views cannot shadow
    tables) unless ``replace`` re-points a same-kind binding."""
    f = _name_file(registry_dir, name)
    _fs().makedirs(os.path.dirname(f), exist_ok=True)
    if _fs().exists(f):
        existing = json.loads(_fs().read_text(f))
        if "view_sql" not in existing:
            raise TableNameError(
                f"{name!r} is a registered TABLE — a view cannot "
                "replace it (DROP TABLE first)"
            )
        if not replace:
            raise TableNameError(
                f"view name {name!r} is already registered; use "
                "replace=True (CREATE OR REPLACE VIEW)"
            )
    payload = json.dumps({"name": name.strip().lower(), "view_sql": sql})
    if replace:
        _fs().write_atomic(f, payload)
        return
    try:
        _fs().write_exclusive(f, payload)
    except FileExistsError:  # pragma: no cover - create/create race
        raise TableNameError(
            f"view name {name!r} is already registered"
        ) from None


def resolve_entry(registry_dir: str, name: str) -> dict:
    """Name -> full registry payload ({"path": ...} for a table,
    {"view_sql": ...} for a view); raises when unbound."""
    f = _name_file(registry_dir, name)
    if not _fs().exists(f):
        raise TableNameError(
            f"unknown name {name!r} (registry: {registry_dir}; "
            f"known: {sorted(list_table_names(registry_dir)) + sorted(list_view_names(registry_dir))})"
        )
    return json.loads(_fs().read_text(f))


def unregister_view_name(registry_dir: str, name: str) -> None:
    """DROP VIEW: remove a view binding; refuses a table binding."""
    entry = resolve_entry(registry_dir, name)
    if "view_sql" not in entry:
        raise TableNameError(
            f"{name!r} is a registered TABLE, not a view — use DROP TABLE"
        )
    _fs().remove(_name_file(registry_dir, name))


def list_view_names(registry_dir: str) -> dict[str, str]:
    """{identifier: stored SQL} for every registered view."""
    d = os.path.join(registry_dir, _NAMES_DIR)
    if not _fs().isdir(d):
        return {}
    out = {}
    for fn in sorted(_fs().listdir(d)):
        if not fn.endswith(".json"):
            continue
        try:
            payload = json.loads(_fs().read_text(os.path.join(d, fn)))
        except json.JSONDecodeError:  # pragma: no cover
            continue
        if "view_sql" in payload:
            out[payload["name"]] = payload["view_sql"]
    return out

def register_existing(
    registry_dir: str,
    prefix: str,
    database: str | None = None,
    replace: bool = False,
) -> dict[str, str]:
    """Glue-crawler analogue (reference ``README.md:51-53``: a crawler
    walks the S3 prefixes and registers what it finds so Athena can
    query by name): scan one level of ``prefix`` and register every
    table discovered.

    - a directory carrying a managed-table marker -> TABLE binding
      (full engine semantics: DV anti-join, row tracking, time travel,
      DML targetability);
    - a directory of parquet files (flat or Hive-partitioned), or a
      bare ``*.parquet`` file -> read-only VIEW binding over
      ``parquet.`path``` — raw external data, queryable by bare name
      through the SQL front-end but never a DML target (exactly a
      crawled raw prefix in Athena).

    Names register as ``<database>.<entry>`` (entry lowercased,
    ``.parquet`` suffix stripped). Engine sidecars are skipped by the
    naming convention every sidecar follows (leading ``_`` or a ``__``
    infix: ``t__history``, ``t__staging_*``, ``t__commitlock``...).
    ``replace=False`` keeps per-name CREATE semantics: an
    already-bound name raises :class:`TableNameError` (crawl into a
    fresh database, or pass ``replace=True`` to re-point).

    Collisions are detected BEFORE anything registers — two entries
    normalizing to the same name ('Foo/' vs 'foo/', 'orders/' vs
    'orders.parquet'), or (with ``replace=False``) a name already
    bound — so a failed crawl leaves zero partial bindings; a
    concurrent registrar racing the same name can still surface as a
    mid-crawl :class:`TableNameError` (put-if-absent is the authority).

    Returns ``{registered name: path}`` for the names registered by
    THIS call."""
    if not _fs().isdir(prefix):
        raise TableNameError(f"register_existing: {prefix!r} is not a directory")
    plan: list[tuple[str, str, str]] = []  # (name, kind, path)
    for entry in sorted(_fs().listdir(prefix)):
        if entry.startswith(("_", ".")) or "__" in entry:
            continue
        full = os.path.join(prefix, entry)
        base = entry[: -len(".parquet")] if entry.endswith(".parquet") else entry
        name = f"{database}.{base}".lower() if database else base.lower()
        if _fs().isdir(full):
            if _fs().exists(os.path.join(full, mt._MARKER)):
                plan.append((name, "table", full))
                continue
            children = _fs().listdir(full)
            has_parquet = any(c.endswith(".parquet") for c in children)
            has_hive = any(
                "=" in c and _fs().isdir(os.path.join(full, c))
                for c in children
            )
            if not (has_parquet or has_hive):
                continue  # not a table-shaped directory
        elif not entry.endswith(".parquet"):
            continue
        plan.append((name, "view", full))
    dupes = {
        n: [p for nm, _k, p in plan if nm == n]
        for n in {nm for nm, _k, _p in plan}
        if sum(1 for nm, _k, _p in plan if nm == n) > 1
    }
    if dupes:
        raise TableNameError(
            f"register_existing: entries collide after name "
            f"normalization (nothing was registered): {dupes}"
        )
    if not replace:
        bound = set(list_table_names(registry_dir)) | set(
            list_view_names(registry_dir)
        )
        clashes = sorted(n for n, _k, _p in plan if n in bound)
        if clashes:
            raise TableNameError(
                f"register_existing: names already bound (nothing was "
                f"registered): {clashes} — crawl into a fresh database "
                "or pass replace=True"
            )
    out: dict[str, str] = {}
    for name, kind, full in plan:
        if kind == "table":
            register_table_name(registry_dir, name, full, replace=replace)
        else:
            register_view_name(
                registry_dir,
                name,
                f"SELECT * FROM parquet.`{full}`",
                replace=replace,
            )
        out[name] = full
    return out
