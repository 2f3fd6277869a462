"""Filesystem seam for the managed-table protocol (``TableFS``).

The managed-table emulation (managed_table / maintenance / layout /
txn_catalog) was written against the local filesystem. Every MUTATING
or LISTING primitive it relies on is routed through this one interface
so the local-FS assumption is a tested contract instead of an ambient
dependency, and an object-store port is one class, not a code audit.

Pure path algebra (``os.path.join``/``dirname``/…) intentionally stays
direct: it manipulates strings, not storage.

S3/object-store mapping per API (the port recipe — each method's
local primitive has a documented cloud equivalent):

====================  =====================================================
method                object-store equivalent
====================  =====================================================
write_atomic          single PUT (S3 PUTs are atomic; the tmp+fsync+replace
                      dance is unnecessary).
write_exclusive       conditional PUT (If-None-Match: *) — put-if-absent,
                      the commit-race primitive.
replace               PUT to the final key (last-writer-wins); for CAS use
                      conditional PUT, as Delta does via the log store.
rename_dir            no native rename: a MANIFEST pointer swap — write the
                      new snapshot under a unique prefix, then one
                      conditional PUT of the pointer object (exactly
                      Delta's _delta_log commit).
link_or_copy          server-side COPY (or a manifest entry referencing the
                      source key — zero-copy clone).
rmtree / remove       batched DeleteObjects on the prefix.
glob / listdir/walk   ListObjectsV2 on the prefix (or, better, read the
                      file list from the commit manifest and never LIST —
                      which the stats-in-marker work already enables).
getsize / exists      HEAD object.
fsync_* / makedirs    no-ops: PUTs are durable on 200; prefixes need no
                      creation.
====================  =====================================================
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import uuid


class LocalTableFS:
    """Local-filesystem implementation — the sandbox default.

    Durability contract: ``write_atomic`` and the two rename ops give
    (a) readers never observe a torn file, (b) once the call returns
    the change survives power loss (fsync of file and parent dir)."""

    # -- read / probe ---------------------------------------------------
    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def read_text(self, path: str) -> str:
        """Whole-file read. Object stores: GET object."""
        with open(path) as f:
            return f.read()

    def glob(self, pattern: str, recursive: bool = False) -> list[str]:
        return _glob.glob(pattern, recursive=recursive)

    def walk(self, path: str):
        return os.walk(path)

    # -- mutate ----------------------------------------------------------
    def makedirs(self, path: str, exist_ok: bool = False) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def write_atomic(self, path: str, data: str) -> None:
        """Torn-write-proof durable write: tmp file + fsync + atomic
        replace + parent-dir fsync. Object stores: one PUT.

        The tmp name is writer-unique (pid + random), not a fixed
        ``path + \".tmp\"``: concurrent writers of the same target (the
        txn catalog's ``_latest`` cache pointer during a commit race)
        must degrade to last-writer-wins, not crash when one writer's
        ``os.replace`` consumes the shared tmp out from under another
        (observed in the cross-process race test)."""
        tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        self.fsync_dir(os.path.dirname(os.path.abspath(path)) or ".")

    def write_exclusive(self, path: str, data: str) -> None:
        """PUT-IF-ABSENT with full-content atomicity: durably write a
        temp file, then hard-link it to the final name — ``link`` fails
        with FileExistsError if another writer already created it, and
        readers can never observe partial content. The commit-race
        primitive (exactly one concurrent writer of a versioned
        manifest wins). Object stores: conditional PUT
        (If-None-Match: *)."""
        tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        finally:
            os.remove(tmp)
        self.fsync_dir(os.path.dirname(os.path.abspath(path)) or ".")

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def rename_dir(self, src: str, dst: str) -> None:
        """The snapshot-swap primitive (atomic on POSIX). Object
        stores: a conditional PUT of the table's pointer manifest."""
        os.rename(src, dst)

    def link_or_copy(self, src: str, dst: str) -> None:
        try:
            os.link(src, dst)
        except OSError:  # cross-device — degrade to a byte copy
            shutil.copy2(src, dst)

    def copy(self, src: str, dst: str) -> None:
        shutil.copy2(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def fsync_dir(self, dirpath: str) -> None:
        """fsync a DIRECTORY: a rename/replace is atomic without this,
        but not durable — a power crash can undo an acknowledged
        commit. Object stores: no-op (PUT durability is server-side)."""
        try:
            fd = os.open(dirpath, os.O_RDONLY)
        except OSError:  # pragma: no cover - platform without dir-open
            return
        try:
            os.fsync(fd)
        except OSError:  # pragma: no cover - fs without dir-fsync
            pass
        finally:
            os.close(fd)


_FS: LocalTableFS = LocalTableFS()


def get_fs() -> LocalTableFS:
    """The active TableFS. Module-level so tests (and an eventual
    object-store deployment) swap it in one place via :func:`set_fs`."""
    return _FS


def set_fs(fs) -> LocalTableFS:
    """Install a TableFS implementation; returns the previous one."""
    global _FS
    prev, _FS = _FS, fs
    return prev
