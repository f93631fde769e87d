"""Snapshot-parquet table layer — Iceberg-style semantics without the
Iceberg runtime jar (unavailable offline; SURVEY.md §4).

A ``SnapshotTable`` is a directory:

    <root>/
      data/<snapshot-uuid>/part-*.parquet     (immutable data dirs)
      snapshots/v{N:06d}.json                 (manifest per snapshot)
      CURRENT                                 (pointer file)

Each manifest records: version, parent version, the list of data dirs
that make up the snapshot (append = parent dirs + new dir; overwrite
= new dir only), row count, and arbitrary **lineage** (wave id,
frontier offset, seen-shard versions, fetch counters — the north
rule's per-partition lineage). Commits are atomic: data is written
first, then the manifest and the CURRENT pointer land via
write-temp + ``os.replace`` (POSIX-atomic), so a crash between steps
leaves the previous snapshot intact (SURVEY.md §7 risk 5). Reads are
by snapshot id (time travel) or CURRENT.

A real Iceberg catalog drops in behind the same four calls
(``commit`` / ``read`` / ``history`` / ``current_version``) via
``spark.sql.catalog.*`` when jars are available.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # --- internals ---------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "snapshots", f"v{version:06d}.json")

    def _current_path(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def _write_atomic(self, path: str, payload: str) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)

    def _all_versions(self) -> list[int]:
        snaps = os.path.join(self.root, "snapshots")
        out = []
        for name in os.listdir(snaps):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def _next_version(self) -> int:
        """Next id = 1 + max(every manifest on disk, high-water mark).
        The HWM file survives orphan purges, so an id is never reused
        even after rollback deletes the orphan's manifest."""
        vs = self._all_versions()
        hwm = -1
        try:
            with open(os.path.join(self.root, "VERSION_HWM")) as fh:
                hwm = int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            pass
        return max(vs[-1] if vs else -1, hwm) + 1

    # --- API ----------------------------------------------------------
    def current_version(self) -> int | None:
        try:
            with open(self._current_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def manifest(self, version: int | None = None) -> dict | None:
        if version is None:
            version = self.current_version()
        if version is None:
            return None
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        out = []
        v = self.current_version()
        while v is not None:
            m = self.manifest(v)
            out.append(m)
            v = m.get("parent")
        return out

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        lineage: dict | None = None,
        count_rows: bool = False,
    ) -> int:
        """Write df as a new snapshot; returns the new version id.

        ``count_rows=True`` rides an observe() on the write job (no
        extra action) and records ``n_rows`` in the lineage — the
        flow-accounting trick from swspark.fetch applied to commits.
        """
        assert mode in ("append", "overwrite")
        obs = None
        if count_rows:
            obs = Observation(f"commit-{uuid.uuid4().hex[:8]}")
            df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        data_dir = os.path.join("data", uuid.uuid4().hex)
        abs_dir = os.path.join(self.root, data_dir)
        df.write.mode("overwrite").parquet(abs_dir)
        lineage = dict(lineage or {})
        if obs is not None:
            lineage["n_rows"] = obs.get["n_rows"]

        parent = self.current_version()
        parent_m = self.manifest(parent) if parent is not None else None
        if mode == "append" and parent_m is not None:
            dirs = parent_m["data_dirs"] + [data_dir]
        else:
            dirs = [data_dir]
        # allocate past every manifest ever written (not parent+1):
        # after a rollback the next commit must NOT reuse an orphan's
        # id, or lineage values recorded against the old id would
        # silently resolve to different data
        version = self._next_version()
        manifest = {
            "version": version,
            "parent": parent,
            "mode": mode,
            "data_dirs": dirs,
            "committed_at": time.time(),
            "lineage": lineage,
        }
        # manifest first, pointer last — a crash in between leaves
        # CURRENT at the parent and the orphan manifest is harmless
        self._write_atomic(os.path.join(self.root, "VERSION_HWM"), str(version))
        self._write_atomic(self._manifest_path(version), json.dumps(manifest))
        self._write_atomic(self._current_path(), str(version))
        return version

    def set_current(self, version: int | None) -> None:
        """Reset the CURRENT pointer (crash reconciliation). Snapshots
        are immutable, so moving the pointer to an ancestor is safe;
        ``None`` returns the table to the never-committed state."""
        if version is None:
            try:
                os.remove(self._current_path())
            except FileNotFoundError:
                pass
            return
        if not os.path.exists(self._manifest_path(version)):
            raise FileNotFoundError(f"no manifest v{version} in {self.root}")
        self._write_atomic(self._current_path(), str(version))

    def rollback_to_wave_before(self, next_wave: int, key: str = "wave") -> int:
        """Roll CURRENT back to the newest snapshot whose lineage
        ``key`` is < ``next_wave`` (or has no such key). Returns the
        number of snapshots discarded. Used on resume: a crash between
        a wave's table commits and the frontier pointer commit leaves
        orphan wave-N snapshots that the replayed wave would duplicate
        (ancestry walk; snapshots are immutable so this is safe).

        Orphaned snapshots are unreachable by design, so their
        manifests AND any data dirs not referenced by the retained
        chain are deleted here — otherwise every crash-resume leaks
        the torn wave's parquet and, worse, a reused version id would
        make old lineage references resolve to different data (ids
        are additionally never reused: see ``_next_version``)."""
        dropped: list[int] = []
        v = self.current_version()
        while v is not None:
            m = self.manifest(v)
            if m.get("lineage", {}).get(key, -1) < next_wave:
                break
            dropped.append(v)
            v = m.get("parent")
        if dropped:
            self.set_current(v)
            self._purge_orphans(dropped)
        return len(dropped)

    def _purge_orphans(self, versions: list[int]) -> None:
        """Delete the manifests of ``versions`` and any data dirs only
        they reference. Retained = union of data_dirs over every
        OTHER manifest still on disk (covers the current ancestry and
        any sibling chains)."""
        import shutil

        drop = set(versions)
        retained: set[str] = set()
        for u in self._all_versions():
            if u not in drop:
                retained.update(self.manifest(u)["data_dirs"])
        doomed: set[str] = set()
        for u in versions:
            doomed.update(self.manifest(u)["data_dirs"])
        for d in doomed - retained:
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        for u in versions:
            try:
                os.remove(self._manifest_path(u))
            except FileNotFoundError:
                pass

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        paths = [os.path.join(self.root, d) for d in m["data_dirs"]]
        return spark.read.parquet(*paths)

    def exists(self) -> bool:
        return self.current_version() is not None
