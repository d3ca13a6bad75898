"""Snapshot-versioned parquet table — atomic publish + time travel for a
plain-parquet lake, using only primitives every object store (and the
reference's REST surface: /root/reference/azure/datalake/gen2/client.py
create_path:329-356 / upload:548-582 / list_path:481-526) already offers.

Layout:
    <root>/_v00000001/*.parquet          immutable snapshot directories
    <root>/_v00000002/*.parquet
    <root>/_manifest.00000001.json       one manifest PER committed version
    <root>/_manifest.00000002.json

Commit protocol (writer) — the Delta-log pattern (a log of immutable
commit files, not a mutable pointer):
    1. write the new snapshot into _v{N+1}/ (a Spark job; invisible to
       readers — nothing references the dir yet),
    2. CREATE _manifest.{N+1}.json — create-if-absent, never overwrite
       (lake.py ``create_bytes_atomic``; ABFS conditional PUT / HDFS
       atomic namespace create). File creation is the commit point: a
       manifest is either fully present or absent, so readers — who
       resolve the table by listing manifests and taking the highest
       version — see either the old table or the new one, never a torn
       state. Two writers racing toward the same N+1 therefore resolve
       by optimistic concurrency: EXACTLY ONE create succeeds; the loser
       detects the existing manifest, re-resolves the version, and
       retries (bounded, then fails loud). Concurrent writers pass a
       ``writer_id`` so their pre-commit data dirs are disjoint
       (_v{N+1}_{writer}); a loser's abandoned dir is unreferenced by
       construction and ``vacuum_orphans`` reclaims it. Proven by
       tests/test_lake.py::test_commit_race_exactly_one_winner.

Reader: `read(version=None)` resolves the newest manifest, then scans ONE
immutable snapshot dir — a concurrent commit can't tear a running query;
`read(version=k)` time-travels to any retained snapshot. At 100 TB the
listing touches only the handful of manifest files at the table root
(snapshot dirs are listed by Spark's own file index per read), and
`expire(keep_last)` bounds retention.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from pydatalake_gen2_spark.sources.lake import LakeCatalog

_MANIFEST_RE = re.compile(r"^_manifest\.(\d{8})\.json$")


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._cat = LakeCatalog(spark, self.root)
        self._cat.create_filesystem("")  # ensure the table root exists

    # -- manifest log -----------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for p in self._cat.list_paths(""):
            m = _MANIFEST_RE.match(p.name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def _vdir(self, version: int) -> str:
        return f"{self.root}/_v{version:08d}"

    def _manifest_name(self, version: int) -> str:
        return f"_manifest.{version:08d}.json"

    # -- public API -------------------------------------------------------
    def _data_dir_name(self, v: int, writer_id: str | None) -> str:
        # Concurrent writers racing toward the same version MUST land
        # their data in DISJOINT dirs, else the loser's pre-commit write
        # clobbers the winner's published data. writer_id disambiguates
        # (Spark's taskAttemptId / app attempt id is the natural value);
        # the default keeps the single-writer layout byte-identical.
        return f"_v{v:08d}" if writer_id is None else f"_v{v:08d}_{writer_id}"

    def _attempt_commit(
        self,
        df: DataFrame,
        v: int,
        writer_id: str | None,
        prior: list[str] | None,
    ) -> bool:
        """One optimistic-concurrency attempt at version ``v``: write the
        data dir, then try to CREATE (never overwrite) the manifest.
        Manifest creation is the commit point — create-if-absent at the
        storage layer (lake.py ``create_bytes_atomic``), so of any number
        of racing writers EXACTLY ONE wins version ``v``; losers get
        False, their data dir becomes an unreferenced orphan that
        ``vacuum_orphans`` reclaims, and the winner's bytes are never
        touched. This is the Delta/Iceberg optimistic-commit protocol
        expressed over a plain filesystem."""
        d = self._data_dir_name(v, writer_id)
        df.write.mode("overwrite").parquet(self._resolve(d))
        # prior=None -> snapshot manifest ("dir"); prior=list (possibly
        # empty) -> cumulative append manifest ("dirs"), matching the
        # pre-r9 on-disk formats byte-for-byte in the single-writer case.
        manifest: dict = {"version": v}
        if prior is None:
            manifest["dir"] = d
        else:
            manifest["dirs"] = prior + [d]
        return self._cat.create_bytes_atomic(
            self._manifest_name(v), json.dumps(manifest).encode()
        )

    def commit(
        self, df: DataFrame, writer_id: str | None = None, max_attempts: int = 5
    ) -> int:
        """Write `df` as the next snapshot and atomically publish it by
        creating that version's manifest file (create-if-absent — the
        commit point). On a lost race the writer re-resolves the table
        and retries at the next version; after ``max_attempts`` losses it
        fails loud rather than spin. Returns the committed version."""
        for _ in range(max_attempts):
            v = self.current_version() + 1
            if self._attempt_commit(df, v, writer_id, prior=None):
                return v
        raise RuntimeError(
            f"commit lost {max_attempts} consecutive version races under "
            f"{self.root}; retry with backoff or reduce writer contention"
        )

    def append_commit(
        self, df: DataFrame, writer_id: str | None = None, max_attempts: int = 5
    ) -> int:
        """APPEND `df` as a new version WITHOUT rewriting prior data: the
        delta lands in its own directory and the new manifest lists the
        cumulative directory set (prior version's dirs + the new one).
        This is the Delta/Iceberg append shape — a commit costs O(delta),
        and the manifest DELTA between two versions identifies exactly
        which files are new, which is what makes `read_changes` a
        metadata-only operation. Full `commit` / `optimize` still publish
        single-dir snapshots (a compaction naturally resets the chain).
        Same optimistic-concurrency commit point as ``commit``; the prior
        dir set is re-resolved on every retry, so a loser's retry appends
        onto the WINNER's cumulative set, never its own stale view."""
        for _ in range(max_attempts):
            vs = self.versions()
            prior = self._manifest_dirs(vs[-1]) if vs else []
            v = (vs[-1] if vs else 0) + 1
            if self._attempt_commit(df, v, writer_id, prior=prior):
                return v
        raise RuntimeError(
            f"append_commit lost {max_attempts} consecutive version races "
            f"under {self.root}"
        )

    def _manifest_dirs(self, version: int) -> list[str]:
        m = json.loads(self._cat.read_bytes(self._manifest_name(version)).decode())
        return m["dirs"] if "dirs" in m else [m["dir"]]

    def _resolve(self, d: str) -> str:
        # Manifest dirs are table-root-relative, except shallow-clone
        # entries which reference the SOURCE table's dirs absolutely.
        return d if d.startswith("/") else f"{self.root}/{d}"

    def read(
        self, version: int | None = None, merge_schema: bool = False
    ) -> DataFrame:
        """Latest snapshot, or time-travel to `version`.

        ``merge_schema=True`` unions the column sets across the
        snapshot's data directories (Spark's parquet mergeSchema) — the
        ADD-COLUMN schema-evolution read: generations written before a
        column existed surface it as NULL, exactly like Delta/Iceberg
        evolved-schema reads. Off by default: merging costs a footer
        pass per file and same-schema tables never need it."""
        vs = self.versions()
        if not vs:
            raise ValueError(f"no committed versions under {self.root}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in retained versions {vs}")
        dirs = self._manifest_dirs(v)
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*[self._resolve(d) for d in dirs])

    def clone_from(self, src: "VersionedTable", version: int | None = None) -> int:
        """SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE` shape):
        publish a manifest in THIS table that references the source
        version's data directories ABSOLUTELY — zero bytes of data move,
        the clone commit is one manifest upload regardless of source
        size. The clone then diverges freely: `append_commit` adds dirs
        under the clone's own root, never touching the source, and the
        source keeps evolving without affecting the clone's pinned dirs
        (snapshot dirs are immutable; the source's `expire`/`vacuum`
        is the one lifecycle coupling — same caveat as Delta shallow
        clones, documented not hidden)."""
        src_v = src.current_version() if version is None else version
        dirs = [src._resolve(d) for d in src._manifest_dirs(src_v)]
        for _ in range(5):  # same optimistic commit point as commit()
            v = self.current_version() + 1
            manifest = {"version": v, "dirs": dirs, "cloned_from": src.root}
            if self._cat.create_bytes_atomic(
                self._manifest_name(v), json.dumps(manifest).encode()
            ):
                return v
        raise RuntimeError(f"clone_from lost 5 version races under {self.root}")

    def read_changes(self, since: int, to: int | None = None) -> DataFrame:
        """Rows added between version `since` (exclusive) and `to`
        (inclusive, default latest) — resolved ENTIRELY from the manifest
        delta: only directories in `to`'s dir set but not `since`'s are
        read. File-level CDC for append-only chains (J23's snapshot diff
        is the row-level sibling for rewrites): an incremental consumer
        reads O(new data), never O(table)."""
        vs = self.versions()
        to_v = vs[-1] if to is None else to
        if since not in vs or to_v not in vs:
            raise ValueError(f"versions ({since}, {to_v}) not all in {vs}")
        old = set(self._manifest_dirs(since))
        new_dirs = [d for d in self._manifest_dirs(to_v) if d not in old]
        if not new_dirs:
            return self.read(to_v).limit(0)
        return self.spark.read.parquet(*[self._resolve(d) for d in new_dirs])

    def expire(self, keep_last: int) -> list[int]:
        """Drop all but the newest `keep_last` snapshots. Two guarantees:
        (1) manifests are deleted BEFORE any data dir, so a reader that
        lists mid-expire never resolves a manifest whose data is already
        gone; (2) a data dir is deleted only if NO retained manifest
        references it — append_commit/clone_from manifests are cumulative,
        so an early version's dir may still be live in the newest
        manifest's dir set (the same liveness rule vacuum_orphans uses;
        without it, expiring any prefix of an append chain would delete
        dirs the CURRENT table still reads)."""
        vs = self.versions()
        drop = vs[:-keep_last] if keep_last > 0 else list(vs)
        dropped = set(drop)
        live: set[str] = set()
        drop_dirs: set[str] = set()
        for v in vs:
            # dir names come from the manifests themselves (not a
            # reconstructed _v{v} pattern) so writer_id-tagged dirs from
            # multi-writer commits expire correctly too.
            (live if v not in dropped else drop_dirs).update(self._manifest_dirs(v))
        for v in drop:
            self._cat.delete_path(self._manifest_name(v))
        for d in sorted(drop_dirs - live):
            if not d.startswith("/"):  # never reach into a clone's source table
                self._cat.delete_path(d, recursive=True)
        return drop

    def vacuum_orphans(
        self, dry_run: bool = False, min_age_s: float = 3600.0
    ) -> list[str]:
        """VACUUM: delete top-level entries no live manifest references —
        leftovers of crashed commits (a written ``_v*`` dir whose manifest
        never published) or stray temp files. Mirrors lakehouse VACUUM
        semantics: the MANIFEST SET is the source of truth, so anything
        unreferenced is garbage by definition; committed data is never
        touched because commit() publishes the manifest only after its
        data dir is complete (and expire() deletes manifests first).

        Concurrency contract: everything derives from ONE directory
        snapshot (a commit landing after the snapshot is simply invisible
        — it can never be classified an orphan), and entries modified
        within ``min_age_s`` are retained, so an IN-FLIGHT commit's data
        dir (written before its manifest publishes — step 1 of the
        protocol) is never reaped. That retention window is the same
        defense real lakehouse VACUUMs require; pass 0 only when no
        writer can be active (e.g. single-process tests). Returns the
        orphan names (sorted), deleting them unless ``dry_run``."""
        import time

        entries = self._cat.list_paths("")
        live = set()
        for p in entries:
            m = _MANIFEST_RE.match(p.name)
            if m:
                live.add(p.name)
                ref = json.loads(self._cat.read_bytes(p.name).decode())
                live.update(ref["dirs"] if "dirs" in ref else [ref["dir"]])
        cutoff_ms = (time.time() - min_age_s) * 1000.0
        orphans = sorted(
            p.name
            for p in entries
            if p.name not in live and p.modification_time <= cutoff_ms
        )
        if not dry_run:
            for name in orphans:
                self._cat.delete_path(name, recursive=True)
        return orphans

    def optimize(self, target_files: int = 1) -> int:
        """OPTIMIZE: rewrite the CURRENT snapshot's layout into
        ``target_files`` files and commit it as a NEW version — data
        identical, small files compacted, history untouched (time travel
        to the pre-optimize version still reads the old layout; `expire`
        reclaims it later). This is the Delta/Iceberg maintenance verb
        composed from this engine's own parts: S12's compaction rewrite
        landing as an S16 manifest commit instead of an in-place
        mutation, so a crashed OPTIMIZE leaves only an orphan dir for
        S30's vacuum — never a half-rewritten table."""
        cur = self.read().coalesce(target_files)
        return self.commit(cur)
