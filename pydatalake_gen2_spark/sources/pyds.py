"""S17 — custom PySpark 4 Python DataSource: the lake listing as a TABLE.

The reference's core read surface is recursive path listing
(``list_path``, reference client.py:481-511 — 5000-entry pages behind an
unbounded LRU memo). Here that surface becomes a first-class Spark
*batch data source* via the public Python DataSource API
(``pyspark.sql.datasource``, new in Spark 4): register once, then

    spark.dataSource.register(LakeListingDataSource)
    spark.read.format("lake_listing").option("path", root).load()

yields a DataFrame of every filesystem entry under ``root`` with name /
extension / directory flag / size / depth columns — queryable, joinable,
and filter-pushdown-aware like any other source.

Scale design (the part the reference's client cannot do):

- **Partitioned listing.** ``partitions()`` returns one InputPartition
  per immediate child of the root, so a million-object store listing
  fans out across executors (each task descends only its own subtree)
  instead of paging sequentially through one driver-side loop. The root
  itself is partition "" (its direct entries).
- **Filter pushdown.** ``pushFilters`` accepts EqualTo/In on ``ext``
  and EqualTo on ``is_dir`` and applies them DURING the walk — directory
  subtrees are still descended, but non-matching entries are never
  yielded to the JVM. Unsupported filters are returned to Spark to
  evaluate post-scan (the API contract).
- **Fresh results.** No memo: every load lists live state — the
  reference's staleness bug (threadsafe_lru never invalidated,
  client.py:72-86) is deliberately not ported, same decision as
  sources/lake.py list_paths.

Columns: name (path relative to root, '/'-separated), ext (lowercased
final suffix, '' for none/dirs), is_dir, size_bytes, depth (1 = direct
child of root).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("ext", StringType(), False),
        StructField("is_dir", BooleanType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("depth", IntegerType(), False),
    ]
)


@dataclass(frozen=True)
class _Subtree(InputPartition):
    rel: str  # '' = the root's direct entries; else one child subtree


class _ListingReader(DataSourceReader):
    def __init__(self, root: str) -> None:
        self.root = root
        self.want_ext: set[str] | None = None
        self.want_is_dir: bool | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("ext",):
                self.want_ext = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("ext",):
                self.want_ext = {str(v) for v in f.value}
            elif isinstance(f, EqualTo) and f.attribute == ("is_dir",):
                self.want_is_dir = bool(f.value)
            else:
                yield f  # not ours — Spark evaluates it post-scan

    def partitions(self) -> list[InputPartition]:
        subs = [
            _Subtree(e.name)
            for e in os.scandir(self.root)
            if e.is_dir(follow_symlinks=False)
        ]
        return sorted(subs, key=lambda p: p.rel) + [_Subtree("")]

    def _emit(self, rel: str, is_dir: bool, size: int) -> tuple | None:
        ext = "" if is_dir else os.path.splitext(rel)[1].lstrip(".").lower()
        if self.want_ext is not None and ext not in self.want_ext:
            return None
        if self.want_is_dir is not None and is_dir != self.want_is_dir:
            return None
        return (rel, ext, is_dir, size, rel.count("/") + 1)

    def read(self, partition: _Subtree) -> Iterator[tuple]:
        root = self.root
        if partition.rel == "":
            # the root partition lists only the root's direct entries
            # (child DIRS are reported here; their contents belong to
            # their own partition)
            for e in sorted(os.scandir(root), key=lambda e: e.name):
                is_dir = e.is_dir(follow_symlinks=False)
                row = self._emit(e.name, is_dir, 0 if is_dir else e.stat().st_size)
                if row:
                    yield row
            return
        base = os.path.join(root, partition.rel)
        for dirpath, dirnames, filenames in os.walk(base):
            dirnames.sort()
            reld = os.path.relpath(dirpath, root).replace(os.sep, "/")
            for d in dirnames:
                row = self._emit(f"{reld}/{d}", True, 0)
                if row:
                    yield row
            for f in sorted(filenames):
                full = os.path.join(dirpath, f)
                row = self._emit(f"{reld}/{f}", False, os.path.getsize(full))
                if row:
                    yield row


class LakeListingDataSource(DataSource):
    """``spark.read.format("lake_listing").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "lake_listing"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("lake_listing requires .option('path', <root>)")
        return _ListingReader(path)


# Memo lives ON the session (id()-keyed sets can alias a recycled object id).
_PYDS_ATTR = "_pdg2_pyds_registered"


def ensure_registered(spark) -> None:
    if not getattr(spark, _PYDS_ATTR, False):
        spark.dataSource.register(LakeListingDataSource)
        # runtime-settable; required for pushFilters to participate
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        setattr(spark, _PYDS_ATTR, True)


# ---------------------------------------------------------------------------
# S26 — Python DataSource WRITER: staged part files + manifest commit
# ---------------------------------------------------------------------------


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str
    rows: int


class _JsonlWriter(DataSourceWriter):
    """Two-phase committed JSON-lines sink.

    Executor tasks stream their partition to a STAGED file (unique name,
    invisible to readers); the driver-side ``commit`` renames every
    staged file to its final ``part-N.jsonl`` name and only then writes
    the ``_SUCCESS`` manifest (file list + row count); ``abort`` deletes
    the staged files. This is the reference's chunked ``append`` +
    final ``flush`` upload protocol (client.py:548-562, 584-627) recast
    as Spark's committer contract: data is never visible half-written,
    a crashed job leaves only garbage-collectable staging, and a retry
    of one task cannot double-publish (its staged file is simply never
    committed). JSON values are rendered with sorted keys so output is
    byte-deterministic per row.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator) -> "_StagedFile":
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"_staged-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                # recursive asDict: nested structs become dicts (a shallow
                # asDict leaves Row objects, which default=str would
                # silently stringify as repr). default=str then totalizes
                # the leaves: timestamps/dates render ISO-ish, Decimals as
                # exact digit strings — JSON-native types untouched.
                f.write(
                    json.dumps(row.asDict(recursive=True), sort_keys=True, default=str)
                    + "\n"
                )
                n += 1
        return _StagedFile(staged=staged, rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        files = []
        total = 0
        for i, m in enumerate(sorted(messages, key=lambda m: m.staged)):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.staged, final)
            files.append(os.path.basename(final))
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": files, "rows": total}, f)

    def abort(self, messages) -> None:
        import os

        # API contract: a FAILED task's commit message arrives as None —
        # only successful tasks have staged files to clean.
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.staged)
            except FileNotFoundError:
                # Tolerated: a retried/speculative task may have already
                # aborted its own staged file, or the task died between
                # commit-message send and file creation. Anything else
                # (permissions, IO) propagates — abort() must not hide it.
                continue


class LakeJsonlSink(DataSource):
    """`format("lake_jsonl")` — see _JsonlWriter."""

    @classmethod
    def name(cls) -> str:
        return "lake_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options["path"])


def ensure_sink_registered(spark) -> None:
    try:
        spark.dataSource.register(LakeJsonlSink)
    except Exception:
        pass  # already registered in this session


# ---------------------------------------------------------------------------
# ST17 — Python STREAMING data source: offset-tracked replay of event files
# ---------------------------------------------------------------------------


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch reader over a directory of parquet
    files (one file per batch, sorted name order = event-time order).

    The offset is ``{"idx": N}`` — files consumed so far. ``read``
    returns one file's rows and advances the offset; an exhausted
    source returns an empty batch with an unchanged offset (the query
    idles until stopped). ``readBetweenOffsets`` re-serves any committed
    range deterministically, which is what makes checkpoint recovery of
    a custom Python source possible: offsets are REPLAYABLE, exactly the
    contract the built-in file/Kafka sources implement. The simple-
    reader variant runs on the driver (low-throughput control path);
    a partitioned ``streamReader`` is the executor-parallel upgrade.
    """

    def __init__(self, path: str) -> None:
        self.path = path
        self.files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _rows(self, name: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(self.path, name),
            columns=["event_id", "user_id", "event_type", "value"],
        )
        return iter(t.to_pylist())

    def read(self, start: dict):
        idx = start["idx"]
        if idx >= len(self.files):
            return iter([]), start
        # list-backed iterator: the engine's prefetch cache copy.copy()s
        # it (generators are not copyable)
        rows = [
            (r["event_id"], r["user_id"], r["event_type"], r["value"])
            for r in self._rows(self.files[idx])
        ]
        return iter(rows), {"idx": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out = []
        for name in self.files[start["idx"] : end["idx"]]:
            out.extend(
                (r["event_id"], r["user_id"], r["event_type"], r["value"])
                for r in self._rows(name)
            )
        return iter(out)


class EventReplayStreamSource(DataSource):
    """`format("events_replay_stream")` — see _ReplayStreamReader."""

    @classmethod
    def name(cls) -> str:
        return "events_replay_stream"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _ReplayStreamReader(self.options["path"])


def ensure_stream_source_registered(spark) -> None:
    try:
        spark.dataSource.register(EventReplayStreamSource)
    except Exception:
        pass  # already registered in this session


# ---------------------------------------------------------------------------
# ST28 — Python STREAMING source: versioned-table CHANGE DATA FEED
# ---------------------------------------------------------------------------


def _vt_local_root(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    return path


def _vt_committed_versions(
    root: str, cache: dict | None = None
) -> dict[int, dict]:
    """Parse the manifest log directly (driver-side control path — the
    stream reader has no SparkSession). Same reader rules as
    VersionedTable.versions(): a manifest that PARSES and whose embedded
    version matches its slot is committed; anything torn is invisible.

    ``cache`` (optional, keyed (name, mtime_ns, size) like
    VersionedTable._parse_manifest) makes the per-trigger cost of a
    long-lived tailing query O(listing), not O(history) re-reads: a
    parseable manifest is immutable for the lifetime of its file, so
    each is read+parsed at most once per reader instance. Torn/foreign
    manifests are deliberately NOT cached (they are the one mutable
    state — a publisher mid-write)."""
    import json as _json
    import re as _re

    pat = _re.compile(r"^_manifest\.(\d{8})\.json$")
    out: dict[int, dict] = {}
    for name in os.listdir(root):
        m = pat.match(name)
        if not m:
            continue
        v = int(m.group(1))
        path = os.path.join(root, name)
        key = None
        if cache is not None:
            try:
                st = os.stat(path)
            except OSError:  # vanished between list & stat
                continue
            key = (name, st.st_mtime_ns, st.st_size)
            hit = cache.get(key)
            if hit is not None:
                out[v] = hit
                continue
        try:
            with open(path, "rb") as f:
                ref = _json.loads(f.read().decode())
        except Exception:  # noqa: BLE001 — in-flight/torn manifest
            continue
        if ref.get("version") != v:
            continue
        if cache is not None and key is not None:
            cache[key] = ref
        out[v] = ref
    return out


def _vt_dirs(ref: dict) -> list[str]:
    return ref["dirs"] if "dirs" in ref else [ref["dir"]]


class _VersionChangesStreamReader(SimpleDataSourceStreamReader):
    """CDF streaming SOURCE over a VersionedTable (sources/versioned.py)
    — the read twin of ST12's stream→versioned-table write direction,
    the Delta `readChangeFeed` shape.

    The offset is ``{"v": N}`` — every committed version ≤ N has been
    served. Each micro-batch serves exactly ONE commit's delta (commit
    order = the change order), resolved from the manifest diff: version
    v's dir set minus its predecessor's — O(delta) data read, never
    O(table), the same metadata-only resolution as
    VersionedTable.read_changes. A caught-up source returns an empty
    batch with an unchanged offset; new commits appearing later are
    picked up on subsequent triggers, so one long-lived query tails the
    table. ``readBetweenOffsets`` re-serves any committed version range
    deterministically (manifests and snapshot dirs are immutable), which
    is exactly the checkpoint-recovery contract.

    Append-only chains are the defined CDF case. A non-append commit
    (full snapshot / optimize: the new dir set is NOT a superset of the
    predecessor's) is a REWRITE with no manifest-derivable row-level
    feed — the reader fails loud there rather than re-emit the table as
    inserts (Delta's readChangeFeed makes the same call for non-CDF
    rewrites); ``VersionedTable.diff_changes`` (S47) is the documented
    recovery path, deriving the row-level insert/delete/update images
    across the rewrite by keyed snapshot diff.

    Rows carry the data columns (in declared-schema order) plus
    ``_commit_version`` — the commit that inserted them."""

    def __init__(self, root: str, columns: list[str], since: int) -> None:
        self.root = _vt_local_root(root)
        self.columns = columns
        self.since = since
        # per-instance parsed-manifest cache (see _vt_committed_versions):
        # a tailing query must not re-read O(history) manifests per trigger
        self._manifest_cache: dict = {}

    def initialOffset(self) -> dict:
        return {"v": self.since}

    def _delta_rows(self, refs: dict[int, dict], v: int) -> list[tuple]:
        import pyarrow.parquet as pq

        prev = max((u for u in refs if u < v), default=None)
        if v > 1 and prev != v - 1:
            # Version v's predecessor manifest v-1 is not visible —
            # expire()/vacuum removed it, or a transient read failure
            # hid it. Committed versions are CONSECUTIVE by protocol
            # (commit_loop claims current+1), so diffing against any
            # older prev (or against the empty set) would re-emit
            # earlier commits' rows as v's "delta", misattributed to
            # _commit_version=v — duplicates in the sink. Fail loud
            # instead (Delta's readChangeFeed errors on vacuumed
            # versions too); the only legitimate no-predecessor case is
            # v=1, the table's genuine first commit. Recovery: restart
            # the feed with since = a retained version, or bridge the
            # gap with VersionedTable.diff_changes (S47).
            raise ValueError(
                f"cannot derive version {v}'s change feed under "
                f"{self.root}: predecessor manifest {v - 1} is not "
                f"visible (expired/vacuumed or unreadable) — restart "
                f"from a retained version or bridge the gap with "
                f"diff_changes"
            )
        new = _vt_dirs(refs[v])
        old = set(_vt_dirs(refs[prev])) if prev is not None else set()
        if prev is not None and not old.issubset(set(new)):
            raise ValueError(
                f"version {v} under {self.root} is a REWRITE (dir set is "
                f"not a superset of version {prev}'s) — no change feed "
                f"is derivable; restart the stream from a later version"
            )
        rows: list[tuple] = []
        for d in new:
            if d in old:
                continue
            # strip any file:// scheme BEFORE the isabs test — cloned
            # tables carry absolute file://... dirs in their manifests,
            # which os.path.isabs would misjudge and join onto root
            d_local = _vt_local_root(d)
            full = (
                d_local if os.path.isabs(d_local)
                else os.path.join(self.root, d_local)
            )
            for f in sorted(os.listdir(full)):
                if not f.endswith(".parquet"):
                    continue
                t = pq.read_table(os.path.join(full, f), columns=self.columns)
                rows.extend(
                    tuple(r[c] for c in self.columns) + (v,)
                    for r in t.to_pylist()
                )
        return rows

    def read(self, start: dict):
        refs = _vt_committed_versions(self.root, self._manifest_cache)
        pending = sorted(v for v in refs if v > start["v"])
        if not pending:
            return iter([]), start  # caught up — idle until a new commit
        v = pending[0]
        return iter(self._delta_rows(refs, v)), {"v": v}

    def readBetweenOffsets(self, start: dict, end: dict):
        refs = _vt_committed_versions(self.root, self._manifest_cache)
        out: list[tuple] = []
        for v in sorted(refs):
            if start["v"] < v <= end["v"]:
                out.extend(self._delta_rows(refs, v))
        return iter(out)


class VersionedChangesStreamSource(DataSource):
    """``readStream.format("versioned_changes")`` — options:

    - ``path``: the table root (``file://…`` or local path),
    - ``dataSchema``: DDL of the table's data columns (the source appends
      ``_commit_version bigint``),
    - ``since`` (optional, default 0): start the feed AFTER this version.
    """

    @classmethod
    def name(cls) -> str:
        return "versioned_changes"

    def schema(self) -> str:
        data = self.options.get("dataschema")
        if not data:
            raise ValueError(
                "versioned_changes requires .option('dataSchema', <ddl>)"
            )
        return f"{data}, _commit_version bigint"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        cols = [f.name for f in schema.fields if f.name != "_commit_version"]
        return _VersionChangesStreamReader(
            self.options["path"], cols, int(self.options.get("since", 0))
        )


def ensure_changes_stream_registered(spark) -> None:
    try:
        spark.dataSource.register(VersionedChangesStreamSource)
    except Exception:
        pass  # already registered in this session
