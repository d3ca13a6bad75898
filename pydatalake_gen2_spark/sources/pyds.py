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
