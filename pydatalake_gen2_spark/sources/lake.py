"""LakeCatalog — the Spark-native replacement for the reference's entire
ADLS Gen2 REST client surface (SURVEY.md §2A R9-R25,
/root/reference/azure/datalake/gen2/client.py:213-631).

The reference hand-rolls HTTP: SharedKey signing (client.py:143-178),
retries (client.py:44-69), chunked append+flush uploads (client.py:548-627),
paginated listing with a stale LRU memo (client.py:72-86, 481-526). On
Spark ALL of that collapses into (a) connector configuration — the ABFS
connector signs, retries, and uploads in blocks — and (b) this thin
catalog utility over Hadoop's FileSystem API, reached through the JVM
gateway. Works identically against `file://` (tests) and `abfss://`
(production); no requests, no signing, no pagination code.

Deliberate behavior differences from the reference (its bugs, not ported):
- listings are never memoized (client.py:481 caches forever → stale);
- rename needs no read-before-write listing (client.py:377-384);
- no flush-at-position-0 corruption (client.py:582);
- properties of a filesystem are readable (client.py:304 .json() on HEAD).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


def configure_abfss(spark: SparkSession, account: str, key: str) -> str:
    """ADLS Gen2 SharedKey auth via connector conf — replaces the
    reference's HMAC request signing (client.py:143-178). Returns the
    account URI suffix for building abfss:// paths."""
    spark.conf.set(f"fs.azure.account.key.{account}.dfs.core.windows.net", key)
    return f"{account}.dfs.core.windows.net"


@dataclass
class PathInfo:
    name: str
    path: str
    is_dir: bool
    length: int
    modification_time: int


class LakeCatalog:
    """Filesystem/path CRUD over Hadoop FileSystem (R9-R19 equivalents)."""

    def __init__(self, spark: SparkSession, root: str):
        """root: a URI like 'file:///tmp/lake' or
        'abfss://<container>@<account>.dfs.core.windows.net'."""
        self._spark = spark
        self._jvm = spark._jvm
        self._root = root.rstrip("/")
        jconf = spark._jsc.hadoopConfiguration()
        juri = self._jvm.java.net.URI(self._root)
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(juri, jconf)

    def _jpath(self, path: str):
        full = f"{self._root}/{path.lstrip('/')}" if path else self._root
        return self._jvm.org.apache.hadoop.fs.Path(full)

    # -- filesystem (container) level: R9/R10/R11 --------------------------
    def create_filesystem(self, name: str) -> bool:
        """R9 create_filesystem (client.py:213-235) → mkdirs."""
        return bool(self._fs.mkdirs(self._jpath(name)))

    def delete_filesystem(self, name: str) -> bool:
        """R10 delete_filesystem (client.py:237-260) → recursive delete."""
        return bool(self._fs.delete(self._jpath(name), True))

    def list_filesystems(self, prefix: str = "") -> list[str]:
        """R11 list_filesystem (client.py:262-290) → top-level listing.
        Fresh every call — no stale memo (vs client.py:72-86)."""
        out = []
        for st in self._fs.listStatus(self._jpath("")):
            n = st.getPath().getName()
            if st.isDirectory() and n.startswith(prefix):
                out.append(n)
        return sorted(out)

    # -- path level: R14-R17, R19, R20-R23 --------------------------------
    def create_path(self, path: str, resource: str = "file") -> bool:
        """R14 create_path (client.py:329-356): empty file or directory."""
        jp = self._jpath(path)
        if resource == "directory":
            return bool(self._fs.mkdirs(jp))
        self._fs.create(jp, True).close()
        return True

    def delete_path(self, path: str, recursive: bool = False) -> bool:
        """R16 delete_path (client.py:397-422)."""
        return bool(self._fs.delete(self._jpath(path), recursive))

    def rename_path(self, src: str, dst: str) -> bool:
        """R15 rename_file (client.py:358-395) — one atomic rename, no
        read-before-write listing round-trip."""
        return bool(self._fs.rename(self._jpath(src), self._jpath(dst)))

    def get_properties(self, path: str) -> PathInfo:
        """R17 get_properties_path (client.py:424-447)."""
        st = self._fs.getFileStatus(self._jpath(path))
        return PathInfo(
            name=st.getPath().getName(),
            path=st.getPath().toString(),
            is_dir=st.isDirectory(),
            length=st.getLen(),
            modification_time=st.getModificationTime(),
        )

    # -- user properties: R12/R13/R18-adjacent ------------------------------
    # The reference sets free-form key=val pairs via the x-ms-properties
    # header (R13 set_properties_filesystem, client.py:308-325; read back
    # by R12 get_properties_filesystem, client.py:292-306). On abfss:// the
    # Hadoop ABFS connector exposes exactly that metadata as xattrs, so we
    # try setXAttr/getXAttrs first; filesystems without xattr support
    # (RawLocalFileSystem in tests) fall back to a dot-prefixed JSON
    # sidecar next to the path (hidden from Spark scans, filtered from
    # list_paths). Replace semantics, matching the reference's header.

    _SIDECAR_SUFFIX = "._props.json"

    def _sidecar(self, path: str) -> str:
        p = path.rstrip("/")
        head, _, tail = p.rpartition("/")
        name = f".{tail}{self._SIDECAR_SUFFIX}"
        return f"{head}/{name}" if head else name

    _xattr_ok: bool | None = None  # per-instance probe memo (lazy)

    def _xattr_supported(self, jp) -> bool:
        """Probe xattr support ONCE per catalog instance — so a partial
        failure mid-write can't fall through to the sidecar while stale
        xattrs remain (mixed-state reads)."""
        if self._xattr_ok is None:
            try:
                self._fs.listXAttrs(jp)
                self._xattr_ok = True
            except Exception:
                self._xattr_ok = False
        return self._xattr_ok

    def set_properties(self, path: str, props: dict[str, str]) -> None:
        """R13 set_properties (client.py:308-325): replace the user
        property set on a filesystem or path. Only ``user.``-namespace
        xattrs are replaced — system/security xattrs are never touched."""
        jp = self._jpath(path)
        if self._xattr_supported(jp):
            for k in self._fs.listXAttrs(jp):
                if k.startswith("user."):
                    self._fs.removeXAttr(jp, k)
            for k, v in props.items():
                self._fs.setXAttr(jp, f"user.{k}", bytearray(v.encode()))
            return
        import json

        self.upload_bytes(self._sidecar(path), json.dumps(props).encode())

    def get_user_properties(self, path: str) -> dict[str, str]:
        """R12 get_properties_filesystem user-metadata read-back
        (client.py:292-306). Reads only the ``user.`` namespace."""
        jp = self._jpath(path)
        if self._xattr_supported(jp):
            out = {}
            for k in self._fs.listXAttrs(jp):
                if k.startswith("user."):
                    out[k[5:]] = bytes(self._fs.getXAttr(jp, k)).decode()
            return out
        import json

        side = self._sidecar(path)
        if not self.exists(side):
            return {}
        return json.loads(self.read_bytes(side).decode())

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._jpath(path)))

    def list_paths(self, directory: str = "", recursive: bool = False) -> list[PathInfo]:
        """R19 list_path (client.py:481-526). Hadoop's listFiles handles
        continuation internally — no 5000-entry pagination loop."""
        out: list[PathInfo] = []
        if recursive:
            it = self._fs.listFiles(self._jpath(directory), True)
            while it.hasNext():
                st = it.next()
                out.append(
                    PathInfo(
                        st.getPath().getName(),
                        st.getPath().toString(),
                        False,
                        st.getLen(),
                        st.getModificationTime(),
                    )
                )
        else:
            for st in self._fs.listStatus(self._jpath(directory)):
                out.append(
                    PathInfo(
                        st.getPath().getName(),
                        st.getPath().toString(),
                        st.isDirectory(),
                        st.getLen(),
                        st.getModificationTime(),
                    )
                )
        return sorted(
            (p for p in out if not p.name.endswith(self._SIDECAR_SUFFIX)),
            key=lambda p: p.path,
        )

    def upload_bytes(self, path: str, data: bytes) -> int:
        """R21/R23 upload (client.py:548-582): the connector stages blocks
        and commits atomically — no manual append/flush positions (and no
        flush-at-0 bug, client.py:582)."""
        stream = self._fs.create(self._jpath(path), True)
        stream.write(bytearray(data))
        stream.close()
        return len(data)

    @staticmethod
    def _is_already_exists(e: Exception) -> bool:
        """True iff the py4j-wrapped Java exception (or any link of its
        cause chain) is a *FileAlreadyExistsException — matched by CLASS
        NAME, not message substring (r9 ADVICE: an unrelated error whose
        message happens to contain 'exists' must not be misread as a lost
        race across Hadoop FS implementations/locales). Covers both
        org.apache.hadoop.fs.FileAlreadyExistsException and
        java.nio.file.FileAlreadyExistsException."""
        je = getattr(e, "java_exception", None)
        seen = 0
        while je is not None and seen < 16:
            try:
                if "FileAlreadyExistsException" in je.getClass().getName():
                    return True
                je = je.getCause()
            except Exception:  # noqa: BLE001 — py4j reflection failure
                break
            seen += 1
        return False

    def create_bytes_atomic(self, path: str, data: bytes) -> bool:
        """Create-if-absent upload — the COMMIT-POINT primitive for the
        versioned table's manifest and claim files (versioned.py protocol
        steps 1 and 3). Returns False when the path already exists — the
        caller LOST a commit race and must re-resolve the table version;
        never overwrites the winner.

        Backend mapping:
        - ABFS: ``create(path, overwrite=false)`` → If-None-Match:*
          conditional PUT; HDFS: atomic namespace create.
        - local ``file:`` scheme: Hadoop's RawLocalFileSystem.create is
          CHECK-then-create (not atomic — r9 ADVICE), so local paths go
          through POSIX ``open(O_CREAT|O_EXCL)`` instead, which IS atomic
          and makes the exactly-one-winner guarantee hold for genuinely
          concurrent local writers (tests/test_lake.py threaded race).
        """
        jp = self._fs.makeQualified(self._jpath(path))
        uri = jp.toUri()
        if (uri.getScheme() or "file") == "file":
            import os

            # Hadoop's create() mkdirs missing parents implicitly; keep
            # that contract on the POSIX branch (r10 review finding #3 —
            # a nested-path caller must not break only on local fs).
            os.makedirs(os.path.dirname(uri.getPath()), exist_ok=True)
            try:
                fd = os.open(
                    uri.getPath(), os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644
                )
            except FileExistsError:
                return False
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            return True
        try:
            stream = self._fs.create(jp, False)
        except Exception as e:  # py4j wraps FileAlreadyExistsException
            if self._is_already_exists(e):
                return False
            raise
        stream.write(bytearray(data))
        stream.close()
        return True

    def read_bytes(self, path: str) -> bytes:
        """R20 read_path (client.py:528-546).

        Reads JVM-side via commons-io: py4j passes a Python bytearray to
        Java BY VALUE, so FSDataInputStream.readFully into it would fill a
        Java-side copy and leave the Python buffer zeroed. IOUtils returns
        the byte[] as the call result, which py4j does marshal back.
        """
        stream = self._fs.open(self._jpath(path))
        try:
            return bytes(self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
