"""One small filesystem seam under the metadata layer.

The lake's DATA plane (parquet read/write) already goes through Spark,
which speaks ``hdfs://`` / ``s3a://`` / ``file://`` natively.  The
METADATA plane (timeline ``.commit`` files, archive batches, stream-epoch
manifests and ledger, savepoints, staging renames) is driver-side
small-file traffic that previously went straight to ``os.*`` — binding
the whole table to a local filesystem.  This module is the one seam:

- ``LocalFS`` — plain ``os`` calls for plain paths (the default; zero
  behavior change, zero overhead).
- ``HadoopFS`` — URI paths route through Hadoop's ``FileSystem`` via the
  Spark JVM gateway: the same FS layer the reference uses for its
  timeline I/O (``DeleteUtils.java:50-59`` resolves a Hadoop
  ``FileSystem`` from the table path), so a table rooted at
  ``hdfs://...`` or ``s3a://...`` works end-to-end with no extra
  dependencies.
- ``MemoryFS`` — a process-local in-memory backend (``mem://``) proving
  the seam carries no hidden ``os.path`` assumptions; used by tests.

``fs_for(path)`` dispatches on the path's scheme.  All paths remain
plain strings joined with ``/`` (``os.path.join`` on POSIX), so callers
never branch on backend.
"""

from __future__ import annotations

import os
import shutil
import threading


class LocalFS:
    """``os``-backed implementation — the default for plain paths."""

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        """Parent-mkdirs + tmp-write + rename: the rename is the publish
        point (readers never see partial content)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        d, name = os.path.split(path)
        tmp = os.path.join(d, f".{name}.inflight")
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def append_line(self, path: str, line: str) -> None:
        """Durable append (ledgers): flushed + fsynced before return."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "a") as f:
            f.write(line)
            f.flush()
            os.fsync(f.fileno())

    def remove(self, path: str) -> None:
        os.remove(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def copy(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)


class MemoryFS:
    """Process-local in-memory backend for ``mem://`` paths (tests).

    One shared namespace per process (class-level store) so every
    component touching the same ``mem://table`` path sees one table —
    mirroring how a real shared filesystem behaves. Operations are
    dict-atomic under the GIL plus a lock for compound ops."""

    _store: dict[str, str] = {}
    _dirs: set[str] = set()
    _lock = threading.Lock()

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._store.clear()
            cls._dirs.clear()

    @staticmethod
    def _norm(path: str) -> str:
        return path.rstrip("/")

    def listdir(self, path: str) -> list[str]:
        p = self._norm(path) + "/"
        with self._lock:
            if not self.isdir(path):
                raise FileNotFoundError(path)
            names = set()
            for k in list(self._store) + list(self._dirs):
                if k.startswith(p):
                    names.add(k[len(p):].split("/", 1)[0])
            return sorted(names)

    def isdir(self, path: str) -> bool:
        p = self._norm(path)
        return p in self._dirs or any(
            k.startswith(p + "/") for k in list(self._store) + list(self._dirs)
        )

    def exists(self, path: str) -> bool:
        return self._norm(path) in self._store or self.isdir(path)

    def read_text(self, path: str) -> str:
        try:
            return self._store[self._norm(path)]
        except KeyError:
            raise FileNotFoundError(path) from None

    def write_text_atomic(self, path: str, text: str) -> None:
        with self._lock:
            self._store[self._norm(path)] = text

    def append_line(self, path: str, line: str) -> None:
        with self._lock:
            p = self._norm(path)
            self._store[p] = self._store.get(p, "") + line

    def remove(self, path: str) -> None:
        with self._lock:
            try:
                del self._store[self._norm(path)]
            except KeyError:
                raise FileNotFoundError(path) from None

    def makedirs(self, path: str) -> None:
        with self._lock:
            self._dirs.add(self._norm(path))

    def replace(self, src: str, dst: str) -> None:
        with self._lock:
            try:
                self._store[self._norm(dst)] = self._store.pop(self._norm(src))
            except KeyError:
                raise FileNotFoundError(src) from None

    def copy(self, src: str, dst: str) -> None:
        with self._lock:
            try:
                self._store[self._norm(dst)] = self._store[self._norm(src)]
            except KeyError:
                raise FileNotFoundError(src) from None

    def size(self, path: str) -> int:
        return len(self.read_text(path).encode("utf-8"))

    def rmtree(self, path: str) -> None:
        p = self._norm(path)
        with self._lock:
            for k in [k for k in self._store if k == p or k.startswith(p + "/")]:
                del self._store[k]
            self._dirs -= {d for d in self._dirs
                           if d == p or d.startswith(p + "/")}


class HadoopFS:
    """Hadoop ``FileSystem`` via the Spark JVM gateway for URI paths
    (``hdfs://``, ``s3a://``, ``file://`` ...) — the reference's own FS
    layer (``DeleteUtils.java:50-59``). Driver-side metadata traffic
    only; the data plane reaches the same URIs through Spark itself."""

    def __init__(self, spark, base_uri: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.Path(base_uri).getFileSystem(
            self._conf
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def listdir(self, path: str) -> list[str]:
        if not self._fs.exists(self._p(path)):
            raise FileNotFoundError(path)
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(self._p(path))
        )

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def read_text(self, path: str) -> str:
        if not self._fs.exists(self._p(path)):
            raise FileNotFoundError(path)
        stream = self._fs.open(self._p(path))
        try:
            util = self._jvm.org.apache.commons.io.IOUtils
            charset = self._jvm.java.nio.charset.StandardCharsets.UTF_8
            return util.toString(stream, charset)
        finally:
            stream.close()

    def _write(self, path: str, text: str, overwrite: bool = True) -> None:
        stream = self._fs.create(self._p(path), overwrite)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        d, name = path.rsplit("/", 1)
        tmp = f"{d}/.{name}.inflight"
        self._write(tmp, text)
        # Hadoop rename does not clobber; delete-then-rename is the
        # standard lake publish idiom (the timeline's own replays make
        # the crash window idempotent)
        if self._fs.exists(self._p(path)):
            self._fs.delete(self._p(path), False)
        self._fs.rename(self._p(tmp), self._p(path))

    def append_line(self, path: str, line: str) -> None:
        # object stores lack append: read-modify-publish (driver-side,
        # single-writer ledgers only)
        try:
            prev = self.read_text(path)
        except FileNotFoundError:
            prev = ""
        self._write(path, prev + line)

    def remove(self, path: str) -> None:
        if not self._fs.delete(self._p(path), False):
            raise FileNotFoundError(path)

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def replace(self, src: str, dst: str) -> None:
        if self._fs.exists(self._p(dst)):
            self._fs.delete(self._p(dst), False)
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def size(self, path: str) -> int:
        if not self._fs.exists(self._p(path)):
            raise FileNotFoundError(path)
        return self._fs.getFileStatus(self._p(path)).getLen()

    def copy(self, src: str, dst: str) -> None:
        util = self._jvm.org.apache.hadoop.fs.FileUtil
        util.copy(self._fs, self._p(src), self._fs, self._p(dst),
                  False, True, self._conf)

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._p(path), True)


_LOCAL = LocalFS()
_MEMORY = MemoryFS()


def fs_for(path: str):
    """Backend for a table/metadata path, by scheme. Plain paths (the
    overwhelmingly common case) get the shared LocalFS; ``mem://`` the
    shared MemoryFS; any other URI a Hadoop FileSystem resolved through
    the active Spark session's JVM."""
    if "://" not in path:
        return _LOCAL
    if path.startswith("mem://"):
        return _MEMORY
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"URI path {path!r} needs an active SparkSession (Hadoop "
            "FileSystem rides the JVM gateway)"
        )
    return HadoopFS(spark, path)
