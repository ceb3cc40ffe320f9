"""Object-store access layer for the Python data sources.

Parity: the reference reads every format from local FS, S3, or GCS through
the ``object_store`` crate (SURVEY.md §2.1; exon-io/src/lib.rs,
runtime_env/exon_runtime_env_ext.rs:28-44), issuing ranged GETs for
index-pruned scans. The Spark-first split is:

* **JVM-read paths** (tabular GFF/GTF/BED/HMMDOMTAB via ``spark.read.csv``,
  the jvm_fast text scans, parquet/csv/json) — use Spark's native Hadoop
  ``s3a://`` / ``gs://`` support on a real cluster; zero code here.
* **Python DataSources** (FASTA, VCF, BAM, ... binary decoders) — this
  module: ``s3://bucket/key`` URIs resolve through a boto3-backed handler
  with ranged reads, so index-pruned scans fetch only the BGZF chunks they
  need, exactly like the reference (indexed_bgzf_file.rs:52-112 over
  object_store).

Handlers are registered per URI scheme in a module-level table that exists
in every process importing exon_spark — planning workers and executors
included. The ``mock://`` scheme (a local directory root named by
``$EXON_SPARK_MOCK_FS_ROOT``) exercises the full remote code path in tests
without network.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass


@dataclass
class RemoteFile:
    path: str  # full URI
    size: int


def scheme_of(path: str) -> str | None:
    """URI scheme, or None for plain local paths. ``file:`` counts as local
    (callers strip it)."""
    if "://" not in path:
        return None
    s = path.split("://", 1)[0].lower()
    return None if s == "file" else s


class _RangedReader(io.RawIOBase):
    """Seekable read-only file over a ``fetch(start, end_exclusive)`` range
    callable — the shape every object store offers. Wrapped in a
    BufferedReader by ``open`` so small sequential reads coalesce into
    block-sized GETs."""

    def __init__(self, fetch, size: int):
        self._fetch = fetch
        self._size = size
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> int:
        if whence == os.SEEK_SET:
            self._pos = offset
        elif whence == os.SEEK_CUR:
            self._pos += offset
        elif whence == os.SEEK_END:
            self._pos = self._size + offset
        return self._pos

    def tell(self) -> int:
        return self._pos

    def readinto(self, b) -> int:
        if self._pos >= self._size:
            return 0
        end = min(self._pos + len(b), self._size)
        data = self._fetch(self._pos, end)
        n = len(data)
        b[:n] = data
        self._pos += n
        return n


class S3Handler:
    """boto3-backed handler for ``s3://bucket/key`` URIs. One client per
    process (boto3 clients are not fork-safe; executors build their own on
    first use). Reads are ranged GETs — an index-pruned VCF scan fetches
    only its BGZF chunk ranges, never the whole object."""

    #: BufferedReader block size — one GET per 8 MiB of sequential read.
    BLOCK = 8 << 20

    def __init__(self, client=None):
        self._client = client

    def _c(self):
        if self._client is None:
            import boto3

            self._client = boto3.client("s3")
        return self._client

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        rest = path.split("://", 1)[1]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def exists(self, path: str) -> bool:
        bucket, key = self._split(path)
        try:
            self._c().head_object(Bucket=bucket, Key=key)
            return True
        except Exception:
            return False

    def getsize(self, path: str) -> int:
        bucket, key = self._split(path)
        return int(self._c().head_object(Bucket=bucket, Key=key)["ContentLength"])

    def open(self, path: str):
        size = self.getsize(path)
        bucket, key = self._split(path)

        def fetch(start: int, end: int) -> bytes:
            resp = self._c().get_object(
                Bucket=bucket, Key=key, Range=f"bytes={start}-{end - 1}"
            )
            return resp["Body"].read()

        return io.BufferedReader(_RangedReader(fetch, size), self.BLOCK)

    def list(self, path: str) -> list[RemoteFile]:
        """All objects under the prefix (exact object first if one exists).
        Returned paths are full s3:// URIs."""
        bucket, key = self._split(path)
        out: list[RemoteFile] = []
        if key and not key.endswith("/"):
            try:
                head = self._c().head_object(Bucket=bucket, Key=key)
                return [RemoteFile(path, int(head["ContentLength"]))]
            except Exception:
                key = key + "/"
        paginator = self._c().get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=key):
            for obj in page.get("Contents", []) or []:
                if obj["Key"].endswith("/"):
                    continue
                out.append(
                    RemoteFile(f"s3://{bucket}/{obj['Key']}", int(obj["Size"]))
                )
        return out


class MockFsHandler:
    """``mock://<relpath>`` → ``$EXON_SPARK_MOCK_FS_ROOT/<relpath>``, but
    accessed ONLY through the remote-handler interface (ranged reads over a
    fetch callable, prefix listing). Proves the object-store plumbing —
    scheme routing, listing, sidecar-index existence checks, virtual-offset
    chunk reads — end-to-end in tests; executors resolve the root from the
    environment, which local-mode workers inherit."""

    @staticmethod
    def _local(path: str) -> str:
        root = os.environ.get("EXON_SPARK_MOCK_FS_ROOT")
        if not root:
            raise FileNotFoundError(
                "mock:// path used without EXON_SPARK_MOCK_FS_ROOT set"
            )
        return os.path.join(root, path.split("://", 1)[1])

    def exists(self, path: str) -> bool:
        return os.path.isfile(self._local(path))

    def getsize(self, path: str) -> int:
        return os.path.getsize(self._local(path))

    def open(self, path: str):
        local = self._local(path)
        size = os.path.getsize(local)

        def fetch(start: int, end: int) -> bytes:
            with open(local, "rb") as fh:
                fh.seek(start)
                return fh.read(end - start)

        return io.BufferedReader(_RangedReader(fetch, size), 1 << 20)

    def list(self, path: str) -> list[RemoteFile]:
        local = self._local(path)
        scheme = path.split("://", 1)[0]
        if os.path.isfile(local):
            return [RemoteFile(path, os.path.getsize(local))]
        out: list[RemoteFile] = []
        for dirpath, _dirs, files in os.walk(local):
            for fn in sorted(files):
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, os.environ["EXON_SPARK_MOCK_FS_ROOT"])
                out.append(
                    RemoteFile(
                        f"{scheme}://{rel.replace(os.sep, '/')}",
                        os.path.getsize(full),
                    )
                )
        return out


_HANDLERS: dict[str, object] = {}


def register_filesystem(scheme: str, handler) -> None:
    """Install a handler for a URI scheme (process-local). ``s3`` and
    ``mock`` are pre-registered; ``gs``/``az`` handlers plug in the same
    way."""
    _HANDLERS[scheme.lower()] = handler


register_filesystem("s3", S3Handler())
register_filesystem("mock", MockFsHandler())


def handler_for(path: str):
    """The registered handler for a remote URI, or None for local paths."""
    s = scheme_of(path)
    if s is None:
        return None
    try:
        return _HANDLERS[s]
    except KeyError:
        raise ValueError(f"no filesystem handler registered for {s}:// paths")


def fs_open(path: str):
    """Seekable binary reader for a local path or remote URI."""
    h = handler_for(path)
    return open(path, "rb") if h is None else h.open(path)


def fs_exists(path: str) -> bool:
    h = handler_for(path)
    return os.path.exists(path) if h is None else h.exists(path)


def fs_getsize(path: str) -> int:
    h = handler_for(path)
    return os.path.getsize(path) if h is None else h.getsize(path)
