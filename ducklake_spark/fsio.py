"""Filesystem seam for every lake write/maintenance path.

The reference runs its whole suite against object storage (minio/S3 —
``test/sql/cloud/``, ``examples/minio-demo-server/``); a 100-TB
deployment lives on an object store where POSIX ``glob``/``rename``/
``os.walk`` do not exist. Every driver-side file operation in the lake
therefore routes through :class:`LakeFS`, which is backed by
``pyarrow.fs`` — the same code drives local disk (LocalFileSystem),
S3, GCS and HDFS via ``FileSystem.from_uri``.

Data-plane reads/writes still go through Spark (Hadoop FS handles the
scheme there); this seam covers the control plane: finalizing written
files, adopting foreign files, cleanup/expire walks, delete-file
bookkeeping, and footer reads.

Tests inject a wrapper filesystem (see tests/test_fsio.py) to prove no
POSIX call leaks around the seam.
"""

from __future__ import annotations

import os
import posixpath
import re
import tempfile

import pyarrow.fs as pafs


def _has_scheme(path: str) -> bool:
    return "://" in path


class LakeFS:
    """Thin driver-side wrapper over a ``pyarrow.fs.FileSystem``.

    All paths crossing this API are plain strings in the wrapped
    filesystem's namespace (scheme already stripped by ``for_path``).
    The wrapped fs is picklable, so executor-side helpers may receive
    it when they need non-local access.
    """

    def __init__(self, fs: pafs.FileSystem):
        self.fs = fs

    # -- construction -------------------------------------------------
    @classmethod
    def for_path(cls, path: str) -> "LakeFS":
        """Resolve the filesystem owning ``path`` (URI or local)."""
        if _has_scheme(path):
            fs, _ = pafs.FileSystem.from_uri(path)
            return cls(fs)
        return cls(pafs.LocalFileSystem())

    @staticmethod
    def strip_scheme(path: str) -> str:
        """Path as the wrapped fs sees it (``s3://b/k`` -> ``b/k``)."""
        if _has_scheme(path):
            return pafs.FileSystem.from_uri(path)[1]
        return path

    # -- mutations ----------------------------------------------------
    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def move(self, src: str, dst: str) -> None:
        """Rename where the fs supports it; copy+delete elsewhere
        (pyarrow maps this per-backend — S3 has no rename)."""
        self.fs.move(src, dst)

    def remove(self, path: str, *, missing_ok: bool = True) -> None:
        try:
            self.fs.delete_file(path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def remove_batch(self, paths: list[str], *, missing_ok: bool = True,
                     workers: int = 16) -> None:
        """Delete many files with bounded concurrency. Object stores
        serve deletes at per-request latency — a serial loop over 100k
        expired/orphaned files is hours of driver wall-clock; 16
        in-flight requests make it minutes."""
        if not paths:
            return
        if len(paths) == 1:
            self.remove(paths[0], missing_ok=missing_ok)
            return
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(
            max_workers=min(workers, len(paths))
        ) as pool:
            # list() propagates the first failure
            list(pool.map(
                lambda p: self.remove(p, missing_ok=missing_ok), paths))

    def rmtree(self, path: str) -> None:
        try:
            self.fs.delete_dir(path)
        except FileNotFoundError:
            pass

    # -- queries ------------------------------------------------------
    def exists(self, path: str) -> bool:
        return self.fs.get_file_info(path).type != pafs.FileType.NotFound

    def size(self, path: str) -> int | None:
        info = self.fs.get_file_info(path)
        if info.type != pafs.FileType.File:
            return None
        return info.size

    def list_files(self, root: str, *, suffix: str | None = None,
                   recursive: bool = True) -> list[str]:
        """All file paths under ``root`` (one LIST per call — never a
        per-directory walk, which is O(dirs) round-trips on S3)."""
        sel = pafs.FileSelector(root, recursive=recursive,
                                allow_not_found=True)
        return sorted(
            i.path for i in self.fs.get_file_info(sel)
            if i.type == pafs.FileType.File
            and (suffix is None or i.path.endswith(suffix))
        )

    def list_infos(self, root: str) -> list[tuple[str, object]]:
        """(path, mtime datetime|None) for every file under ``root`` —
        same single LIST as :meth:`list_files`, with the modification
        time the listing already carries (age-guarded cleanups)."""
        sel = pafs.FileSelector(root, recursive=True, allow_not_found=True)
        return sorted(
            (i.path, i.mtime) for i in self.fs.get_file_info(sel)
            if i.type == pafs.FileType.File
        )

    def glob(self, pattern: str) -> list[str]:
        """Glob via one recursive listing + client-side match.

        ``**`` crosses directory separators, ``*``/``?`` do not —
        the semantics of ``glob.glob(..., recursive=True)`` that the
        adoption path documented, now object-store-safe.
        """
        pattern = pattern.replace(os.sep, "/")
        # longest literal prefix directory
        parts = pattern.split("/")
        base_parts = []
        for p in parts[:-1]:
            if re.search(r"[*?\[]", p):
                break
            base_parts.append(p)
        base = "/".join(base_parts) or "."
        rx = _glob_regex(pattern)
        return [p for p in self.list_files(base) if rx.fullmatch(p)]

    # -- byte access --------------------------------------------------
    def open_input(self, path: str):
        return self.fs.open_input_file(path)

    def read_bytes(self, path: str) -> bytes:
        with self.fs.open_input_file(path) as f:
            return f.read()

    def open_output(self, path: str):
        return self.fs.open_output_stream(path)


def _glob_regex(pattern: str) -> "re.Pattern[str]":
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "*":
            if pattern[i:i + 2] == "**":
                out.append(".*")
                i += 2
                if pattern[i:i + 1] == "/":  # '**/' also matches zero dirs
                    out.append("/?")
                    i += 1
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = i + 1
            if j < len(pattern) and pattern[j] in "!^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1
            while j < len(pattern) and pattern[j] != "]":
                j += 1
            if j >= len(pattern):  # unterminated '[' is a literal
                out.append(re.escape(c))
            else:
                inner = pattern[i + 1:j].replace("\\", "\\\\")
                if inner.startswith("!"):
                    inner = "^" + inner[1:]
                out.append(f"[{inner}]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return re.compile("".join(out))


def open_input_any(path: str):
    """Open ``path`` for reading through the filesystem its scheme
    names (LocalFileSystem for bare paths). Executor-safe: resolves
    per call, holds no driver state."""
    if _has_scheme(path):
        fs, p = pafs.FileSystem.from_uri(path)
    else:
        fs, p = pafs.LocalFileSystem(), path
    return fs.open_input_file(p)


def open_output_any(path: str):
    """Open ``path`` for writing through the filesystem its scheme
    names. Executor-safe counterpart of ``open_input_any``. S3 writes
    go through a put-on-close buffer (see s3_boto_client)."""
    if path.startswith(("s3://", "s3a://")):
        import io

        bucket, key = split_s3(path)

        class _PutOnClose(io.BytesIO):
            def close(self2) -> None:  # noqa: N805
                try:
                    s3_boto_client().put_object(
                        Bucket=bucket, Key=key,
                        Body=self2.getvalue())
                finally:
                    io.BytesIO.close(self2)

        return _PutOnClose()
    if _has_scheme(path):
        fs, p = pafs.FileSystem.from_uri(path)
    else:
        fs, p = pafs.LocalFileSystem(), path
    return fs.open_output_stream(p)


def size_any(path: str) -> int:
    """File size through the scheme-resolved filesystem."""
    if _has_scheme(path):
        fs, p = pafs.FileSystem.from_uri(path)
    else:
        fs, p = pafs.LocalFileSystem(), path
    return fs.get_file_info(p).size


def join(base: str, *parts: str) -> str:
    """posix join — object-store keys always use '/'."""
    return posixpath.join(base.replace(os.sep, "/"), *parts)


# -- object-store (S3) support -----------------------------------------

def s3_filesystem(url: str, options: dict | None = None):
    """pyarrow S3FileSystem for ``url`` (s3://bucket/prefix) from
    duckdb-shaped session settings (SET s3_endpoint / s3_access_key_id
    / ... — reference httpfs semantics) with AWS_* env fallback.
    Returns (fs, key_prefix)."""
    o = {k.lower(): v for k, v in (options or {}).items()}
    kwargs: dict = {"allow_bucket_creation": True,
                    "allow_bucket_deletion": True}
    endpoint = (o.get("s3_endpoint")
                or os.environ.get("AWS_ENDPOINT_URL")
                or os.environ.get("AWS_ENDPOINT_URL_S3"))
    if endpoint:
        if "://" not in endpoint:
            use_ssl = str(o.get("s3_use_ssl", "false")).lower() \
                in ("1", "true")
            endpoint = ("https://" if use_ssl else "http://") + endpoint
        kwargs["endpoint_override"] = endpoint
    ak = o.get("s3_access_key_id") or os.environ.get("AWS_ACCESS_KEY_ID")
    sk = (o.get("s3_secret_access_key")
          or os.environ.get("AWS_SECRET_ACCESS_KEY"))
    if ak:
        kwargs["access_key"] = ak
        kwargs["secret_key"] = sk or ""
    kwargs["region"] = o.get("s3_region") or os.environ.get(
        "AWS_REGION", "us-east-1")
    fs = pafs.S3FileSystem(**kwargs)
    prefix = url.split("://", 1)[1].rstrip("/")
    return fs, prefix


def mirror_root_for(url: str) -> str:
    """Shared local mirror directory for an object-store data path —
    every session attaching the same URL maps to the same mirror, so
    cross-session reads see each other's files immediately while the
    commit hooks sync the mirror to the store. This is the data plane
    used when the Spark runtime has no hadoop-aws jars (this test
    container); a production cluster reads s3a:// directly and never
    enters mirror mode."""
    import hashlib

    h = hashlib.sha1(url.rstrip("/").encode()).hexdigest()[:16]
    root = os.path.join(tempfile.gettempdir(), "dl_s3_mirror", h)
    os.makedirs(root, exist_ok=True)
    return root


def s3_boto_client(options: dict | None = None):
    """boto3 S3 client from duckdb-shaped settings / AWS env. Used for
    WRITES in mirror mode: arrow's multipart CompleteMultipartUpload
    trips over moto's testing server, while plain PutObject round-trips
    cleanly; arrow handles reads/listings."""
    import boto3

    o = {k.lower(): v for k, v in (options or {}).items()}
    endpoint = o.get("s3_endpoint") or os.environ.get("AWS_ENDPOINT_URL")
    if endpoint and "://" not in endpoint:
        use_ssl = str(o.get("s3_use_ssl", "false")).lower() in ("1", "true")
        endpoint = ("https://" if use_ssl else "http://") + endpoint
    return boto3.client(
        "s3", endpoint_url=endpoint or None,
        aws_access_key_id=(o.get("s3_access_key_id")
                           or os.environ.get("AWS_ACCESS_KEY_ID")),
        aws_secret_access_key=(o.get("s3_secret_access_key")
                               or os.environ.get("AWS_SECRET_ACCESS_KEY")),
        region_name=(o.get("s3_region")
                     or os.environ.get("AWS_DEFAULT_REGION", "us-east-1")))


def split_s3(path: str) -> tuple[str, str]:
    """'s3://bucket/key...' -> (bucket, key)."""
    rest = path.split("://", 1)[1]
    bucket, _, key = rest.partition("/")
    return bucket, key
