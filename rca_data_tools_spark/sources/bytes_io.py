"""Byte-range reader / key-value store abstractions for the native scans.

The reference reads its archives straight from object storage (consolidated
Zarr on S3 via fsspec mappers — rca_data_tools/qaqc/dashboard.py:305-313);
the engine's native readers (sources/zarr.py, sources/hdf5.py,
sources/netcdf.py) were written against local files. This module factors the
file access they share behind two tiny interfaces so the SAME metadata
parsers and chunk decoders serve any byte source:

- :class:`ByteRangeReader` — positional reads over one binary file
  (HDF5/NetCDF): ``pread(offset, size)`` + ``size()``. Exactly the shape of
  an object-store ranged GET, which is why the native readers can become
  object-store capable without touching their format logic.
- :class:`KeyValueStore` — keyed blob access for directory-shaped formats
  (Zarr: one blob per chunk/metadata key).

Implementations here: local-file (mmap-backed, lazily opened, picklable —
executors reopen after deserialization), in-memory (tests, and the proof
that the readers never assume a real file), HTTP ranged-GET
(:class:`HttpRangeReader` / :class:`HttpStore`, stdlib urllib, block-cached),
and fsspec delegates (:class:`FsspecRangeReader` / :class:`FsspecStore`) that
make the same scans object-store capable (s3://, gs://, abfs://) wherever
fsspec + the protocol driver are installed — probed at call time, loud
ImportError here where they are not.

Scale notes: drivers parse metadata through a reader (KBs of tiny reads —
mmap makes those page-cache hits); executors deserialize the picklable
reader and issue one ``pread`` per chunk, which maps 1:1 onto ranged GETs at
deployment. Nothing in the interface assumes seekability-with-state, so
concurrent tasks share nothing.
"""

from __future__ import annotations

import mmap
import os


def pwrite_all(fd: int, payload: bytes, offset: int) -> None:
    """``os.pwrite`` until every byte lands. POSIX permits short writes
    (NFS, interrupted syscalls); ignoring the return value would leave a
    silently zeroed hole in a pre-sized sink file. Raises on zero-progress
    writes instead of spinning."""
    view = memoryview(payload)
    while view:
        n = os.pwrite(fd, view, offset)
        if n <= 0:
            raise OSError(f"pwrite returned {n} at offset {offset}")
        view = view[n:]
        offset += n


class ByteRangeReader:
    """Positional binary reads. Subclasses implement :meth:`pread` and
    :meth:`size`; instances must be picklable (executors reopen them)."""

    def pread(self, offset: int, size: int) -> bytes:
        raise NotImplementedError

    def size(self) -> int:
        raise NotImplementedError

    # convenience: buf[a:b] slicing and buf[i] int indexing — the idioms the
    # format parsers use, so a reader drops in where an mmap/bytes buffer was
    def __getitem__(self, sl):
        if isinstance(sl, int):
            b = self.pread(sl, 1)
            if not b:
                raise IndexError(f"byte offset {sl} out of range")
            return b[0]
        start = sl.start or 0
        stop = self.size() if sl.stop is None else sl.stop
        return self.pread(start, max(0, stop - start))

    def find_nul(self, start: int, max_scan: int = 1 << 16) -> int:
        """Offset of the first NUL byte at/after ``start`` (string tables)."""
        pos = start
        end = min(self.size(), start + max_scan)
        while pos < end:
            block = self.pread(pos, min(4096, end - pos))
            if not block:
                break
            hit = block.find(b"\x00")
            if hit >= 0:
                return pos + hit
            pos += len(block)
        return -1

    def close(self) -> None:
        pass


class LocalFileReader(ByteRangeReader):
    """mmap-backed local file. Lazily opened; pickles as just the path, so
    shipping it inside a Spark plan is free and each task reopens its own
    handle (no shared file-descriptor state across tasks)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = None
        self._buf = None

    def _ensure(self):
        if self._buf is None:
            self._fh = open(self.path, "rb")
            self._buf = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        return self._buf

    def pread(self, offset: int, size: int) -> bytes:
        return self._ensure()[offset : offset + size]

    def size(self) -> int:
        return os.path.getsize(self.path)

    def close(self) -> None:
        if self._buf is not None:
            self._buf.close()
            self._fh.close()
            self._buf = self._fh = None

    def __getstate__(self):
        return {"path": self.path}

    def __setstate__(self, state):
        self.path = state["path"]
        self._fh = None
        self._buf = None


class MemoryReader(ByteRangeReader):
    """In-memory bytes — tests, and the stand-in for any remote range
    source (the contract is identical: hand back an arbitrary range)."""

    def __init__(self, data: bytes):
        self.data = bytes(data)

    def pread(self, offset: int, size: int) -> bytes:
        return self.data[offset : offset + size]

    def size(self) -> int:
        return len(self.data)


class HttpRangeReader(ByteRangeReader):
    """Ranged-GET reader over HTTP(S) — the object-store access shape, with
    stdlib urllib only. Each ``pread`` issues one ``Range: bytes=a-b``
    request; servers that ignore Range (status 200) are handled by slicing
    the full body, with the size cached so repeated metadata reads don't
    re-HEAD. Picklable (plain attributes), so executors deserialize it and
    fetch their own chunk ranges — exactly the S3/HTTP deployment pattern
    the reference's fsspec mappers use (qaqc/dashboard.py:305-313).

    Metadata parses issue MANY tiny reads (HDF5 headers are walked byte by
    byte), so reads are served through a cache of 64 KiB-aligned blocks —
    one GET warms a whole block, and a full metadata parse costs a handful
    of requests instead of hundreds. The cache is bounded (LRU over
    ``max_cached_blocks``) and drops on pickling, so shipping the reader to
    executors is cheap and each task warms its own locality.

    For authenticated object stores, subclass and add headers in
    :meth:`_request` — the format readers need nothing else."""

    BLOCK = 64 * 1024

    def __init__(self, url: str, timeout: float = 30.0, max_cached_blocks: int = 64):
        self.url = url
        self.timeout = timeout
        self.max_cached_blocks = max_cached_blocks
        self._size = None
        self._blocks: "dict[int, bytes]" = {}
        self._full: "bytes | None" = None  # set iff the server ignores Range

    def _request(self, headers: dict, method: str = "GET"):
        # urllib FALLBACK path (redirects, odd statuses) and the documented
        # subclass extension point for auth headers — extra_headers() feeds
        # the pooled fast path, this feeds the fallback.
        import urllib.request

        req = urllib.request.Request(
            self.url, headers={**self.extra_headers(), **headers}, method=method
        )
        return urllib.request.urlopen(req, timeout=self.timeout)

    def extra_headers(self) -> dict:
        """Subclass hook: headers added to every request (auth tokens)."""
        return {}

    def _exchange(self, headers: dict, method: str = "GET"):
        """One pooled keep-alive exchange (same NODELAY pool as HttpStore —
        HDF5 metadata walks issue MANY small ranged GETs, exactly the shape
        the Nagle/delayed-ACK stall punished at ~40 ms each); non-2xx falls
        back to urllib which knows redirects."""
        from urllib.parse import urlparse

        p = urlparse(self.url)
        # the request target keeps the query string: presigned/versioned
        # URLs (?X-Amz-Signature=, ?versionId=) name a DIFFERENT resource
        # without it, and a server answering 2xx for the bare path would
        # have us silently read the wrong bytes (ADVICE r08)
        target = (p.path or "/") + (f"?{p.query}" if p.query else "")
        status, hdrs, body = _pooled_request(
            p.scheme, p.netloc, method,
            target, {**self.extra_headers(), **headers}, self.timeout,
        )
        if 200 <= status < 300:
            return status, hdrs, body
        with self._request(headers, method=method) as r:
            return r.status, r.headers, r.read()

    def size(self) -> int:
        if self._size is None:
            _status, hdrs, _body = self._exchange({}, method="HEAD")
            length = hdrs.get("Content-Length")
            if length is None:
                raise ValueError(f"no Content-Length from {self.url!r}")
            self._size = int(length)
        return self._size

    def _fetch(self, offset: int, size: int) -> bytes:
        if self._full is not None:
            return self._full[offset : offset + size]
        status, _hdrs, body = self._exchange(
            {"Range": f"bytes={offset}-{offset + size - 1}"}
        )
        if status == 206:
            return body[:size]
        # Server ignored Range and sent the whole file: keep it, so a
        # metadata parse (hundreds of tiny preads) costs ONE transfer
        # instead of O(file_size x blocks). Dropped on pickling like the
        # block cache.
        self._size = len(body)
        self._full = body
        return body[offset : offset + size]

    def pread(self, offset: int, size: int) -> bytes:
        if size <= 0:
            return b""
        if self._full is not None:
            return self._full[offset : offset + size]
        if size >= self.BLOCK:
            return self._fetch(offset, size)  # bulk chunk reads bypass cache
        first = offset // self.BLOCK
        last = (offset + size - 1) // self.BLOCK
        parts = []
        for bi in range(first, last + 1):
            blk = self._blocks.pop(bi, None)
            if blk is None:
                blk = self._fetch(bi * self.BLOCK, self.BLOCK)
                while len(self._blocks) >= self.max_cached_blocks:
                    self._blocks.pop(next(iter(self._blocks)))
            self._blocks[bi] = blk  # re-insert = move to MRU position
            lo = max(0, offset - bi * self.BLOCK)
            hi = min(len(blk), offset + size - bi * self.BLOCK)
            parts.append(blk[lo:hi])
        return b"".join(parts)

    def __getstate__(self):
        return {
            "url": self.url,
            "timeout": self.timeout,
            "max_cached_blocks": self.max_cached_blocks,
            "_size": self._size,
        }

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._blocks = {}
        self._full = None


def as_reader(source: "str | bytes | ByteRangeReader") -> ByteRangeReader:
    """Coerce a path / URL / raw bytes / reader into a ByteRangeReader."""
    if isinstance(source, ByteRangeReader):
        return source
    if isinstance(source, (bytes, bytearray)):
        return MemoryReader(bytes(source))
    if isinstance(source, str) and source.startswith(("http://", "https://")):
        return HttpRangeReader(source)
    if isinstance(source, str) and source.startswith(_FSSPEC_SCHEMES):
        return FsspecRangeReader(source)
    return LocalFileReader(source)


class KeyValueStore:
    """Keyed blob access for directory-shaped stores (Zarr). Instances must
    be picklable; ``get`` raising KeyError/FileNotFoundError marks a missing
    key (Zarr: an absent chunk means all-fill-value)."""

    #: Remote stores overlap their per-key round trips; local ones gain
    #: nothing from threads (page cache) and keep the serial loop.
    PREFETCH_WORKERS = 0

    def get(self, key: str) -> bytes:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def __getstate__(self):
        # the cached prefetch executor is connection-like state: drop it on
        # pickling for EVERY subclass (a subclass enabling PREFETCH_WORKERS
        # without its own __getstate__ must not become unpicklable after
        # its first get_many — ADVICE r08); threads rebuild lazily
        return {k: v for k, v in self.__dict__.items() if k != "_prefetch_pool"}

    def get_many(self, keys: "list[str]") -> "dict[str, bytes | None]":
        """Fetch several blobs; missing keys map to None. Remote stores
        (PREFETCH_WORKERS > 0) fan the round trips out over a small thread
        pool — a task scanning K chunks of V variables otherwise pays
        K*V sequential latencies, which dominated the r07 native-scan
        bench. Local stores keep the serial loop (no latency to hide)."""

        def _one(k: str):
            try:
                return self.get(k)
            except (KeyError, FileNotFoundError):
                return None

        if self.PREFETCH_WORKERS > 1 and len(keys) > 1:
            # the executor is cached on the instance (and dropped on
            # pickling, like connections): its threads persist across
            # calls, so per-thread keep-alive connections persist too
            pool = self.__dict__.get("_prefetch_pool")
            if pool is None:
                from concurrent.futures import ThreadPoolExecutor

                pool = ThreadPoolExecutor(self.PREFETCH_WORKERS)
                self.__dict__["_prefetch_pool"] = pool
            return dict(zip(keys, pool.map(_one, keys)))
        return {k: _one(k) for k in keys}


class LocalDirStore(KeyValueStore):
    """A directory tree as a store: key 'var/0.0' -> root/var/0.0."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/"))

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))


class MemoryStore(KeyValueStore):
    """Dict-backed store — tests and remote-store stand-in."""

    def __init__(self, blobs: dict[str, bytes]):
        self.blobs = dict(blobs)

    def get(self, key: str) -> bytes:
        return self.blobs[key]

    def exists(self, key: str) -> bool:
        return key in self.blobs


import threading as _threading

_HTTP_TL = _threading.local()  # per-worker-thread keep-alive connections


def _nodelay(conn):
    import socket

    conn.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)


class _NoDelayHTTPConnection(__import__("http.client", fromlist=["x"]).HTTPConnection):
    """TCP_NODELAY keep-alive connection: on a reused socket, Nagle +
    delayed-ACK turn every small-header/body exchange into a ~40 ms stall
    (measured 44 ms/GET on the native-scan bench, 2 ms without). Every real
    HTTP client (curl, requests/urllib3, JVM) disables Nagle for exactly
    this reason."""

    def connect(self):
        super().connect()
        _nodelay(self)


class _NoDelayHTTPSConnection(__import__("http.client", fromlist=["x"]).HTTPSConnection):
    def connect(self):
        super().connect()
        _nodelay(self)


def _pooled_request(scheme, netloc, method, path, headers, timeout):
    """(status, headers, body) over the per-thread keep-alive pool. One
    retry on a fresh connection for stale-socket failures (a server that
    idled out a kept-alive connection between tasks); servers answering
    HTTP/1.0 or Connection: close degrade to connection-per-request.

    The pool is PROCESS-level keyed by (scheme, netloc) and thread, never
    per-reader/store instance: every query pickles fresh instances, so
    instance-scoped pooling would open (and leak until GC) a connection
    per worker per query — measured as an alternating ~2x swing on the
    native-scan bench as abandoned sockets piled up server-side."""
    import http.client

    conns = getattr(_HTTP_TL, "conns", None)
    if conns is None:
        conns = _HTTP_TL.conns = {}
    key = (scheme, netloc)

    def _drop(conn):
        conns.pop(key, None)
        try:
            conn.close()
        except Exception:
            pass

    for attempt in (0, 1):
        conn = conns.get(key)
        if conn is None:
            cls = (
                _NoDelayHTTPSConnection if scheme == "https" else _NoDelayHTTPConnection
            )
            conn = conns[key] = cls(netloc, timeout=timeout)
        try:
            conn.request(method, path, headers=headers or {})
            r = conn.getresponse()
            body = r.read()
        except (http.client.HTTPException, OSError):
            _drop(conn)
            if attempt:
                raise
            continue
        if r.will_close:
            _drop(conn)
        return r.status, r.headers, body



class HttpStore(KeyValueStore):
    """Keyed blobs over HTTP(S): key 'var/0.0' -> GET base_url/var/0.0 —
    the consolidated-Zarr-over-object-store access pattern. Missing keys
    (404) raise KeyError; picklable like the rest.

    GETs ride a per-thread KEEP-ALIVE connection (http.client), because a
    chunked scan issues one GET per chunk and the TCP+HTTP setup of a fresh
    connection per blob dominated the native-scan bench (r07: the HTTP
    path cost ~3x the same scan over a local dir; object stores serve
    thousands of GETs per connection for exactly this reason). A server
    that answers HTTP/1.0 or Connection: close degrades gracefully to
    one-connection-per-request; stale pooled connections retry once on a
    fresh connection. Redirects and other urllib niceties stay on the
    urllib fallback path (exists/HEAD, non-2xx handling)."""

    #: Serial by default, MEASURED: with 32 executor-side Python workers a
    #: per-worker thread pool multiplies concurrent connections 4x and the
    #: sf1 native-scan bench REGRESSED 0.85s -> 3.2s against the (GIL-bound)
    #: localhost server — the cluster's parallelism already saturates one
    #: endpoint, and keep-alive serial GETs per worker won. Against a real
    #: horizontally-scaled object store, raise per deployment measurement.
    PREFETCH_WORKERS = 0

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._init_pool()

    def _init_pool(self):
        from urllib.parse import urlparse

        p = urlparse(self.base_url)
        self._scheme, self._netloc = p.scheme, p.netloc
        # a base URL carrying a query string (?token=... auth) keeps it: it
        # is appended AFTER the key on every request — dropping it would
        # fetch the bare path (wrong resource / 403) for presigned bases
        self._basepath = p.path.rstrip("/")
        self._basequery = p.query

    def _target(self, key: str) -> str:
        from urllib.parse import quote

        t = f"{self._basepath}/{quote(key)}"
        return f"{t}?{self._basequery}" if self._basequery else t

    def __getstate__(self):
        return {"base_url": self.base_url, "timeout": self.timeout}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._init_pool()

    def _open(self, key: str, method: str = "GET"):
        import urllib.request

        # built from components so a base query string lands AFTER the key
        # (the pooled path's _target does the same)
        req = urllib.request.Request(
            f"{self._scheme}://{self._netloc}{self._target(key)}", method=method
        )
        return urllib.request.urlopen(req, timeout=self.timeout)

    def get(self, key: str) -> bytes:
        from urllib.parse import quote

        status, _hdrs, body = _pooled_request(
            self._scheme, self._netloc, "GET",
            self._target(key), None, self.timeout,
        )
        if status == 404:
            raise KeyError(key)
        if 200 <= status < 300:
            return body
        # redirects and auth dances go through urllib, which knows how to
        # follow/raise them properly
        import urllib.error

        try:
            with self._open(key) as u:
                return u.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise KeyError(key) from None
            raise

    def exists(self, key: str) -> bool:
        """HEAD, not GET — a metadata probe must not download the blob.
        Rides the keep-alive pool like get(); a HEAD rejected with anything
        but 404 (405/501 method-not-allowed, but also 403 from GET-only
        presigned URLs) falls back to one urllib GET, so no store that can
        serve get() ever fails exists()."""
        import urllib.error
        from urllib.parse import quote

        status, _hdrs, _body = _pooled_request(
            self._scheme, self._netloc, "HEAD",
            self._target(key), None, self.timeout,
        )
        if status == 404:
            return False
        if 200 <= status < 300:
            return True
        try:
            with self._open(key):
                return True
        except urllib.error.HTTPError as e2:
            if e2.code == 404:
                return False
            raise


_FSSPEC_SCHEMES = ("s3://", "gs://", "az://", "abfs://", "memory://", "ftp://")


def _fsspec_fs(url: str):
    """(filesystem, path) for an object-store URL via fsspec — optional
    dependency, probed at call time so executors probe their own runtime."""
    try:
        import fsspec
    except ImportError:
        raise NotImplementedError(
            f"reading {url!r} requires fsspec (pip install fsspec[s3|gcs|...]); "
            "not installed in this runtime"
        ) from None
    return fsspec.core.url_to_fs(url)


class FsspecStore(KeyValueStore):
    """KeyValueStore over any fsspec filesystem (or a duck-typed object with
    ``cat_file``/``exists``) — makes the native Zarr and NetCDF-4 scans
    object-store capable (s3://, gs://, az://, ...) with ZERO reader
    changes: executors deserialize the store (fsspec filesystems pickle by
    their connection parameters) and fetch their own chunk keys."""

    def __init__(self, root: str, fs=None):
        if fs is None:
            fs, root = _fsspec_fs(root)
        self.fs = fs
        self.root = root.rstrip("/")

    def get(self, key: str) -> bytes:
        try:
            return bytes(self.fs.cat_file(f"{self.root}/{key}"))
        except FileNotFoundError:
            raise KeyError(key) from None

    def exists(self, key: str) -> bool:
        return bool(self.fs.exists(f"{self.root}/{key}"))


class FsspecRangeReader(ByteRangeReader):
    """ByteRangeReader over an fsspec filesystem: each ``pread`` is one
    ``cat_file(start, end)`` ranged read — the object-store GET shape the
    HDF5/NetCDF parsers already assume. Same optional-dependency contract
    as FsspecStore."""

    def __init__(self, url: str, fs=None, path: str | None = None):
        if fs is None:
            fs, path = _fsspec_fs(url)
        self.fs = fs
        self.path = path if path is not None else url
        self._size: "int | None" = None

    def size(self) -> int:
        if self._size is None:
            self._size = int(self.fs.size(self.path))
        return self._size

    def pread(self, offset: int, size: int) -> bytes:
        if size <= 0:
            return b""
        return bytes(self.fs.cat_file(self.path, start=offset, end=offset + size))


def as_store(source: "str | dict | KeyValueStore") -> KeyValueStore:
    """Coerce a directory path / base URL / dict / store into a
    KeyValueStore."""
    if isinstance(source, KeyValueStore):
        return source
    if isinstance(source, dict):
        return MemoryStore(source)
    if isinstance(source, str) and source.startswith(("http://", "https://")):
        return HttpStore(source)
    if isinstance(source, str) and source.startswith(_FSSPEC_SCHEMES):
        return FsspecStore(source)
    return LocalDirStore(source)
