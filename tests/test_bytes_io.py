"""Byte-range / key-value source abstraction: the native readers must run
unchanged over an in-memory source — the proof that nothing in the format
logic assumes a local file, which is what makes an object-store reader a
drop-in (VERDICT round-3 ask #2)."""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from rca_data_tools_spark.sources.bytes_io import (
    LocalFileReader,
    MemoryReader,
    MemoryStore,
    as_reader,
    as_store,
)


def test_reader_semantics_and_pickle(tmp_path):
    data = bytes(range(256)) * 4
    p = tmp_path / "blob.bin"
    p.write_bytes(data)
    for rd in (MemoryReader(data), LocalFileReader(str(p))):
        assert rd.size() == len(data)
        assert rd.pread(0, 8) == data[:8]
        assert rd[10:20] == data[10:20]
        assert rd[3] == data[3]
        # past-EOF reads truncate like mmap/bytes slicing
        assert rd.pread(len(data) - 4, 100) == data[-4:]
        rt = pickle.loads(pickle.dumps(rd))
        assert rt.pread(5, 5) == data[5:10]
    nul = MemoryReader(b"abc\x00def")
    assert nul.find_nul(0) == 3
    assert nul.find_nul(4) == -1


def test_hdf5_from_memory_reader(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset
    from tests.test_hdf5 import write_h5

    path = str(tmp_path / "m.h5")
    arr = np.arange(40, dtype="<f8")
    write_h5(path, {"x": {"array": arr, "chunks": (16,), "filters": [("shuffle",), ("deflate", 6)]}})
    blob = open(path, "rb").read()
    h5 = H5File(MemoryReader(blob))
    assert "x" in h5.datasets
    np.testing.assert_array_equal(read_dataset(h5, "x"), arr)


def test_netcdf_scan_from_memory_reader(spark, tmp_path):
    from rca_data_tools_spark.sources.netcdf import netcdf_table
    from tests.test_netcdf import _write_classic

    path = str(tmp_path / "m.nc")
    time = np.arange(10, dtype=">f8")
    temp = np.linspace(3.0, 4.0, 10).astype(">f8")
    spectra = np.arange(30, dtype=">f4").reshape(10, 3)
    depth = np.array([5.0, 10.0, 15.0], dtype=">f4")
    _write_classic(path, time, temp, spectra, depth)
    blob = open(path, "rb").read()
    df = netcdf_table(spark, MemoryReader(blob), ["time", "temp"], records_per_task=4)
    rows = df.orderBy("idx").collect()
    np.testing.assert_allclose([r["temp"] for r in rows], temp.astype("f8"))


def test_netcdf4_scan_from_memory_reader(spark, tmp_path):
    from rca_data_tools_spark.sources.netcdf import netcdf_table
    from tests.test_hdf5 import write_h5

    path = str(tmp_path / "m4.nc")
    arr = np.linspace(0.0, 1.0, 24)
    write_h5(path, {"v": {"array": arr, "chunks": (8,), "filters": [("deflate", 4)]}})
    blob = open(path, "rb").read()
    df = netcdf_table(spark, MemoryReader(blob), ["v"], records_per_task=10)
    rows = df.orderBy("idx").collect()
    np.testing.assert_allclose([r["v"] for r in rows], arr)


def test_zarr_scan_from_memory_store(spark, tmp_path):
    from rca_data_tools_spark.sources.zarr import zarr_table
    from tests.test_zarr import _write_array

    root = str(tmp_path / "z.zarr")
    os.makedirs(root)
    vals = np.arange(12, dtype="<f8")
    _write_array(root, "v", vals, chunks=(5,), compressor={"id": "zlib", "level": 1})
    blobs = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            full = os.path.join(dirpath, fn)
            blobs[os.path.relpath(full, root)] = open(full, "rb").read()
    df = zarr_table(spark, MemoryStore(blobs), ["v"])
    rows = df.orderBy("idx").collect()
    np.testing.assert_allclose([r["v"] for r in rows], vals)


def test_coercions():
    rd = as_reader(b"xyz")
    assert isinstance(rd, MemoryReader) and rd.pread(1, 2) == b"yz"
    assert as_reader(rd) is rd
    st = as_store({"k": b"v"})
    assert isinstance(st, MemoryStore) and st.get("k") == b"v"
    assert as_store(st) is st
    with pytest.raises(KeyError):
        st.get("missing")


# --- HTTP range reader / store against a localhost server -------------------


class _RangeHandler:
    """Factory for a SimpleHTTPRequestHandler subclass rooted at a dir that
    honors Range requests (the object-store GET shape)."""

    @staticmethod
    def make(root: str):
        import http.server

        class H(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **kw):
                super().__init__(*a, directory=root, **kw)

            def log_message(self, *a):
                pass

            def do_GET(self):
                rng = self.headers.get("Range")
                path = self.translate_path(self.path)
                if rng is None or not os.path.isfile(path):
                    return super().do_GET()
                lo, hi = rng.split("=")[1].split("-")
                lo, hi = int(lo), int(hi)
                with open(path, "rb") as f:
                    f.seek(lo)
                    body = f.read(hi - lo + 1)
                total = os.path.getsize(path)
                self.send_response(206)
                self.send_header("Content-Range", f"bytes {lo}-{lo+len(body)-1}/{total}")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return H


def _serve(root: str):
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler.make(root))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_http_range_reader_semantics(tmp_path):
    from rca_data_tools_spark.sources.bytes_io import HttpRangeReader, as_reader

    data = bytes(range(256)) * 3
    (tmp_path / "blob.bin").write_bytes(data)
    srv, base = _serve(str(tmp_path))
    try:
        rd = as_reader(f"{base}/blob.bin")
        assert isinstance(rd, HttpRangeReader)
        assert rd.size() == len(data)
        assert rd.pread(0, 10) == data[:10]
        assert rd.pread(700, 100) == data[700:768]  # clipped at EOF
        assert rd[5] == data[5]
        rt = pickle.loads(pickle.dumps(rd))
        assert rt.pread(100, 8) == data[100:108]
    finally:
        srv.shutdown()


def test_netcdf4_scan_over_http(spark, tmp_path):
    """The native NetCDF-4/HDF5 scan end-to-end over HTTP ranged GETs —
    driver parses metadata remotely, executors fetch their chunk ranges."""
    from rca_data_tools_spark.sources.netcdf import netcdf_table
    from tests.test_hdf5 import write_h5

    arr = np.linspace(0.0, 2.0, 40)
    write_h5(str(tmp_path / "r.nc"), {"v": {"array": arr, "chunks": (16,), "filters": [("deflate", 5)]}})
    srv, base = _serve(str(tmp_path))
    try:
        df = netcdf_table(spark, f"{base}/r.nc", ["v"], records_per_task=16)
        got = [r["v"] for r in df.orderBy("idx").collect()]
        np.testing.assert_allclose(got, arr)
    finally:
        srv.shutdown()


def test_zarr_scan_over_http(spark, tmp_path):
    from rca_data_tools_spark.sources.bytes_io import HttpStore
    from rca_data_tools_spark.sources.zarr import zarr_table
    from tests.test_zarr import _write_array

    root = str(tmp_path / "h.zarr")
    os.makedirs(root)
    vals = np.arange(17, dtype="<f8") * 1.5
    _write_array(root, "v", vals, chunks=(6,), compressor={"id": "zlib", "level": 1})
    srv, base = _serve(str(tmp_path))
    try:
        store = HttpStore(f"{base}/h.zarr")
        assert store.exists("v/.zarray") and not store.exists("nope")
        got = [r["v"] for r in zarr_table(spark, f"{base}/h.zarr", ["v"]).orderBy("idx").collect()]
        np.testing.assert_allclose(got, vals)
    finally:
        srv.shutdown()


def test_http_block_cache_bounds_request_count(tmp_path):
    """The metadata parse of an HDF5 file issues hundreds of tiny reads;
    the 64 KiB block cache must collapse them into a handful of GETs."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset
    from rca_data_tools_spark.sources.bytes_io import HttpRangeReader
    from tests.test_hdf5 import write_h5

    arr = np.arange(200, dtype="<f8")
    write_h5(str(tmp_path / "c.h5"), {"x": {"array": arr, "chunks": (32,), "filters": [("deflate", 3)]}})

    import http.server
    import threading

    hits = []
    base_cls = _RangeHandler.make(str(tmp_path))

    class Counting(base_cls):
        def do_GET(self):
            hits.append(self.path)
            return super().do_GET()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Counting)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/c.h5"
        h5 = H5File(HttpRangeReader(url))
        np.testing.assert_array_equal(read_dataset(h5, "x"), arr)
        assert len(hits) <= 4, hits  # file < 64 KiB: everything from 1 block
    finally:
        srv.shutdown()


def test_http_store_exists_is_head_not_get(tmp_path):
    """exists() must probe with HEAD — a metadata probe that downloads the
    blob costs a full transfer per key at object-store scale. Servers that
    reject HEAD fall back to a single GET."""
    import http.server
    import threading

    from rca_data_tools_spark.sources.bytes_io import HttpStore

    (tmp_path / "blob").write_bytes(b"x" * 4096)
    methods = []
    base_cls = _RangeHandler.make(str(tmp_path))

    class Recording(base_cls):
        def do_GET(self):
            methods.append(("GET", self.path))
            return super().do_GET()

        def do_HEAD(self):
            methods.append(("HEAD", self.path))
            return super().do_HEAD()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Recording)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        store = HttpStore(f"http://127.0.0.1:{srv.server_address[1]}")
        assert store.exists("blob") and not store.exists("nope")
        assert methods == [("HEAD", "/blob"), ("HEAD", "/nope")]
    finally:
        srv.shutdown()

    # HEAD-rejecting server: one GET fallback, still correct
    methods.clear()

    class NoHead(Recording):
        def do_HEAD(self):
            methods.append(("HEAD", self.path))
            self.send_error(405)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), NoHead)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        store = HttpStore(f"http://127.0.0.1:{srv.server_address[1]}")
        assert store.exists("blob")
        assert methods == [("HEAD", "/blob"), ("GET", "/blob")]
    finally:
        srv.shutdown()


def test_http_reader_caches_full_body_when_range_ignored(tmp_path):
    """A server that ignores Range returns the whole file (status 200); the
    reader must keep that body so a block-cache-missing metadata parse costs
    ONE transfer, not one whole-file download per 64 KiB block."""
    import http.server
    import threading

    from rca_data_tools_spark.sources.bytes_io import HttpRangeReader

    data = bytes(range(256)) * 1200  # ~300 KiB: spans several cache blocks
    (tmp_path / "plain.bin").write_bytes(data)
    gets = []

    class Plain(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

        def do_GET(self):  # no Range support at all
            gets.append(self.path)
            return super().do_GET()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Plain)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rd = HttpRangeReader(f"http://127.0.0.1:{srv.server_address[1]}/plain.bin")
        for off in range(0, len(data), 70_000):  # hits 5 distinct blocks
            assert rd.pread(off, 16) == data[off : off + 16]
        assert rd.pread(100, 100_000) == data[100:100_100]  # bulk path too
        assert len(gets) == 1, gets
        assert rd.size() == len(data)
    finally:
        srv.shutdown()


class _FakeFS:
    """Duck-typed fsspec filesystem over an in-memory dict — picklable, so
    it ships to executors like a real fsspec filesystem instance does."""

    def __init__(self, blobs: dict[str, bytes]):
        self.blobs = dict(blobs)

    def cat_file(self, path, start=None, end=None):
        if path not in self.blobs:
            raise FileNotFoundError(path)
        b = self.blobs[path]
        return b[start or 0 : end if end is not None else len(b)]

    def exists(self, path):
        return path in self.blobs

    def size(self, path):
        if path not in self.blobs:
            raise FileNotFoundError(path)
        return len(self.blobs[path])


def test_fsspec_store_and_reader_with_ducktyped_fs(spark, tmp_path):
    """FsspecStore/FsspecRangeReader delegate to any fsspec-shaped object:
    a native Zarr scan runs end-to-end over one, with missing chunks as
    KeyError -> fill, and the reader serves ranged preads."""
    from rca_data_tools_spark.sources.bytes_io import FsspecRangeReader, FsspecStore
    from rca_data_tools_spark.sources.zarr import zarr_table
    from tests.test_zarr import _write_array

    # the duck-typed class lives in this test module: ship it to executors
    # (a real fsspec filesystem imports from the installed package instead)
    spark.sparkContext.addPyFile(os.path.abspath(__file__))

    root = str(tmp_path / "fs.zarr")
    os.makedirs(root)
    vals = np.arange(15, dtype="<f8") + 0.25
    _write_array(root, "v", vals, chunks=(6,), fill_value=-1.0)
    blobs = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            blobs["bucket/" + os.path.relpath(p, root).replace(os.sep, "/")] = open(p, "rb").read()
    del blobs["bucket/v/1"]  # unwritten chunk -> fill -> NULL
    store = FsspecStore("bucket/", fs=_FakeFS(blobs))
    assert store.exists("v/.zarray") and not store.exists("v/1")
    rows = {r["idx"]: r["v"] for r in zarr_table(spark, store, ["v"]).collect()}
    assert len(rows) == 15
    assert rows[2] == pytest.approx(2.25)
    assert all(rows[i] is None for i in range(6, 12))

    rd = FsspecRangeReader("bucket/blob", fs=_FakeFS({"bucket/blob": bytes(range(100))}),
                           path="bucket/blob")
    assert rd.size() == 100
    assert rd.pread(10, 5) == bytes(range(10, 15))
    assert rd.pread(95, 50) == bytes(range(95, 100))  # clipped at EOF
    rt = pickle.loads(pickle.dumps(rd))
    assert rt.pread(0, 3) == b"\x00\x01\x02"


def test_fsspec_absent_is_a_loud_capability_error():
    import importlib

    from rca_data_tools_spark.sources.bytes_io import as_reader, as_store

    if importlib.util.find_spec("fsspec") is not None:
        pytest.skip("fsspec installed: dispatch succeeds instead")
    with pytest.raises(NotImplementedError, match="fsspec"):
        as_store("s3://bucket/prefix")
    with pytest.raises(NotImplementedError, match="fsspec"):
        as_reader("gs://bucket/file.nc")


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("fsspec") is None,
    reason="fsspec not installed in this runtime",
)
def test_fsspec_memory_filesystem_end_to_end(spark, tmp_path):
    """With real fsspec installed, memory:// works through the same
    adapter — the exact wiring an s3:// deployment uses."""
    import fsspec

    from rca_data_tools_spark.sources.zarr import zarr_table
    from tests.test_zarr import _write_array

    root = str(tmp_path / "m.zarr")
    os.makedirs(root)
    vals = np.arange(9, dtype="<f8")
    _write_array(root, "v", vals, chunks=(4,))
    fs = fsspec.filesystem("memory")
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            with fs.open("zstore/" + os.path.relpath(p, root).replace(os.sep, "/"), "wb") as f:
                f.write(open(p, "rb").read())
    got = [r["v"] for r in zarr_table(spark, "memory://zstore", ["v"]).orderBy("idx").collect()]
    np.testing.assert_allclose(got, vals)


def test_http_query_string_reaches_the_server(tmp_path):
    """Presigned/versioned URLs: the pooled keep-alive path must send the
    URL's query string as part of the request target — a server that
    REQUIRES the token must see it on every ranged GET, store GET and HEAD
    (ADVICE r08: the pooled path used to strip it)."""
    import http.server
    import threading

    (tmp_path / "blob.bin").write_bytes(bytes(range(200)))
    seen = []

    class TokenHandler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

        def _gate(self) -> bool:
            seen.append(self.path)
            if "tok=secret" not in self.path:
                self.send_response(403)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return False
            self.path = self.path.split("?")[0]
            return True

        def do_GET(self):
            if not self._gate():
                return
            rng = self.headers.get("Range")
            path = self.translate_path(self.path)
            if rng is None or not os.path.isfile(path):
                return super().do_GET()
            lo, hi = rng.split("=")[1].split("-")
            lo, hi = int(lo), int(hi)
            with open(path, "rb") as f:
                f.seek(lo)
                body = f.read(hi - lo + 1)
            self.send_response(206)
            self.send_header(
                "Content-Range",
                f"bytes {lo}-{lo+len(body)-1}/{os.path.getsize(path)}",
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_HEAD(self):
            if self._gate():
                super().do_HEAD()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), TokenHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        from rca_data_tools_spark.sources.bytes_io import HttpRangeReader, HttpStore

        r = HttpRangeReader(f"{base}/blob.bin?tok=secret")
        assert r.size() == 200
        assert r.pread(10, 5) == bytes(range(10, 15))

        s = HttpStore(f"{base}?tok=secret")
        assert s.get("blob.bin")[:3] == b"\x00\x01\x02"
        assert s.exists("blob.bin") and not s.exists("nope.bin")
        # every request the server saw carried the token
        assert seen and all("tok=secret" in p for p in seen), seen
    finally:
        srv.shutdown()


from rca_data_tools_spark.sources.bytes_io import KeyValueStore as _KVS


class _ThreadedStore(_KVS):
    """Module-level (picklable) store with the threaded prefetch enabled."""

    PREFETCH_WORKERS = 4

    def __init__(self):
        self.blobs = {"a": b"1", "b": b"2"}

    def get(self, key):
        return self.blobs[key]

    def exists(self, key):
        return key in self.blobs


def test_prefetch_pool_does_not_break_pickling():
    """A KeyValueStore subclass that enables PREFETCH_WORKERS must stay
    picklable after its first get_many (the cached ThreadPoolExecutor is
    dropped by the base __getstate__ — ADVICE r08)."""
    import pickle

    t = _ThreadedStore()
    assert t.get_many(["a", "b", "missing"]) == {"a": b"1", "b": b"2", "missing": None}
    assert "_prefetch_pool" in t.__dict__  # the pool WAS cached
    clone = pickle.loads(pickle.dumps(t))  # and pickling still works
    assert clone.get_many(["b", "a"]) == {"b": b"2", "a": b"1"}
