"""Native NetCDF scan (SURVEY §2.1 S2) — classic CDF-1/2/5 parsed from the
public format spec with numpy alone; NetCDF-4 (HDF5 container) served by the
native minimal HDF5 reader in sources/hdf5.py (superblock v0 / v1 headers /
deflate+shuffle chunked datasets; anything beyond raises loudly).

The reference opens .nc test inputs with xarray (tests/
test_plotProfilesScatter.py:13,25) and its stores follow the same model as
Zarr: a record (time) dimension plus per-variable arrays. The classic format
is a single binary file — big-endian header (dims, attrs, vars with data
offsets) followed by fixed-size data, record variables interleaved per
record — which makes a distributed scan straightforward: tasks seek straight
to their record range; no library, no driver-side array.

Scale shape mirrors sources/zarr.py: the driver parses ONLY the header (KBs),
record ranges become a chunk-index DataFrame, and an Arrow ``mapInPandas``
pass decodes ranges executor-side. One .nc file parallelizes over records;
a directory of per-deployment files parallelizes over files × ranges.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from rca_data_tools_spark.sources.bytes_io import as_reader

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_DTYPES = {
    1: np.dtype(">i1"),
    2: np.dtype("S1"),
    3: np.dtype(">i2"),
    4: np.dtype(">i4"),
    5: np.dtype(">f4"),
    6: np.dtype(">f8"),
    # CDF-5 (64-bit data) additions
    7: np.dtype(">u1"),
    8: np.dtype(">u2"),
    9: np.dtype(">u4"),
    10: np.dtype(">i8"),
    11: np.dtype(">u8"),
}


class _Parser:
    def __init__(self, buf: bytes, wide: bool = False):
        # ``wide``: CDF-5 ("64-bit data") — every NON_NEG in the BNF widens
        # to 8 bytes (counts, dim lengths, name lengths, ndims, dimids,
        # vsize); tags and nc_type stay 4 bytes, padding stays 4-byte.
        self.buf, self.pos, self.wide = buf, 0, wide

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def u4(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def nn(self) -> int:
        """One NON_NEG per the spec: 4 bytes classic, 8 bytes in CDF-5."""
        if self.wide:
            return struct.unpack(">Q", self.take(8))[0]
        return struct.unpack(">I", self.take(4))[0]

    def name(self) -> str:
        n = self.nn()
        s = self.take(n).decode()
        self.pos += (4 - n % 4) % 4  # names pad to 4-byte boundary
        return s

    def read_attrs(self) -> dict:
        """Attribute list → {name: value} for SCALAR NUMERIC attributes
        (the CF packing/missing-data vocabulary: _FillValue, missing_value,
        scale_factor, add_offset); strings and vector attributes are
        skipped — the scan has no use for them yet."""
        tag, count = self.u4(), self.nn()
        if tag not in (_NC_ATTRIBUTE, 0):
            raise ValueError("malformed attribute list")
        out: dict = {}
        for _ in range(count):
            name = self.name()
            typ, n = self.u4(), self.nn()
            dt = _DTYPES[typ]
            nbytes = n * dt.itemsize
            raw = self.take(nbytes)
            self.pos += (4 - nbytes % 4) % 4
            if n == 1 and dt.kind in "iuf":
                out[name] = float(np.frombuffer(raw, dtype=dt)[0])
        return out

    def skip_attrs(self) -> None:
        self.read_attrs()


def read_header(source) -> dict:
    """Parse a classic NetCDF header → dims, variables (shape, dtype, offset,
    record flag). CDF-1 (32-bit offsets) and CDF-2 (64-bit) supported;
    NetCDF-4 files raise toward the native HDF5 path. ``source`` is a path
    or any ByteRangeReader (sources/bytes_io.py) — the parser never assumes
    a local file."""
    rd = as_reader(source)
    head = rd.pread(0, 1 << 20)  # headers are small; 1 MB is generous
    path = getattr(rd, "path", "<byte-range source>")
    if head[:4] == b"\x89HDF":
        raise NotImplementedError(
            "NetCDF-4 is an HDF5 container — use netcdf4_table (native "
            "minimal HDF5 reader, sources/hdf5.py); netcdf_table also "
            "routes there automatically"
        )
    if head[:3] != b"CDF" or head[3] not in (1, 2, 5):
        raise ValueError(f"not a classic NetCDF file: {path!r}")
    offset64 = head[3] in (2, 5)
    wide = head[3] == 5  # CDF-5: 64-bit counts/sizes throughout
    p = _Parser(head, wide=wide)
    p.pos = 4
    numrecs = p.nn()
    dims: list[tuple[str, int]] = []
    tag, count = p.u4(), p.nn()
    if tag == _NC_DIMENSION:
        for _ in range(count):
            dims.append((p.name(), p.nn()))
    p.skip_attrs()
    variables: dict[str, dict] = {}
    tag, count = p.u4(), p.nn()
    if tag not in (_NC_VARIABLE, 0):
        raise ValueError("malformed variable list")
    rec_size = 0
    for _ in range(count):
        vname = p.name()
        ndims = p.nn()
        dimids = [p.nn() for _ in range(ndims)]
        attrs = p.read_attrs()
        typ, vsize = p.u4(), p.nn()
        begin = struct.unpack(">Q", p.take(8))[0] if offset64 else p.u4()
        shape = [dims[d][1] for d in dimids]
        is_record = bool(dimids) and dims[dimids[0]][1] == 0
        variables[vname] = {
            "dtype": _DTYPES[typ],
            "shape": shape,
            "begin": begin,
            "vsize": vsize,
            "record": is_record,
            "attrs": attrs,
        }
        if is_record:
            rec_size += vsize
    record_vars = [v for v, m in variables.items() if m["record"]]
    if len(record_vars) == 1:
        # Spec special case: with exactly one record variable the record slabs
        # are packed WITHOUT the per-variable 4-byte padding, so the stride is
        # the bare slab size, not the padded vsize.
        m = variables[record_vars[0]]
        inner = int(np.prod(m["shape"][1:], dtype=np.int64)) if len(m["shape"]) > 1 else 1
        rec_size = inner * m["dtype"].itemsize
    if numrecs == (0xFFFFFFFFFFFFFFFF if wide else 0xFFFFFFFF):
        # STREAMING sentinel: the writer did not know the record count. Derive
        # it from the file size and the record stride instead of producing an
        # absurd row count.
        if rec_size == 0:
            numrecs = 0
        else:
            first_begin = min(variables[v]["begin"] for v in record_vars)
            numrecs = max(0, (rd.size() - first_begin) // rec_size)
    return {"numrecs": numrecs, "dims": dims, "variables": variables, "rec_size": rec_size}


def _read_var_range(rd, header: dict, var: str, lo: int, hi: int) -> np.ndarray:
    """Values of ``var`` for record (or index) range [lo, hi), via positional
    reads on a ByteRangeReader (one ranged GET per slab on object stores)."""
    m = header["variables"][var]
    width = m["dtype"].itemsize
    inner = int(np.prod(m["shape"][1:], dtype=np.int64)) if len(m["shape"]) > 1 else 1
    if m["record"]:
        # record variables interleave: var's slab sits at begin + r*rec_size
        out = np.empty((hi - lo, inner), dtype=m["dtype"].newbyteorder("="))
        for i, r in enumerate(range(lo, hi)):
            raw = rd.pread(m["begin"] + r * header["rec_size"], inner * width)
            out[i] = np.frombuffer(raw, dtype=m["dtype"], count=inner)
        return out if len(m["shape"]) > 1 else out[:, 0]
    raw = rd.pread(m["begin"] + lo * inner * width, (hi - lo) * inner * width)
    arr = np.frombuffer(raw, dtype=m["dtype"])
    return arr.reshape(hi - lo, inner) if len(m["shape"]) > 1 else arr


def _apply_cf_packing(arr: np.ndarray, attrs: dict) -> np.ndarray:
    """CF packed-data conventions (CF-1.x §8.1, netCDF best practices) on a
    float64 array: declared ``_FillValue`` / ``missing_value`` match against
    the PACKED values and become NaN (Spark NULL), then
    ``unpacked = packed * scale_factor + add_offset``. Undeclared default
    fills are deliberately NOT guessed — masking spec-default sentinels a
    writer never promised would silently drop real data."""
    attrs = attrs or {}
    fill = attrs.get("_FillValue", attrs.get("missing_value"))
    if fill is not None and not np.isnan(fill):
        arr = np.where(arr == fill, np.nan, arr)
    scale, offset = attrs.get("scale_factor"), attrs.get("add_offset")
    if scale is not None or offset is not None:
        arr = arr * (1.0 if scale is None else scale) + (
            0.0 if offset is None else offset
        )
    return arr


def _cdf_keeps_int(meta: dict) -> bool:
    """Integer variable with no CF numeric semantics -> bigint column,
    values exact (mirror of zarr._keeps_int; int64 payloads such as
    epoch-ns times are not representable in float64 above 2^53)."""
    attrs = meta.get("attrs") or {}
    return meta["dtype"].kind in "iu" and not any(
        k in attrs for k in ("_FillValue", "missing_value", "scale_factor", "add_offset")
    )


def netcdf_table(
    spark: SparkSession,
    path: str,
    variables: list[str],
    records_per_task: int = 65536,
    index_name: str = "idx",
) -> DataFrame:
    """Scan classic-NetCDF variables sharing dim-0 into ``(idx, var1, ...)``;
    2-D (time, k) variables become array<double> columns, matching the
    engine's multi-dimensional parameter model (SURVEY §1.1). ``char``
    variables — the classic format's only text type, conventionally shaped
    (time, strlen) — become string columns: each row's bytes joined, decoded
    UTF-8 (bad bytes replaced, never raised mid-scan), trailing NUL/space
    padding stripped. NetCDF-4 files (HDF5 containers) route to
    :func:`netcdf4_table` automatically.

    ``path`` may be a local path or any picklable ByteRangeReader
    (sources/bytes_io.py) — executors deserialize it and issue positional
    reads, so an object-store reader plugs in without touching this scan."""
    rd = as_reader(path)
    if rd.pread(0, 4) == b"\x89HDF":
        return netcdf4_table(
            spark, rd, variables,
            records_per_task=records_per_task, index_name=index_name,
        )
    header = read_header(rd)
    metas = {v: header["variables"][v] for v in variables}
    n0 = {
        v: (header["numrecs"] if m["record"] else m["shape"][0])
        for v, m in metas.items()
    }
    n_rows = n0[variables[0]]
    for v, n in n0.items():
        if n != n_rows:
            raise ValueError(f"variable {v!r} has dim-0 length {n}, expected {n_rows}")
        if len(metas[v]["shape"]) > 2:
            raise ValueError(f"variable {v!r} is {len(metas[v]['shape'])}-D; supported: 1-D/2-D")

    n_chunks = max(1, -(-n_rows // records_per_task))
    chunk_index = spark.range(n_chunks).toDF("chunk_id")

    def _scan(batches):
        for pdf in batches:
            for chunk_id in pdf["chunk_id"]:
                lo = int(chunk_id) * records_per_task
                hi = min(lo + records_per_task, n_rows)
                out = {index_name: np.arange(lo, hi, dtype=np.int64)}
                for v in variables:
                    arr = _read_var_range(rd, header, v, lo, hi)
                    if metas[v]["dtype"].kind == "S":
                        raw = arr.reshape(hi - lo, -1)
                        joined = raw.view(f"S{raw.shape[1]}")[:, 0]
                        out[v] = (
                            pd.Series(joined)
                            .str.decode("utf-8", errors="replace")
                            .str.rstrip("\x00 ")
                        )
                    elif arr.ndim == 1 and _cdf_keeps_int(metas[v]):
                        out[v] = arr.astype(np.int64)
                    else:
                        arr = _apply_cf_packing(
                            arr.astype(np.float64), metas[v].get("attrs")
                        )
                        out[v] = list(arr) if arr.ndim == 2 else arr
                yield pd.DataFrame(out)

    def _field(v: str) -> str:
        if metas[v]["dtype"].kind == "S":
            return f"`{v}` string"
        if len(metas[v]["shape"]) == 1 and _cdf_keeps_int(metas[v]):
            return f"`{v}` bigint"
        return (
            f"`{v}` array<double>" if len(metas[v]["shape"]) == 2 else f"`{v}` double"
        )

    fields = [f"{index_name} long"] + [
        _field(v) for v in variables
    ]
    return chunk_index.mapInPandas(_scan, schema=", ".join(fields))


def h5_time_row_range(path, time_var: str, lo, hi, h5=None) -> tuple[int, int]:
    """[row_lo, row_hi) of rows with ``lo <= time < hi`` in a NetCDF-4 /
    HDF5 file's non-decreasing 1-D time variable — the native-format
    analogue of parquet date-partition pruning (and of the Zarr path's
    time_row_range; both delegate the boundary semantics to
    sources/timeslice.bisect_row_range). Driver cost is metadata-scale
    regardless of series length: a contiguous time variable bisects with
    O(log n) single-element preads; a chunked one bisects over its chunk
    map decoding only the O(log n_chunks) probe chunks. Pass a pre-parsed
    ``h5`` (H5File) to skip re-parsing the file's metadata."""
    from rca_data_tools_spark.sources.hdf5 import _UNDEF, H5File, decode_chunk
    from rca_data_tools_spark.sources.timeslice import bisect_row_range

    if h5 is None:
        h5 = H5File(as_reader(path))
    ds = h5.datasets[time_var]
    if len(ds.shape) != 1:
        raise ValueError(f"time variable {time_var!r} must be 1-D")
    # CF-packed time coordinate: bisect in PACKED space (the chunks hold
    # packed values) by transforming the physical bounds — mirror of the
    # Zarr path's time_row_range
    scale = ds.attrs.get("scale_factor")
    offset = ds.attrs.get("add_offset")
    if scale is not None or offset is not None:
        s = 1.0 if scale is None else float(scale)
        o = 0.0 if offset is None else float(offset)
        if s < 0:
            # A physically non-decreasing time axis stored with a negative
            # scale_factor is DECREASING in packed space; bisect_row_range
            # assumes non-decreasing input, so proceeding would silently
            # return a wrong row range — refuse loudly instead.
            raise NotImplementedError(
                f"time variable {time_var!r} has negative scale_factor {s}: "
                "the packed coordinate is decreasing and packed-space "
                "bisection would silently mis-slice; pass row_range instead"
            )
        lo, hi = (lo - o) / s, (hi - o) / s
    n = ds.shape[0]
    if n == 0:
        return 0, 0
    buf = ds.owner if ds.owner is not None else h5._buf

    if ds.layout == "chunked":
        chunks = sorted(ds.chunks, key=lambda c: c[0][0])
        c0 = ds.chunk_shape[0]
        cache: dict[int, np.ndarray] = {}

        def chunk(i: int) -> np.ndarray:
            if i not in cache:
                offs, addr, nbytes, mask = chunks[i]
                arr = decode_chunk(
                    buf[addr : addr + nbytes], ds.dtype, ds.chunk_shape,
                    ds.filters, mask,
                )
                cache[i] = arr[: min(c0, n - offs[0])]
            return cache[i]

        def base(i: int) -> int:
            return chunks[i][0][0]

        n_units = len(chunks)
    else:
        if ds.layout == "compact":
            whole = np.frombuffer(ds.compact, dtype=ds.dtype)
        elif ds.data_address == _UNDEF:
            whole = np.zeros(n, dtype=ds.dtype)
        else:
            whole = None
        isz = ds.dtype.itemsize

        def chunk(i: int) -> np.ndarray:  # one element per "unit"
            if whole is not None:
                return whole[i : i + 1]
            raw = buf[ds.data_address + i * isz : ds.data_address + (i + 1) * isz]
            return np.frombuffer(raw, dtype=ds.dtype)

        def base(i: int) -> int:
            return i

        n_units = n

    return bisect_row_range(chunk, base, n_units, n, lo, hi)


def netcdf4_table(
    spark: SparkSession,
    path: str,
    variables: list[str],
    records_per_task: int = 65536,
    index_name: str = "idx",
    row_range: "tuple[int, int] | None" = None,
    h5=None,
) -> DataFrame:
    """NetCDF-4 scan via the native minimal HDF5 reader (sources/hdf5.py):
    same ``(idx, var1, ...)`` contract as :func:`netcdf_table`, 2-D variables
    as array<double> columns. Pass a pre-parsed ``h5`` (H5File) to reuse
    metadata already walked (e.g. by h5_time_row_range) instead of
    re-parsing.

    Scale shape: the driver mmap-parses only HDF5 metadata (superblock,
    object headers, chunk B-trees — KBs); the dim-sized chunk map ships in
    the plan, and each task reopens the file and decodes exactly the chunks
    overlapping its row range (deflate/shuffle reversed executor-side).
    Contiguous variables are sliced by direct seek, like the classic path.
    Unsupported HDF5 features (superblock v2/v3, v2 headers, filters beyond
    deflate+shuffle) raise loudly at plan time, never silently mis-read.
    """
    from rca_data_tools_spark.sources.hdf5 import (
        _UNDEF,
        H5File,
        decode_chunk,
        read_vlen_strings,
    )

    if h5 is None:
        rd = as_reader(path)
        h5 = H5File(rd)
    else:
        rd = h5._buf
    display = getattr(rd, "path", "<byte-range source>")
    metas: dict[str, dict] = {}
    for v in variables:
        if v not in h5.datasets:
            raise KeyError(
                f"variable {v!r} not in {display!r} (has: {sorted(h5.datasets)})"
            )
        ds = h5.datasets[v]
        if len(ds.shape) > 2:
            raise ValueError(f"variable {v!r} is {len(ds.shape)}-D; supported: 1-D/2-D")
        if ds.layout == "chunked" and len(ds.shape) == 2:
            if ds.chunk_shape[1] < ds.shape[1]:
                raise ValueError(
                    f"variable {v!r} chunks its second dimension; expected one "
                    "chunk across it (the reference's wavelength/bin dims are small)"
                )
        # plain picklable metadata — never close over H5File (it holds a
        # mmap); readers themselves ARE picklable (reopen on deserialize),
        # so an external-linked variable ships its owning file's reader
        metas[v] = {
            "dtype": ds.dtype,
            "shape": ds.shape,
            "layout": ds.layout,
            "addr": ds.data_address,
            "compact": ds.compact,
            "chunk_shape": ds.chunk_shape,
            "chunks": ds.chunks,
            "filters": ds.filters,
            "rd": ds.owner,  # None -> the scanned file's own reader
            # CF missing-data + packing conventions (_FillValue /
            # missing_value -> SQL NULL on packed values, then
            # scale_factor/add_offset unpack) — same contract as the Zarr
            # scan's fill handling; applied in _apply_cf_packing
            "attrs": dict(ds.attrs),
        }
    n_rows = metas[variables[0]]["shape"][0]
    for v, m in metas.items():
        if m["shape"][0] != n_rows:
            raise ValueError(
                f"variable {v!r} has dim-0 length {m['shape'][0]}, expected {n_rows}"
            )

    # row_range pruning (pair with h5_time_row_range for time slices): the
    # plan holds only the overlapping row-block tasks, and since _rows
    # skips chunks outside its [lo, hi), no out-of-slice chunk is ever
    # fetched or decoded — native-format partition pruning
    row_lo, row_hi = row_range if row_range is not None else (0, n_rows)
    row_lo, row_hi = max(0, row_lo), min(n_rows, row_hi)
    blk_lo = row_lo // records_per_task
    blk_hi = -(-row_hi // records_per_task) if row_hi > row_lo else blk_lo
    chunk_index = spark.range(blk_lo, max(blk_lo, blk_hi)).toDF("chunk_id")

    def _rows(r, m: dict, lo: int, hi: int) -> np.ndarray:
        shape, dtype = m["shape"], m["dtype"]
        inner = int(shape[1]) if len(shape) == 2 else 1
        rowbytes = inner * dtype.itemsize
        if m["layout"] == "compact":
            arr = np.frombuffer(m["compact"], dtype=dtype).reshape(-1, inner)
            return arr[lo:hi]
        if m["layout"] == "contiguous":
            if m["addr"] == _UNDEF:  # never-allocated dataset reads as zeros
                return np.zeros((hi - lo, inner), dtype=dtype)
            raw = r.pread(m["addr"] + lo * rowbytes, (hi - lo) * rowbytes)
            return np.frombuffer(raw, dtype=dtype).reshape(hi - lo, inner)
        c0 = m["chunk_shape"][0]
        out = np.zeros((hi - lo, inner), dtype=dtype)
        for offs, addr, nbytes, mask in m["chunks"]:
            o0 = offs[0]
            if o0 >= hi or o0 + c0 <= lo:
                continue
            chunk = decode_chunk(
                r.pread(addr, nbytes), dtype, m["chunk_shape"], m["filters"], mask
            ).reshape(c0, -1)
            a, b = max(lo, o0), min(hi, min(o0 + c0, shape[0]))
            out[a - lo : b - lo] = chunk[a - o0 : b - o0, :inner]
        return out

    def _scan(batches):
        # rd deserializes per task (LocalFileReader reopens; a remote reader
        # would issue ranged GETs) — one pread per chunk/slab, no shared state
        heap_cache: dict = {}  # global-heap collections, shared per task
        for pdf in batches:
            for chunk_id in pdf["chunk_id"]:
                lo = max(int(chunk_id) * records_per_task, row_lo)
                hi = min(int(chunk_id) * records_per_task + records_per_task, n_rows, row_hi)
                out = {index_name: np.arange(lo, hi, dtype=np.int64)}
                for v in variables:
                    raw = _rows(metas[v]["rd"] or rd, metas[v], lo, hi)
                    if metas[v]["dtype"].kind == "V":  # vlen strings
                        out[v] = read_vlen_strings(
                            metas[v]["rd"] or rd, raw[:, 0], heap_cache
                        )
                        continue
                    if metas[v]["dtype"].kind == "S":
                        # NC_CHAR (2-D of S1) or fixed-length HDF5 strings
                        # (1-D of Sn): either way one string per row
                        if raw.dtype.itemsize == 1 and raw.shape[1] > 1:
                            raw = raw.view(f"S{raw.shape[1]}")
                        out[v] = (
                            pd.Series(raw[:, 0])
                            .str.decode("utf-8", errors="replace")
                            .str.rstrip("\x00 ")
                        )
                        continue
                    if len(metas[v]["shape"]) == 1 and _cdf_keeps_int(metas[v]):
                        out[v] = raw[:, 0].astype(np.int64)
                        continue
                    arr = _apply_cf_packing(
                        raw.astype(np.float64), metas[v]["attrs"]
                    )
                    out[v] = list(arr) if len(metas[v]["shape"]) == 2 else arr[:, 0]
                yield pd.DataFrame(out)

    def _field4(v: str) -> str:
        if metas[v]["dtype"].kind in "SV":
            return f"`{v}` string"
        if len(metas[v]["shape"]) == 1 and _cdf_keeps_int(metas[v]):
            return f"`{v}` bigint"
        return (
            f"`{v}` array<double>" if len(metas[v]["shape"]) == 2 else f"`{v}` double"
        )

    fields = [f"{index_name} long"] + [_field4(v) for v in variables]
    return chunk_index.mapInPandas(_scan, schema=", ".join(fields))


def netcdf_dataset_table(
    spark: SparkSession,
    paths: list[str] | str,
    variables: list[str],
    records_per_task: int = 65536,
    index_name: str = "idx",
    file_col: str = "file_id",
    time_var: "str | None" = None,
    time_range: "tuple | None" = None,
) -> DataFrame:
    """Scan a collection of NetCDF files (classic or NetCDF-4, mixed is
    fine) as one DataFrame with a ``file_id`` provenance column — the
    reference's per-deployment file layout (one .nc per deployment) read as
    a single table.

    Scale shape: each file contributes its own chunk-index plan (metadata
    parsed driver-side per file, KBs each), unioned lazily — tasks fan out
    over files x record-ranges, so a directory of a thousand deployments
    parallelizes like a partitioned table. Schema mismatches fail loudly at
    plan time via the per-file variable checks.

    ``time_var`` + ``time_range=(lo, hi)`` prune the collection: a file
    whose time slice is empty drops out of the plan entirely — a NetCDF-4
    file at O(log n) driver bisect probes, a classic file at two record
    preads (its first/last time values) — and a surviving NetCDF-4 file
    scans only its overlapping blocks (the file's metadata is parsed
    ONCE, shared between the bisect and the scan). Surviving classic
    files decode fully and filter on the time column (their record layout
    interleaves variables, so a row skip saves little decode). ``time_var``
    must be in ``variables`` when a range is given, so the classic-path
    filter and the returned columns agree."""
    import glob as _glob

    from pyspark.sql import functions as F

    from rca_data_tools_spark.sources.hdf5 import H5File

    if isinstance(paths, str):
        found = sorted(
            p for p in _glob.glob(os.path.join(paths, "*.nc"))
        ) or sorted(_glob.glob(paths))
        if not found:
            raise FileNotFoundError(f"no .nc files under {paths!r}")
        paths = found
    if time_range is not None and (time_var is None or time_var not in variables):
        raise ValueError("time_range needs time_var, listed in variables")
    parts = []
    typed_empty = None  # correctly-typed empty frame in case every file skips
    for i, p in enumerate(paths):
        rd = as_reader(p)
        is_h5 = rd.pread(0, 4) == b"\x89HDF"
        if is_h5:
            h5 = H5File(rd)  # parsed once: bisect and scan share it
            if time_range is not None:
                tvar, v0 = h5.datasets[time_var], h5.datasets[variables[0]]
                if tvar.shape[0] != v0.shape[0]:
                    raise ValueError(
                        f"{p!r}: time variable {time_var!r} has "
                        f"{tvar.shape[0]} rows, {variables[0]!r} has "
                        f"{v0.shape[0]} — bounds from a different axis"
                    )
                row_range = h5_time_row_range(p, time_var, *time_range, h5=h5)
                if row_range[0] == row_range[1]:
                    if typed_empty is None:
                        typed_empty = netcdf4_table(
                            spark, p, variables, index_name=index_name,
                            row_range=(0, 0), h5=h5,
                        )
                    continue  # whole file outside the slice: not in the plan
            else:
                row_range = None
            df = netcdf4_table(
                spark, p, variables,
                records_per_task=records_per_task, index_name=index_name,
                row_range=row_range, h5=h5,
            )
        else:
            if time_range is not None:
                header = read_header(rd)
                n = header["numrecs"] if header["variables"][time_var]["record"] else header["variables"][time_var]["shape"][0]
                if n == 0:
                    if typed_empty is None:
                        typed_empty = netcdf_table(
                            spark, p, variables, index_name=index_name
                        ).limit(0)
                    continue
                first = float(_read_var_range(rd, header, time_var, 0, 1)[0])
                last = float(_read_var_range(rd, header, time_var, n - 1, n)[0])
                if last < time_range[0] or first >= time_range[1]:
                    if typed_empty is None:
                        # limit(0) folds to an empty relation at plan time —
                        # schema preserved, zero tasks
                        typed_empty = netcdf_table(
                            spark, p, variables, index_name=index_name
                        ).limit(0)
                    continue  # two preads proved the file disjoint: skip it
            df = netcdf_table(
                spark, p, variables,
                records_per_task=records_per_task, index_name=index_name,
            )
            if time_range is not None:
                df = df.filter(
                    (F.col(time_var) >= time_range[0])
                    & (F.col(time_var) < time_range[1])
                )
        parts.append(df.select(F.lit(i).alias(file_col), "*"))
    if not parts:
        # every file was skipped: empty but typed EXACTLY like a non-empty
        # scan (incl. array<double> 2-D columns), from the first file's plan
        return typed_empty.select(F.lit(0).alias(file_col), "*")
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def netcdf_to_parquet(
    spark: SparkSession,
    path,
    variables: list[str],
    out_path: str,
    time_var: str | None = None,
    epoch: str = "1900-01-01",
    time_unit: str = "s",
    records_per_task: int = 65536,
    time_range: "tuple | None" = None,
) -> DataFrame:
    """Ingest conversion: one distributed pass from a NetCDF file (classic
    or NetCDF-4, local path / URL / ByteRangeReader) into the engine's
    canonical Parquet layout — the .nc twin of zarr_to_parquet, paying any
    slow native decode exactly once. ``time_var`` (a numeric
    offset-from-epoch coordinate; xarray's NetCDF default epoch is
    1900-01-01 seconds, unlike Zarr's 1970) is rebuilt into a ``ts``
    timestamp column so the output joins the engine's time machinery
    directly.

    Returns the re-read DataFrame (from Parquet, post-conversion).
    """
    from pyspark.sql import functions as F

    cols = list(variables)
    if time_var and time_var not in cols:
        cols.insert(0, time_var)
    if time_range is not None and not time_var:
        raise ValueError("time_range needs time_var")
    if time_range is not None and as_reader(path).pread(0, 4) == b"\x89HDF":
        # sliced NetCDF-4 ingest prunes to the overlapping blocks
        df = netcdf4_table(
            spark, path, cols, records_per_task=records_per_task,
            row_range=h5_time_row_range(path, time_var, *time_range),
        )
    else:
        df = netcdf_table(spark, path, cols, records_per_task=records_per_task)
        if time_range is not None:
            df = df.filter(
                (F.col(time_var) >= time_range[0])
                & (F.col(time_var) < time_range[1])
            )
    if time_var:
        unit_us = {"s": 1_000_000, "ms": 1_000, "us": 1}[time_unit]
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                (F.col(time_var) * F.lit(unit_us)).cast("long")
                + F.unix_micros(F.lit(epoch).cast("timestamp"))
            ),
        )
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
