"""Distributed classic-NetCDF (CDF) writer — the export face of the native
NetCDF scan.

The reference's data interchange format is NetCDF (its golden test data is
.nc, its users hand .nc files to xarray); this writer lets the engine EMIT
that format. Layout written is the classic spec (the same BNF
sources/netcdf.py parses): CDF-2 (64-bit offsets) normally, CDF-5 (64-bit
data) automatically when any column needs int64 — NC_INT64 does not exist
before CDF-5. All variables are FIXED (non-record) 1-D over a single ``row``
dimension, each contiguous at a driver-computed offset, so executors write
their row-slices with positional ``os.pwrite`` into the pre-sized file —
fully parallel, no record interleaving, no coordination beyond the header.

``path`` must be reachable by every executor (shared filesystem locally;
an object-store multipart adapter is the production mirror of the read
side's ByteRangeReader).
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

#: Spark SQL type -> (nc_type id, big-endian numpy dtype). Timestamps are
#: epoch-ns int64 (CF-style; declare units via attrs if desired).
_NC_TYPES = {
    "smallint": (3, ">i2"),
    "int": (4, ">i4"),
    "float": (5, ">f4"),
    "double": (6, ">f8"),
    "bigint": (10, ">i8"),
    "timestamp": (10, ">i8"),
    "timestamp_ntz": (10, ">i8"),
}
_CDF5_ONLY = {10, 11}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


class _HeaderWriter:
    def __init__(self, wide: bool):
        self.out = bytearray()
        self.wide = wide

    def u4(self, v: int) -> None:
        self.out += struct.pack(">I", v)

    def nn(self, v: int) -> None:
        self.out += struct.pack(">Q" if self.wide else ">I", v)

    def name(self, s: str) -> None:
        b = s.encode()
        self.nn(len(b))
        self.out += _pad4(b)


def write_cdf(
    df: DataFrame,
    path: str,
    idx_col: str,
    columns: list[str],
    rows_per_task: int = 65536,
    attrs: "dict[str, dict[str, float]] | None" = None,
) -> int:
    """Write ``columns`` of ``df`` as fixed 1-D variables of a classic
    NetCDF file sharing the ``row`` dimension. ``idx_col`` must hold a
    dense 0..n-1 index (storage order — same contract as the Zarr sink).
    Scalar numeric per-variable attributes (``attrs``) are emitted as f8,
    which is how the reader's CF vocabulary (_FillValue / scale_factor /
    add_offset / missing_value) comes back.

    Returns the row count. The file is immediately readable by
    sources/netcdf.netcdf_table (roundtrip-tested) and by any libnetcdf
    ≥ 4.4 (CDF-5) or any version at all when no int64 column forces CDF-5.
    """
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in [idx_col, *columns]:
        if c not in fields:
            raise ValueError(f"column {c!r} not in DataFrame")
    for c in columns:
        if fields[c] not in _NC_TYPES:
            raise NotImplementedError(
                f"CDF writer supports numeric/timestamp columns; {c!r} is "
                f"{fields[c]}"
            )
    n = df.count()
    if n == 0:
        raise ValueError("refusing to write an empty NetCDF file")

    types = {c: _NC_TYPES[fields[c]] for c in columns}
    wide = any(t[0] in _CDF5_ONLY for t in types.values())

    # ---- header ----
    h = _HeaderWriter(wide)
    h.out += b"CDF" + (b"\x05" if wide else b"\x02")
    h.nn(0)  # numrecs: no record dimension
    h.u4(_NC_DIMENSION)
    h.nn(1)
    h.name("row")
    h.nn(n)
    h.u4(0)  # global attrs: ABSENT
    h.nn(0)
    h.u4(_NC_VARIABLE)
    h.nn(len(columns))
    # first pass with placeholder begins to size the header, then rewrite
    def emit_vars(begins: dict) -> bytes:
        w = _HeaderWriter(wide)
        for c in columns:
            w.name(c)
            w.nn(1)      # ndims
            w.nn(0)      # dimid 0 = row
            var_attrs = (attrs or {}).get(c) or {}
            if var_attrs:
                w.u4(_NC_ATTRIBUTE)
                w.nn(len(var_attrs))
                for an, av in var_attrs.items():
                    w.name(an)
                    w.u4(6)  # NC_DOUBLE
                    w.nn(1)
                    w.out += struct.pack(">d", float(av))
            else:
                w.u4(0)
                w.nn(0)
            typ, dt = types[c]
            width = np.dtype(dt).itemsize
            vsize = -(-n * width // 4) * 4  # padded byte count
            w.u4(typ)
            w.nn(min(vsize, 2**32 - 4) if not wide else vsize)
            w.out += struct.pack(">Q", begins[c])  # offset64 in CDF-2 and CDF-5
        return bytes(w.out)

    placeholder = emit_vars({c: 0 for c in columns})
    header_len = len(h.out) + len(placeholder)
    begins, off = {}, header_len
    for c in columns:
        off = -(-off // 4) * 4  # 4-byte align each variable block
        begins[c] = off
        off += -(-n * np.dtype(types[c][1]).itemsize // 4) * 4
    body = emit_vars(begins)
    assert len(body) == len(placeholder)  # names/types fixed -> stable size
    with open(path, "wb") as f:
        f.write(bytes(h.out) + body)
        f.truncate(off)  # pre-size: executors pwrite into the zeroed tail

    # ---- parallel data write ----
    col_order = list(columns)
    col_dt = {c: types[c][1] for c in columns}
    col_spark = {c: fields[c] for c in columns}
    n_rows, rpt = n, rows_per_task

    def _write_slab(pdf):
        import pandas as pd

        sid = int(pdf["__sid"].iloc[0])
        lo = sid * rpt
        expect = min(rpt, n_rows - lo)
        if len(pdf) != expect:
            raise ValueError(
                f"slab {sid}: {len(pdf)} rows, expected {expect} — the index "
                "column must be a dense 0..n-1 sequence"
            )
        pdf = pdf.sort_values("__idx")
        idx = pdf["__idx"].to_numpy()
        if idx[0] != lo or idx[-1] != lo + expect - 1:
            raise ValueError(f"slab {sid}: index rows not dense in [{lo}, {lo+expect})")
        fd = os.open(path, os.O_WRONLY)
        try:
            for c in col_order:
                dt = np.dtype(col_dt[c])
                s = pdf[c]
                if col_spark[c].startswith("timestamp"):
                    vals = s.astype("datetime64[ns]").astype("int64").to_numpy()
                elif dt.kind == "f":
                    vals = s.to_numpy(dtype=f"<f{dt.itemsize}")
                else:
                    if s.isna().any():
                        raise ValueError(
                            f"column {c!r} has NULLs; integer NetCDF needs an "
                            "explicit _FillValue — fill beforehand and declare it"
                        )
                    vals = s.to_numpy(dtype=f"<i{dt.itemsize}")
                payload = np.ascontiguousarray(vals.astype(dt)).tobytes()
                from rca_data_tools_spark.sources.bytes_io import pwrite_all

                pwrite_all(fd, payload, begins[c] + lo * dt.itemsize)
        finally:
            os.close(fd)
        return pd.DataFrame({"sid": [sid], "rows": [expect]})

    staged = df.select(
        F.col(idx_col).cast("long").alias("__idx"),
        (F.col(idx_col).cast("long") / rpt).cast("long").alias("__sid"),
        *[F.col(c) for c in columns],
    )
    written = (
        staged.groupBy("__sid")
        .applyInPandas(_write_slab, "sid long, rows long")
        .agg(F.sum("rows").alias("n"))
        .collect()[0]["n"]
    )
    if written != n:
        raise ValueError(f"wrote {written} rows, expected {n}")
    return int(written)
