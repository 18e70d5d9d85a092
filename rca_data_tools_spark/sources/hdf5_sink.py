"""Distributed HDF5 writer — the write face of the native HDF5/NetCDF-4 scan.

The reference's interchange formats are NetCDF files; classic CDF is covered
by netcdf_sink.write_cdf, and this module emits the OTHER family: an HDF5
file (the container under every NetCDF-4 file), in the earliest on-disk
format — superblock version 0, v1 object headers, an old-style root group
(local heap + v1 group B-tree + SNOD symbol nodes), one 1-D CONTIGUOUS
little-endian dataset per column. That is exactly the subset
sources/hdf5.py parses first (and the subset its golden libhdf5 files
exercise), so the written file round-trips through the engine's own scan;
the layout follows the public HDF5 File Format Specification (IV.A v1
object headers, III.A local heaps, III.B v1 B-trees, III.C symbol nodes).

Scale shape — identical to the CDF writer: every dataset is contiguous at a
driver-computed offset, so the driver writes the metadata template once
(KBs) and pre-sizes the file; executors then ``os.pwrite`` their row-slices
at ``data_addr + row * itemsize`` — fully parallel, no record interleaving,
the only shuffle the groupBy on slab id. ``path`` must be reachable by
every executor (shared filesystem locally; an object-store multipart
adapter is the production mirror of the read side's ByteRangeReader).
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNDEF = 0xFFFFFFFFFFFFFFFF

#: Spark SQL type -> little-endian numpy dtype. Timestamps are epoch-ns
#: int64 (the convention the reader's CF handling and time pruning share).
_H5_TYPES = {
    "smallint": "<i2",
    "int": "<i4",
    "bigint": "<i8",
    "float": "<f4",
    "double": "<f8",
    "timestamp": "<i8",
    "timestamp_ntz": "<i8",
}

_LEAF_K = 4       # superblock group-leaf K: a SNOD holds at most 2K entries
_INTERNAL_K = 16  # group-internal K: a B-tree node is sized for 2K children


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _dt_message(dt: np.dtype) -> bytes:
    """Datatype message (class 0 fixed-point / class 1 IEEE float), v1
    encoding with the standard property blocks libhdf5 writes."""
    size = dt.itemsize
    if dt.kind == "f":
        # byte0: version 1, class 1; bits0: LE order, implied-msb mantissa
        # norm (bits 4-5 = 10b); bits1: sign-bit location
        head = struct.pack(
            "<BBBBI", (1 << 4) | 1, 0x20, size * 8 - 1, 0x00, size
        )
        if size == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        elif size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:  # pragma: no cover - gated by _H5_TYPES
            raise NotImplementedError(f"HDF5 float size {size}")
        return head + props
    # fixed-point: byte0: version 1, class 0; bits0: LE, signed (bit 3)
    head = struct.pack("<BBBBI", (1 << 4) | 0, 0x08, 0x00, 0x00, size)
    return head + struct.pack("<HH", 0, size * 8)  # bit offset, precision


def _dataspace_message(n: int) -> bytes:
    # version 1, rank 1, no max-dims flag, 5 reserved bytes, one 8-byte dim
    return struct.pack("<BBB5x", 1, 1, 0) + struct.pack("<Q", n)


def _attr_message(name: str, value: float) -> bytes:
    """Scalar float64 attribute, v1 encoding (name/datatype/dataspace parts
    each padded to 8 — the framing _parse_attribute reverses)."""
    nameb = name.encode() + b"\x00"
    dt = _dt_message(np.dtype("<f8"))
    sp = struct.pack("<BBB5x", 1, 0, 0)  # rank-0 scalar dataspace
    head = struct.pack("<BBHHH", 1, 0, len(nameb), len(dt), len(sp))
    return head + _pad8(nameb) + _pad8(dt) + _pad8(sp) + struct.pack("<d", value)


def _ohdr_v1(messages: list[tuple[int, bytes]]) -> bytes:
    """A version-1 object header: 16-byte prefix + 8-byte-aligned messages."""
    body = bytearray()
    for mtype, data in messages:
        data = _pad8(data)
        body += struct.pack("<HHB3x", mtype, len(data), 0) + data
    return struct.pack("<BxHIIxxxx", 1, len(messages), 1, len(body)) + bytes(body)


def write_hdf5(
    df: DataFrame,
    path: str,
    idx_col: str,
    columns: list[str],
    rows_per_task: int = 65536,
    attrs: "dict[str, dict[str, float]] | None" = None,
) -> int:
    """Write ``columns`` of ``df`` as 1-D contiguous datasets of one HDF5
    file sharing dim 0. ``idx_col`` must hold a dense 0..n-1 index (storage
    order — the same contract as the Zarr and CDF sinks). Numeric and
    timestamp columns only; NULLs in float columns become NaN, NULLs in
    integer columns refuse loudly (declare a _FillValue via ``attrs`` and
    fill beforehand). Scalar numeric per-variable attributes (``attrs``)
    are emitted as float64 attribute messages — the reader's CF vocabulary
    (_FillValue / scale_factor / add_offset) comes back through them.

    Returns the row count written. The file is immediately readable by
    sources/hdf5.read_dataset and sources/netcdf.netcdf_table's HDF5 path.
    """
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in [idx_col, *columns]:
        if c not in fields:
            raise ValueError(f"column {c!r} not in DataFrame")
    for c in columns:
        if fields[c] not in _H5_TYPES:
            raise NotImplementedError(
                f"hdf5 writer supports numeric/timestamp columns; {c!r} is {fields[c]}"
            )
    n = df.count()
    if n == 0:
        raise ValueError("refusing to write an empty hdf5 file")

    # ---- metadata template (driver-side, KBs) ----
    # symbol-table entries must be name-sorted (spec III.C)
    names = sorted(columns)
    dts = {c: np.dtype(_H5_TYPES[fields[c]]) for c in columns}

    # local heap data: empty string at offset 0, then NUL-terminated names
    heap_data = bytearray(8)
    name_off: dict[str, int] = {}
    for c in names:
        name_off[c] = len(heap_data)
        heap_data += _pad8(c.encode() + b"\x00")

    # fixed-size blocks, laid out in file order
    sb_size = 96
    root_ohdr_addr = sb_size
    root_ohdr_size = 16 + 8 + 16  # one symbol-table message (16-byte body)
    heap_addr = root_ohdr_addr + root_ohdr_size
    heap_hdr_size = 32
    heap_data_addr = heap_addr + heap_hdr_size
    btree_addr = heap_data_addr + len(heap_data)
    # v1 B-tree node allocated for 2K children: sig+meta(8) siblings(16)
    # then (key,child) x 2K + final key
    btree_size = 8 + 16 + (2 * _INTERNAL_K) * 16 + 8
    snod_cap = 2 * _LEAF_K
    snods = [names[i : i + snod_cap] for i in range(0, len(names), snod_cap)]
    if len(snods) > 2 * _INTERNAL_K:
        raise NotImplementedError(
            f"hdf5 writer caps at {2 * _INTERNAL_K * snod_cap} columns"
        )
    snod_size = 8 + snod_cap * 40
    snod_addrs = [btree_addr + btree_size + i * snod_size for i in range(len(snods))]

    # dataset object headers, then 8-byte-aligned data blocks
    ohdrs: dict[str, bytes] = {}
    ohdr_addrs: dict[str, int] = {}
    pos = snod_addrs[-1] + snod_size if snods else btree_addr + btree_size
    data_addrs: dict[str, int] = {}
    # first pass: object headers need data addresses -> compute data region
    # after sizing all headers with placeholder addresses
    sized = {}
    for c in names:
        msgs = [
            (0x0001, _dataspace_message(n)),
            (0x0003, _dt_message(dts[c])),
            (0x0008, struct.pack("<BBQQ", 3, 1, 0, 0)),  # placeholder addr
        ]
        for an, av in ((attrs or {}).get(c) or {}).items():
            msgs.append((0x000C, _attr_message(an, float(av))))
        sized[c] = msgs
        ohdr_addrs[c] = pos
        pos += len(_ohdr_v1(msgs))
    data_start = -(-pos // 8) * 8
    off = data_start
    for c in names:
        data_addrs[c] = off
        off += -(-n * dts[c].itemsize // 8) * 8
    eof = off
    for c in names:
        sized[c][2] = (
            0x0008,
            struct.pack("<BBQQ", 3, 1, data_addrs[c], n * dts[c].itemsize),
        )
        ohdrs[c] = _ohdr_v1(sized[c])

    template = bytearray(data_start)
    # superblock v0
    template[0:8] = b"\x89HDF\r\n\x1a\n"
    template[8:16] = struct.pack("<8B", 0, 0, 0, 0, 0, 8, 8, 0)
    template[16:24] = struct.pack("<HHI", _LEAF_K, _INTERNAL_K, 0)
    template[24:56] = struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    # root symbol-table entry: name offset 0, ohdr, cache type 1 with the
    # group's (btree, heap) addresses in the scratch space
    template[56:96] = struct.pack(
        "<QQIIQQ", 0, root_ohdr_addr, 1, 0, btree_addr, heap_addr
    )
    root = _ohdr_v1([(0x0011, struct.pack("<QQ", btree_addr, heap_addr))])
    template[root_ohdr_addr : root_ohdr_addr + len(root)] = root
    # local heap: signature, version, data size, free-list offset, data addr
    template[heap_addr : heap_addr + heap_hdr_size] = (
        b"HEAP" + struct.pack("<B3x", 0)
        + struct.pack("<QQQ", len(heap_data), _UNDEF, heap_data_addr)
    )
    template[heap_data_addr : heap_data_addr + len(heap_data)] = heap_data
    # v1 group B-tree, level 0: key0=0 then (child_i, key_{i+1}=last name
    # offset in child i) — keys bound each child's name range (spec III.B)
    bt = bytearray(btree_size)
    bt[0:8] = b"TREE" + struct.pack("<BBH", 0, 0, len(snods))
    bt[8:24] = struct.pack("<QQ", _UNDEF, _UNDEF)
    p = 24
    bt[p : p + 8] = struct.pack("<Q", 0)  # key 0: before every name
    p += 8
    for i, group in enumerate(snods):
        bt[p : p + 8] = struct.pack("<Q", snod_addrs[i])
        p += 8
        bt[p : p + 8] = struct.pack("<Q", name_off[group[-1]])
        p += 8
    template[btree_addr : btree_addr + btree_size] = bt
    for i, group in enumerate(snods):
        sn = bytearray(snod_size)
        sn[0:8] = b"SNOD" + struct.pack("<BBH", 1, 0, len(group))
        q = 8
        for c in group:
            sn[q : q + 40] = struct.pack(
                "<QQII16x", name_off[c], ohdr_addrs[c], 0, 0
            )
            q += 40
        template[snod_addrs[i] : snod_addrs[i] + snod_size] = sn
    for c in names:
        template[ohdr_addrs[c] : ohdr_addrs[c] + len(ohdrs[c])] = ohdrs[c]

    with open(path, "wb") as f:
        f.write(bytes(template))
        f.truncate(eof)  # pre-size: executors pwrite into the zeroed tail

    # ---- parallel data write (same slab machinery as the CDF sink) ----
    col_order = list(columns)
    col_dt = {c: _H5_TYPES[fields[c]] for c in columns}
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
                    vals = s.to_numpy(dtype=dt)  # NULL -> NaN via pandas
                else:
                    if s.isna().any():
                        raise ValueError(
                            f"column {c!r} has NULLs; integer HDF5 needs an "
                            "explicit _FillValue — fill beforehand and declare it"
                        )
                    vals = s.to_numpy(dtype=dt)
                payload = np.ascontiguousarray(vals.astype(dt)).tobytes()
                from rca_data_tools_spark.sources.bytes_io import pwrite_all

                pwrite_all(fd, payload, data_addrs[c] + lo * dt.itemsize)
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
