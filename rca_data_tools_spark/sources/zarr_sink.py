"""Distributed Zarr v2 writer — the write face of the native scan.

The reference's corpus lives AS Zarr stores (its dashboards read them via
fsspec mappers, qaqc/dashboard.py:305-313); stores are produced upstream by
xarray.to_zarr. This module closes that loop engine-side: a DataFrame with a
dense row index writes out as a Zarr v2 group — one chunk file per
(variable, chunk id), produced IN PARALLEL by the executors — that the
engine's own reader (sources/zarr.py zarr_table), zarr-python, and xarray
can all open.

Layout written (Zarr v2 spec, zarr.dev/spec/v2):
- ``<root>/.zgroup``                 {"zarr_format": 2}
- ``<root>/.zmetadata``              consolidated metadata (xarray convention)
- ``<root>/<var>/.zarray``           shape/chunks/dtype/compressor/order
- ``<root>/<var>/.zattrs``           optional CF attrs per variable
- ``<root>/<var>/<cid>``             zlib-compressed C-order chunk bytes,
                                     edge chunk zero-padded to full shape

Scale shape: rows are assigned to chunks by ``idx // chunk_rows`` and each
chunk is built by ONE task (applyInPandas over the chunk id — the group is
at most ``chunk_rows`` rows, bounded memory), so the write parallelizes
across the chunk grid exactly like the read does. The only shuffle is the
groupBy on chunk id. ``root`` must be a path every executor can reach (a
shared filesystem locally; an object-store mount/adapter in production —
the read side's KeyValueStore abstraction is the model to mirror there).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark SQL type -> (numpy dtype str, fill value). Timestamps are epoch-ns
#: int64 (the CF-style convention the reader's time pruning bisects over).
_DTYPES = {
    "double": ("<f8", "NaN"),
    "float": ("<f4", "NaN"),
    "bigint": ("<i8", None),
    "int": ("<i4", None),
    "smallint": ("<i2", None),
    "timestamp": ("<i8", None),
    "timestamp_ntz": ("<i8", None),
}


def _validate_columns(df: DataFrame, idx_col: str, columns: list[str]):
    """Shared write-side schema gate: every column numeric/timestamp or a
    fixed-width array<double>/array<float> (-> 2-D variable). Returns
    (simple-type map, probed array widths, row count); refuses ragged
    arrays, unsupported types, and empty frames loudly."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in [idx_col, *columns]:
        if c not in fields:
            raise ValueError(f"column {c!r} not in DataFrame")
    widths: dict[str, int] = {}
    for c in columns:
        ft = fields[c]
        if ft.startswith("array<") and ft.endswith(">") and ft[6:-1] in ("double", "float"):
            k_row = df.select(F.size(F.col(c)).alias("k")).agg(
                F.min("k").alias("kmin"), F.max("k").alias("kmax")
            ).collect()[0]
            if k_row["kmin"] != k_row["kmax"] or k_row["kmin"] is None:
                raise ValueError(
                    f"array column {c!r} is ragged ({k_row['kmin']}.."
                    f"{k_row['kmax']}); zarr 2-D variables need a fixed width"
                )
            widths[c] = int(k_row["kmin"])
        elif ft not in _DTYPES:
            raise NotImplementedError(
                f"zarr writer supports numeric/timestamp columns (and fixed-"
                f"width array<double>/array<float>); {c!r} is {ft}"
            )
    n = df.count()
    if n == 0:
        raise ValueError("refusing to write an empty zarr store")
    return fields, widths, n


def _column_values(s, spark_type: str, np_dtype: str, col: str) -> np.ndarray:
    """One pandas column -> the 1-D numpy slab stored for a chunk, with the
    writer's NULL policy (floats NaN, integers refuse without a fill)."""
    if spark_type.startswith("timestamp"):
        return s.astype("datetime64[ns]").astype("int64").to_numpy()
    if np_dtype in ("<f8", "<f4"):
        return s.to_numpy(dtype=np_dtype)  # NULL -> NaN via pandas
    if s.isna().any():
        raise ValueError(
            f"column {col!r} has NULLs; integer zarr needs an "
            "explicit fill — fill beforehand and declare it in attrs"
        )
    return s.to_numpy(dtype=np_dtype)


def write_zarr_v2(
    df: DataFrame,
    root: str,
    idx_col: str,
    columns: list[str],
    chunk_rows: int = 16384,
    level: int = 1,
    attrs: "dict[str, dict] | None" = None,
) -> int:
    """Write ``columns`` of ``df`` as 1-D Zarr v2 arrays sharing dim-0.

    ``idx_col`` must hold a DENSE 0..n-1 row index (it defines storage
    order; build one with row_number over the store's sort order). Every
    column must be numeric or timestamp — string columns refuse loudly
    (the reader scans fixed-width strings, but a writer needs a length
    policy the caller should set explicitly by encoding first). NULLs in
    float columns become NaN; NULLs in integer columns refuse loudly
    (Zarr v2 integers have no missing-value representation without a CF
    fill attribute — pass one via ``attrs`` and fill beforehand).

    Returns the row count written. The store is immediately readable by
    sources/zarr.zarr_table (roundtrip-tested, including over HTTP).
    """
    fields, widths, n = _validate_columns(df, idx_col, columns)

    os.makedirs(root, exist_ok=True)
    metas: dict[str, dict] = {}
    for c in columns:
        if c in widths:
            dt = "<f8" if fields[c] == "array<double>" else "<f4"
            shape, chunks = [n, widths[c]], [chunk_rows, widths[c]]
        else:
            dt, _ = _DTYPES[fields[c]]
            shape, chunks = [n], [chunk_rows]
        d = os.path.join(root, c)
        os.makedirs(d, exist_ok=True)
        meta = {
            "zarr_format": 2,
            "shape": shape,
            "chunks": chunks,
            "dtype": dt,
            "compressor": {"id": "zlib", "level": level},
            "fill_value": None,
            "order": "C",
            "filters": None,
        }
        metas[c] = meta
        with open(os.path.join(d, ".zarray"), "w") as f:
            json.dump(meta, f)
        var_attrs = (attrs or {}).get(c)
        if var_attrs:
            with open(os.path.join(d, ".zattrs"), "w") as f:
                json.dump(var_attrs, f)
    with open(os.path.join(root, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    consolidated = {"zarr_format": 2, "metadata": {".zgroup": {"zarr_format": 2}}}
    for c, meta in metas.items():
        consolidated["metadata"][f"{c}/.zarray"] = meta
        var_attrs = (attrs or {}).get(c)
        if var_attrs:
            consolidated["metadata"][f"{c}/.zattrs"] = var_attrs
    with open(os.path.join(root, ".zmetadata"), "w") as f:
        json.dump({"zarr_format": 2, "consolidated_format": 1, **consolidated}, f)

    col_dts = {
        c: ("<f8" if fields[c] == "array<double>" else "<f4")
        if c in widths else _DTYPES[fields[c]][0]
        for c in columns
    }
    col_types = {c: fields[c] for c in columns}
    col_widths = dict(widths)
    n_rows, cr = n, chunk_rows

    def _write_chunk(pdf):
        import pandas as pd

        cid = int(pdf["__cid"].iloc[0])
        lo = cid * cr
        expect = min(cr, n_rows - lo)
        if len(pdf) != expect:
            raise ValueError(
                f"chunk {cid}: {len(pdf)} rows, expected {expect} — the "
                f"index column must be a dense 0..n-1 sequence"
            )
        pdf = pdf.sort_values("__idx")
        idx = pdf["__idx"].to_numpy()
        if idx[0] != lo or idx[-1] != lo + expect - 1:
            raise ValueError(f"chunk {cid}: index rows not dense in [{lo}, {lo+expect})")
        for c in cols_order:
            dt = col_dts[c]
            s = pdf[c]
            if c in col_widths:
                k = col_widths[c]
                mat = np.stack(s.to_numpy()).astype(dt)  # (rows, k)
                if mat.shape[1] != k:
                    raise ValueError(f"chunk {cid}: {c!r} width drifted")
                if expect < cr:
                    mat = np.concatenate(
                        [mat, np.zeros((cr - expect, k), dtype=dt)]
                    )
                payload = zlib.compress(np.ascontiguousarray(mat).tobytes(), level)
                tmp = os.path.join(root, c, f".{cid}.0.tmp")
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, os.path.join(root, c, f"{cid}.0"))
                continue
            vals = _column_values(s, col_types[c], dt, c)
            arr = np.asarray(vals, dtype=dt)
            if expect < cr:  # edge chunk zero-pads to full shape (v2 spec)
                arr = np.concatenate([arr, np.zeros(cr - expect, dtype=dt)])
            payload = zlib.compress(np.ascontiguousarray(arr).tobytes(), level)
            tmp = os.path.join(root, c, f".{cid}.tmp")
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, os.path.join(root, c, str(cid)))  # atomic publish
        return pd.DataFrame({"cid": [cid], "rows": [expect]})

    cols_order = list(columns)
    staged = df.select(
        F.col(idx_col).cast("long").alias("__idx"),
        (F.col(idx_col).cast("long") / cr).cast("long").alias("__cid"),
        *[F.col(c) for c in columns],
    )
    written = (
        staged.groupBy("__cid")
        .applyInPandas(_write_chunk, "cid long, rows long")
        .agg(F.sum("rows").alias("n"))
        .collect()[0]["n"]
    )
    if written != n:
        raise ValueError(f"wrote {written} rows, expected {n}")
    return int(written)


#: Spark SQL type -> zarr v3 data_type name (timestamps store epoch-ns).
_V3_NAMES = {
    "double": "float64",
    "float": "float32",
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "timestamp": "int64",
    "timestamp_ntz": "int64",
}

#: shard-index entry for an inner chunk that was never written (reads as
#: the fill value) — zarr v3 sharding spec, mirrored in zarr._SHARD_MISSING
_MISSING = 0xFFFFFFFFFFFFFFFF


def _gzip_bytes(data: bytes, level: int) -> bytes:
    """A standard gzip member (RFC 1952) — what the zarr v3 ``gzip`` codec
    stores, so zarr-python can open the store too (the engine's reader
    accepts zlib or gzip via wbits=47). compressobj keeps the header
    mtime-free, so output is deterministic."""
    co = zlib.compressobj(level, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def write_zarr_v3(
    df: DataFrame,
    root: str,
    idx_col: str,
    columns: list[str],
    chunk_rows: int = 16384,
    inner_rows: int | None = None,
    level: int = 1,
    attrs: "dict[str, dict] | None" = None,
) -> int:
    """Write ``columns`` of ``df`` as 1-D (or fixed-width 2-D) Zarr **v3**
    arrays sharing dim 0 — the v3 sibling of write_zarr_v2, same column
    contract (dense 0..n-1 ``idx_col``, numeric/timestamp columns, NULL
    policy) and the same chunk-parallel shape: one executor task per OUTER
    chunk, the only shuffle the groupBy on chunk id.

    Layout written (zarr v3 spec; zarr.dev/spec/v3):
    - ``<root>/zarr.json``            group doc + consolidated_metadata
                                      (zarr-python 3 convention: one store
                                      read resolves every array)
    - ``<root>/<var>/zarr.json``      array doc: regular chunk grid,
                                      default ``c/``-separated key encoding,
                                      ``bytes``(LE) + ``gzip`` codecs
    - ``<root>/<var>/c/<i>``          one gzip chunk per grid position
                                      (``c/<i>/0`` for 2-D variables)

    When ``inner_rows`` is given the chain becomes ``sharding_indexed``:
    each store object is then a SHARD — ``chunk_rows`` rows bundled as
    ceil(chunk_rows/inner_rows) independently-gzipped inner chunks plus a
    crc32c-protected offset/length index at the end. That is the
    object-store layout for 100 TB archives: few large PUTs, ranged GETs
    per inner chunk on read, and the engine's scan prunes inner chunks by
    time-slice exactly as it does plain chunks (sources/zarr._decode_shard).
    Trailing all-padding inner chunks in the edge shard are marked MISSING
    (2^64-1 sentinel) rather than stored — readers fill them.

    Returns the row count written; the store round-trips through
    sources/zarr.zarr_table (v3 path) bit-for-bit.
    """
    fields, widths, n = _validate_columns(df, idx_col, columns)
    if inner_rows is not None and not 0 < inner_rows <= chunk_rows:
        raise ValueError("inner_rows must be in (0, chunk_rows]")

    os.makedirs(root, exist_ok=True)
    inner_codecs = [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "gzip", "configuration": {"level": level}},
    ]
    consolidated: dict[str, dict] = {}
    for c in columns:
        if c in widths:
            dname = "float64" if fields[c] == "array<double>" else "float32"
            shape, outer = [n, widths[c]], [chunk_rows, widths[c]]
            inner = [inner_rows, widths[c]] if inner_rows else None
        else:
            dname = _V3_NAMES[fields[c]]
            shape, outer = [n], [chunk_rows]
            inner = [inner_rows] if inner_rows else None
        if inner:
            codecs = [{
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": inner,
                    "codecs": inner_codecs,
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }]
        else:
            codecs = inner_codecs
        doc = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": shape,
            "data_type": dname,
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": outer},
            },
            "chunk_key_encoding": {
                "name": "default",
                "configuration": {"separator": "/"},
            },
            "fill_value": 0.0 if dname.startswith("float") else 0,
            "codecs": codecs,
            "attributes": (attrs or {}).get(c, {}),
        }
        consolidated[c] = doc
        os.makedirs(os.path.join(root, c, "c"), exist_ok=True)
        with open(os.path.join(root, c, "zarr.json"), "w") as f:
            json.dump(doc, f)
    with open(os.path.join(root, "zarr.json"), "w") as f:
        json.dump(
            {
                "zarr_format": 3,
                "node_type": "group",
                "attributes": {},
                "consolidated_metadata": {
                    "kind": "inline",
                    "must_understand": False,
                    "metadata": consolidated,
                },
            },
            f,
        )

    col_dts = {
        c: ("<f8" if fields[c] == "array<double>" else "<f4")
        if c in widths else _DTYPES[fields[c]][0]
        for c in columns
    }
    col_types = {c: fields[c] for c in columns}
    col_widths = dict(widths)
    n_rows, cr, ir, lvl = n, chunk_rows, inner_rows, level

    def _shard_blob(slab: np.ndarray, valid_rows: int) -> bytes:
        """Pack one outer slab (cr rows, already zero-padded) into a shard:
        gzipped inner chunks + LE u64 (offset, length) index + crc32c."""
        from rca_data_tools_spark.sources.zarr import _crc32c

        grid_n = -(-cr // ir)
        entries = np.full((grid_n, 2), _MISSING, dtype="<u8")
        parts: list[bytes] = []
        off = 0
        for j in range(grid_n):
            lo = j * ir
            if lo >= valid_rows:
                continue  # pure padding -> MISSING, readers fill
            piece = slab[lo : lo + ir]
            if piece.shape[0] < ir:  # pad the edge inner chunk to full shape
                pad = [(0, ir - piece.shape[0])] + [(0, 0)] * (piece.ndim - 1)
                piece = np.pad(piece, pad)
            payload = _gzip_bytes(np.ascontiguousarray(piece).tobytes(), lvl)
            entries[j] = (off, len(payload))
            parts.append(payload)
            off += len(payload)
        body = entries.tobytes()
        return b"".join(parts) + body + _crc32c(body).to_bytes(4, "little")

    def _write_chunk(pdf):
        import pandas as pd

        cid = int(pdf["__cid"].iloc[0])
        lo = cid * cr
        expect = min(cr, n_rows - lo)
        if len(pdf) != expect:
            raise ValueError(
                f"chunk {cid}: {len(pdf)} rows, expected {expect} — the "
                f"index column must be a dense 0..n-1 sequence"
            )
        pdf = pdf.sort_values("__idx")
        idx = pdf["__idx"].to_numpy()
        if idx[0] != lo or idx[-1] != lo + expect - 1:
            raise ValueError(f"chunk {cid}: index rows not dense in [{lo}, {lo+expect})")
        for c in cols_order:
            dt = col_dts[c]
            s = pdf[c]
            if c in col_widths:
                k = col_widths[c]
                slab = np.stack(s.to_numpy()).astype(dt)  # (rows, k)
                if slab.shape[1] != k:
                    raise ValueError(f"chunk {cid}: {c!r} width drifted")
                key = os.path.join(root, c, "c", str(cid), "0")
                os.makedirs(os.path.dirname(key), exist_ok=True)
            else:
                slab = np.asarray(
                    _column_values(s, col_types[c], dt, c), dtype=dt
                )
                key = os.path.join(root, c, "c", str(cid))
            if expect < cr:  # zero-pad the edge outer chunk to full shape
                pad = [(0, cr - expect)] + [(0, 0)] * (slab.ndim - 1)
                slab = np.pad(slab, pad)
            if ir:
                payload = _shard_blob(slab, expect)
            else:
                payload = _gzip_bytes(np.ascontiguousarray(slab).tobytes(), lvl)
            tmp = key + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, key)  # atomic publish
        return pd.DataFrame({"cid": [cid], "rows": [expect]})

    cols_order = list(columns)
    staged = df.select(
        F.col(idx_col).cast("long").alias("__idx"),
        (F.col(idx_col).cast("long") / cr).cast("long").alias("__cid"),
        *[F.col(c) for c in columns],
    )
    written = (
        staged.groupBy("__cid")
        .applyInPandas(_write_chunk, "cid long, rows long")
        .agg(F.sum("rows").alias("n"))
        .collect()[0]["n"]
    )
    if written != n:
        raise ValueError(f"wrote {written} rows, expected {n}")
    return int(written)
