"""Zarr v2 ``filters`` chains decode per numcodecs' published semantics
(delta = cumsum of stored diffs, fixedscaleoffset dec = enc/scale + offset,
quantize = cast, shuffle = byte transpose, astype = cast, packbits = bool
bit-packing with a leading leftover-count byte), applied in REVERSE chain
order; any unknown filter refuses at METADATA time — decoding a filtered
chunk as plain bytes would return silently wrong values, the one failure
mode worse than an error (this gate is the regression test for a hole
where filters were ignored entirely). Fixtures hand-encode each filter
exactly as numcodecs does, since numcodecs itself is not in this runtime."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest


def _write_store(root: str, meta: dict, chunks: dict) -> None:
    d = os.path.join(root, "t")
    os.makedirs(d)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump(meta, f)
    for k, v in chunks.items():
        with open(os.path.join(d, k), "wb") as f:
            f.write(v)


def test_delta_filtered_coordinate_reads(spark, tmp_path):
    from rca_data_tools_spark.sources.zarr import zarr_table

    n, cs = 23, 10
    vals = (np.arange(n, dtype="<i8") * 60 + 1_600_000_000)  # monotone epoch
    meta = {
        "zarr_format": 2,
        "shape": [n],
        "chunks": [cs],
        "dtype": "<i8",
        "compressor": {"id": "zlib"},
        "fill_value": 0,
        "order": "C",
        "filters": [{"id": "delta", "dtype": "<i8", "astype": "<i4"}],
    }
    chunks = {}
    for ci in range(3):
        block = np.zeros(cs, dtype="<i8")
        part = vals[ci * cs : (ci + 1) * cs]
        block[: len(part)] = part
        enc = np.empty(cs, dtype="<i4")
        enc[0] = block[0]
        enc[1:] = np.diff(block)
        chunks[str(ci)] = zlib.compress(enc.tobytes())
    root = str(tmp_path / "delta.zarr")
    _write_store(root, meta, chunks)
    rows = {r["idx"]: r["t"] for r in zarr_table(spark, root, ["t"]).collect()}
    assert rows == {i: int(vals[i]) for i in range(n)}


def test_unknown_filters_refuse_even_in_chains(tmp_path):
    from rca_data_tools_spark.sources.zarr import _load_array_meta

    base = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
        "compressor": None, "fill_value": 0, "order": "C",
    }
    root1 = str(tmp_path / "bad.zarr")
    _write_store(root1, {**base, "filters": [{"id": "categorize"}]}, {})
    with pytest.raises(NotImplementedError, match="categorize"):
        _load_array_meta(root1, "t")
    root2 = str(tmp_path / "chain.zarr")
    _write_store(
        root2,
        {**base, "filters": [{"id": "delta", "dtype": "<f8"}, {"id": "vlen-utf8"}]},
        {},
    )
    with pytest.raises(NotImplementedError, match="vlen-utf8"):
        _load_array_meta(root2, "t")


def _scan(spark, tmp_path, name, meta, chunks, col="t"):
    from rca_data_tools_spark.sources.zarr import zarr_table

    root = str(tmp_path / name)
    _write_store(root, meta, chunks)
    return {r["idx"]: r[col] for r in zarr_table(spark, root, [col]).collect()}


def test_fixedscaleoffset_decodes(spark, tmp_path):
    # numcodecs FixedScaleOffset encode: round((x - offset) * scale) as
    # astype; decode: enc/scale + offset as dtype
    vals = np.array([10.12, 10.37, 9.81, 10.04, 10.55], dtype="<f8")
    offset, scale = 10.0, 100.0
    enc = np.round((vals - offset) * scale).astype("<i2")
    meta = {
        "zarr_format": 2, "shape": [5], "chunks": [5], "dtype": "<f8",
        "compressor": None, "fill_value": "NaN", "order": "C",
        "filters": [{
            "id": "fixedscaleoffset", "offset": offset, "scale": scale,
            "dtype": "<f8", "astype": "<i2",
        }],
    }
    got = _scan(spark, tmp_path, "fso.zarr", meta, {"0": enc.tobytes()})
    want = enc / scale + offset
    assert got == {i: pytest.approx(want[i]) for i in range(5)}


def test_quantize_decodes(spark, tmp_path):
    # numcodecs Quantize is lossy at ENCODE (round to `digits` binary
    # precision, stored as astype); decode is just the cast back to dtype
    vals = np.array([3.14159265, 2.71828183, 1.41421356], dtype="<f8")
    digits = 3
    precision = 10.0 ** -digits
    exp = np.log10(precision)
    bits = np.ceil(np.log2(10.0 ** -exp))
    scale = 2.0 ** bits
    enc = (np.around(scale * vals) / scale).astype("<f4")
    meta = {
        "zarr_format": 2, "shape": [3], "chunks": [3], "dtype": "<f8",
        "compressor": None, "fill_value": "NaN", "order": "C",
        "filters": [{"id": "quantize", "digits": digits, "dtype": "<f8",
                     "astype": "<f4"}],
    }
    got = _scan(spark, tmp_path, "quant.zarr", meta, {"0": enc.tobytes()})
    want = enc.astype("<f8")
    assert got == {i: want[i] for i in range(3)}


def test_shuffle_then_delta_chain_decodes(spark, tmp_path):
    # chain [delta, shuffle]: encode runs delta FIRST, then byte-shuffles
    # the <i4 diffs; decode must reverse in the opposite order
    import zlib

    vals = np.array([100, 103, 101, 108, 110, 109], dtype="<i8")
    diffs = np.empty(6, dtype="<i4")
    diffs[0] = vals[0]
    diffs[1:] = np.diff(vals)
    shuffled = diffs.view("u1").reshape(-1, 4).T.tobytes()  # numcodecs Shuffle
    meta = {
        "zarr_format": 2, "shape": [6], "chunks": [6], "dtype": "<i8",
        "compressor": {"id": "zlib"}, "fill_value": 0, "order": "C",
        "filters": [
            {"id": "delta", "dtype": "<i8", "astype": "<i4"},
            {"id": "shuffle", "elementsize": 4},
        ],
    }
    got = _scan(
        spark, tmp_path, "sd.zarr", meta, {"0": zlib.compress(shuffled)}
    )
    assert got == {i: int(vals[i]) for i in range(6)}


def test_astype_decodes(spark, tmp_path):
    vals = np.array([1, 2, 3, 4], dtype="<i8")
    enc = vals.astype("<i2")
    meta = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<i8",
        "compressor": None, "fill_value": 0, "order": "C",
        "filters": [{"id": "astype", "encode_dtype": "<i2",
                     "decode_dtype": "<i8"}],
    }
    got = _scan(spark, tmp_path, "ast.zarr", meta, {"0": enc.tobytes()})
    assert got == {i: int(vals[i]) for i in range(4)}


def test_packbits_bool_decodes(spark, tmp_path):
    # numcodecs PackBits: leading byte = leftover bit count, then packbits
    flags = np.array([True, False, True, True, False, True, False, False,
                      True, True, False], dtype=bool)
    leftover = flags.size % 8
    enc = np.concatenate([
        np.array([leftover], dtype="u1"), np.packbits(flags)
    ])
    meta = {
        "zarr_format": 2, "shape": [11], "chunks": [11], "dtype": "|b1",
        "compressor": None, "fill_value": False, "order": "C",
        "filters": [{"id": "packbits"}],
    }
    got = _scan(spark, tmp_path, "pb.zarr", meta, {"0": enc.tobytes()})
    # the scan's output column type is double (engine-wide numeric face)
    assert got == {i: float(flags[i]) for i in range(11)}
