"""Zarr v2 ``filters`` chain: the numcodecs delta filter decodes (cumsum of
the stored diffs), and any other filter refuses at METADATA time — decoding
a filtered chunk as plain bytes would return silently wrong values, the one
failure mode worse than an error (this gate is the regression test for a
hole where filters were ignored entirely)."""

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


def test_unknown_or_chained_filters_refuse(tmp_path):
    from rca_data_tools_spark.sources.zarr import _load_array_meta

    base = {
        "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8",
        "compressor": None, "fill_value": 0, "order": "C",
    }
    root1 = str(tmp_path / "fso.zarr")
    _write_store(root1, {**base, "filters": [{"id": "fixedscaleoffset"}]}, {})
    with pytest.raises(NotImplementedError, match="fixedscaleoffset"):
        _load_array_meta(root1, "t")
    root2 = str(tmp_path / "chain.zarr")
    _write_store(
        root2,
        {**base, "filters": [{"id": "delta", "dtype": "<f8"}, {"id": "shuffle"}]},
        {},
    )
    with pytest.raises(NotImplementedError, match="chain"):
        _load_array_meta(root2, "t")
