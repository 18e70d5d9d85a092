"""Snappy decoder validation. The reference encoder is pyarrow's bundled
C++ snappy codec (``pa.Codec('snappy')``) — real snappy output, not a
round-trip of our own encoder — so agreement here means the decoder reads
what the ecosystem actually writes (same strategy as the lz4/zstd CLI
validation in test_blosc.py / test_zstd.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rca_data_tools_spark.sources.snappy import snappy_decompress

_codec = pa.Codec("snappy")


def _ref_compress(data: bytes) -> bytes:
    return _codec.compress(data, asbytes=True)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"hello world " * 400,  # long runs -> 2-byte-offset copies
        bytes(range(256)) * 8,  # incompressible-ish literals
        np.arange(50_000, dtype="<f8").tobytes(),  # >64 KiB, varint length >2 bytes
        b"ab" * 40_000,  # overlapping-copy run-length case
        np.random.default_rng(7).integers(0, 255, 200_000, dtype=np.uint8).tobytes(),
    ],
    ids=["empty", "one", "repetitive", "literals", "floats", "rle", "random"],
)
def test_decodes_reference_encoder_output(data):
    assert snappy_decompress(_ref_compress(data)) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_fuzz_reference_compress_decodes(data):
    assert snappy_decompress(_ref_compress(data)) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=1, max_size=256))
def test_fuzz_corrupt_input_raises_typed(data):
    """Arbitrary bytes must either decode or raise ValueError — never an
    internal IndexError/OverflowError (the executor-side contract every
    native decoder in sources/ follows)."""
    try:
        snappy_decompress(data)
    except ValueError:
        pass


def test_corruption_cases_raise():
    good = _ref_compress(b"hello hello hello hello")
    with pytest.raises(ValueError, match="varint"):
        snappy_decompress(b"\xff\xff\xff\xff\xff\xff")
    # truncation mid-element raises the element check; truncation on an
    # element boundary still fails the preamble-size check — loud either way
    with pytest.raises(ValueError, match="past end|truncated|preamble"):
        snappy_decompress(good[:-3])
    # a copy reaching before the start of output
    bad = b"\x08" + b"\x00" * 0 + bytes([0x01 | (4 - 4) << 2, 200]) + b"abcd"
    with pytest.raises(ValueError):
        snappy_decompress(bad)
    # preamble promises more bytes than the elements produce
    with pytest.raises(ValueError, match="preamble"):
        snappy_decompress(b"\x20" + _ref_compress(b"abc")[1:])


def test_blosc_snappy_chunk_end_to_end():
    """A Blosc1 chunk whose splits are real snappy streams (codec id 2)
    decodes through blosc_decompress — the wiring a
    ``Blosc(cname='snappy')`` Zarr store exercises."""
    from rca_data_tools_spark.sources.blosc import blosc_decompress

    data = np.arange(4096, dtype="<i4").tobytes()
    typesize, nbytes = 4, len(data)
    # byte-shuffle exactly as c-blosc does, then one unsplit block
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, typesize)
    shuffled = arr.T.tobytes()
    comp = _ref_compress(shuffled)
    assert len(comp) < nbytes
    block = struct.pack("<i", len(comp)) + comp
    header = struct.pack("<BBBB", 1, 1, 0x1 | (2 << 5), typesize)
    header += struct.pack("<iii", nbytes, nbytes, 16 + 4 + len(block))
    chunk = header + struct.pack("<i", 20) + block
    assert blosc_decompress(chunk) == data
