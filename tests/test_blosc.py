"""Blosc1 chunk decoder: fixtures are encoded by hand from the public chunk
format (and a minimal greedy LZ4 block encoder written here), since neither
blosc nor lz4 exist in this runtime on either side. End-to-end: a blosc-lz4
zarr store written by the test is scanned by the native zarr reader."""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np
import pytest

from rca_data_tools_spark.sources.blosc import (
    blosc_decompress,
    lz4_block_decompress,
)


def lz4_block_compress(data: bytes) -> bytes:
    """Minimal valid LZ4 block encoder (greedy hash-match, spec-compliant
    end-of-stream rules: last 5 bytes are literals, no match starts within
    the last 12 bytes)."""
    n = len(data)
    out = bytearray()
    anchor = 0
    pos = 0
    table: dict[bytes, int] = {}

    def emit(lit: bytes, match_len: int = 0, offset: int = 0) -> None:
        ll, ml = len(lit), match_len - 4 if match_len else 0
        token = (min(ll, 15) << 4) | (min(ml, 15) if match_len else 0)
        out.append(token)
        if ll >= 15:
            rest = ll - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(lit)
        if match_len:
            out.extend(struct.pack("<H", offset))
            if ml >= 15:
                rest = ml - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    while pos + 12 <= n:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF and data[cand : cand + 4] == key:
            match_len = 4
            limit = n - 5  # spec: last 5 bytes must be literals
            while pos + match_len < limit and data[cand + match_len] == data[pos + match_len]:
                match_len += 1
            emit(data[anchor:pos], match_len, pos - cand)
            pos += match_len
            anchor = pos
        else:
            pos += 1
    emit(data[anchor:])  # final literals-only sequence
    return bytes(out)


def blosc_chunk(
    data: bytes,
    typesize: int,
    codec: int = 1,  # 1 = lz4
    shuffle: "bool | str" = True,
    blocksize: int | None = None,
    nsplits_override: int | None = None,
) -> bytes:
    """Encode one Blosc1 chunk the way c-blosc lays it out.

    ``shuffle`` may be True (byte shuffle), False, or ``"bit"`` (bitshuffle —
    forward transform from the module under test; independence comes from the
    hand-derived bit vectors in test_bitshuffle_layout_vectors)."""
    from rca_data_tools_spark.sources.blosc import _split_rule, _CODECS, _bit_shuffle

    nbytes = len(data)
    blocksize = blocksize or nbytes
    if shuffle == "bit":
        flags = 0x4 | (codec << 5)
    else:
        flags = (0x1 if shuffle else 0) | (codec << 5)
    nblocks = -(-nbytes // blocksize)
    blocks = []
    for j in range(nblocks):
        raw = data[j * blocksize : (j + 1) * blocksize]
        if shuffle == "bit":
            raw = _bit_shuffle(raw, typesize)
        elif shuffle and typesize > 1:
            n_elem = len(raw) // typesize
            body = n_elem * typesize
            arr = np.frombuffer(raw[:body], dtype=np.uint8).reshape(n_elem, typesize)
            raw = arr.T.tobytes() + raw[body:]
        last_partial = len(raw) < blocksize
        nsplits = nsplits_override or (
            1
            if last_partial
            else (typesize if _split_rule(_CODECS[codec], typesize, blocksize) else 1)
        )
        neblock = len(raw) // nsplits
        enc = bytearray()
        for i in range(nsplits):
            want = neblock + (len(raw) - neblock * nsplits if i == nsplits - 1 else 0)
            split = raw[i * neblock : i * neblock + want]
            if codec == 1:
                c = lz4_block_compress(split)
            else:
                c = zlib.compress(split)
            if len(c) >= want:  # store uncompressed, as c-blosc does
                c = split
            enc += struct.pack("<i", len(c)) + c
        blocks.append(bytes(enc))
    header_len = 16 + 4 * nblocks
    bstarts, off = [], header_len
    for b in blocks:
        bstarts.append(off)
        off += len(b)
    cbytes = off
    chunk = struct.pack("<BBBB", 1, 1, flags, typesize)
    chunk += struct.pack("<iii", nbytes, blocksize, cbytes)
    chunk += struct.pack(f"<{nblocks}i", *bstarts)
    return chunk + b"".join(blocks)


def test_lz4_roundtrip_random_and_repetitive():
    rng = np.random.RandomState(3)
    for data in (
        rng.bytes(1000),
        b"abcdefgh" * 200,
        rng.bytes(13),
        np.arange(500, dtype="<f8").tobytes(),
    ):
        comp = lz4_block_compress(data)
        assert lz4_block_decompress(comp, len(data)) == data


def test_blosc_chunk_shapes():
    rng = np.random.RandomState(5)
    arr = (np.sin(np.arange(4096) / 10.0) * 1000).astype("<f8")
    data = arr.tobytes()
    # multi-block + shuffle + lz4 splits (the zarr-python default shape)
    for blocksize in (8192, 5000, len(data)):
        chunk = blosc_chunk(data, typesize=8, codec=1, shuffle=True, blocksize=blocksize)
        assert blosc_decompress(chunk) == data
    # zlib inner codec, no shuffle
    chunk = blosc_chunk(data, typesize=8, codec=3, shuffle=False, blocksize=4096)
    assert blosc_decompress(chunk) == data
    # random (incompressible) data -> stored splits
    rdata = rng.bytes(2048)
    chunk = blosc_chunk(rdata, typesize=4, codec=1, shuffle=True, blocksize=1024)
    assert blosc_decompress(chunk) == rdata
    # encoder that used the non-default split mode: self-describing fallback
    chunk = blosc_chunk(data, typesize=8, codec=1, shuffle=True, blocksize=8192, nsplits_override=1)
    assert blosc_decompress(chunk) == data


def test_blosc_memcpy_and_errors():
    data = b"\x01\x02\x03\x04" * 8
    chunk = struct.pack("<BBBB", 1, 1, 0x2, 4) + struct.pack("<iii", len(data), len(data), 16 + len(data)) + data
    assert blosc_decompress(chunk) == data
    zstd = blosc_chunk(data, typesize=4, codec=1, shuffle=False)
    zstd = bytearray(zstd)
    zstd[2] = (zstd[2] & 0x1F) | (4 << 5)  # rewrite codec code to zstd
    with pytest.raises((NotImplementedError, ValueError)):
        blosc_decompress(bytes(zstd))


def test_bitshuffle_layout_vectors():
    """Hand-derived vectors pin the exact public layout (bitshuffle's numpy
    reference = little-bitorder bit-matrix transpose; c-blosc shuffle.c wraps
    it with size -= size % 8 + verbatim remainder) independently of the
    forward transform, so round-trip tests can't mask a mirrored layout."""
    from rca_data_tools_spark.sources.blosc import _bit_shuffle, _bit_unshuffle

    # typesize=1, 8 elements: plane p holds bit p (LSB-numbered) of each
    # element, element i at little-endian bit i of the plane byte.
    src = bytes([1, 0, 0, 0, 0, 0, 0, 0])  # only element 0 has bit 0 set
    assert _bit_shuffle(src, 1) == bytes([1, 0, 0, 0, 0, 0, 0, 0])
    src = bytes([0, 0, 0, 2, 0, 0, 0, 0])  # element 3, bit 1 -> plane 1, bit 3
    assert _bit_shuffle(src, 1) == bytes([0, 0b00001000, 0, 0, 0, 0, 0, 0])
    src = bytes([1] * 8)  # bit 0 of every element -> plane 0 = 0xFF
    assert _bit_shuffle(src, 1) == bytes([0xFF, 0, 0, 0, 0, 0, 0, 0])
    src = bytes([0x80] * 8)  # MSB of every element -> LAST plane (p=7)
    assert _bit_shuffle(src, 1) == bytes([0, 0, 0, 0, 0, 0, 0, 0xFF])
    # typesize=2: value 256 little-endian = byte 1 bit 0 -> plane row 8*1+0=8
    src = struct.pack("<8H", 256, 0, 0, 0, 0, 0, 0, 0)
    out = _bit_shuffle(src, 2)
    assert out[8] == 1 and all(b == 0 for i, b in enumerate(out) if i != 8)
    # remainder: 11 elements of 1 byte -> 8 transformed, last 3 verbatim
    src = bytes([1] * 8 + [0xAA, 0xBB, 0xCC])
    out = _bit_shuffle(src, 1)
    assert out[:8] == bytes([0xFF, 0, 0, 0, 0, 0, 0, 0])
    assert out[8:] == bytes([0xAA, 0xBB, 0xCC])
    # every vector inverts exactly
    for src, ts in [(bytes([0, 0, 0, 2, 0, 0, 0, 0]), 1), (struct.pack("<8H", 256, 0, 0, 0, 0, 0, 0, 0), 2)]:
        assert _bit_unshuffle(_bit_shuffle(src, ts), ts) == src


def test_bitshuffle_roundtrip_shapes():
    from rca_data_tools_spark.sources.blosc import _bit_shuffle, _bit_unshuffle

    rng = np.random.RandomState(11)
    for typesize in (1, 2, 4, 8, 12):
        for n_elem in (8, 16, 64, 65, 71, 7, 3):
            buf = rng.bytes(n_elem * typesize)
            assert _bit_unshuffle(_bit_shuffle(buf, typesize), typesize) == buf
        # trailing sub-element bytes ride along verbatim
        buf = rng.bytes(16 * typesize + max(0, typesize - 1))
        assert _bit_unshuffle(_bit_shuffle(buf, typesize), typesize) == buf


def test_blosc_bitshuffle_chunks():
    """Full-container decode with the bitshuffle flag set, all split shapes."""
    arr = (np.cos(np.arange(4096) / 7.0) * 500).astype("<f8")
    data = arr.tobytes()
    for blocksize in (8192, 4096, len(data)):
        chunk = blosc_chunk(data, typesize=8, codec=1, shuffle="bit", blocksize=blocksize)
        assert blosc_decompress(chunk) == data
    # zlib inner codec + bitshuffle; and a non-multiple-of-8 leftover block
    chunk = blosc_chunk(data[:1000], typesize=8, codec=3, shuffle="bit", blocksize=512)
    assert blosc_decompress(chunk) == data[:1000]
    # typesize=1 bitshuffle is a real transform (unlike byte shuffle)
    text = (b"status-ok " * 120)[:1111]
    chunk = blosc_chunk(text, typesize=1, codec=1, shuffle="bit", blocksize=512)
    assert blosc_decompress(chunk) == text


def test_zarr_scan_reads_bitshuffle_store(spark, tmp_path):
    """A zarr v2 store written with Blosc(shuffle=BITSHUFFLE) scans natively."""
    from rca_data_tools_spark.sources.zarr import zarr_table

    root = str(tmp_path / "bitshuf.zarr")
    d = os.path.join(root, "pressure")
    os.makedirs(d)
    n = 23
    vals = (np.arange(n, dtype="<f4") * 1.5 + 3.25).astype("<f4")
    meta = {
        "zarr_format": 2,
        "shape": [n],
        "chunks": [8],
        "dtype": "<f4",
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 2},
        "fill_value": None,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump(meta, f)
    for cid in range(3):
        block = vals[cid * 8 : (cid + 1) * 8]
        if len(block) < 8:
            block = np.concatenate([block, np.zeros(8 - len(block), dtype="<f4")])
        with open(os.path.join(d, str(cid)), "wb") as f:
            f.write(blosc_chunk(block.astype("<f4").tobytes(), typesize=4, shuffle="bit"))
    rows = {r["idx"]: r["pressure"] for r in zarr_table(spark, root, ["pressure"]).collect()}
    assert len(rows) == n
    assert all(abs(rows[i] - float(vals[i])) < 1e-6 for i in range(n))


def test_zarr_scan_reads_blosc_store(spark, tmp_path):
    """End-to-end: a blosc-lz4(+shuffle) zarr v2 store scans natively."""
    from rca_data_tools_spark.sources.zarr import zarr_table

    root = str(tmp_path / "blosc.zarr")
    os.makedirs(root)
    n = 25
    temp = (np.sin(np.arange(n)) * 100).astype("<f8")
    temp[4] = -9999.0
    d = os.path.join(root, "temp")
    os.makedirs(d)
    meta = {
        "zarr_format": 2,
        "shape": [n],
        "chunks": [10],
        "dtype": "<f8",
        "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
        "fill_value": -9999.0,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump(meta, f)
    for cid in range(3):
        block = temp[cid * 10 : (cid + 1) * 10]
        if len(block) < 10:
            block = np.concatenate([block, np.zeros(10 - len(block))])
        with open(os.path.join(d, str(cid)), "wb") as f:
            f.write(blosc_chunk(block.astype("<f8").tobytes(), typesize=8))
    rows = {r["idx"]: r for r in zarr_table(spark, root, ["temp"]).collect()}
    assert len(rows) == n
    assert rows[4]["temp"] is None  # fill -> NULL survives the blosc path
    for i in (0, 9, 10, 24):
        assert rows[i]["temp"] == pytest.approx(temp[i])


def test_zarr_to_parquet_ingest_conversion(spark, tmp_path):
    """The recompress-on-ingest path: blosc store -> one distributed decode
    pass -> canonical Parquet with a rebuilt ts column; re-read is the
    vectorized parquet scan."""
    from rca_data_tools_spark.sources.zarr import zarr_to_parquet

    root = str(tmp_path / "ingest.zarr")
    os.makedirs(root)
    n = 20
    t = np.arange(n, dtype="<f8") * 3600.0  # seconds since epoch
    temp = (np.cos(np.arange(n)) * 10).astype("<f8")
    for name, arr in (("time", t), ("temp", temp)):
        d = os.path.join(root, name)
        os.makedirs(d)
        meta = {
            "zarr_format": 2, "shape": [n], "chunks": [8], "dtype": "<f8",
            "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
            "fill_value": None, "order": "C", "filters": None,
        }
        with open(os.path.join(d, ".zarray"), "w") as f:
            json.dump(meta, f)
        for cid in range(3):
            block = arr[cid * 8 : (cid + 1) * 8]
            if len(block) < 8:
                block = np.concatenate([block, np.zeros(8 - len(block))])
            with open(os.path.join(d, str(cid)), "wb") as f:
                f.write(blosc_chunk(block.astype("<f8").tobytes(), typesize=8))
    out = str(tmp_path / "temp.parquet")
    df = zarr_to_parquet(spark, root, ["temp"], out, time_var="time", time_unit="s")
    rows = {r["idx"]: r for r in df.collect()}
    assert len(rows) == n
    assert rows[3]["temp"] == pytest.approx(temp[3])
    assert rows[2]["ts"].hour == 2  # 2*3600s since epoch
    # the converted table is plain parquet: vectorized scan, no codec shim
    assert spark.read.parquet(out).count() == n


# --- LZ4 block decoder vs the REFERENCE lz4 CLI ------------------------------

_LZ4_CLI = __import__("shutil").which("lz4")


def _lz4_frame_blocks(frame: bytes):
    """Walk an LZ4 FRAME (public frame spec) and yield (compressed, raw_flag)
    data blocks — a ~20-line shim so the reference CLI's output can validate
    the BLOCK decoder, closing the spec-circularity noted in FIXTURES.md."""
    import struct

    assert struct.unpack_from("<I", frame, 0)[0] == 0x184D2204, "bad lz4 magic"
    flg = frame[4]
    assert (flg >> 6) == 1, "unsupported lz4 frame version"
    b_indep = bool(flg & 0x20)
    b_checksum = bool(flg & 0x10)
    c_size = bool(flg & 0x08)
    assert b_indep, "CLI produced block-dependent frame; pass -BI"
    pos = 6 + (8 if c_size else 0) + 1  # FLG+BD [+content size] +HC
    while True:
        (bsize,) = struct.unpack_from("<I", frame, pos)
        pos += 4
        if bsize == 0:  # EndMark
            break
        raw = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        yield frame[pos : pos + bsize], raw
        pos += bsize + (4 if b_checksum else 0)


@pytest.mark.skipif(_LZ4_CLI is None, reason="no reference lz4 CLI")
@pytest.mark.parametrize("level", ["-1", "-9", "-12"])
@pytest.mark.parametrize("bsize", ["-B4", "-B5"])
def test_lz4_block_decoder_against_reference_cli(level, bsize):
    import random
    import subprocess

    rng = random.Random(5)
    cases = [
        b"",
        b"a" * 10,
        b"the quick brown fox jumps over the lazy dog. " * 400,
        bytes(rng.randrange(256) for _ in range(30000)),      # incompressible
        bytes(rng.randrange(4) for _ in range(30000)),        # highly repetitive
        np.arange(20000, dtype="<i4").tobytes(),
        (b"abcabcabd" * 9000),                                # overlap matches
        bytes(rng.randrange(256) for _ in range(100)) * 900,  # long-range repeats
    ]
    from rca_data_tools_spark.sources.blosc import lz4_block_decompress

    for data in cases:
        frame = subprocess.run(
            [_LZ4_CLI, "-q", level, bsize, "-BI", "-c"],
            input=data, capture_output=True, check=True,
        ).stdout
        out = bytearray()
        max_block = {"-B4": 1 << 16, "-B5": 1 << 18}[bsize]
        for block, raw in _lz4_frame_blocks(frame):
            if raw:
                out += block
            else:
                want = min(max_block, len(data) - len(out))
                out += lz4_block_decompress(block, want)
        assert bytes(out) == data, (level, bsize, len(data))
