"""Superblock v2/v3 + version-2 object header coverage for the native HDF5
reader: the 1.8+ format newer libnetcdf defaults can emit (VERDICT round-3
ask #3). Fixtures are hand-written from the public HDF5 File Format
Specification — OHDR headers, link-message groups, dense link storage
(fractal heap + v2 B-tree leaf), v3 attributes, OCHK continuations, and v4
data layouts (single-chunk / implicit indexes) — then parsed and scanned
distributed. Soft links resolve (absolute/relative/chains; dangling links
skip); unsupported 1.8+ structures (deep v2 B-trees, external links) must
raise loudly."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tests.test_hdf5 import (
    UNDEF,
    _chunk_btree,
    _dataspace,
    _datatype,
    _filter_pipeline,
    _layout_chunked,
    _layout_contiguous,
)

_SB_SIZE = 48


def _msg2(mtype: int, data: bytes) -> bytes:
    """v2 message framing: 1-byte type, 2-byte size, 1-byte flags, no pad."""
    return struct.pack("<BHB", mtype, len(data), 0) + data


def _ohdr2(msgs: list[bytes], flags: int = 0x01) -> bytes:
    """Version-2 object header, 2-byte chunk-0 size, trailing checksum
    (zeros — the reader documents that it does not verify lookup3)."""
    body = b"".join(msgs)
    assert flags & 0x03 == 0x01
    return b"OHDR" + struct.pack("<BBH", 2, flags, len(body)) + body + b"\x00" * 4


def _link_info(heap_addr: bytes = UNDEF) -> bytes:
    # version 0, flags 0, fractal heap addr, name-index v2 B-tree addr
    return struct.pack("<BB", 0, 0) + heap_addr + UNDEF


def _link_msg(name: str, ohdr_addr: int) -> bytes:
    nb = name.encode()
    return struct.pack("<BBB", 1, 0, len(nb)) + nb + struct.pack("<Q", ohdr_addr)


def _soft_link_msg(name: str, target: str = "/elsewhere") -> bytes:
    nb, tb = name.encode(), target.encode()
    return (
        struct.pack("<BBBB", 1, 0x08, 1, len(nb))  # flags: link-type present
        + nb
        + struct.pack("<H", len(tb))
        + tb
    )


def _external_link_msg(name: str, file: str, path: str) -> bytes:
    nb = name.encode()
    body = b"\x00" + file.encode() + b"\x00" + path.encode() + b"\x00"
    return (
        struct.pack("<BBBB", 1, 0x08, 64, len(nb))
        + nb
        + struct.pack("<H", len(body))
        + body
    )


def _attribute3(name: str, value, dtype: np.dtype) -> bytes:
    nb = name.encode() + b"\x00"
    dt = _datatype(dtype)
    sp = struct.pack("<BBB5x", 1, 0, 0)  # scalar: rank 0
    return (
        struct.pack("<BBHHHB", 3, 0, len(nb), len(dt), len(sp), 0)
        + nb + dt + sp
        + np.array([value], dtype=dtype).tobytes()
    )


def _layout_v4_single(addr: int, chunk_shape, nbytes: int | None = None, mask: int = 0) -> bytes:
    """v4 chunked layout, Single Chunk index; filtered iff nbytes given."""
    flags = 0x02 if nbytes is not None else 0x00
    out = struct.pack("<BBBBB", 4, 2, flags, len(chunk_shape), 8)
    out += b"".join(struct.pack("<Q", c) for c in chunk_shape)
    out += b"\x01"
    if nbytes is not None:
        out += struct.pack("<QI", nbytes, mask)
    return out + struct.pack("<Q", addr)


def _layout_v4_implicit(addr: int, chunk_shape) -> bytes:
    out = struct.pack("<BBBBB", 4, 2, 0, len(chunk_shape), 8)
    out += b"".join(struct.pack("<Q", c) for c in chunk_shape)
    return out + b"\x02" + struct.pack("<Q", addr)


def _layout_v4_fixed_array(addr: int, chunk_shape, filtered: bool = False) -> bytes:
    flags = 0x02 if filtered else 0x00
    out = struct.pack("<BBBBB", 4, 2, flags, len(chunk_shape), 8)
    out += b"".join(struct.pack("<Q", c) for c in chunk_shape)
    return out + b"\x03" + b"\x0a" + struct.pack("<Q", addr)  # page bits + addr


class _WriterV3:
    """Appends blocks after a reserved v3 superblock, written at finish."""

    def __init__(self):
        self.buf = bytearray(_SB_SIZE)

    def append(self, b: bytes) -> int:
        addr = len(self.buf)
        self.buf += b
        return addr

    def finish(self, root_ohdr: int) -> bytes:
        sb = (
            b"\x89HDF\r\n\x1a\n"
            + struct.pack("<BBBB", 3, 8, 8, 0)  # version, offsets, lengths, flags
            + struct.pack("<Q", 0)  # base address
            + UNDEF  # superblock extension
            + struct.pack("<Q", len(self.buf))  # EOF
            + struct.pack("<Q", root_ohdr)
            + b"\x00" * 4  # checksum (not verified)
        )
        assert len(sb) == _SB_SIZE, len(sb)
        self.buf[:_SB_SIZE] = sb
        return bytes(self.buf)


def write_h5_v2(path: str, datasets: dict[str, dict], group: str | None = None) -> None:
    """1.8+-format file: v3 superblock, OHDR headers everywhere, link-message
    root group (compact storage). datasets: name -> {'array', 'chunks',
    'filters', 'fill', 'v4': 'single'|'single_raw'|'implicit', 'split': bool}."""
    w = _WriterV3()
    links = []
    for name, spec in sorted(datasets.items()):
        arr = np.ascontiguousarray(spec["array"])
        msgs = [_msg2(0x01, _dataspace(arr.shape)), _msg2(0x03, _datatype(arr.dtype))]
        if spec.get("fill") is not None:
            msgs.append(_msg2(0x0C, _attribute3("_FillValue", spec["fill"], arr.dtype)))
        v4 = spec.get("v4")
        if v4 == "single":
            raw = zlib.compress(arr.tobytes(), 6)
            addr = w.append(raw)
            msgs.append(_msg2(0x08, _layout_v4_single(addr, arr.shape, nbytes=len(raw))))
            msgs.append(_msg2(0x0B, _filter_pipeline([(1, (6,))])))
        elif v4 == "single_raw":
            addr = w.append(arr.tobytes())
            msgs.append(_msg2(0x08, _layout_v4_single(addr, arr.shape)))
        elif v4 == "implicit":
            cshape = tuple(spec["chunks"])
            c0 = cshape[0]
            blocks = []
            for lo in range(0, arr.shape[0], c0):
                chunk = np.zeros(cshape, dtype=arr.dtype)
                part = arr[lo : lo + c0]
                chunk[: part.shape[0]] = part
                blocks.append(chunk.tobytes())
            addr = w.append(b"".join(blocks))
            msgs.append(_msg2(0x08, _layout_v4_implicit(addr, cshape)))
        elif spec.get("chunks") is None:
            raw = arr.tobytes()
            addr = w.append(raw)
            msgs.append(_msg2(0x08, _layout_contiguous(addr, len(raw))))
        else:
            cshape = tuple(spec["chunks"])
            c0 = cshape[0]
            entries = []
            for lo in range(0, arr.shape[0], c0):
                chunk = np.zeros(cshape, dtype=arr.dtype)
                part = arr[lo : lo + c0]
                chunk[: part.shape[0]] = part
                data = zlib.compress(chunk.tobytes(), 6)
                addr = w.append(data)
                entries.append(((lo,) + (0,) * (len(cshape) - 1), addr, len(data), 0))
            btree_addr = w.append(_chunk_btree(entries, len(cshape)))
            msgs.append(_msg2(0x08, _layout_chunked(btree_addr, cshape, arr.dtype.itemsize)))
            msgs.append(_msg2(0x0B, _filter_pipeline([(1, (6,))])))
        if spec.get("split"):
            # exercise OCHK continuation: first message in chunk 0, the rest
            # in a continuation block (signature + messages + checksum)
            rest = b"".join(msgs[1:])
            ochk = b"OCHK" + rest + b"\x00" * 4
            caddr = w.append(ochk)
            cont = _msg2(0x10, struct.pack("<QQ", caddr, len(ochk)))
            links.append((name, w.append(_ohdr2([msgs[0], cont]))))
        else:
            links.append((name, w.append(_ohdr2(msgs))))

    link_msgs = [_msg2(0x02, _link_info())] + [
        _msg2(0x06, _link_msg(n, a)) for n, a in links
    ]
    if group is not None:
        inner = w.append(_ohdr2(link_msgs))
        link_msgs = [
            _msg2(0x02, _link_info()),
            _msg2(0x06, _link_msg(group, inner)),
        ]
    root = w.append(_ohdr2(link_msgs))
    with open(path, "wb") as f:
        f.write(w.finish(root))


def test_v2_metadata_and_values(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    path = str(tmp_path / "v2.h5")
    a = np.linspace(0.0, 5.0, 23)
    b = np.arange(12, dtype="<i4").reshape(4, 3)
    write_h5_v2(path, {
        "a": {"array": a, "chunks": (8,)},
        "b": {"array": b, "chunks": None},
    })
    h5 = H5File(path)
    assert set(h5.datasets) == {"a", "b"}
    assert h5.datasets["a"].layout == "chunked"
    np.testing.assert_allclose(read_dataset(h5, "a"), a)
    np.testing.assert_array_equal(read_dataset(h5, "b"), b)


def test_v2_nested_group_and_fill_attribute(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    path = str(tmp_path / "v2g.h5")
    v = np.array([1.0, -9999.0, 3.0, 4.0])
    write_h5_v2(path, {"v": {"array": v, "chunks": (2,), "fill": -9999.0}}, group="grp")
    h5 = H5File(path)
    assert set(h5.datasets) == {"grp/v"}
    assert h5.datasets["grp/v"].attrs["_FillValue"] == -9999.0
    np.testing.assert_allclose(read_dataset(h5, "grp/v"), v)


def test_v2_continuation_block(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    path = str(tmp_path / "v2c.h5")
    a = np.arange(10, dtype="<f8")
    write_h5_v2(path, {"a": {"array": a, "chunks": (4,), "split": True}})
    h5 = H5File(path)
    np.testing.assert_allclose(read_dataset(h5, "a"), a)


def test_v2_layout_v4_single_and_implicit(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    path = str(tmp_path / "v4.h5")
    s = np.linspace(1.0, 2.0, 16)
    r = np.arange(6, dtype="<i8")
    imp = np.linspace(-1.0, 1.0, 21)
    write_h5_v2(path, {
        "s": {"array": s, "v4": "single"},
        "r": {"array": r, "v4": "single_raw"},
        "imp": {"array": imp, "chunks": (8,), "v4": "implicit"},
    })
    h5 = H5File(path)
    np.testing.assert_allclose(read_dataset(h5, "s"), s)
    np.testing.assert_array_equal(read_dataset(h5, "r"), r)
    np.testing.assert_allclose(read_dataset(h5, "imp"), imp)


def test_v2_distributed_scan_via_netcdf4(spark, tmp_path):
    from rca_data_tools_spark.sources.netcdf import netcdf_table

    path = str(tmp_path / "v2.nc")
    v = np.linspace(0.0, 1.0, 50)
    v[7] = -9.0
    write_h5_v2(path, {"v": {"array": v, "chunks": (16,), "fill": -9.0}})
    df = netcdf_table(spark, path, ["v"], records_per_task=20)
    rows = df.orderBy("idx").collect()
    got = [r["v"] for r in rows]
    assert got[7] is None  # fill -> SQL NULL
    np.testing.assert_allclose(
        [g for i, g in enumerate(got) if i != 7],
        [x for i, x in enumerate(v) if i != 7],
    )


def _contiguous_ds(w, arr: np.ndarray) -> int:
    raw_addr = w.append(arr.tobytes())
    return w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_contiguous(raw_addr, arr.nbytes)),
    ]))


def test_v2_soft_links_resolve(tmp_path):
    """Absolute, relative, and chained soft links alias their targets under
    the link's own path; a dangling link is skipped, not fatal (it is
    listable but points at nothing — h5py iteration semantics)."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    arr = np.arange(7, dtype="<f8")
    ds = _contiguous_ds(w, arr)
    g = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("x", ds)),
        _msg2(0x06, _soft_link_msg("rel", "x")),  # relative, same group
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("g", g)),
        _msg2(0x06, _soft_link_msg("abs_x", "/g/x")),
        _msg2(0x06, _soft_link_msg("alias_g", "g")),
        _msg2(0x06, _soft_link_msg("chain", "/alias_g/rel")),
        _msg2(0x06, _soft_link_msg("dangling", "/nowhere/else")),
    ]))
    p = str(tmp_path / "soft_ok.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    assert set(h5.datasets) == {"g/x", "g/rel", "abs_x", "alias_g/x", "alias_g/rel", "chain"}
    for name in ("abs_x", "chain", "alias_g/rel"):
        np.testing.assert_array_equal(read_dataset(h5, name), arr)


def test_v2_soft_link_ancestor_alias_stops(tmp_path):
    """A soft link back to an ancestor group is a legal alias whose
    expansion never terminates — the walk must stop at the alias, not
    recurse forever and not raise."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    w = _WriterV3()
    ds = _contiguous_ds(w, np.arange(3, dtype="<f8"))
    g = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("x", ds)),
        _msg2(0x06, _soft_link_msg("up", "/")),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("g", g)),
    ]))
    p = str(tmp_path / "soft_up.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    assert set(H5File(p).datasets) == {"g/x"}


def test_v2_soft_link_chain_depth_capped(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File

    w = _WriterV3()
    msgs = [_msg2(0x02, _link_info())]
    msgs.append(_msg2(0x06, _soft_link_msg("s0", "/s1")))
    for i in range(1, 11):
        msgs.append(_msg2(0x06, _soft_link_msg(f"s{i}", f"/s{i + 1}")))
    root = w.append(_ohdr2(msgs))
    p = str(tmp_path / "soft_deep.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(NotImplementedError, match="soft-link chain"):
        H5File(p)


def test_v2_mutual_soft_link_cycle_terminates(tmp_path):
    """Two soft links resolving through each other (A -> B -> A -> ...)
    must hit the chain-depth cap, not loop forever."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    w = _WriterV3()
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _soft_link_msg("a", "/b")),
        _msg2(0x06, _soft_link_msg("b", "/a")),
    ]))
    p = str(tmp_path / "soft_mutual.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(NotImplementedError, match="soft-link chain"):
        H5File(p)


def test_v2_external_link_missing_file_raises_with_target(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File

    w = _WriterV3()
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _external_link_msg("ext", "other.h5", "/data/x")),
    ]))
    p = str(tmp_path / "ext.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(NotImplementedError, match="external link.*other.h5"):
        H5File(p)


def _write_target_file(tmp_path, arr) -> str:
    """A file holding group g with dataset x, plus root dataset y."""
    w = _WriterV3()
    ds = _contiguous_ds(w, arr)
    ds_y = _contiguous_ds(w, arr * 2)
    g = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("x", ds)),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("g", g)),
        _msg2(0x06, _link_msg("y", ds_y)),
    ]))
    p = str(tmp_path / "target.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    return p


def test_v2_external_link_resolves_sibling_file(tmp_path):
    """External links resolve against the containing file's directory
    (libhdf5's default prefix): a dataset target aliases that dataset, a
    group target imports its subtree, and the imported datasets read their
    bytes from the TARGET file."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    arr = np.arange(9, dtype="<f8")
    _write_target_file(tmp_path, arr)
    w = _WriterV3()
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _external_link_msg("ext_x", "target.h5", "/g/x")),
        _msg2(0x06, _external_link_msg("ext_g", "target.h5", "/g")),
        _msg2(0x06, _external_link_msg("ext_all", "target.h5", "/")),
    ]))
    p = str(tmp_path / "linker.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    assert set(h5.datasets) == {
        "ext_x", "ext_g/x", "ext_all/g/x", "ext_all/y",
    }
    np.testing.assert_array_equal(read_dataset(h5, "ext_x"), arr)
    np.testing.assert_array_equal(read_dataset(h5, "ext_g/x"), arr)
    np.testing.assert_array_equal(read_dataset(h5, "ext_all/y"), arr * 2)


def test_v2_external_link_dangling_object_raises(tmp_path):
    """The target FILE opens but names no such object: loud (h5py raises on
    access), unlike a dangling soft link which is a same-file listable."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    arr = np.arange(4, dtype="<f8")
    _write_target_file(tmp_path, arr)
    w = _WriterV3()
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _external_link_msg("ext", "target.h5", "/no/such")),
    ]))
    p = str(tmp_path / "linker3.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(ValueError, match="no object '/no/such'"):
        H5File(p)


def test_v2_external_link_custom_opener(tmp_path):
    """An explicit opener overrides the same-directory default — the hook
    an object-store deployment uses to map link names onto its own
    KeyValueStore layout."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    arr = np.arange(4, dtype="<f8")
    target = _write_target_file(tmp_path, arr)
    w = _WriterV3()
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _external_link_msg("ext", "logical-name", "/g/x")),
    ]))
    p = str(tmp_path / "linker2.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p, external_opener=lambda n: target if n == "logical-name" else None)
    np.testing.assert_array_equal(read_dataset(h5, "ext"), arr)


def _fixed_array_index(w: _WriterV3, entries: list, filtered: bool) -> int:
    """Write a FAHD header + unpaged FADB data block; entries are
    (address|None) for unfiltered, (address, nbytes, mask)|None for
    filtered. Returns the FAHD address."""
    client = 1 if filtered else 0
    entry_size = 8 + (4 + 4 if filtered else 0)  # addr [+ 4-byte size + mask]
    fahd_addr = len(w.buf)
    fadb_addr = fahd_addr + 4 + 1 + 1 + 1 + 1 + 8 + 8 + 4
    body = b"FADB" + bytes([0, client]) + struct.pack("<Q", fahd_addr)
    for e in entries:
        if e is None:
            body += UNDEF + (struct.pack("<II", 0, 0) if filtered else b"")
        elif filtered:
            a, nb, mask = e
            body += struct.pack("<QII", a, nb, mask)
        else:
            body += struct.pack("<Q", e)
    body += b"\x00" * 4  # checksum (not verified)
    hdr = b"FAHD" + bytes([0, client, entry_size, 10])
    hdr += struct.pack("<QQ", len(entries), fadb_addr) + b"\x00" * 4
    w.append(hdr)
    w.append(body)
    return fahd_addr


def test_v2_layout_v4_fixed_array_reads(tmp_path):
    """Fixed Array chunk index — what latest-format writers use for
    fixed-shape chunked datasets — in both the filtered (deflate) and
    unfiltered element forms, with a missing chunk reading as zeros."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    arr = np.arange(20, dtype="<f8")
    # filtered variant: 3 deflate chunks + chunk 8..11 MISSING (zeros)
    f_entries = []
    for lo in range(0, 20, 4):
        if lo == 8:
            f_entries.append(None)
            continue
        chunk = np.zeros(4, dtype="<f8")
        chunk[: len(arr[lo : lo + 4])] = arr[lo : lo + 4]
        blob = zlib.compress(chunk.tobytes(), 6)
        f_entries.append((w.append(blob), len(blob), 0))
    fa_f = _fixed_array_index(w, f_entries, filtered=True)
    msgs_f = [
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_fixed_array(fa_f, (4,), filtered=True)),
        _msg2(0x0B, _filter_pipeline([(1, (6,))])),
    ]
    ds_f = w.append(_ohdr2(msgs_f))
    # unfiltered variant: raw chunks
    u_entries = []
    for lo in range(0, 20, 4):
        chunk = np.zeros(4, dtype="<f8")
        chunk[: len(arr[lo : lo + 4])] = arr[lo : lo + 4]
        u_entries.append(w.append(chunk.tobytes()))
    fa_u = _fixed_array_index(w, u_entries, filtered=False)
    msgs_u = [
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_fixed_array(fa_u, (4,))),
    ]
    ds_u = w.append(_ohdr2(msgs_u))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("filt", ds_f)),
        _msg2(0x06, _link_msg("raw", ds_u)),
    ]))
    p = str(tmp_path / "fa.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    expect_f = arr.copy()
    expect_f[8:12] = 0.0  # missing chunk reads as zeros
    np.testing.assert_array_equal(read_dataset(h5, "filt"), expect_f)
    np.testing.assert_array_equal(read_dataset(h5, "raw"), arr)


def _layout_v4_ext_array(addr: int, chunk_shape, filtered: bool = False) -> bytes:
    flags = 0x02 if filtered else 0x00
    out = struct.pack("<BBBBB", 4, 2, flags, len(chunk_shape), 8)
    out += b"".join(struct.pack("<Q", c) for c in chunk_shape)
    # index type 4 + creation params: max bits, index elmts, min ptrs,
    # min elmts, page bits (libhdf5 latest-format defaults)
    return out + b"\x04" + bytes([32, 4, 4, 16, 10]) + struct.pack("<Q", addr)


def _ea_schedule(idx_blk_elmts: int = 4, min_elmts: int = 16, min_ptrs: int = 4):
    """The EA doubling schedule for the blocks the index block addresses
    directly: level u holds 2^(u//2) blocks of min_elmts * 2^((u+1)//2)
    elements, for 2*log2(min_ptrs) levels."""
    out = []
    start = 0
    for u in range(2 * (min_ptrs.bit_length() - 1)):
        nelmts = min_elmts << ((u + 1) // 2)
        for _ in range(1 << (u // 2)):
            out.append((start, nelmts))
            start += nelmts
    return out


def _ext_array_index(w: _WriterV3, entries: list, filtered: bool,
                     idx_blk_elmts: int = 4) -> int:
    """Write an EAHD header + EAIB index block; entries beyond the inline
    capacity spill into EADB data blocks laid out per the EA doubling
    schedule (each full-capacity, trailing slots UNDEF, carrying its own
    element offset in the exclude-index-block convention). Entries are
    address|None (unfiltered) or (address, nbytes, mask)|None. Returns the
    EAHD address."""
    client = 1 if filtered else 0
    elmt_size = 16 if filtered else 8  # addr [+ 4-byte size + 4-byte mask]

    def enc(e) -> bytes:
        if e is None:
            return UNDEF + (struct.pack("<II", 0, 0) if filtered else b"")
        if filtered:
            a, nb, mask = e
            return struct.pack("<QII", a, nb, mask)
        return struct.pack("<Q", e)

    inline, spill = entries[:idx_blk_elmts], entries[idx_blk_elmts:]
    schedule = _ea_schedule(idx_blk_elmts)
    n_data_blks = 0
    dblk_addrs: list[int] = []
    for start_e, nelmts in schedule:
        blk = spill[start_e : start_e + nelmts]
        if not blk:
            dblk_addrs.append(None)
            continue
        blk = blk + [None] * (nelmts - len(blk))
        body = b"EADB" + bytes([0, client])
        # header address patched below (EAHD comes after the data blocks)
        body += b"\x00" * 8 + struct.pack("<I", start_e)
        body += b"".join(enc(e) for e in blk) + b"\x00" * 4
        dblk_addrs.append(w.append(body))
        n_data_blks += 1
    eahd_addr = len(w.buf)
    for a in dblk_addrs:
        if a is not None:  # patch the header back-pointer
            w.buf[a + 6 : a + 14] = struct.pack("<Q", eahd_addr)
    eaib_addr = eahd_addr + 4 + 8 + 7 * 8 + 4
    hdr = b"EAHD" + bytes([0, client, elmt_size, 32, idx_blk_elmts, 16, 4, 10])
    hdr += struct.pack(
        "<QQQQQQQ", 0, 0, n_data_blks, 0, len(entries), len(entries), eaib_addr
    )
    hdr += b"\x00" * 4  # checksum (not verified)
    body = b"EAIB" + bytes([0, client]) + struct.pack("<Q", eahd_addr)
    for e in inline + [None] * (idx_blk_elmts - len(inline)):
        body += enc(e)
    if spill:
        for a in dblk_addrs:
            body += UNDEF if a is None else struct.pack("<Q", a)
    body += b"\x00" * 4
    assert len(w.buf) == eahd_addr
    w.append(hdr)
    assert len(w.buf) == eaib_addr
    w.append(body)
    return eahd_addr


def test_v2_layout_v4_extensible_array_reads(tmp_path):
    """Extensible Array chunk index (one unlimited dimension, elements
    inline in the index block): unfiltered and deflate-filtered variants,
    with a missing chunk reading as zeros."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    arr = np.arange(14, dtype="<f8") * 0.5  # 4 chunks of 4 (last clipped)
    # unfiltered: raw chunk blobs, chunk 2 (rows 8..11) missing -> zeros
    u_entries = []
    for ci, lo in enumerate(range(0, 14, 4)):
        if ci == 2:
            u_entries.append(None)
            continue
        chunk = np.zeros(4, dtype="<f8")
        part = arr[lo : lo + 4]
        chunk[: len(part)] = part
        u_entries.append(w.append(chunk.tobytes()))
    u_idx = _ext_array_index(w, u_entries, filtered=False)
    # filtered: deflate chunks, all present
    f_entries = []
    for lo in range(0, 14, 4):
        chunk = np.zeros(4, dtype="<f8")
        part = arr[lo : lo + 4]
        chunk[: len(part)] = part
        blob = zlib.compress(chunk.tobytes(), 6)
        f_entries.append((w.append(blob), len(blob), 0))
    f_idx = _ext_array_index(w, f_entries, filtered=True)

    u_ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(u_idx, (4,))),
    ]))
    f_ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(f_idx, (4,), filtered=True)),
        _msg2(0x0B, _filter_pipeline([(1, (6,))])),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("u", u_ds)),
        _msg2(0x06, _link_msg("f", f_ds)),
    ]))
    p = str(tmp_path / "ea.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    want = arr.copy()
    want[8:12] = 0.0  # the missing chunk
    np.testing.assert_allclose(read_dataset(h5, "u"), want)
    np.testing.assert_allclose(read_dataset(h5, "f"), arr)


def test_v2_layout_v4_extensible_array_data_blocks(tmp_path):
    """Chunk counts beyond the inline capacity spill into EADB data blocks
    (the shape libhdf5 writes for any real appendable time series): 52
    chunks = 4 inline + data blocks 16/32 per the doubling schedule, with
    one whole data block missing (those chunks read as zeros) and a
    deflate-filtered variant."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    n_chunks = 52
    arr = (np.arange(n_chunks * 4) * 0.25).astype("<f8")

    def chunk_blob(ci):
        return arr[ci * 4 : (ci + 1) * 4].tobytes()

    # unfiltered: drop chunks 20..51 (the second data block entirely absent)
    u_entries = [w.append(chunk_blob(ci)) if ci < 20 else None
                 for ci in range(n_chunks)]
    u_idx = _ext_array_index(w, u_entries, filtered=False)
    # the second data block (elements 16..47 of the spill) is all-None ->
    # builder writes no block; rewrite entries so it exercises BOTH a
    # present partial block and an UNDEF block address
    f_entries = []
    for ci in range(n_chunks):
        blob = zlib.compress(chunk_blob(ci), 6)
        f_entries.append((w.append(blob), len(blob), 0))
    f_idx = _ext_array_index(w, f_entries, filtered=True)

    u_ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(u_idx, (4,))),
    ]))
    f_ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(f_idx, (4,), filtered=True)),
        _msg2(0x0B, _filter_pipeline([(1, (6,))])),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("u", u_ds)),
        _msg2(0x06, _link_msg("f", f_ds)),
    ]))
    p = str(tmp_path / "ea_dblocks.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    want = arr.copy()
    want[20 * 4 :] = 0.0  # all chunks past 20 unwritten
    np.testing.assert_allclose(read_dataset(h5, "u"), want)
    np.testing.assert_allclose(read_dataset(h5, "f"), arr)


def test_v2_layout_v4_extensible_array_super_blocks_raise(tmp_path):
    """Chunk counts beyond the index block's direct span (244 with libhdf5
    defaults) need EASB super blocks — outside the subset, loud raise."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    w = _WriterV3()
    n_chunks = 250
    arr = np.zeros(n_chunks * 4, dtype="<f8")
    entries = [None] * n_chunks
    idx = _ext_array_index(w, entries, filtered=False)
    ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(idx, (4,))),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("x", ds)),
    ]))
    p = str(tmp_path / "ea_super.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(NotImplementedError, match="super blocks"):
        H5File(p)


def test_v2_layout_v4_extensible_array_offset_mismatch_raises(tmp_path):
    """A data block whose stored element offset disagrees with the derived
    doubling-schedule start (under both conventions) must refuse loudly —
    the self-check that turns any layout-math disagreement into an error
    instead of silently misplaced chunks."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    w = _WriterV3()
    n_chunks = 8
    arr = np.arange(n_chunks * 4, dtype="<f8")
    entries = [w.append(arr[ci * 4 : (ci + 1) * 4].tobytes())
               for ci in range(n_chunks)]
    idx = _ext_array_index(w, entries, filtered=False)
    # corrupt the first EADB's stored offset (it follows sig+ver+client+hdr)
    dblk = bytes(w.buf).index(b"EADB")
    w.buf[dblk + 14 : dblk + 18] = struct.pack("<I", 7)  # neither 0 nor 4
    ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(idx, (4,))),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("x", ds)),
    ]))
    p = str(tmp_path / "ea_badoff.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(ValueError, match="offset"):
        H5File(p)


def _layout_v4_btree2(addr: int, chunk_shape, filtered: bool = False) -> bytes:
    flags = 0x02 if filtered else 0x00
    out = struct.pack("<BBBBB", 4, 2, flags, len(chunk_shape), 8)
    out += b"".join(struct.pack("<Q", c) for c in chunk_shape)
    # index type 5 + node size(4) + split/merge percents
    return out + b"\x05" + struct.pack("<IBB", 2048, 100, 40) + struct.pack("<Q", addr)


def _enc_chunk_rec(r, ndims: int, filtered: bool) -> bytes:
    if filtered:
        a, nb, mask, offs = r
        out = struct.pack("<QII", a, nb, mask)
    else:
        a, offs = r
        out = struct.pack("<Q", a)
    return out + b"".join(struct.pack("<Q", o) for o in offs)


def _btree2_depth1(w: _WriterV3, btype: int, rec_size: int,
                   leaves: "list[list[bytes]]", internal: "list[bytes]",
                   node_size: int = 2048) -> int:
    """Write a REAL depth-1 version-2 B-tree: BTHD header -> one BTIN root
    (records + (addr, nrec) child pointers — no 'total' field at depth 1)
    -> BTLF leaves. Child-pointer nrec width = 1 byte, matching the
    format's sizing for these node/record sizes (max leaf records < 256)."""
    assert len(internal) == len(leaves) - 1
    max_leaf = (node_size - 10) // rec_size
    assert max_leaf < 256, "fixture assumes 1-byte child-record counts"
    bthd_addr = len(w.buf)
    btin_size = 6 + len(internal) * rec_size + len(leaves) * (8 + 1) + 4
    btin_addr = bthd_addr + 38
    leaf_addrs, a = [], btin_addr + btin_size
    for lv in leaves:
        leaf_addrs.append(a)
        a += 6 + len(lv) * rec_size + 4
    total = sum(len(lv) for lv in leaves) + len(internal)
    hdr = b"BTHD" + bytes([0, btype])
    hdr += struct.pack("<IHHBB", node_size, rec_size, 1, 100, 40)
    hdr += struct.pack("<QH", btin_addr, len(internal))
    hdr += struct.pack("<Q", total) + b"\x00" * 4
    assert len(hdr) == 38
    w.append(hdr)
    btin = b"BTIN" + bytes([0, btype]) + b"".join(internal)
    for la, lv in zip(leaf_addrs, leaves):
        btin += struct.pack("<Q", la) + bytes([len(lv)])
    btin += b"\x00" * 4
    assert len(btin) == btin_size
    w.append(btin)
    for lv in leaves:
        w.append(b"BTLF" + bytes([0, btype]) + b"".join(lv) + b"\x00" * 4)
    return bthd_addr


def _btree2_chunk_index(w: _WriterV3, records: list, ndims: int,
                        filtered: bool) -> int:
    """Write a BTHD header + one BTLF leaf of chunk records; records are
    (address, scaled_offsets) or (address, nbytes, mask, scaled_offsets).
    Returns the BTHD address."""
    btype = 11 if filtered else 10
    rec_size = (8 + 4 + 4 if filtered else 8) + 8 * ndims
    leaf = b"BTLF" + bytes([0, btype])
    for r in records:
        leaf += _enc_chunk_rec(r, ndims, filtered)
    leaf += b"\x00" * 4
    bthd_addr = len(w.buf)
    leaf_addr = bthd_addr + 38
    hdr = b"BTHD" + bytes([0, btype]) + struct.pack("<IHHBB", 2048, rec_size, 0, 100, 40)
    hdr += struct.pack("<QH", leaf_addr, len(records))
    hdr += struct.pack("<Q", len(records)) + b"\x00" * 4
    assert len(hdr) == 38, len(hdr)
    w.append(hdr)
    assert len(w.buf) == leaf_addr
    w.append(leaf)
    return bthd_addr


def test_v2_layout_v4_btree2_reads(tmp_path):
    """Version-2 B-tree chunk index (multiple unlimited dimensions): 2-D
    dataset, records carry SCALED offsets, filtered and unfiltered record
    types, records not in C order."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    arr = (np.arange(24, dtype="<f8") + 1.0).reshape(4, 6)
    chunk = (2, 3)
    # unfiltered records, shuffled order to prove offsets drive placement
    u_recs = []
    for si in (1, 0):
        for sj in (1, 0):
            block = arr[si * 2 : si * 2 + 2, sj * 3 : sj * 3 + 3]
            u_recs.append((w.append(np.ascontiguousarray(block).tobytes()), (si, sj)))
    u_idx = _btree2_chunk_index(w, u_recs, 2, filtered=False)
    f_recs = []
    for si in (0, 1):
        for sj in (0, 1):
            block = arr[si * 2 : si * 2 + 2, sj * 3 : sj * 3 + 3]
            blob = zlib.compress(np.ascontiguousarray(block).tobytes(), 6)
            f_recs.append((w.append(blob), len(blob), 0, (si, sj)))
    f_idx = _btree2_chunk_index(w, f_recs, 2, filtered=True)
    u_ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_btree2(u_idx, chunk)),
    ]))
    f_ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_btree2(f_idx, chunk, filtered=True)),
        _msg2(0x0B, _filter_pipeline([(1, (6,))])),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("u", u_ds)),
        _msg2(0x06, _link_msg("f", f_ds)),
    ]))
    p = str(tmp_path / "bt2.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    np.testing.assert_allclose(read_dataset(h5, "u"), arr)
    np.testing.assert_allclose(read_dataset(h5, "f"), arr)


def test_v2_layout_v4_btree2_deep_tree_reads(tmp_path):
    """Depth-1 v2 B-tree chunk index (the shape libhdf5 writes once the
    chunk count outgrows one leaf): a 6x6 dataset in nine 2x2 chunks,
    records split across three BTLF leaves under one BTIN root, must scan
    identically to the single-leaf form."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    arr = (np.arange(36, dtype="<f8") * 1.5).reshape(6, 6)
    recs = []
    for si in range(3):
        for sj in range(3):
            blk = np.ascontiguousarray(arr[si * 2 : si * 2 + 2, sj * 2 : sj * 2 + 2])
            recs.append(_enc_chunk_rec((w.append(blk.tobytes()), (si, sj)), 2, False))
    idx = _btree2_depth1(
        w, btype=10, rec_size=24,
        leaves=[recs[0:3], recs[4:6], recs[7:9]], internal=[recs[3], recs[6]],
    )
    ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_btree2(idx, (2, 2))),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("x", ds)),
    ]))
    p = str(tmp_path / "bt2deep.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    assert len(h5.datasets["x"].chunks) == 9
    np.testing.assert_array_equal(read_dataset(h5, "x"), arr)


def _dense_group_bytes(w: _WriterV3, links: list[tuple[str, int]],
                       indirect: bool = False, btree_depth1: bool = False) -> int:
    """Write a dense-storage group (fractal heap + v2 B-tree leaf) and
    return the address of its OHDR. Layout written from the public spec:
    FRHP header, root FHDB direct block (or FHIB root with FHDB children),
    BTHD + BTLF name index with 11-byte (hash + 7-byte heap ID) records."""
    width, start_size, max_direct = 4, 512, 65536
    max_heap_bits, max_managed = 32, 4096
    off_size, len_size = 4, 2
    objs = [_link_msg(n, a) for n, a in links]

    base = len(w.buf)
    heap_hdr_size = 146
    dblock_hdr = 4 + 1 + 8 + off_size  # no checksum (flags=0)

    if not indirect:
        heap_addr = base
        dblock_addr = base + heap_hdr_size
        after_heap = dblock_addr + start_size
        block_offsets = [(0, dblock_addr)]
        cur_rows = 0
        root_addr = dblock_addr
    else:
        heap_addr = base
        # root FHIB with 1 row x width children; put objects in child 0 and 2
        fhib_size = 4 + 1 + 8 + off_size + width * 8 + 4
        fhib_addr = base + heap_hdr_size
        d0 = fhib_addr + fhib_size
        d2 = d0 + start_size
        after_heap = d2 + start_size
        block_offsets = [(0, d0), (2 * start_size, d2)]
        cur_rows = 1
        root_addr = fhib_addr

    # place objects into the block(s): heap offsets INCLUDE block headers
    ids = []
    per_block: dict[int, bytearray] = {bo: bytearray() for bo, _ in block_offsets}
    bi = 0
    for obj in objs:
        bo, _addr = block_offsets[bi % len(block_offsets)]
        cur = per_block[bo]
        off = bo + dblock_hdr + len(cur)
        cur += obj
        ids.append(
            b"\x00" + off.to_bytes(off_size, "little") + len(obj).to_bytes(len_size, "little")
        )
        bi += 1

    btree_addr = after_heap
    bthd_size = 38
    leaf_addr = btree_addr + bthd_size

    # FRHP
    hdr = b"FRHP" + bytes([0])
    hdr += struct.pack("<HHB", 1 + off_size + len_size, 0, 0)  # id len, filt, flags
    hdr += struct.pack("<I", max_managed)
    hdr += b"\x00" * 8 + UNDEF + b"\x00" * 8 + UNDEF  # huge id, huge bt, free, fsmgr
    hdr += struct.pack("<QQQ", 3 * start_size, 3 * start_size, 0)  # managed/alloc/iter
    hdr += struct.pack("<Q", len(objs))
    hdr += b"\x00" * 32  # huge/tiny sizes+counts
    hdr += struct.pack("<H", width)
    hdr += struct.pack("<QQ", start_size, max_direct)
    hdr += struct.pack("<HH", max_heap_bits, 1)
    hdr += struct.pack("<Q", root_addr) + struct.pack("<H", cur_rows)
    hdr += b"\x00" * 4  # checksum (not verified)
    assert len(hdr) == heap_hdr_size, len(hdr)
    w.append(hdr)

    def dblock(block_off: int, payload: bytes) -> bytes:
        blk = b"FHDB" + bytes([0]) + struct.pack("<Q", heap_addr)
        blk += block_off.to_bytes(off_size, "little") + payload
        return blk + b"\x00" * (start_size - len(blk))

    if not indirect:
        w.append(dblock(0, bytes(per_block[0])))
    else:
        fhib = b"FHIB" + bytes([0]) + struct.pack("<Q", heap_addr)
        fhib += (0).to_bytes(off_size, "little")
        children = [d0, UNDEF, d2, UNDEF]
        for c in children:
            fhib += c if isinstance(c, bytes) else struct.pack("<Q", c)
        fhib += b"\x00" * 4
        assert len(fhib) == fhib_size, (len(fhib), fhib_size)
        w.append(fhib)
        w.append(dblock(0, bytes(per_block[0])))
        w.append(dblock(2 * start_size, bytes(per_block[2 * start_size])))

    recs = [struct.pack("<I", i) + hid for i, hid in enumerate(ids)]
    if btree_depth1:
        # BTIN root + three BTLF leaves (record = 4-byte hash + heap id)
        assert len(w.buf) == btree_addr
        third = len(recs) // 3
        _btree2_depth1(
            w, btype=5, rec_size=4 + 7, node_size=512,
            leaves=[recs[:third], recs[third + 1 : 2 * third + 1], recs[2 * third + 2 :]],
            internal=[recs[third], recs[2 * third + 1]],
        )
    else:
        # BTHD + BTLF (depth 0, type 5)
        bthd = b"BTHD" + bytes([0, 5]) + struct.pack("<IH", 512, 4 + 7)
        bthd += struct.pack("<HBB", 0, 100, 40)  # depth, split, merge
        bthd += struct.pack("<Q", leaf_addr) + struct.pack("<H", len(ids))
        bthd += struct.pack("<Q", len(ids)) + b"\x00" * 4
        assert len(bthd) == bthd_size, (len(bthd),)
        w.append(bthd)
        leaf = b"BTLF" + bytes([0, 5])
        for rec in recs:
            leaf += rec  # hash is ignored by the reader
        leaf += b"\x00" * 4
        w.append(leaf)

    return w.append(_ohdr2([
        _msg2(0x02, struct.pack("<BB", 0, 0) + struct.pack("<Q", heap_addr)
              + struct.pack("<Q", btree_addr)),
    ]))


def test_v2_dense_group_links(tmp_path):
    """Dense link storage: 12 datasets (beyond the ~8-link compact limit)
    indexed through a fractal heap root direct block + v2 B-tree leaf."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    arrays = {f"var{i:02d}": np.arange(6, dtype="<f8") * (i + 1) for i in range(12)}
    links = []
    for name, arr in sorted(arrays.items()):
        addr = w.append(arr.tobytes())
        msgs = [
            _msg2(0x01, _dataspace(arr.shape)),
            _msg2(0x03, _datatype(arr.dtype)),
            _msg2(0x08, _layout_contiguous(addr, arr.nbytes)),
        ]
        links.append((name, w.append(_ohdr2(msgs))))
    root = _dense_group_bytes(w, links)
    path = str(tmp_path / "dense.h5")
    with open(path, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(path)
    assert set(h5.datasets) == set(arrays)
    for name, arr in arrays.items():
        np.testing.assert_array_equal(read_dataset(h5, name), arr)


def test_v2_dense_group_indirect_root(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    arrays = {f"d{i}": np.linspace(0, 1, 5) + i for i in range(6)}
    links = []
    for name, arr in sorted(arrays.items()):
        addr = w.append(np.ascontiguousarray(arr).tobytes())
        msgs = [
            _msg2(0x01, _dataspace(arr.shape)),
            _msg2(0x03, _datatype(np.dtype("<f8"))),
            _msg2(0x08, _layout_contiguous(addr, arr.nbytes)),
        ]
        links.append((name, w.append(_ohdr2(msgs))))
    root = _dense_group_bytes(w, links, indirect=True)
    path = str(tmp_path / "densei.h5")
    with open(path, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(path)
    assert set(h5.datasets) == set(arrays)
    for name, arr in arrays.items():
        np.testing.assert_allclose(read_dataset(h5, name), arr)


def test_v2_dense_group_deep_name_index_reads(tmp_path):
    """Depth-1 name-index B-tree over a dense group (what libhdf5 writes
    once a group's link count outgrows one leaf — e.g. a NetCDF-4 file
    with many variables): heap IDs split across three BTLF leaves under a
    BTIN root must list and read every dataset."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _WriterV3()
    names = [f"v{i:02d}" for i in range(11)]
    addrs = {n: _contiguous_ds(w, np.full(4, float(i))) for i, n in enumerate(names)}
    g = _dense_group_bytes(w, [(n, addrs[n]) for n in names], btree_depth1=True)
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("grp", g)),
    ]))
    p = str(tmp_path / "deepdense.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    assert set(h5.datasets) == {f"grp/{n}" for n in names}
    for i, n in enumerate(names):
        np.testing.assert_array_equal(read_dataset(h5, f"grp/{n}"), np.full(4, float(i)))


def test_fuzz_corrupt_metadata_raises_typed_errors(tmp_path):
    """Randomized bit flips over both fixture formats: the parser must
    terminate with ValueError/NotImplementedError (or parse, when the flip
    hit data bytes) — never an internal IndexError, unbounded recursion, or
    a hang on crafted cycles."""
    import random

    from rca_data_tools_spark.sources.hdf5 import H5File
    from tests.test_hdf5 import write_h5

    p0, p1 = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    write_h5(p0, {"x": {"array": np.arange(64, dtype="<f8"), "chunks": (16,), "filters": [("deflate", 3)]}})
    write_h5_v2(p1, {"x": {"array": np.arange(64, dtype="<f8"), "chunks": (16,)}})
    bases = [open(p0, "rb").read(), open(p1, "rb").read()]

    # extensible-array and v2-B-tree chunk-index fixtures join the fuzz pool
    def _ea_base() -> bytes:
        w = _WriterV3()
        arr = np.arange(12, dtype="<f8")
        entries = [w.append(arr[lo : lo + 4].tobytes()) for lo in range(0, 12, 4)]
        idx = _ext_array_index(w, entries, filtered=False)
        ds = w.append(_ohdr2([
            _msg2(0x01, _dataspace(arr.shape)),
            _msg2(0x03, _datatype(arr.dtype)),
            _msg2(0x08, _layout_v4_ext_array(idx, (4,))),
        ]))
        root = w.append(_ohdr2([
            _msg2(0x02, _link_info()), _msg2(0x06, _link_msg("x", ds)),
        ]))
        return w.finish(root)

    def _bt2_base() -> bytes:
        w = _WriterV3()
        arr = np.arange(16, dtype="<f8").reshape(4, 4)
        recs = []
        for si in range(2):
            for sj in range(2):
                blk = np.ascontiguousarray(arr[si * 2 : si * 2 + 2, sj * 2 : sj * 2 + 2])
                recs.append((w.append(blk.tobytes()), (si, sj)))
        idx = _btree2_chunk_index(w, recs, 2, filtered=False)
        ds = w.append(_ohdr2([
            _msg2(0x01, _dataspace(arr.shape)),
            _msg2(0x03, _datatype(arr.dtype)),
            _msg2(0x08, _layout_v4_btree2(idx, (2, 2))),
        ]))
        root = w.append(_ohdr2([
            _msg2(0x02, _link_info()), _msg2(0x06, _link_msg("x", ds)),
        ]))
        return w.finish(root)

    def _links_base() -> bytes:
        # soft + external links join the fuzz pool: flipped type/length/
        # target bytes must stay typed (UnicodeDecodeError is a ValueError)
        w = _WriterV3()
        ds = _contiguous_ds(w, np.arange(6, dtype="<f8"))
        g = w.append(_ohdr2([
            _msg2(0x02, _link_info()),
            _msg2(0x06, _link_msg("x", ds)),
        ]))
        root = w.append(_ohdr2([
            _msg2(0x02, _link_info()),
            _msg2(0x06, _link_msg("g", g)),
            _msg2(0x06, _soft_link_msg("s", "/g/x")),
            _msg2(0x06, _soft_link_msg("chain", "s")),
            _msg2(0x06, _external_link_msg("ext", "absent.h5", "/y")),
        ]))
        return w.finish(root)

    def _deep_bt2_base() -> bytes:
        # depth-1 chunk-index B-tree joins the fuzz pool: flipped node
        # sizes, child counts, and pointer bytes must stay typed
        w = _WriterV3()
        arr = (np.arange(36, dtype="<f8")).reshape(6, 6)
        recs = []
        for si in range(3):
            for sj in range(3):
                blk = np.ascontiguousarray(arr[si * 2 : si * 2 + 2, sj * 2 : sj * 2 + 2])
                recs.append(_enc_chunk_rec((w.append(blk.tobytes()), (si, sj)), 2, False))
        idx = _btree2_depth1(
            w, btype=10, rec_size=24,
            leaves=[recs[0:3], recs[4:6], recs[7:9]], internal=[recs[3], recs[6]],
        )
        ds = w.append(_ohdr2([
            _msg2(0x01, _dataspace(arr.shape)),
            _msg2(0x03, _datatype(arr.dtype)),
            _msg2(0x08, _layout_v4_btree2(idx, (2, 2))),
        ]))
        root = w.append(_ohdr2([
            _msg2(0x02, _link_info()), _msg2(0x06, _link_msg("x", ds)),
        ]))
        return w.finish(root)

    def _depth2_base() -> bytes:
        w = _WriterV3()
        node_size, rec_size = 8192, 24
        enc_leaf, cum_encs, _ = _bt2_sizing(node_size, rec_size, 2)
        arr = (np.arange(48, dtype="<f8")).reshape(8, 6)
        recs = []
        for si in range(4):
            for sj in range(3):
                blk = np.ascontiguousarray(arr[si * 2 : si * 2 + 2, sj * 2 : sj * 2 + 2])
                recs.append(_enc_chunk_rec((w.append(blk.tobytes()), (si, sj)), 2, False))
        tree = ("int", [recs[5]], [
            ("int", [recs[2]], [("leaf", recs[0:2]), ("leaf", recs[3:5])]),
            ("int", [recs[8]], [("leaf", recs[6:8]), ("leaf", recs[9:12])]),
        ])
        root_addr, nrec_root, total = _bt2_write_tree(w, 10, rec_size, tree, 2, enc_leaf, cum_encs)
        hdr = b"BTHD" + bytes([0, 10]) + struct.pack("<IHHBB", node_size, rec_size, 2, 100, 40)
        hdr += struct.pack("<QH", root_addr, nrec_root)
        hdr += struct.pack("<Q", total) + b"\x00" * 4
        idx = w.append(hdr)
        ds = w.append(_ohdr2([
            _msg2(0x01, _dataspace(arr.shape)),
            _msg2(0x03, _datatype(arr.dtype)),
            _msg2(0x08, _layout_v4_btree2(idx, (2, 2))),
        ]))
        root = w.append(_ohdr2([
            _msg2(0x02, _link_info()), _msg2(0x06, _link_msg("x", ds)),
        ]))
        return w.finish(root)

    # pin the hand-built seeds as VALID before mutating them — a malformed
    # base would raise typed errors every iteration and silently void the
    # coverage it is supposed to add
    from rca_data_tools_spark.sources.hdf5 import read_dataset

    for blob in (_ea_base(), _bt2_base(), _deep_bt2_base(), _depth2_base()):
        h5ok = H5File(blob)
        assert "x" in h5ok.datasets and len(read_dataset(h5ok, "x")) > 0
    # the links seed deliberately ends in an unresolvable external link: a
    # valid parse walks the soft links first, then raises exactly there
    with pytest.raises(NotImplementedError, match="external link"):
        H5File(_links_base())

    bases += [_ea_base(), _bt2_base(), _links_base(), _deep_bt2_base(), _depth2_base()]
    rng = random.Random(99)
    for _ in range(400):
        blob = bytearray(rng.choice(bases))
        for _ in range(rng.randrange(1, 4)):
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        try:
            H5File(bytes(blob))
        except (ValueError, NotImplementedError, KeyError):
            pass  # typed loud failure is the contract

    # crafted cycle: a group B-tree whose child points at itself
    import struct as _st

    from tests.test_hdf5 import UNDEF, _object_header, _msg
    from tests.test_hdf5 import _Writer

    w = _Writer()
    heap_data_addr = w.append(b"\x00" * 8 + b"x\x00" + b"\x00" * 6)
    heap_addr = w.append(
        b"HEAP" + _st.pack("<B3x", 0) + _st.pack("<QQQ", 16, 0, heap_data_addr)
    )
    btree_addr = len(w.buf)
    w.append(
        b"TREE" + _st.pack("<BBH", 0, 1, 1) + UNDEF + UNDEF
        + _st.pack("<Q", 8) + _st.pack("<Q", btree_addr) + _st.pack("<Q", 8)
    )
    root = w.append(_object_header([_msg(0x0011, _st.pack("<QQ", btree_addr, heap_addr))]))
    p = str(tmp_path / "cycle.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(ValueError, match="cyclic"):
        H5File(p)


# --- model-based property test: random trees + random links ----------------

@pytest.mark.parametrize("seed", range(20))
def test_soft_link_resolution_matches_python_model(tmp_path, seed):
    """Build a random group tree with random soft links (absolute/relative,
    possibly dangling or chained), then compare the parser's dataset listing
    against a pure-Python model that resolves the same link graph over a
    dict tree — same dangling-skip, ancestor-stop, and depth-cap rules."""
    import random

    from rca_data_tools_spark.sources.hdf5 import H5File

    rng = random.Random(1000 + seed)

    # --- random tree model: groups hold children; datasets are leaves
    n_groups = rng.randrange(2, 6)
    groups = {i: {} for i in range(n_groups)}  # gid -> {name: ('g',gid)|('d',val)|('s',path)}
    parent_of = {}
    for gid in range(1, n_groups):
        p = rng.randrange(0, gid)
        groups[p][f"g{gid}"] = ("g", gid)
        parent_of[gid] = p
    n_ds = rng.randrange(1, 5)
    for d in range(n_ds):
        gid = rng.randrange(0, n_groups)
        groups[gid][f"d{d}"] = ("d", d)

    def path_of(gid: int) -> str:
        parts = []
        while gid != 0:
            parts.append(f"g{gid}")
            gid = parent_of[gid]
        return "/" + "/".join(reversed(parts))

    # random soft links: absolute to a group/dataset path, or a sibling name
    for li in range(rng.randrange(1, 5)):
        src = rng.randrange(0, n_groups)
        kind = rng.random()
        if kind < 0.4:  # absolute to a random group
            tgt = path_of(rng.randrange(0, n_groups))
        elif kind < 0.7:  # absolute to a random dataset (maybe dangling)
            tgt = (path_of(rng.randrange(0, n_groups)).rstrip("/") + f"/d{rng.randrange(0, n_ds + 1)}").replace("//", "/")
        else:  # relative sibling name (maybe dangling)
            names = list(groups[src]) or ["nothing"]
            tgt = rng.choice(names + ["missing"])
        groups[src][f"s{li}"] = ("s", tgt)

    # --- model resolution (the spec the parser must match)
    def model_resolve(base_gid, path, depth):
        if depth > 8:
            return "toodeep"
        cur = ("g", 0) if path.startswith("/") else ("g", base_gid)
        for part in (p for p in path.split("/") if p and p != "."):
            if cur[0] != "g":
                return None
            ent = groups[cur[1]].get(part)
            if ent is None:
                return None
            if ent[0] == "s":
                ent = model_resolve(cur[1], ent[1], depth + 1)
                if ent in (None, "toodeep"):
                    return ent
            cur = ent
        return cur

    expect = {}
    too_deep = False

    def model_walk(gid, prefix, on_path):
        nonlocal too_deep
        for name, ent in sorted(groups[gid].items()):
            tgt, via_soft = ent, False
            if ent[0] == "s":
                tgt = model_resolve(gid, ent[1], 0)
                via_soft = True
                if tgt == "toodeep":
                    too_deep = True
                    return
                if tgt is None:
                    continue
            if tgt[0] == "d":
                expect[prefix + name] = float(tgt[1])
            else:
                if via_soft and tgt[1] in on_path:
                    continue
                model_walk(tgt[1], f"{prefix}{name}/", on_path | {tgt[1]})

    model_walk(0, "", {0})

    # --- materialize the same tree as a real v3 file
    w = _WriterV3()
    ds_addr = {}
    for d in range(n_ds):
        ds_addr[d] = _contiguous_ds(w, np.full(3, float(d)))
    g_addr = {}
    for gid in sorted(groups, reverse=True):  # children before parents
        msgs = [_msg2(0x02, _link_info())]
        for name, ent in sorted(groups[gid].items()):
            if ent[0] == "g":
                msgs.append(_msg2(0x06, _link_msg(name, g_addr[ent[1]])))
            elif ent[0] == "d":
                msgs.append(_msg2(0x06, _link_msg(name, ds_addr[ent[1]])))
            else:
                msgs.append(_msg2(0x06, _soft_link_msg(name, ent[1])))
        g_addr[gid] = w.append(_ohdr2(msgs))
    p = str(tmp_path / f"model{seed}.h5")
    with open(p, "wb") as f:
        f.write(w.finish(g_addr[0]))

    if too_deep:
        with pytest.raises(NotImplementedError, match="soft-link chain"):
            H5File(p)
        return
    h5 = H5File(p)
    from rca_data_tools_spark.sources.hdf5 import read_dataset

    assert set(h5.datasets) == set(expect), (
        sorted(set(h5.datasets) ^ set(expect)), groups)
    for name, val in expect.items():
        np.testing.assert_array_equal(read_dataset(h5, name), np.full(3, val))


def _bt2_sizing(node_size: int, rec_size: int, depth: int):
    """The format's v2 B-tree field widths (H5B2 sizing): the child-nrec
    field uses the LEAF-level max's byte count at EVERY depth; the
    total-subtree field (below depth>=2 internals) sizes per level."""
    def enc(v):
        n = 1
        while v >= 1 << (8 * n):
            n += 1
        return n
    max_nrec = [(node_size - 10) // rec_size]
    cum = [max_nrec[0]]
    enc_leaf = enc(max_nrec[0])
    for d in range(1, depth + 1):
        ptr = 8 + enc_leaf + (enc(cum[d - 1]) if d >= 2 else 0)
        m = (node_size - 10 - ptr) // (rec_size + ptr)
        max_nrec.append(m)
        cum.append(m + (m + 1) * cum[d - 1])
    return enc_leaf, [enc(c) for c in cum], max_nrec


def _bt2_write_tree(w, btype, rec_size, node, level, enc_leaf, cum_encs):
    if node[0] == "leaf":
        addr = w.append(b"BTLF" + bytes([0, btype]) + b"".join(node[1]) + b"\x00" * 4)
        return addr, len(node[1]), len(node[1])
    _, recs, children = node
    kids = [
        _bt2_write_tree(w, btype, rec_size, c, level - 1, enc_leaf, cum_encs)
        for c in children
    ]
    body = b"BTIN" + bytes([0, btype]) + b"".join(recs)
    total = len(recs)
    for a, n, t in kids:
        body += struct.pack("<Q", a) + n.to_bytes(enc_leaf, "little")
        if level >= 2:
            body += t.to_bytes(cum_encs[level - 1], "little")
        total += t
    addr = w.append(body + b"\x00" * 4)
    return addr, len(recs), total


def test_v2_layout_v4_btree2_depth2_fixed_nrec_width(tmp_path):
    """Depth-2 tree at a geometry where the LEAF-level nrec width (2 bytes,
    340 max records) differs from the level-1 width (1 byte would fit 240)
    — the case that distinguishes the format's fixed leaf-based width from
    a per-level width. node_size=8192, rec_size=24: a per-level parser
    misaligns every root child pointer after the first."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    node_size, rec_size = 8192, 24
    enc_leaf, cum_encs, max_nrec = _bt2_sizing(node_size, rec_size, 2)
    assert enc_leaf == 2 and max_nrec[1] < 256  # the diverging geometry

    w = _WriterV3()
    arr = (np.arange(48, dtype="<f8") * 0.25).reshape(8, 6)
    recs = []
    for si in range(4):
        for sj in range(3):
            blk = np.ascontiguousarray(arr[si * 2 : si * 2 + 2, sj * 2 : sj * 2 + 2])
            recs.append(_enc_chunk_rec((w.append(blk.tobytes()), (si, sj)), 2, False))
    tree = (
        "int",
        [recs[5]],
        [
            ("int", [recs[2]], [("leaf", recs[0:2]), ("leaf", recs[3:5])]),
            ("int", [recs[8]], [("leaf", recs[6:8]), ("leaf", recs[9:12])]),
        ],
    )
    root_addr, nrec_root, total = _bt2_write_tree(w, 10, rec_size, tree, 2, enc_leaf, cum_encs)
    assert total == 12
    hdr = b"BTHD" + bytes([0, 10]) + struct.pack("<IHHBB", node_size, rec_size, 2, 100, 40)
    hdr += struct.pack("<QH", root_addr, nrec_root)
    hdr += struct.pack("<Q", total) + b"\x00" * 4
    idx = w.append(hdr)
    ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_btree2(idx, (2, 2))),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()), _msg2(0x06, _link_msg("x", ds)),
    ]))
    p = str(tmp_path / "bt2depth2.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    assert len(h5.datasets["x"].chunks) == 12
    np.testing.assert_array_equal(read_dataset(h5, "x"), arr)


def _fletcher32_c_loop(data: bytes) -> int:
    """Literal transliteration of H5checksum.c H5_checksum_fletcher32,
    360-word overflow folds included — the differential reference for the
    vectorized closed form in sources/hdf5.py."""
    ln = len(data) // 2
    sum1 = sum2 = 0
    pos = 0
    while ln:
        tlen = min(ln, 360)
        ln -= tlen
        for _ in range(tlen):
            sum1 += (data[pos] << 8) | data[pos + 1]
            pos += 2
            sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if len(data) % 2:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return (sum2 << 16) | sum1


def test_fletcher32_matches_c_loop():
    from rca_data_tools_spark.sources.hdf5 import fletcher32

    rng = np.random.RandomState(17)
    cases = [b"", b"a", b"abcde", b"\x00" * 1000, b"\xff" * 1001]
    cases += [rng.bytes(n) for n in (1, 2, 3, 719, 720, 721, 5000, 65537)]
    # adversarial: sums congruent to 0 mod 0xffff (representative edge)
    cases.append(b"\xff\xff" * 360 + b"\x00\x01")
    for data in cases:
        assert fletcher32(data) == _fletcher32_c_loop(data), data[:8]


def test_v2_fletcher32_filtered_dataset_reads_and_verifies(tmp_path):
    """deflate+fletcher32 pipeline (the libnetcdf fletcher32=True shape):
    checksum verifies and strips before the data is viewed; a corrupted
    chunk raises instead of returning garbage."""
    from rca_data_tools_spark.sources.hdf5 import (
        H5File,
        fletcher32,
        read_dataset,
    )

    w = _WriterV3()
    arr = (np.arange(24) * 1.25).astype("<f8")
    entries = []
    for lo in range(0, 24, 8):
        payload = arr[lo : lo + 8].tobytes()
        checksummed = payload + struct.pack("<I", fletcher32(payload))
        blob = zlib.compress(checksummed, 6)
        entries.append((w.append(blob), len(blob), 0))
    # pipeline order as written: [fletcher32, deflate] — decode reverses
    ds = w.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(
            _ext_array_index(w, entries, filtered=True), (8,), filtered=True)),
        _msg2(0x0B, _filter_pipeline([(3, ()), (1, (6,))])),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("v", ds)),
    ]))
    p = str(tmp_path / "flet.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    np.testing.assert_allclose(read_dataset(H5File(p), "v"), arr)

    # corrupt one stored checksum byte inside the first compressed chunk:
    # recompress a tampered payload into the same slot's entry
    payload = arr[0:8].tobytes()
    bad = payload + struct.pack("<I", fletcher32(payload) ^ 1)
    blob = zlib.compress(bad, 6)
    w2 = _WriterV3()
    e2 = [(w2.append(blob), len(blob), 0)]
    for lo in range(8, 24, 8):
        pl = arr[lo : lo + 8].tobytes()
        b2 = zlib.compress(pl + struct.pack("<I", fletcher32(pl)), 6)
        e2.append((w2.append(b2), len(b2), 0))
    ds2 = w2.append(_ohdr2([
        _msg2(0x01, _dataspace(arr.shape)),
        _msg2(0x03, _datatype(arr.dtype)),
        _msg2(0x08, _layout_v4_ext_array(
            _ext_array_index(w2, e2, filtered=True), (8,), filtered=True)),
        _msg2(0x0B, _filter_pipeline([(3, ()), (1, (6,))])),
    ]))
    root2 = w2.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("v", ds2)),
    ]))
    p2 = str(tmp_path / "flet_bad.h5")
    with open(p2, "wb") as f:
        f.write(w2.finish(root2))
    with pytest.raises(ValueError, match="fletcher32"):
        read_dataset(H5File(p2), "v")


def test_v2_soft_link_chain_crossing_external_link_raises_with_target(tmp_path):
    """A soft link whose chain CROSSES an external link must fail loudly
    naming the external target — not silently vanish from the listing
    (the pre-round-6 behavior), which dropped data reachable only through
    the chain while the directly-reached link worked. The external link
    itself resolves fine here (sibling target file exists), so the raise
    isolates the CHAIN path in _resolve_path, not the direct import."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    arr = np.arange(9, dtype="<f8")
    _write_target_file(tmp_path, arr)
    w = _WriterV3()
    g = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _external_link_msg("ext_g", "target.h5", "/g")),
    ]))
    root = w.append(_ohdr2([
        _msg2(0x02, _link_info()),
        _msg2(0x06, _link_msg("g", g)),
        # chain: /g/ext_g is an external link, /x lies beyond it
        _msg2(0x06, _soft_link_msg("via", "/g/ext_g/x")),
    ]))
    p = str(tmp_path / "soft_across_ext.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(NotImplementedError, match="target.h5"):
        H5File(p)
