"""Native minimal-HDF5 scan: fixture files are written by hand from the
public HDF5 File Format Specification (superblock v0, v1 object headers,
symbol-table group, contiguous + chunked/deflate/shuffle datasets — no HDF5
library exists in this runtime on either side), then parsed and scanned
distributed and compared against the source arrays."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

UNDEF = b"\xff" * 8


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _msg(mtype: int, data: bytes) -> bytes:
    data = _pad8(data)
    return struct.pack("<HHB3x", mtype, len(data), 0) + data


def _object_header(msgs: list[bytes]) -> bytes:
    body = b"".join(msgs)
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(body)) + body


def _dataspace(shape: tuple[int, ...]) -> bytes:
    return struct.pack("<BBB5x", 1, len(shape), 0) + b"".join(
        struct.pack("<Q", s) for s in shape
    )


def _datatype(dtype: np.dtype) -> bytes:
    if dtype.kind in "iu":
        bits0 = (0x08 if dtype.kind == "i" else 0) | (1 if dtype.byteorder == ">" else 0)
        head = struct.pack("<BBBBI", 0x10, bits0, 0, 0, dtype.itemsize)
        return head + struct.pack("<HH", 0, dtype.itemsize * 8)
    if dtype.kind == "f":
        bits0 = 1 if dtype.byteorder == ">" else 0
        head = struct.pack("<BBBBI", 0x11, bits0 | 0x20, 0x0F, 0, dtype.itemsize)
        if dtype.itemsize == 8:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        else:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        return head + props
    if dtype.kind == "S":  # fixed-length string, null-padded ASCII
        return struct.pack("<BBBBI", 0x13, 0, 0, 0, dtype.itemsize)
    raise AssertionError(dtype)


def _layout_contiguous(addr: int, size: int) -> bytes:
    return struct.pack("<BB", 3, 1) + struct.pack("<QQ", addr, size)


def _layout_chunked(btree_addr: int, chunk_shape: tuple[int, ...], elem: int) -> bytes:
    dims = list(chunk_shape) + [elem]
    return (
        struct.pack("<BBB", 3, 2, len(dims))
        + struct.pack("<Q", btree_addr)
        + b"".join(struct.pack("<I", d) for d in dims)
    )


def _attribute(name: str, value, dtype: np.dtype) -> bytes:
    """v1 attribute message with a scalar numeric value (_FillValue shape)."""
    nb = name.encode() + b"\x00"
    dt = _datatype(dtype)
    sp = struct.pack("<BBB5x", 1, 0, 0)  # scalar dataspace: rank 0
    body = struct.pack("<BxHHH", 1, len(nb), len(dt), len(sp))
    body += _pad8(nb) + _pad8(dt) + _pad8(sp)
    body += np.array([value], dtype=dtype).tobytes()
    return body


def _filter_pipeline(filters: list[tuple[int, tuple[int, ...]]]) -> bytes:
    out = struct.pack("<BB6x", 1, len(filters))
    for fid, cdv in filters:
        out += struct.pack("<HHHH", fid, 0, 0, len(cdv))
        out += b"".join(struct.pack("<I", v) for v in cdv)
        if len(cdv) % 2 == 1:
            out += b"\x00" * 4
    return out


def _chunk_btree(
    entries: list[tuple[tuple[int, ...], int, int, int]], ndims: int
) -> bytes:
    """Level-0 chunk B-tree: (offsets, addr, nbytes, mask) per chunk, plus
    the spec's trailing final key."""
    out = b"TREE" + struct.pack("<BBH", 1, 0, len(entries)) + UNDEF + UNDEF

    def key(offs, nbytes, mask):
        return struct.pack("<II", nbytes, mask) + b"".join(
            struct.pack("<Q", o) for o in list(offs) + [0]
        )

    for offs, addr, nbytes, mask in entries:
        out += key(offs, nbytes, mask) + struct.pack("<Q", addr)
    last = entries[-1]
    out += key([o + 1 for o in last[0]], 0, 0)  # final (upper bound) key
    return out


class _Writer:
    def __init__(self):
        self.buf = bytearray(96)  # superblock written last

    def append(self, b: bytes) -> int:
        addr = len(self.buf)
        self.buf += b
        return addr

    def finish(self, root_ohdr: int) -> bytes:
        sb = (
            b"\x89HDF\r\n\x1a\n"
            + struct.pack("<BBBBB", 0, 0, 0, 0, 0)  # versions sb/fs/root/res/shm
            + struct.pack("<BBB", 8, 8, 0)  # offsets, lengths, reserved
            + struct.pack("<HH", 4, 16)  # leaf k, internal k
            + struct.pack("<I", 0)  # consistency flags
            + struct.pack("<Q", 0)  # base address
            + UNDEF  # free space
            + struct.pack("<Q", len(self.buf))  # EOF
            + UNDEF  # driver info
            + struct.pack("<QQ", 0, root_ohdr)  # root symtab entry head
            + struct.pack("<II", 0, 0)
            + b"\x00" * 16
        )
        assert len(sb) == 96, len(sb)
        self.buf[:96] = sb
        return bytes(self.buf)


def write_h5(path, datasets: dict[str, dict]) -> None:
    """datasets: name -> {'array': np.ndarray, 'chunks': shape|None,
    'filters': [('deflate', level)|('shuffle',)]}."""
    w = _Writer()
    # local heap: names start at offset 8, 8-aligned
    names = sorted(datasets)
    heap_data = bytearray(b"\x00" * 8)
    name_offs = {}
    for n in names:
        name_offs[n] = len(heap_data)
        heap_data += n.encode() + b"\x00"
        heap_data += b"\x00" * ((8 - len(heap_data) % 8) % 8)
    heap_data_addr = w.append(bytes(heap_data))
    heap_addr = w.append(
        b"HEAP" + struct.pack("<B3x", 0) + struct.pack("<QQQ", len(heap_data), 0, heap_data_addr)
    )

    ohdr_addrs = {}
    for n in names:
        spec = datasets[n]
        if "vlen" in spec:  # variable-length strings via the global heap
            strs = [s.encode() for s in spec["vlen"]]
            body = b""
            for i, s in enumerate(strs, 1):
                body += struct.pack("<HH4xQ", i, 1, len(s)) + s
                body += b"\x00" * ((8 - len(s) % 8) % 8)
            total = 16 + len(body) + 16  # header + objects + free space
            gcol = (
                b"GCOL" + struct.pack("<B3x", 1) + struct.pack("<Q", total)
                + body + struct.pack("<HH4xQ", 0, 0, 16)
            )
            gaddr = w.append(gcol)
            desc = b"".join(
                struct.pack("<IQI", len(s), gaddr, i)
                for i, s in enumerate(strs, 1)
            )
            daddr = w.append(desc)
            vdt = struct.pack("<BBBBI", 0x19, 0x01, 0, 0, 16)  # class 9, string
            vdt += struct.pack("<BBBBI", 0x13, 0, 0, 0, 1)  # base: S1
            ohdr_addrs[n] = w.append(_object_header([
                _msg(0x0001, _dataspace((len(strs),))),
                _msg(0x0003, vdt),
                _msg(0x0008, _layout_contiguous(daddr, len(desc))),
            ]))
            continue
        arr = np.ascontiguousarray(spec["array"])
        msgs = [_msg(0x0001, _dataspace(arr.shape)), _msg(0x0003, _datatype(arr.dtype))]
        if spec.get("fill") is not None:
            msgs.append(_msg(0x000C, _attribute("_FillValue", spec["fill"], arr.dtype)))
        for aname, (aval, adt) in (spec.get("attrs") or {}).items():
            msgs.append(_msg(0x000C, _attribute(aname, aval, np.dtype(adt))))
        if spec.get("chunks") is None:
            raw = arr.tobytes()
            addr = w.append(raw)
            msgs.append(_msg(0x0008, _layout_contiguous(addr, len(raw))))
        else:
            cshape = tuple(spec["chunks"])
            filters = []
            for f in spec.get("filters", ()):
                if f[0] == "shuffle":
                    filters.append((2, (arr.dtype.itemsize,)))
                elif f[0] == "deflate":
                    filters.append((1, (f[1],)))
            entries = []
            grid = [range(0, s, c) for s, c in zip(arr.shape, cshape)]
            import itertools

            for offs in itertools.product(*grid):
                sel = tuple(slice(o, o + c) for o, c in zip(offs, cshape))
                chunk = np.zeros(cshape, dtype=arr.dtype)
                part = arr[sel]
                chunk[tuple(slice(0, s) for s in part.shape)] = part
                data = chunk.tobytes()
                for fid, cdv in filters:  # forward application order
                    if fid == 2:
                        elem = cdv[0]
                        a = np.frombuffer(data, dtype=np.uint8)
                        data = a.reshape(len(a) // elem, elem).T.tobytes()
                    else:
                        data = zlib.compress(data, cdv[0])
                addr = w.append(data)
                entries.append((offs, addr, len(data), 0))
            btree_addr = w.append(_chunk_btree(entries, len(cshape)))
            msgs.append(
                _msg(0x0008, _layout_chunked(btree_addr, cshape, arr.dtype.itemsize))
            )
            if filters:
                msgs.append(_msg(0x000B, _filter_pipeline(filters)))
        ohdr_addrs[n] = w.append(_object_header(msgs))

    # symbol node + group B-tree + root object header
    snod = b"SNOD" + struct.pack("<BxH", 1, len(names))
    for n in names:
        snod += struct.pack("<QQII", name_offs[n], ohdr_addrs[n], 0, 0) + b"\x00" * 16
    snod_addr = w.append(snod)
    btree = (
        b"TREE"
        + struct.pack("<BBH", 0, 0, 1)
        + UNDEF
        + UNDEF
        + struct.pack("<Q", name_offs[names[0]])
        + struct.pack("<Q", snod_addr)
        + struct.pack("<Q", name_offs[names[-1]])
    )
    btree_addr = w.append(btree)
    root = _object_header([_msg(0x0011, struct.pack("<QQ", btree_addr, heap_addr))])
    root_addr = w.append(root)
    with open(path, "wb") as f:
        f.write(w.finish(root_addr))


@pytest.fixture()
def h5_file(tmp_path):
    rng = np.random.RandomState(7)
    time = np.arange(100, dtype="<f8") * 10.0
    temp = rng.randn(100).astype("<f8")
    counts = (rng.rand(100) * 1000).astype("<i4")
    spectra = rng.randn(100, 5).astype("<f8")
    path = str(tmp_path / "deploy.nc")
    write_h5(
        path,
        {
            "time": {"array": time, "chunks": None},
            "temp": {"array": temp, "chunks": (32,), "filters": [("shuffle",), ("deflate", 6)]},
            "counts": {"array": counts, "chunks": (40,), "filters": [("deflate", 4)]},
            "spectra": {"array": spectra, "chunks": (32, 5), "filters": [("shuffle",), ("deflate", 6)]},
        },
    )
    return path, {"time": time, "temp": temp, "counts": counts, "spectra": spectra}


def test_metadata_parse(h5_file):
    from rca_data_tools_spark.sources.hdf5 import H5File

    path, arrays = h5_file
    h5 = H5File(path)
    assert sorted(h5.datasets) == sorted(arrays)
    assert h5.datasets["time"].layout == "contiguous"
    assert h5.datasets["temp"].layout == "chunked"
    assert h5.datasets["temp"].chunk_shape == (32,)
    assert [f for f, _ in h5.datasets["temp"].filters] == [2, 1]
    assert h5.datasets["counts"].dtype == np.dtype("<i4")
    assert h5.datasets["spectra"].shape == (100, 5)
    # 100 rows / chunk0 32 -> 4 chunks along dim0
    assert len(h5.datasets["temp"].chunks) == 4


def test_whole_array_read(h5_file):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    path, arrays = h5_file
    h5 = H5File(path)
    for name, expect in arrays.items():
        np.testing.assert_array_equal(read_dataset(h5, name), expect)


def test_distributed_scan(spark, h5_file):
    from rca_data_tools_spark.sources.netcdf import netcdf4_table

    path, arrays = h5_file
    df = netcdf4_table(
        spark, path, ["time", "temp", "counts", "spectra"], records_per_task=17
    )
    rows = df.orderBy("idx").collect()
    assert len(rows) == 100
    got_t = np.array([r["time"] for r in rows])
    np.testing.assert_allclose(got_t, arrays["time"])
    np.testing.assert_allclose(np.array([r["temp"] for r in rows]), arrays["temp"])
    np.testing.assert_allclose(
        np.array([r["counts"] for r in rows]), arrays["counts"].astype("f8")
    )
    np.testing.assert_allclose(
        np.array([list(r["spectra"]) for r in rows]), arrays["spectra"]
    )


def test_netcdf_table_routes_hdf5(spark, h5_file):
    from rca_data_tools_spark.sources.netcdf import netcdf_table

    path, arrays = h5_file
    df = netcdf_table(spark, path, ["time", "temp"])
    assert df.count() == 100


def test_unknown_filter_raises(tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File

    path = str(tmp_path / "bad.nc")
    arr = np.arange(10, dtype="<f8")
    write_h5(path, {"x": {"array": arr, "chunks": (4,), "filters": [("deflate", 1)]}})
    # patch the filter id to szip (unsupported)
    data = bytearray(open(path, "rb").read())
    idx = data.find(struct.pack("<HHHH", 1, 0, 0, 1))
    assert idx > 0
    data[idx : idx + 2] = struct.pack("<H", 4)
    open(path, "wb").write(bytes(data))
    with pytest.raises(NotImplementedError, match="filter id 4"):
        H5File(path)


def test_big_endian_and_missing_variable(tmp_path, spark):
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset
    from rca_data_tools_spark.sources.netcdf import netcdf4_table

    path = str(tmp_path / "be.nc")
    arr = np.arange(20, dtype=">f4")
    write_h5(path, {"v": {"array": arr, "chunks": None}})
    h5 = H5File(path)
    np.testing.assert_array_equal(read_dataset(h5, "v"), arr)
    with pytest.raises(KeyError, match="not in"):
        netcdf4_table(spark, path, ["nope"])


def test_fillvalue_attribute_to_null(spark, tmp_path):
    from rca_data_tools_spark.sources.hdf5 import H5File
    from rca_data_tools_spark.sources.netcdf import netcdf4_table

    path = str(tmp_path / "fill.nc")
    vals = np.arange(30, dtype="<f8")
    vals[7] = -9999.0
    vals[21] = -9999.0
    write_h5(
        path,
        {"v": {"array": vals, "chunks": (8,), "filters": [("deflate", 1)], "fill": -9999.0}},
    )
    h5 = H5File(path)
    assert h5.datasets["v"].attrs == {"_FillValue": -9999.0}
    rows = netcdf4_table(spark, path, ["v"], records_per_task=9).orderBy("idx").collect()
    got = [r["v"] for r in rows]
    assert got[7] is None and got[21] is None
    np.testing.assert_allclose(
        [g for i, g in enumerate(got) if i not in (7, 21)],
        [v for i, v in enumerate(vals) if i not in (7, 21)],
    )


def test_filter_pipeline_v2_short_layout(tmp_path):
    """Version-2 filter pipelines omit the Name Length field for ids < 256
    (and pad nothing); both layouts must parse to the same filters."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    h5 = H5File.__new__(H5File)  # parser methods only
    # v2, 2 filters: shuffle(id=2, cdv=[8]) then deflate(id=1, cdv=[6])
    v2 = struct.pack("<BB", 2, 2)
    v2 += struct.pack("<HHH", 2, 0, 1) + struct.pack("<I", 8)
    v2 += struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6)
    assert h5._parse_filters(v2) == [(2, (8,)), (1, (6,))]
    # v1 equivalent (from the fixture writer) parses identically
    v1 = _filter_pipeline([(2, (8,)), (1, (6,))])
    assert h5._parse_filters(v1) == [(2, (8,)), (1, (6,))]
    # v2 with a registered (id >= 256) filter carrying a name
    name = b"myfilt"
    v2n = struct.pack("<BB", 2, 1)
    v2n += struct.pack("<HHHH", 300, len(name), 0, 2) + name + struct.pack("<II", 7, 9)
    assert h5._parse_filters(v2n) == [(300, (7, 9))]


def test_mixed_format_directory_scan(spark, tmp_path, h5_file):
    """A directory mixing classic CDF-1 and NetCDF-4 files reads as one
    table with file provenance."""
    import shutil

    from rca_data_tools_spark.sources.netcdf import netcdf_dataset_table

    h5_path, arrays = h5_file
    d = tmp_path / "deployments"
    d.mkdir()
    shutil.copy(h5_path, d / "deploy2.nc")
    shutil.copy(h5_path, d / "deploy1.nc")
    df = netcdf_dataset_table(spark, str(d), ["time", "temp"], records_per_task=33)
    assert df.count() == 200
    assert df.select("file_id").distinct().count() == 2
    one = df.filter("file_id = 0").orderBy("idx").collect()
    np.testing.assert_allclose([r["time"] for r in one], arrays["time"])


def _stab_group(w, children: dict[str, int], soft: "dict[str, str] | None" = None) -> int:
    """Append heap + SNOD + TREE + object header for an old-style group whose
    members are ``children`` (name -> object header address) plus optional
    ``soft`` symbolic links (name -> target path, stored as cache-type-2
    entries with the link value in the local heap); returns the group's
    object header address."""
    soft = soft or {}
    names = sorted({**children, **soft})
    heap_data = bytearray(b"\x00" * 8)
    offs, val_offs = {}, {}
    for n in names:
        offs[n] = len(heap_data)
        heap_data += n.encode() + b"\x00"
        heap_data += b"\x00" * ((8 - len(heap_data) % 8) % 8)
    for n, target in soft.items():
        val_offs[n] = len(heap_data)
        heap_data += target.encode() + b"\x00"
        heap_data += b"\x00" * ((8 - len(heap_data) % 8) % 8)
    heap_data_addr = w.append(bytes(heap_data))
    heap_addr = w.append(
        b"HEAP" + struct.pack("<B3x", 0)
        + struct.pack("<QQQ", len(heap_data), 0, heap_data_addr)
    )
    snod = b"SNOD" + struct.pack("<BxH", 1, len(names))
    for n in names:
        if n in soft:
            snod += (
                struct.pack("<QQII", offs[n], 0, 2, 0)
                + struct.pack("<I", val_offs[n])
                + b"\x00" * 12
            )
        else:
            snod += struct.pack("<QQII", offs[n], children[n], 0, 0) + b"\x00" * 16
    snod_addr = w.append(snod)
    btree = (
        b"TREE" + struct.pack("<BBH", 0, 0, 1) + UNDEF + UNDEF
        + struct.pack("<Q", offs[names[0]]) + struct.pack("<Q", snod_addr)
        + struct.pack("<Q", offs[names[-1]])
    )
    btree_addr = w.append(btree)
    return w.append(_object_header([_msg(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]))


def test_hard_link_dag_alias_is_legal(tmp_path):
    """One group object header linked from TWO parent groups is a legal
    non-cyclic DAG (HDF5 hard links): both paths must scan — only an
    ancestor repeating on its own descent is a cycle."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _Writer()
    arr = np.arange(6, dtype="<f8")
    raw_addr = w.append(arr.tobytes())
    ds_ohdr = w.append(_object_header([
        _msg(0x0001, _dataspace(arr.shape)),
        _msg(0x0003, _datatype(arr.dtype)),
        _msg(0x0008, _layout_contiguous(raw_addr, arr.nbytes)),
    ]))
    shared = _stab_group(w, {"x": ds_ohdr})      # the aliased group
    root = _stab_group(w, {"a": shared, "b": shared})
    p = str(tmp_path / "dag.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    assert set(h5.datasets) == {"a/x", "b/x"}
    np.testing.assert_array_equal(read_dataset(h5, "a/x"), arr)
    np.testing.assert_array_equal(read_dataset(h5, "b/x"), arr)


def test_old_style_symbolic_link_resolves(tmp_path):
    """Old-style (symbol-table) groups store soft links as cache-type-2
    entries whose value string lives in the group's local heap; the scan
    must alias the target like the 1.8+ link-message form, and skip a
    dangling one."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    w = _Writer()
    arr = np.arange(5, dtype="<f8")
    raw_addr = w.append(arr.tobytes())
    ds_ohdr = w.append(_object_header([
        _msg(0x0001, _dataspace(arr.shape)),
        _msg(0x0003, _datatype(arr.dtype)),
        _msg(0x0008, _layout_contiguous(raw_addr, arr.nbytes)),
    ]))
    g = _stab_group(w, {"x": ds_ohdr})
    root = _stab_group(
        w, {"g": g},
        soft={"abs_x": "/g/x", "rel_g": "g", "gone": "/not/here"},
    )
    p = str(tmp_path / "stab_soft.h5")
    with open(p, "wb") as f:
        f.write(w.finish(root))
    h5 = H5File(p)
    assert set(h5.datasets) == {"g/x", "abs_x", "rel_g/x"}
    np.testing.assert_array_equal(read_dataset(h5, "abs_x"), arr)
    np.testing.assert_array_equal(read_dataset(h5, "rel_g/x"), arr)


def test_group_ancestor_cycle_raises(tmp_path):
    """A group whose member IS an ancestor's object header (true cycle in
    the link graph) must fail loudly, not recurse forever."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    w = _Writer()
    # build inner group first with a placeholder child, then a root linking
    # to it; patch the inner SNOD to point back at root afterwards
    dummy = w.append(_object_header([]))  # placeholder object
    inner = _stab_group(w, {"back": dummy})
    root = _stab_group(w, {"g": inner})
    blob = bytearray(w.finish(root))
    # patch: the SNOD entry of `inner` holds `dummy`'s address; repoint to root
    pos = blob.find(struct.pack("<Q", dummy), 0)
    while pos != -1:
        # the address appears inside the SNOD entry (offset 8 within entry)
        if blob[pos - 8 : pos - 4] != b"SNOD":  # crude but deterministic here
            blob[pos : pos + 8] = struct.pack("<Q", root)
        pos = blob.find(struct.pack("<Q", dummy), pos + 1)
    p = str(tmp_path / "cycle2.h5")
    with open(p, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="cyclic"):
        H5File(p)


def test_netcdf4_row_range_pruned_scan(spark, h5_file):
    """row_range pruning: only the overlapping row-block tasks are planned
    and each clips to the slice; result equals the full scan filtered on
    idx. Time-based bounds come from h5_time_row_range, bisecting the
    monotone time variable without reading it whole."""
    from rca_data_tools_spark.sources.netcdf import h5_time_row_range, netcdf4_table

    path, arrays = h5_file
    t = arrays["time"]
    lo_t, hi_t = float(t[23]), float(t[77])
    row_lo, row_hi = h5_time_row_range(path, "time", lo_t, hi_t)
    assert (row_lo, row_hi) == (23, 77)

    full = netcdf4_table(
        spark, path, ["time", "temp", "spectra"], records_per_task=17
    ).collect()
    expect = sorted(
        (r["idx"], r["time"], r["temp"], tuple(r["spectra"])) for r in full
        if 23 <= r["idx"] < 77
    )
    pruned = netcdf4_table(
        spark, path, ["time", "temp", "spectra"], records_per_task=17,
        row_range=(row_lo, row_hi),
    ).collect()
    assert sorted((r["idx"], r["time"], r["temp"], tuple(r["spectra"])) for r in pruned) == expect
    assert len(pruned) == 54

    empty = netcdf4_table(spark, path, ["time"], row_range=(5, 5))
    assert empty.count() == 0 and [f.name for f in empty.schema.fields] == ["idx", "time"]


def test_dataset_collection_time_pruning(spark, tmp_path):
    """Collection-level time pruning over a MIXED directory: a NetCDF-4
    file entirely outside the slice drops out of the plan (file skip), a
    NetCDF-4 file overlapping it scans only its rows, and a classic file
    filters to the same semantics — one table, exact slice."""
    from tests.test_netcdf import _write_classic

    from rca_data_tools_spark.sources.netcdf import netcdf_dataset_table

    d = tmp_path / "coll"
    d.mkdir()
    rng = np.random.RandomState(3)
    # file a: HDF5, time 0..990 — fully OUTSIDE the slice
    write_h5(str(d / "a.nc"), {
        "time": {"array": np.arange(100, dtype="<f8") * 10.0, "chunks": None},
        "temp": {"array": rng.randn(100).astype("<f8"), "chunks": (32,), "filters": [("deflate", 4)]},
    })
    # file b: HDF5, time 1000..1990 — slice overlaps rows 20..49
    tb = 1000.0 + np.arange(100, dtype="<f8") * 10.0
    vb = rng.randn(100).astype("<f8")
    write_h5(str(d / "b.nc"), {
        "time": {"array": tb, "chunks": None},
        "temp": {"array": vb, "chunks": (32,), "filters": [("deflate", 4)]},
    })
    # file c: classic CDF-1, time 1100..1400 step 20 — partly inside
    tc = 1100.0 + np.arange(16, dtype=np.float64) * 20.0
    vc = rng.uniform(2, 10, 16)
    _write_classic(str(d / "c.nc"), tc, vc, rng.uniform(0, 1, (16, 3)), np.array([5.0]))

    lo, hi = 1200.0, 1500.0
    df = netcdf_dataset_table(
        spark, str(d), ["time", "temp"], records_per_task=33,
        time_var="time", time_range=(lo, hi),
    )
    rows = df.collect()
    # file a (file_id 0) skipped entirely; b and c contribute their slices
    assert {r["file_id"] for r in rows} == {1, 2}
    for r in rows:
        assert lo <= r["time"] < hi
    got_b = sorted(r["time"] for r in rows if r["file_id"] == 1)
    assert got_b == [t for t in tb if lo <= t < hi]
    got_c = sorted(r["time"] for r in rows if r["file_id"] == 2)
    assert got_c == [t for t in tc if lo <= t < hi]

    # slice hitting nothing: empty but well-typed
    none = netcdf_dataset_table(
        spark, str(d), ["time", "temp"], time_var="time", time_range=(9e9, 9.1e9)
    )
    assert none.count() == 0
    assert [f.name for f in none.schema.fields] == ["file_id", "idx", "time", "temp"]


def test_cf_packed_netcdf4_unpacks(spark, tmp_path):
    """CF packed data through the native HDF5 path: int16 + scale_factor /
    add_offset attributes scan as unpacked doubles, declared _FillValue
    matching the PACKED value -> NULL (fill masks BEFORE unpacking)."""
    from rca_data_tools_spark.sources.netcdf import netcdf4_table

    path = str(tmp_path / "packed4.nc")
    packed = np.array([100, 250, -32768, -50, 0], dtype="<i2")
    write_h5(
        path,
        {"sst": {
            "array": packed, "chunks": (3,), "filters": [("deflate", 1)],
            "fill": -32768,
            "attrs": {"scale_factor": (0.01, "<f8"),
                      "add_offset": (20.0, "<f8")},
        }},
    )
    rows = netcdf4_table(spark, path, ["sst"], records_per_task=2).orderBy("idx").collect()
    got = [r["sst"] for r in rows]
    assert got[2] is None
    np.testing.assert_allclose(
        [got[0], got[1], got[3], got[4]], [21.0, 22.5, 19.5, 20.0]
    )


def test_char_and_fixed_string_datasets_scan_as_strings(spark, tmp_path):
    """netCDF-4 NC_CHAR arrays (2-D of S1) and HDF5 fixed-length strings
    (1-D of Sn) both scan as string columns with padding stripped."""
    from rca_data_tools_spark.sources.netcdf import netcdf4_table

    path = str(tmp_path / "strings.nc")
    chars = np.array(
        [list(b"CE04"), list(b"RS03"), list(b"\x00\x00\x00\x00"),
         list(b"AX1\x00")],
        dtype="u1",
    ).view("S1")
    fixed = np.array([b"alpha", b"beta\x00", b"\x00" * 5, b"gamma"], dtype="S5")
    temps = np.array([4.5, 5.25, 6.0, 7.75], dtype="<f8")
    write_h5(
        path,
        {
            "station": {"array": chars, "chunks": None},
            "label": {"array": fixed, "chunks": None},
            "temp": {"array": temps, "chunks": (2,), "filters": [("deflate", 1)]},
        },
    )
    df = netcdf4_table(spark, path, ["station", "label", "temp"],
                       records_per_task=3)
    types = dict(df.dtypes)
    assert types["station"] == "string" and types["label"] == "string"
    rows = df.orderBy("idx").collect()
    assert [r["station"] for r in rows] == ["CE04", "RS03", "", "AX1"]
    assert [r["label"] for r in rows] == ["alpha", "beta", "", "gamma"]
    np.testing.assert_allclose([r["temp"] for r in rows], temps)


def test_h5_time_row_range_cf_packed(tmp_path):
    """Physical time bounds bisect correctly against a CF-packed (int16 +
    scale/offset) time coordinate: bounds transform into packed space."""
    from rca_data_tools_spark.sources.netcdf import h5_time_row_range

    path = str(tmp_path / "ptime.nc")
    packed = np.arange(12, dtype="<i2")  # physical t = p*10 + 1000
    write_h5(
        path,
        {"time": {"array": packed, "chunks": (5,), "filters": [("deflate", 1)],
                  "attrs": {"scale_factor": (10.0, "<f8"),
                            "add_offset": (1000.0, "<f8")}}},
    )
    assert h5_time_row_range(path, "time", 1020.0, 1070.0) == (2, 7)


def test_vlen_string_dataset_scans(spark, tmp_path):
    """netCDF-4 NC_STRING (HDF5 vlen strings): descriptors resolve through
    the global heap into a string column; empty strings round-trip."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_vlen_strings
    from rca_data_tools_spark.sources.netcdf import netcdf4_table

    path = str(tmp_path / "vlen.nc")
    labels = ["surface", "mid-water column", "", "benthic", "profiler-leg-7"]
    temps = np.array([1.5, 2.5, 3.5, 4.5, 5.5], dtype="<f8")
    write_h5(
        path,
        {"label": {"vlen": labels},
         "temp": {"array": temps, "chunks": None}},
    )
    # driver-side resolution helper
    h5 = H5File(path)
    ds = h5.datasets["label"]
    assert ds.dtype.kind == "V" and ds.dtype.itemsize == 16
    # distributed scan face
    df = netcdf4_table(spark, path, ["label", "temp"], records_per_task=2)
    assert dict(df.dtypes)["label"] == "string"
    rows = df.orderBy("idx").collect()
    assert [r["label"] for r in rows] == labels
    np.testing.assert_allclose([r["temp"] for r in rows], temps)


def test_vlen_sequence_datatype_refuses(tmp_path):
    """A vlen SEQUENCE (netCDF-4 user vlen types) must refuse loudly, not
    mis-read descriptors as data."""
    from rca_data_tools_spark.sources.hdf5 import H5File

    path = str(tmp_path / "vseq.nc")
    w = _Writer()
    vdt = struct.pack("<BBBBI", 0x19, 0x00, 0, 0, 16)  # class 9, sequence
    vdt += struct.pack("<BBBBI", 0x10, 0x08, 0, 0, 4) + struct.pack("<HH", 0, 32)
    daddr = w.append(b"\x00" * 32)
    ohdr = w.append(_object_header([
        _msg(0x0001, _dataspace((2,))),
        _msg(0x0003, vdt),
        _msg(0x0008, _layout_contiguous(daddr, 32)),
    ]))
    heap_data = bytearray(b"\x00" * 8) + b"seq\x00" + b"\x00" * 4
    hd = w.append(bytes(heap_data))
    heap = w.append(b"HEAP" + struct.pack("<B3x", 0) + struct.pack("<QQQ", len(heap_data), 0, hd))
    snod = b"SNOD" + struct.pack("<BxH", 1, 1)
    snod += struct.pack("<QQII", 8, ohdr, 0, 0) + b"\x00" * 16
    sa = w.append(snod)
    btree = (b"TREE" + struct.pack("<BBH", 0, 0, 1) + UNDEF + UNDEF
             + struct.pack("<Q", 8) + struct.pack("<Q", sa) + struct.pack("<Q", 8))
    ba = w.append(btree)
    root = w.append(_object_header([_msg(0x0011, struct.pack("<QQ", ba, heap))]))
    with open(path, "wb") as f:
        f.write(w.finish(root))
    with pytest.raises(NotImplementedError, match="SEQUENCE"):
        H5File(path)


def test_h5_time_row_range_negative_scale_refuses(tmp_path):
    """A negative scale_factor makes the PACKED coordinate decreasing while
    the physical axis is non-decreasing; the bisect assumes non-decreasing
    input, so the scan must refuse loudly (silent mis-slice otherwise)."""
    import pytest

    from rca_data_tools_spark.sources.netcdf import h5_time_row_range

    path = str(tmp_path / "negscale.nc")
    packed = -np.arange(12, dtype="<i2")  # physical t = p*(-10) + 1000, rising
    write_h5(
        path,
        {"time": {"array": packed, "chunks": (5,), "filters": [],
                  "attrs": {"scale_factor": (-10.0, "<f8"),
                            "add_offset": (1000.0, "<f8")}}},
    )
    with pytest.raises(NotImplementedError, match="negative scale_factor"):
        h5_time_row_range(path, "time", 1020.0, 1070.0)
