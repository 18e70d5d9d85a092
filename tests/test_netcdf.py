"""Native classic-NetCDF scan: CDF-1 files are written by hand from the
public format spec (big-endian header + record-interleaved data — no netCDF
library exists in the runtime on either side), then scanned distributed and
compared against the source arrays."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">I", len(b)) + b + b"\x00" * ((4 - len(b) % 4) % 4)


def _write_classic(path, time, temp, spectra, depth):
    """CDF-1 file: record dim time (UNLIMITED), fixed dims k=3 and z;
    record vars time/temp/spectra interleave per record, fixed var depth
    sits before the record block."""
    n = len(time)
    dims = [("time", 0), ("k", 3), ("z", len(depth))]
    absent = struct.pack(">II", 0, 0)
    rec_slabs = [8, 8, 24]  # time f8, temp f8, spectra 3*f8
    rec_size = sum(rec_slabs)

    def var_entry(name, dimids, begin, vsize):
        return (
            _name(name)
            + struct.pack(">I", len(dimids))
            + b"".join(struct.pack(">I", d) for d in dimids)
            + absent
            + struct.pack(">III", 6, vsize, begin)  # NC_DOUBLE
        )

    # assemble with dummy begins to learn the header length
    def header(begins):
        h = b"CDF\x01" + struct.pack(">I", n)
        h += struct.pack(">II", 0x0A, len(dims))
        for dname, dsize in dims:
            h += _name(dname) + struct.pack(">I", dsize)
        h += absent  # global attrs
        h += struct.pack(">II", 0x0B, 4)
        h += var_entry("depth", [2], begins[0], len(depth) * 8)
        h += var_entry("time", [0], begins[1], 8)
        h += var_entry("temp", [0], begins[2], 8)
        h += var_entry("spectra", [0, 1], begins[3], 24)
        return h

    hlen = len(header([0, 0, 0, 0]))
    b_depth = hlen
    base = hlen + len(depth) * 8
    begins = [b_depth, base, base + 8, base + 16]
    body = np.asarray(depth, dtype=">f8").tobytes()
    for r in range(n):
        body += struct.pack(">d", time[r]) + struct.pack(">d", temp[r])
        body += np.asarray(spectra[r], dtype=">f8").tobytes()
    with open(path, "wb") as f:
        f.write(header(begins) + body)
    assert rec_size == 40


@pytest.fixture()
def nc_file(tmp_path):
    rng = np.random.RandomState(11)
    n = 57
    time = np.arange(n, dtype=np.float64) * 3600.0
    temp = rng.uniform(2, 10, n)
    spectra = rng.uniform(0, 1, (n, 3))
    depth = np.array([5.0, 10.0, 15.0, 20.0])
    path = str(tmp_path / "inst.nc")
    _write_classic(path, time, temp, spectra, depth)
    return path, time, temp, spectra, depth


def test_header_parse(nc_file):
    from rca_data_tools_spark.sources.netcdf import read_header

    path, time, *_ = nc_file
    h = read_header(path)
    assert h["numrecs"] == len(time)
    assert h["variables"]["temp"]["record"] is True
    assert h["variables"]["spectra"]["shape"][1:] == [3]
    assert h["variables"]["depth"]["record"] is False
    assert h["rec_size"] == 40


def test_scan_values_record_and_2d(spark, nc_file):
    from rca_data_tools_spark.sources.netcdf import netcdf_table

    path, time, temp, spectra, depth = nc_file
    df = netcdf_table(spark, path, ["time", "temp", "spectra"], records_per_task=20)
    rows = {r["idx"]: r for r in df.collect()}
    assert len(rows) == 57
    for i in (0, 19, 20, 56):  # chunk interior and boundaries
        assert rows[i]["time"] == pytest.approx(time[i])
        assert rows[i]["temp"] == pytest.approx(temp[i])
        assert rows[i]["spectra"] == pytest.approx(list(spectra[i]))


def test_scan_fixed_var(spark, nc_file):
    from rca_data_tools_spark.sources.netcdf import netcdf_table

    path, *_, depth = nc_file
    df = netcdf_table(spark, path, ["depth"])
    got = [r["depth"] for r in df.orderBy("idx").collect()]
    assert got == pytest.approx(list(depth))


def test_netcdf4_and_mismatches_fail_loudly(spark, tmp_path, nc_file):
    from rca_data_tools_spark.sources.netcdf import netcdf_table, netcdf4_table, read_header

    hdf = tmp_path / "x.nc"
    hdf.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="HDF5"):
        read_header(str(hdf))
    # truncated/garbage HDF5 (zeroed superblock fields) still fails loudly in
    # the native reader rather than mis-parsing
    with pytest.raises(NotImplementedError, match="8-byte"):
        netcdf4_table(spark, str(hdf), ["x"])
    path, *_ = nc_file
    with pytest.raises(ValueError, match="dim-0"):
        netcdf_table(spark, path, ["time", "depth"])  # 57 vs 4 rows


def test_streaming_sentinel_numrecs(tmp_path, nc_file):
    """numrecs == 0xFFFFFFFF (the spec's STREAMING sentinel) must be derived
    from file size / record stride, not used as a literal row count."""
    from rca_data_tools_spark.sources.netcdf import read_header

    path, time, *_ = nc_file
    data = bytearray(open(path, "rb").read())
    data[4:8] = struct.pack(">I", 0xFFFFFFFF)
    p2 = str(tmp_path / "streaming.nc")
    open(p2, "wb").write(bytes(data))
    h = read_header(p2)
    assert h["numrecs"] == len(time)


def test_single_record_variable_packing(spark, tmp_path):
    """Spec special case: with exactly ONE record variable the record slabs
    are packed without per-record 4-byte padding — the stride is the bare
    slab size even though vsize is padded."""
    from rca_data_tools_spark.sources.netcdf import netcdf_table, read_header

    n = 9
    vals = (np.arange(n) * 3).astype(">i2")  # arithmetic before the big-endian cast
    absent = struct.pack(">II", 0, 0)

    def header(begin):
        h = b"CDF\x01" + struct.pack(">I", n)
        h += struct.pack(">II", 0x0A, 1) + _name("time") + struct.pack(">I", 0)
        h += absent  # global attrs
        h += struct.pack(">II", 0x0B, 1)
        h += (
            _name("v")
            + struct.pack(">I", 1)
            + struct.pack(">I", 0)
            + absent
            + struct.pack(">III", 3, 4, begin)  # NC_SHORT, padded vsize=4
        )
        return h

    hlen = len(header(0))
    path = str(tmp_path / "packed.nc")
    with open(path, "wb") as f:
        f.write(header(hlen) + vals.tobytes())  # stride 2, no padding
    h = read_header(path)
    assert h["rec_size"] == 2
    rows = {r["idx"]: r["v"] for r in netcdf_table(spark, path, ["v"]).collect()}
    assert rows == {i: float(vals[i]) for i in range(n)}


def test_cdf2_64bit_offsets(spark, tmp_path):
    """CDF-2 ('CDF\\x02'): identical layout but variable begins are 64-bit.
    Covers the offset64 header branch end-to-end."""
    from rca_data_tools_spark.sources.netcdf import netcdf_table, read_header

    n = 7
    vals = (np.arange(n) * 1.5).astype(">f8")
    absent = struct.pack(">II", 0, 0)

    def header(begin):
        h = b"CDF\x02" + struct.pack(">I", n)
        h += struct.pack(">II", 0x0A, 1) + _name("time") + struct.pack(">I", 0)
        h += absent
        h += struct.pack(">II", 0x0B, 1)
        h += (
            _name("v")
            + struct.pack(">I", 1)
            + struct.pack(">I", 0)
            + absent
            + struct.pack(">II", 6, 8)  # NC_DOUBLE, vsize 8
            + struct.pack(">Q", begin)  # 64-bit begin
        )
        return h

    hlen = len(header(0))
    path = str(tmp_path / "cdf2.nc")
    with open(path, "wb") as f:
        f.write(header(hlen) + vals.tobytes())
    h = read_header(path)
    assert h["variables"]["v"]["begin"] == hlen
    rows = {r["idx"]: r["v"] for r in netcdf_table(spark, path, ["v"]).collect()}
    assert rows == {i: float(vals[i]) for i in range(n)}


def test_cdf5_64bit_data(spark, tmp_path):
    """CDF-5 ('CDF\\x05', the PnetCDF 64-bit data variant): every NON_NEG in
    the BNF widens to 8 bytes (numrecs, counts, name lengths, dim lengths,
    ndims, dimids, vsize) and the new unsigned/64-bit types decode. Fixture
    hand-written from the public classic-format spec appendix, with an
    int64 record variable and a uint fixed variable."""
    import struct

    from rca_data_tools_spark.sources.netcdf import netcdf_table, read_header

    n = 6
    # .astype AFTER the arithmetic: numpy promotion drops the explicit
    # big-endian order on mixed scalar ops
    big = (np.arange(n) * 3_000_000_000).astype(">i8")  # beyond int32
    uvals = (np.arange(4) + 4_000_000_000).astype(">u4")  # beyond int32

    def name5(sname: str) -> bytes:
        b = sname.encode()
        return struct.pack(">Q", len(b)) + b + b"\x00" * ((4 - len(b) % 4) % 4)

    absent = struct.pack(">I", 0) + struct.pack(">Q", 0)

    def header(begin_big, begin_u):
        h = b"CDF\x05" + struct.pack(">Q", n)  # numrecs: 8 bytes
        # dim_list: tag u4, nelems u8; dims: time (record), x=4
        h += struct.pack(">I", 0x0A) + struct.pack(">Q", 2)
        h += name5("time") + struct.pack(">Q", 0)
        h += name5("x") + struct.pack(">Q", 4)
        h += absent  # gatt_list
        h += struct.pack(">I", 0x0B) + struct.pack(">Q", 2)  # var_list
        h += (
            name5("big")
            + struct.pack(">Q", 1)  # ndims: 8 bytes
            + struct.pack(">Q", 0)  # dimid:  8 bytes
            + absent
            + struct.pack(">I", 10)  # NC_INT64
            + struct.pack(">Q", 8)  # vsize: 8 bytes
            + struct.pack(">Q", begin_big)
        )
        h += (
            name5("u")
            + struct.pack(">Q", 1)
            + struct.pack(">Q", 1)  # dimid -> x
            + absent
            + struct.pack(">I", 9)  # NC_UINT
            + struct.pack(">Q", 16)
            + struct.pack(">Q", begin_u)
        )
        return h

    hlen = len(header(0, 0))
    path = str(tmp_path / "cdf5.nc")
    with open(path, "wb") as f:
        f.write(header(hlen + 16, hlen) + uvals.tobytes() + big.tobytes())
    h = read_header(path)
    assert h["numrecs"] == n and dict(h["dims"]) == {"time": 0, "x": 4}
    assert h["variables"]["big"]["dtype"] == np.dtype(">i8")
    rows = {r["idx"]: r["big"] for r in netcdf_table(spark, path, ["big"]).collect()}
    assert rows == {i: int(big[i]) for i in range(n)}
    urows = {r["idx"]: r["u"] for r in netcdf_table(spark, path, ["u"]).collect()}
    assert urows == {i: int(uvals[i]) for i in range(4)}


def test_netcdf_to_parquet_time_range(spark, tmp_path, nc_file):
    """Sliced .nc ingest: --time-range converts only the requested span
    (classic path filters; the NetCDF-4 path prunes blocks)."""
    from rca_data_tools_spark.sources.netcdf import netcdf_to_parquet

    path, time, temp, _, _ = nc_file
    lo, hi = float(time[10]), float(time[40])
    out = str(tmp_path / "sliced.parquet")
    df = netcdf_to_parquet(
        spark, path, ["temp"], out, time_var="time", time_unit="s",
        epoch="1970-01-01", time_range=(lo, hi),
    )
    rows = df.orderBy("idx").collect()
    assert [r["idx"] for r in rows] == list(range(10, 40))
    np.testing.assert_allclose([r["temp"] for r in rows], temp[10:40])
    assert all(r["ts"] is not None for r in rows)


def test_cf_packed_classic_unpacks(spark, tmp_path):
    """CF packed data (CF-1.x §8.1): a short variable with scale_factor /
    add_offset / _FillValue attributes scans as unpacked doubles with the
    declared fill (matched on the PACKED value) reading as NULL."""
    from rca_data_tools_spark.sources.netcdf import netcdf_table, read_header

    path = str(tmp_path / "packed.nc")
    packed = np.array([100, 250, -32768, -50], dtype=">i2")

    def attr_num(name, typ, fmt, val):
        raw = struct.pack(fmt, val)
        return (
            _name(name) + struct.pack(">II", typ, 1)
            + raw + b"\x00" * ((4 - len(raw) % 4) % 4)
        )

    attrs = struct.pack(">II", 0x0C, 4)
    attrs += attr_num("_FillValue", 3, ">h", -32768)          # NC_SHORT
    attrs += attr_num("scale_factor", 6, ">d", 0.01)          # NC_DOUBLE
    attrs += attr_num("add_offset", 6, ">d", 20.0)
    # a string attr in the same list must parse-and-skip cleanly
    attrs += _name("units") + struct.pack(">II", 2, 4) + b"degC"

    def header(begin):
        h = b"CDF\x01" + struct.pack(">I", 4)  # numrecs=4
        h += struct.pack(">II", 0x0A, 1) + _name("time") + struct.pack(">I", 0)
        h += struct.pack(">II", 0, 0)  # no global attrs
        h += struct.pack(">II", 0x0B, 1)
        h += (
            _name("sst") + struct.pack(">I", 1) + struct.pack(">I", 0)
            + attrs + struct.pack(">III", 3, 4, begin)  # NC_SHORT, vsize 2+pad
        )
        return h

    hlen = len(header(0))
    with open(path, "wb") as f:
        # single record variable: slabs pack WITHOUT per-record padding
        f.write(header(hlen) + packed.tobytes())

    h = read_header(path)
    assert h["variables"]["sst"]["attrs"] == {
        "_FillValue": -32768.0, "scale_factor": 0.01, "add_offset": 20.0,
    }
    rows = netcdf_table(spark, path, ["sst"]).orderBy("idx").collect()
    got = [r["sst"] for r in rows]
    assert got[2] is None
    np.testing.assert_allclose([got[0], got[1], got[3]], [21.0, 22.5, 19.5])


def test_char_variables_scan_as_strings(spark, tmp_path):
    """Classic char variables — the format's only text type — scan as
    string columns: (time, strlen) rows joined, NUL/space padding
    stripped; interleaved alongside a numeric record variable."""
    from rca_data_tools_spark.sources.netcdf import netcdf_table

    path = str(tmp_path / "chars.nc")
    codes = [b"CE04", b"RS03", b"\x00\x00\x00\x00", b"AX01"]  # all-NUL -> ""
    temps = [4.5, 5.25, 6.0, 7.75]
    n = 4
    absent = struct.pack(">II", 0, 0)

    def header(begins):
        h = b"CDF\x01" + struct.pack(">I", n)
        h += struct.pack(">II", 0x0A, 2)
        h += _name("time") + struct.pack(">I", 0)
        h += _name("strlen") + struct.pack(">I", 4)
        h += absent  # global attrs
        h += struct.pack(">II", 0x0B, 2)
        h += (
            _name("station") + struct.pack(">I", 2)
            + struct.pack(">II", 0, 1) + absent
            + struct.pack(">III", 2, 4, begins[0])  # NC_CHAR, 4 bytes/rec
        )
        h += (
            _name("temp") + struct.pack(">I", 1) + struct.pack(">I", 0)
            + absent + struct.pack(">III", 6, 8, begins[1])  # NC_DOUBLE
        )
        return h

    hlen = len(header([0, 0]))
    body = b""
    for r in range(n):  # two record vars interleave: station slab, temp slab
        body += codes[r] + struct.pack(">d", temps[r])
    with open(path, "wb") as f:
        f.write(header([hlen, hlen + 4]) + body)

    df = netcdf_table(spark, path, ["station", "temp"])
    assert dict(df.dtypes)["station"] == "string"
    rows = df.orderBy("idx").collect()
    assert [r["station"] for r in rows] == ["CE04", "RS03", "", "AX01"]
    np.testing.assert_allclose([r["temp"] for r in rows], temps)
