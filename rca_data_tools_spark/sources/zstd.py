"""Pure-Python Zstandard frame decoder (RFC 8878), stdlib-only.

Newer Zarr stores default to zstd compression (zarr-python v3 /
numcodecs Zstd), so without this module the native Zarr scan
(sources/zarr.py) could not read them in a runtime that ships no zstd
binding. Like sources/blosc.py (Blosc1 + LZ4 block) and sources/hdf5.py,
this is written from the public specification — RFC 8878 "Zstandard
Compression and the 'application/zstd' Media Type" — with no third-party
code, and validated in tests against the reference ``zstd`` CLI where one
is available on the build machine (tests/test_zstd.py), so correctness is
checked against real encoder output, not a mirror of this module's own
reading of the spec.

Supported (the full single-frame format a Zarr chunk uses):
- frame header: window descriptor / single-segment, frame content size,
  content checksum (xxhash64, VERIFIED when present — a wrong decode of a
  checksummed frame fails loudly rather than returning wrong bytes)
- skippable frames (skipped), multiple concatenated frames
- raw / RLE / compressed blocks
- literals: raw, RLE, Huffman-compressed (1- and 4-stream), treeless
  (repeat table), with Huffman weights either direct or FSE-compressed
- sequences: predefined / RLE / FSE-compressed / repeat table modes for
  all three of literal-lengths, offsets, match-lengths; full repeat-offset
  history semantics
- dictionaries are NOT supported (Dictionary_ID raises loudly) — Zarr
  chunks never use them

Performance shape: pure Python at roughly 1-5 MB/s — like the blosc/LZ4
shim, it runs executor-side inside the chunk-scan ``mapInPandas`` (one call
per chunk, parallel across the chunk grid), and ``convert-zarr`` ingest to
Parquet pays it exactly once per archive. The point is that zstd archives
are *readable* without new native dependencies, with recompress-on-ingest
as the documented fast path.
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50

# --- backward bitstream (FSE / Huffman payloads) ---------------------------


class _BackBits:
    """zstd's backward bitstream: bytes are little-endian, the final byte
    carries a 1-bit start marker, and reads consume from the marker down."""

    def __init__(self, buf: bytes):
        if not buf:
            raise ValueError("zstd: empty backward bitstream")
        self.num = int.from_bytes(buf, "little")
        last = buf[-1]
        if last == 0:
            raise ValueError("zstd: backward bitstream missing start bit")
        self.pos = 8 * (len(buf) - 1) + (last.bit_length() - 1)

    def read(self, n: int) -> int:
        """Read n bits; reading past the start raises."""
        if n == 0:
            return 0
        self.pos -= n
        if self.pos < 0:
            raise ValueError("zstd: backward bitstream exhausted")
        return (self.num >> self.pos) & ((1 << n) - 1)

    def read_padded(self, n: int) -> int:
        """Read n bits, zero-padding past the start (Huffman stream tail:
        the spec guarantees the encoder sized the stream so the symbols
        complete; low bits beyond the start read as zero)."""
        if n == 0:
            return 0
        self.pos -= n
        if self.pos >= 0:
            return (self.num >> self.pos) & ((1 << n) - 1)
        shift = -self.pos
        if shift >= n:
            return 0
        return (self.num << shift) & ((1 << n) - 1)


# --- forward bitstream (FSE table descriptions) ----------------------------


class _FwdBits:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # in bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > 8 * len(self.buf):
            raise ValueError("zstd: FSE table description truncated")
        lo_byte, lo_bit = divmod(self.pos, 8)
        hi_byte = (end + 7) // 8
        chunk = int.from_bytes(self.buf[lo_byte:hi_byte], "little")
        self.pos = end
        return (chunk >> lo_bit) & ((1 << n) - 1)

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


# --- FSE -------------------------------------------------------------------


def _fse_build_table(norm: list[int], accuracy_log: int):
    """Decoding table from normalized counts: per cell (symbol, nb_bits,
    baseline). Spread and state rules per RFC 8878 §4.1.1."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high = size - 1
    for s, c in enumerate(norm):
        if c == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(norm):
        if c <= 0:
            continue
        for _ in range(c):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE distribution (spread mismatch)")
    nxt = [c if c > 0 else 1 for c in norm]
    nb_bits = [0] * size
    baseline = [0] * size
    for i in range(size):
        s = symbols[i]
        x = nxt[s]
        nxt[s] += 1
        nb = accuracy_log - (x.bit_length() - 1)
        nb_bits[i] = nb
        baseline[i] = (x << nb) - size
    return symbols, nb_bits, baseline


def _fse_read_distribution(buf: bytes, max_accuracy: int):
    """FSE table description (forward bitstream): returns (norm counts,
    accuracy_log, bytes consumed)."""
    br = _FwdBits(buf)
    accuracy_log = br.read(4) + 5
    if accuracy_log > max_accuracy:
        raise ValueError(
            f"zstd: FSE accuracy {accuracy_log} exceeds context max {max_accuracy}"
        )
    size = 1 << accuracy_log
    remaining = size + 1
    threshold = size
    nb_bits = accuracy_log + 1
    norm: list[int] = []
    previous0 = False
    while remaining > 1:
        if previous0:
            # runs of zero-probability symbols: 2-bit repeat counts
            while True:
                rep = br.read(2)
                norm.extend([0] * rep)
                if rep < 3:
                    break
            previous0 = False
            continue
        maxv = (2 * threshold - 1) - remaining
        val = br.read(nb_bits - 1)
        if val < maxv:
            count = val
        else:
            extra = br.read(1)
            val |= extra << (nb_bits - 1)
            count = val if val < threshold else val - maxv
        count -= 1  # -1 means "less than 1" probability
        remaining -= -count if count < 0 else count
        norm.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE distribution (over-allocated)")
    return norm, accuracy_log, br.bytes_consumed()


# --- Huffman ---------------------------------------------------------------


def _huf_read_weights(buf: bytes):
    """Huffman table description: returns (weights incl. the inferred last
    one, bytes consumed)."""
    if not buf:
        raise ValueError("zstd: empty Huffman table description")
    hbyte = buf[0]
    if hbyte >= 128:  # direct representation: 4-bit weights
        n = hbyte - 127
        nbytes = (n + 1) // 2
        raw = buf[1 : 1 + nbytes]
        if len(raw) < nbytes:
            raise ValueError("zstd: truncated Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        consumed = 1 + nbytes
    else:  # FSE-compressed weights
        csize = hbyte
        blob = buf[1 : 1 + csize]
        if len(blob) < csize:
            raise ValueError("zstd: truncated compressed Huffman weights")
        norm, al, hdr = _fse_read_distribution(blob, 6)
        symbols, nbits, base = _fse_build_table(norm, al)
        bb = _BackBits(blob[hdr:])
        s1 = bb.read(al)
        s2 = bb.read(al)
        weights = []
        # two interleaved states over one backward stream; when a state
        # update would cross the start, the OTHER state flushes its final
        # symbol and decoding ends (FSE interleaved-stream termination)
        cur, other = s1, s2
        while True:
            weights.append(symbols[cur])
            nb = nbits[cur]
            if bb.pos - nb < 0:
                weights.append(symbols[other])
                break
            cur_new = base[cur] + bb.read(nb)
            cur, other = other, cur_new
            if len(weights) > 255:
                raise ValueError("zstd: runaway Huffman weight stream")
        consumed = 1 + csize
    # the final weight is implied: it completes the total to the smallest
    # power of two STRICTLY larger than the explicit sum
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman weight set")
    left = (1 << total.bit_length()) - total
    if left & (left - 1):
        raise ValueError("zstd: corrupt Huffman weights (no power-of-two completion)")
    weights.append(left.bit_length())  # weight w contributes 2^(w-1) = left
    return weights, consumed


def _huf_build_table(weights: list[int]):
    """Canonical Huffman decode LUT: (max_bits, symbols[], nbits[]) with
    2^max_bits entries. Codes are assigned from low weight to high, symbols
    of equal weight in natural order, per RFC 8878 §4.2.1."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = total.bit_length() - 1
    if (1 << max_bits) != total:
        raise ValueError("zstd: Huffman weights do not sum to a power of two")
    size = 1 << max_bits
    sym_lut = [0] * size
    nb_lut = [0] * size
    rank_pos = 0
    for w in range(1, max_bits + 1):
        nb = max_bits + 1 - w
        span = 1 << (w - 1)
        for s, ws in enumerate(weights):
            if ws != w:
                continue
            for i in range(rank_pos, rank_pos + span):
                sym_lut[i] = s
                nb_lut[i] = nb
            rank_pos += span
    if rank_pos != size:
        raise ValueError("zstd: Huffman table incomplete")
    return max_bits, sym_lut, nb_lut


def _huf_decode_stream(buf: bytes, n_out: int, table) -> bytearray:
    max_bits, sym_lut, nb_lut = table
    bb = _BackBits(buf)
    out = bytearray()
    # prefix-peek against the LUT: consume per-symbol bit counts; near the
    # stream start the peek zero-pads (encoder guarantees completion)
    pos_int = bb
    for _ in range(n_out):
        save = pos_int.pos
        idx = pos_int.read_padded(max_bits)
        nb = nb_lut[idx]
        pos_int.pos = save - nb
        if pos_int.pos < -max_bits:
            raise ValueError("zstd: Huffman stream exhausted early")
        out.append(sym_lut[idx])
    return out


# --- sequences: code tables (RFC 8878 §3.1.1.3.2.1) ------------------------

_LL_BASE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37,
    39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

_MAX_ACCURACY = {"ll": 9, "of": 8, "ml": 9}


class _SeqTable:
    """One of the three sequence-code FSE tables, or its RLE degenerate."""

    def __init__(self, kind):
        self.kind = kind  # 'fse' | 'rle'
        self.symbols = self.nb_bits = self.baseline = None
        self.accuracy_log = 0
        self.rle_symbol = 0

    @classmethod
    def fse(cls, norm, accuracy_log):
        t = cls("fse")
        t.symbols, t.nb_bits, t.baseline = _fse_build_table(norm, accuracy_log)
        t.accuracy_log = accuracy_log
        return t

    @classmethod
    def rle(cls, symbol):
        t = cls("rle")
        t.rle_symbol = symbol
        return t

    def init_state(self, bb: _BackBits) -> int:
        return bb.read(self.accuracy_log) if self.kind == "fse" else 0

    def symbol(self, state: int) -> int:
        return self.rle_symbol if self.kind == "rle" else self.symbols[state]

    def update(self, state: int, bb: _BackBits) -> int:
        if self.kind == "rle":
            return 0
        return self.baseline[state] + bb.read(self.nb_bits[state])


# --- xxhash64 (frame content checksum) -------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (public spec; RFC 8878 frames store its low 32 bits)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (v + lane * _P2) & _M64
                v = (_rotl(v, 31) * _P1) & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            v = (_rotl(v * _P2 & _M64, 31) * _P1) & _M64
            h = ((h ^ v) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl(lane * _P2 & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h ^= (lane * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# --- frame / block decoding ------------------------------------------------


class _FrameState:
    """Cross-block state within one frame: repeat offsets, repeated Huffman
    table, repeated sequence tables."""

    def __init__(self):
        self.rep = [1, 4, 8]
        self.huf_table = None
        self.tables = {"ll": None, "of": None, "ml": None}


def _decode_literals(block: bytes, st: _FrameState):
    """Literals section: returns (literals, bytes consumed)."""
    b0 = block[0]
    ltype = b0 & 0x03
    size_format = (b0 >> 2) & 0x03
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            rsize = b0 >> 3
            hdr = 1
        elif size_format == 1:
            rsize = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            rsize = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            lits = bytes(block[hdr : hdr + rsize])
            if len(lits) != rsize:
                raise ValueError("zstd: truncated raw literals")
            return lits, hdr + rsize
        return bytes([block[hdr]]) * rsize, hdr + 1
    # Huffman-compressed (2) or treeless (3)
    if size_format == 0:
        rsize = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        csize = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
        streams = 1
    elif size_format == 1:
        rsize = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        csize = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
        streams = 4
    elif size_format == 2:
        rsize = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x03) << 12)
        csize = (block[2] >> 2) | (block[3] << 6)
        hdr = 4
        streams = 4
    else:
        rsize = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        csize = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        hdr = 5
        streams = 4
    payload = block[hdr : hdr + csize]
    if len(payload) != csize:
        raise ValueError("zstd: truncated literals payload")
    consumed = hdr + csize
    if ltype == 2:
        weights, wbytes = _huf_read_weights(payload)
        st.huf_table = _huf_build_table(weights)
        payload = payload[wbytes:]
    elif st.huf_table is None:
        raise ValueError("zstd: treeless literals with no previous Huffman table")
    table = st.huf_table
    if streams == 1:
        lits = _huf_decode_stream(payload, rsize, table)
    else:
        if len(payload) < 6:
            raise ValueError("zstd: missing 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
        rest = payload[6:]
        bounds = [0, s1, s1 + s2, s1 + s2 + s3, len(rest)]
        if bounds[3] > len(rest):
            raise ValueError("zstd: 4-stream jump table inconsistent")
        per = (rsize + 3) // 4
        sizes = [per, per, per, rsize - 3 * per]
        if sizes[3] < 0:
            raise ValueError("zstd: regenerated size under 4-stream minimum")
        lits = bytearray()
        for k in range(4):
            lits += _huf_decode_stream(
                rest[bounds[k] : bounds[k + 1]], sizes[k], table
            )
    if len(lits) != rsize:
        raise ValueError("zstd: literals regenerated size mismatch")
    return bytes(lits), consumed


def _read_seq_table(kind: str, mode: int, buf: bytes, pos: int, st: _FrameState):
    """One sequence-code table per its 2-bit compression mode; returns
    (table, new pos)."""
    if mode == 0:  # predefined
        norm, al = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}[kind]
        table = _SeqTable.fse(norm, al)
    elif mode == 1:  # RLE: one byte, the symbol for every sequence
        table = _SeqTable.rle(buf[pos])
        pos += 1
    elif mode == 2:  # FSE-compressed description
        norm, al, consumed = _fse_read_distribution(
            buf[pos:], _MAX_ACCURACY[kind]
        )
        table = _SeqTable.fse(norm, al)
        pos += consumed
    else:  # repeat
        table = st.tables[kind]
        if table is None:
            raise ValueError(f"zstd: repeat mode for {kind} with no previous table")
    st.tables[kind] = table
    return table, pos


def _decode_sequences(buf: bytes, st: _FrameState):
    """Sequences section: returns list of (lit_len, offset_val, match_len)
    raw code values (offset resolution happens during execution)."""
    if not buf:
        return []
    b0 = buf[0]
    if b0 == 0:
        return []
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        nseq, pos = ((b0 - 128) << 8) + buf[1], 2
    else:
        nseq, pos = buf[1] + (buf[2] << 8) + 0x7F00, 3
    modes = buf[pos]
    pos += 1
    if modes & 0x03:
        raise ValueError("zstd: reserved sequence-mode bits set")
    ll_t, pos = _read_seq_table("ll", (modes >> 6) & 0x03, buf, pos, st)
    of_t, pos = _read_seq_table("of", (modes >> 4) & 0x03, buf, pos, st)
    ml_t, pos = _read_seq_table("ml", (modes >> 2) & 0x03, buf, pos, st)
    bb = _BackBits(buf[pos:])
    ll_state = ll_t.init_state(bb)
    of_state = of_t.init_state(bb)
    ml_state = ml_t.init_state(bb)
    out = []
    for i in range(nseq):
        of_code = of_t.symbol(of_state)
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        of_val = (1 << of_code) + bb.read(of_code)
        ml_code = ml_t.symbol(ml_state)
        if ml_code > 52:
            raise ValueError("zstd: match-length code out of range")
        ml = _ML_BASE[ml_code] + bb.read(_ML_BITS[ml_code])
        ll_code = ll_t.symbol(ll_state)
        if ll_code > 35:
            raise ValueError("zstd: literal-length code out of range")
        ll = _LL_BASE[ll_code] + bb.read(_LL_BITS[ll_code])
        out.append((ll, of_val, ml))
        if i < nseq - 1:  # the last sequence carries no state-update bits
            ll_state = ll_t.update(ll_state, bb)
            ml_state = ml_t.update(ml_state, bb)
            of_state = of_t.update(of_state, bb)
    return out


def _execute(lits: bytes, seqs, st: _FrameState, window: bytearray) -> bytes:
    """Sequence execution with repeat-offset history over the frame window."""
    out = bytearray()
    lpos = 0
    rep = st.rep
    for ll, of_val, ml in seqs:
        out += lits[lpos : lpos + ll]
        lpos += ll
        if of_val > 3:
            offset = of_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = of_val - 1 if ll != 0 else of_val
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # ll == 0 and of_val == 3: rep0 - 1
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        total = len(window) + len(out)
        if offset > total:
            raise ValueError("zstd: match offset beyond window")
        # fast paths: non-overlapping matches copy as slices; overlapping
        # matches double the copied span each step (repeating pattern)
        while ml > 0:
            p = len(window) + len(out) - offset
            if p < len(window):
                take = min(ml, len(window) - p, offset)
                out += window[p : p + take]
            else:
                q = p - len(window)
                take = min(ml, offset)
                out += out[q : q + take]
            ml -= take
    out += lits[lpos:]
    return bytes(out)


def _decode_block(block: bytes, st: _FrameState, window: bytearray) -> bytes:
    lits, consumed = _decode_literals(block, st)
    seqs = _decode_sequences(block[consumed:], st)
    return _execute(lits, seqs, st, window)


def zstd_decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decode one or more concatenated zstd frames to the original bytes."""
    out_all = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("zstd: truncated frame magic")
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if (magic & 0xFFFFFFF0) == _SKIPPABLE_LO:
            (size,) = struct.unpack_from("<I", data, pos)
            pos += 4 + size
            continue
        if magic != _MAGIC:
            raise ValueError(f"zstd: bad magic 0x{magic:08x}")
        if pos >= n:
            raise ValueError("zstd: truncated frame header")
        fhd = data[pos]
        pos += 1
        fcs_code = fhd >> 6
        single_segment = bool(fhd & 0x20)
        if fhd & 0x18:
            raise ValueError("zstd: reserved frame-header bits set")
        has_checksum = bool(fhd & 0x04)
        did_size = (0, 1, 2, 4)[fhd & 0x03]
        if not single_segment:
            pos += 1  # window descriptor (bound implied by content size here)
        if did_size:
            did = int.from_bytes(data[pos : pos + did_size], "little")
            pos += did_size
            if did:
                raise NotImplementedError(
                    "zstd: dictionary-compressed frames not supported "
                    "(Zarr chunks never use dictionaries)"
                )
        fcs_bytes = (0, 2, 4, 8)[fcs_code] if not (fcs_code == 0 and single_segment) else 1
        content_size = None
        if fcs_bytes:
            if pos + fcs_bytes > n:
                raise ValueError("zstd: truncated frame content size")
            content_size = int.from_bytes(data[pos : pos + fcs_bytes], "little")
            if fcs_bytes == 2:
                content_size += 256
            pos += fcs_bytes
        st = _FrameState()
        frame_out = bytearray()
        while True:
            if n - pos < 3:
                raise ValueError("zstd: truncated block header")
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 0x03
            bsize = bh >> 3
            if btype == 0:  # raw
                if n - pos < bsize:
                    raise ValueError("zstd: truncated raw block")
                frame_out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: one byte repeated bsize times
                if n - pos < 1:
                    raise ValueError("zstd: truncated RLE block")
                frame_out += data[pos : pos + 1] * bsize
                pos += 1
            elif btype == 2:
                block = data[pos : pos + bsize]
                if len(block) != bsize:
                    raise ValueError("zstd: truncated compressed block")
                pos += bsize
                try:
                    frame_out += _decode_block(block, st, frame_out)
                except (IndexError, struct.error) as e:
                    # corrupt framing inside the block: surface the typed
                    # loud failure, never an internal indexing error
                    raise ValueError(f"zstd: corrupt compressed block ({e})") from None
            else:
                raise ValueError("zstd: reserved block type")
            if len(out_all) + len(frame_out) > max_output:
                raise ValueError("zstd: output exceeds size bound")
            if last:
                break
        if content_size is not None and len(frame_out) != content_size:
            raise ValueError(
                f"zstd: frame decoded {len(frame_out)} bytes, header said {content_size}"
            )
        if has_checksum:
            if pos + 4 > n:
                raise ValueError("zstd: truncated content checksum")
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            got = xxh64(bytes(frame_out)) & 0xFFFFFFFF
            if got != want:
                raise ValueError(
                    "zstd: content checksum mismatch — refusing to return "
                    "possibly-corrupt output"
                )
        out_all += frame_out
    return bytes(out_all)
