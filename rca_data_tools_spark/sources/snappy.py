"""Pure-Python decoder for raw Snappy streams (google/snappy
format_description.txt) — the inner codec c-blosc uses when a Zarr store
was written with ``Blosc(cname='snappy')``. This runtime ships no snappy
library, but pyarrow's bundled C++ codec CAN compress — the test suite
uses it as the reference encoder, so every decode path here is validated
against real snappy output rather than a round-trip of our own making
(tests/test_snappy.py).

Format (all little-endian):

- preamble: uncompressed length as an unsigned varint (7 bits per byte,
  high bit = continuation);
- element stream, each element starting with a tag byte whose low 2 bits
  select the type:
  - ``00`` literal: length-1 in the upper 6 bits, except values 60..63
    which mean the next 1..4 bytes hold length-1;
  - ``01`` copy, 1-byte offset: length-4 in bits 2-4 (so 4..11), offset =
    bits 5-7 as the high part plus one trailing byte;
  - ``10`` copy, 2-byte offset: length-1 in the upper 6 bits, offset in
    the next 2 bytes;
  - ``11`` copy, 4-byte offset: same but 4 offset bytes.
- copies may reach back at most ``len(out)`` bytes and may overlap
  forward (run-length semantics), exactly like the LZ4 match loop in
  sources/blosc.py.

Decode shape: called executor-side per chunk split from the Zarr scan
(mapInPandas), like the LZ4/zstd decoders — no driver-side work.
"""

from __future__ import annotations


def snappy_decompress(src: bytes) -> bytes:
    """Decode one raw Snappy stream (preamble + elements) to bytes.

    Raises ``ValueError`` on any structural corruption: truncated varint,
    element running past the input, copy offset of zero or beyond the
    output produced so far, or a final size that disagrees with the
    preamble.
    """
    n = len(src)
    pos = 0
    out_size = 0
    shift = 0
    while True:
        if pos >= n:
            raise ValueError("snappy: truncated length varint")
        b = src[pos]
        pos += 1
        out_size |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 31:
            raise ValueError("snappy: length varint longer than 32 bits")
    out = bytearray()
    while pos < n:
        tag = src[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            length = tag >> 2
            if length >= 60:
                k = length - 59
                if pos + k > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(src[pos : pos + k], "little")
                pos += k
            length += 1
            if pos + length > n:
                raise ValueError("snappy: literal past end of input")
            out += src[pos : pos + length]
            pos += length
            continue
        if ttype == 1:
            if pos >= n:
                raise ValueError("snappy: truncated copy element")
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | src[pos]
            pos += 1
        elif ttype == 2:
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy element")
            length = (tag >> 2) + 1
            offset = int.from_bytes(src[pos : pos + 2], "little")
            pos += 2
        else:
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy element")
            length = (tag >> 2) + 1
            offset = int.from_bytes(src[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset outside produced output")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:  # overlapping copy: repeat the trailing pattern
            for i in range(length):
                out.append(out[start + i])
    if len(out) != out_size:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble promised {out_size}"
        )
    return bytes(out)
