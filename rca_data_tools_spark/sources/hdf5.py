"""Minimal native HDF5 reader — enough of the public HDF5 file format
(HDF5 File Format Specification v2/v3, hdfgroup.org) to scan the NetCDF-4
files the reference opens with xarray (see sources/netcdf.py), with numpy +
stdlib zlib only.

Supported subset (what netCDF-4/libhdf5 writes for a classic-model file at
offset 0, in both the earliest format and the 1.8+ "latest" format):

- superblocks version 0 (the libhdf5 default) AND v2/v3, 8-byte
  offsets/lengths
- old-style groups: symbol-table entry -> v1 group B-tree -> SNOD nodes ->
  local heap link names; new-style (1.8+) groups: compact link messages in
  the header, and dense storage via fractal heap + v2 B-tree name index
  (root direct block or one level of indirect block; name-index B-trees of
  ANY depth — internal BTIN nodes walked with the format's own per-level
  pointer sizing)
- object headers version 1 AND version 2 ('OHDR', with OCHK continuations)
- messages: dataspace (v1/v2), datatype (fixed-point and IEEE float,
  little/big endian), data layout v3 (contiguous and chunked) and v4
  (contiguous/compact/chunked with Single Chunk, Implicit, unpaged Fixed
  Array, Extensible Array — inline elements AND unpaged data blocks, the
  shape libhdf5 writes for appendable time series; super blocks raise —
  or version-2 B-tree chunk indexes of any depth — the full latest-format
  family for fixed-shape AND unlimited-dimension chunked datasets),
  filter pipeline v1/v2 (deflate id=1, shuffle id=2, fletcher32 id=3 —
  checksum verified, mismatch raises), attributes v1/v2/v3,
  link info, link, symbol table, continuation
- hard AND soft links in both group styles (old-style cache-type-2 symbol
  table entries with the link value in the local heap, and 1.8+ type-1
  link messages): absolute and relative targets, chains (depth-capped),
  dangling links skipped like h5py iteration, soft aliases of an ancestor
  stopped at the alias; external links raise with the target file named
- chunked data through the v1 chunk B-tree (any nesting level), with
  per-chunk filter masks; partial edge chunks clipped

Anything outside the subset raises loudly with the feature name — the same
honest-contract style as sources/zarr.py (blosc) and sources/netcdf.py
(NetCDF-4 gate, which now routes here instead of failing when the file is
HDF5).

Scale shape mirrors sources/zarr.py: the DRIVER parses only the metadata
(superblock, headers, chunk B-tree — KBs); the chunk map (address, nbytes,
filter mask, offsets) is dimension-sized and ships to executors inside the
plan, where an Arrow ``mapInPandas`` pass seeks and decodes chunk ranges.
The array data itself never touches the driver.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import numpy as np

from rca_data_tools_spark.sources.bytes_io import as_reader

_SIGNATURE = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

#: stored element of a variable-length STRING dataset (netCDF-4 NC_STRING):
#: byte count + global heap ID (collection address, object index)
VLEN_STR_DTYPE = np.dtype(
    {"names": ["len", "gcol", "idx"], "formats": ["<u4", "<u8", "<u4"]}
)

# filter ids from the spec / registered filters
_DEFLATE, _SHUFFLE, _FLETCHER32 = 1, 2, 3


@dataclass
class Dataset:
    name: str
    dtype: np.dtype
    shape: tuple[int, ...]
    layout: str  # 'contiguous' | 'chunked' | 'compact'
    data_address: int = _UNDEF  # contiguous
    data_size: int = 0
    compact: bytes | None = None
    chunk_shape: tuple[int, ...] = ()
    # how the chunk map is found: v1 B-tree (v3 layouts / v4 index 5 never
    # reaches here), a v4 single-chunk record, v4 implicit addressing, or a
    # v4 fixed array (whose elements carry sizes only when filtered)
    chunk_index: str = "btree1"
    filtered_index: bool = False
    # [(chunk_offset_tuple, address, nbytes, filter_mask)]
    chunks: list[tuple[tuple[int, ...], int, int, int]] = field(default_factory=list)
    filters: list[tuple[int, tuple[int, ...]]] = field(default_factory=list)
    # scalar numeric attributes (e.g. netCDF-4's _FillValue); non-scalar or
    # non-numeric attributes are skipped, never mis-read
    attrs: dict[str, float] = field(default_factory=dict)
    # set only for datasets imported through an EXTERNAL link: the
    # ByteRangeReader of the file that actually holds the bytes (picklable,
    # like every reader — read paths use ``owner or the scanning file``)
    owner: "object | None" = None


class H5File:
    """Driver-side metadata parse of one HDF5 file. ``datasets`` maps
    path-less names (flat) and 'group/name' (nested) to :class:`Dataset`."""

    def __init__(self, source, external_opener=None, _ext_depth: int = 0):
        """``source`` is a local path or any ByteRangeReader
        (sources/bytes_io.py). Locally the reader is mmap-backed, so the
        metadata parse touches only the pages it reads (KBs of a file that
        may be tens of GB); on an object store the same ``pread`` calls
        become ranged GETs — the parse logic is source-agnostic.

        ``external_opener`` maps an external-link file name to a source
        (path / reader) or None when the file cannot be provided. When the
        scanned file is a local path, the default opener resolves link
        targets against the file's own directory — libhdf5's default
        external-link prefix — and only when the sibling actually exists;
        an unresolvable external link raises with the target named."""
        self._buf = as_reader(source)
        self.path = getattr(self._buf, "path", "<byte-range source>")
        if external_opener is None and isinstance(self.path, str):
            import os

            base = os.path.dirname(os.path.abspath(self.path))

            def external_opener(fname: str) -> "str | None":
                cand = fname if os.path.isabs(fname) else os.path.join(base, fname)
                return cand if os.path.isfile(cand) else None

        self._ext_opener = external_opener
        self._ext_depth = _ext_depth
        if self._buf[0:8] != _SIGNATURE:
            raise ValueError(f"not an HDF5 file: {self.path!r}")
        self.datasets: dict[str, Dataset] = {}
        self._seen_groups: set[int] = set()
        try:
            self._parse_superblock()
        except (IndexError, OverflowError, RecursionError) as e:
            # corrupt metadata: surface the typed loud failure, never an
            # internal indexing/recursion error (fuzz-tested)
            raise ValueError(f"corrupt HDF5 metadata in {self.path!r}: {e}") from None

    # -- low-level --------------------------------------------------------
    def _u(self, pos: int, n: int) -> int:
        return int.from_bytes(self._buf[pos : pos + n], "little")

    def _parse_superblock(self) -> None:
        b = self._buf
        version = b[8]
        if version == 0:
            if b[13] != 8 or b[14] != 8:
                raise NotImplementedError(
                    "HDF5: only 8-byte offsets/lengths supported "
                    f"(got {b[13]}/{b[14]})"
                )
            # 24-byte fixed part then base/freespace/eof/driver addresses,
            # then the root group symbol table entry
            root_entry = 24 + 4 * 8
            ohdr = self._u(root_entry + 8, 8)
        elif version in (2, 3):
            # v2/v3 layout (spec II.A.2): offsets size(9), lengths size(10),
            # consistency flags(11), then base / extension / EOF / root group
            # object header addresses and a trailing checksum (not verified —
            # this reader trusts its source like the v0 path does).
            if b[9] != 8 or b[10] != 8:
                raise NotImplementedError(
                    "HDF5: only 8-byte offsets/lengths supported "
                    f"(got {b[9]}/{b[10]})"
                )
            ohdr = self._u(12 + 24, 8)
        else:
            raise NotImplementedError(f"HDF5 superblock version {version}")
        self._root_ohdr = ohdr
        self._walk_group(ohdr, prefix="")

    # -- object headers ---------------------------------------------------
    def _messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, data) messages of a v1 or v2 object header, following
        continuation blocks. The two framings differ (v1: 2-byte types,
        message count, 8-byte alignment; v2: 'OHDR' signature, 1-byte types,
        run-to-end-of-chunk, trailing checksums) but both yield the same
        (type, data) message stream, so everything downstream is shared."""
        if self._buf[addr : addr + 4] == b"OHDR":
            return self._messages_v2(addr)
        b = self._buf
        if b[addr] != 1:
            raise NotImplementedError(
                f"HDF5 object header version {b[addr]} (v1 and v2 supported)"
            )
        nmsgs = self._u(addr + 2, 2)
        hdr_size = self._u(addr + 8, 4)
        blocks = [(addr + 16, hdr_size)]
        msgs: list[tuple[int, bytes]] = []
        while blocks and len(msgs) < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and len(msgs) < nmsgs:
                mtype = self._u(pos, 2)
                msize = self._u(pos + 2, 2)
                data = b[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x0010:  # continuation
                    caddr = int.from_bytes(data[0:8], "little")
                    clen = int.from_bytes(data[8:16], "little")
                    blocks.append((caddr, clen))
                    msgs.append((mtype, data))
                else:
                    msgs.append((mtype, data))
        return msgs

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes]]:
        """Version-2 object header (spec IV.A.1.b): 'OHDR' + version + flags,
        optional time / phase-change fields, variable-width chunk-0 size,
        then 1-byte-type messages packed to the end of the chunk (no message
        count). Trailing lookup3 checksums are not verified (same trust
        model as the rest of this reader). Continuation blocks carry an
        'OCHK' signature and their own checksum."""
        b = self._buf
        if b[addr + 4] != 2:
            raise NotImplementedError(
                f"HDF5 v2 object header version {b[addr + 4]}"
            )
        flags = b[addr + 5]
        pos = addr + 6
        if flags & 0x20:  # access/mod/change/birth times stored
            pos += 16
        if flags & 0x10:  # non-default attribute phase change
            pos += 4
        size_width = 1 << (flags & 0x03)
        chunk0 = self._u(pos, size_width)
        pos += size_width
        tracked = bool(flags & 0x04)  # attribute creation order tracked:
        # each message header then carries a 2-byte creation-order field
        msg_hdr = 4 + (2 if tracked else 0)
        blocks = [(pos, chunk0)]
        msgs: list[tuple[int, bytes]] = []
        while blocks:
            p, remaining = blocks.pop(0)
            while remaining >= msg_hdr:
                mtype = b[p]
                msize = self._u(p + 1, 2)
                # p+3 is the message flags byte; bit 1 = shared message
                if b[p + 3] & 0x02:
                    raise NotImplementedError(
                        "HDF5 shared message in v2 object header"
                    )
                data = b[p + msg_hdr : p + msg_hdr + msize]
                p += msg_hdr + msize
                remaining -= msg_hdr + msize
                if mtype == 0x10:  # continuation: OCHK + messages + checksum
                    caddr = int.from_bytes(data[0:8], "little")
                    clen = int.from_bytes(data[8:16], "little")
                    if b[caddr : caddr + 4] != b"OCHK":
                        raise ValueError("HDF5: bad OCHK signature")
                    blocks.append((caddr + 4, clen - 8))
                msgs.append((mtype, data))
            # leftover < msg_hdr bytes is the documented gap; checksum follows
        return msgs

    def _walk_group(self, ohdr_addr: int, prefix: str) -> None:
        # Cycle guard over the CURRENT path only: hard links may legally
        # alias one group under two different parents (a non-cyclic DAG —
        # the group is simply walked once per path); only an ancestor
        # repeating on its own descent is a true cycle.
        if ohdr_addr in self._seen_groups:
            raise ValueError("HDF5: cyclic group structure")
        self._seen_groups.add(ohdr_addr)
        try:
            self._walk_group_inner(ohdr_addr, prefix)
        finally:
            self._seen_groups.discard(ohdr_addr)

    def _walk_group_inner(self, ohdr_addr: int, prefix: str) -> None:
        msgs = self._messages(ohdr_addr)
        children = self._group_children(msgs)
        if children is None:
            raise NotImplementedError(
                "HDF5 group with neither a symbol-table message nor link "
                "messages (unsupported group storage)"
            )
        for name, child_ohdr in children:
            if isinstance(child_ohdr, tuple) and child_ohdr[0] == "ext":
                self._import_external(name, child_ohdr[1], child_ohdr[2], prefix)
                continue
            via_soft = isinstance(child_ohdr, tuple)
            if via_soft:
                child_ohdr = self._resolve_path(ohdr_addr, child_ohdr[1], 0)
                if child_ohdr is None:
                    continue  # dangling soft link: listable but not openable
            child_msgs = self._messages(child_ohdr)
            if self._group_children(child_msgs) is not None:
                if via_soft and child_ohdr in self._seen_groups:
                    # a soft link back to an ancestor is a legal alias whose
                    # expansion never terminates — stop at the alias (h5py's
                    # visit does the same); a HARD ancestor self-reference
                    # stays a loud cycle in _walk_group
                    continue
                self._walk_group(child_ohdr, prefix=f"{prefix}{name}/")
            else:
                ds = self._dataset_from_messages(prefix + name, child_msgs)
                if ds is not None:
                    self.datasets[prefix + name] = ds

    def _resolve_path(self, base_ohdr: int, path: str, depth: int) -> "int | None":
        """Resolve a soft-link target to an object header address — absolute
        paths from the root group, relative ones from the group holding the
        link; soft links met along the way resolve recursively (chain depth
        capped). Returns None when any component is missing (a dangling
        link, legal in a conforming file)."""
        if depth > 8:
            raise NotImplementedError(
                f"HDF5 soft-link chain deeper than 8 at {path!r}"
            )
        cur = self._root_ohdr if path.startswith("/") else base_ohdr
        for part in (p for p in path.split("/") if p and p != "."):
            children = self._group_children(self._messages(cur))
            if children is None:
                return None  # path descends through a dataset
            target = next((t for n, t in children if n == part), None)
            if target is None:
                return None
            if isinstance(target, tuple):  # a link in the chain
                if target[0] != "soft":
                    # an EXTERNAL link met mid-chain: silently dropping it
                    # would make data reachable only through this chain
                    # vanish from the listing, while the same link reached
                    # directly fails loudly (_import_external) — keep the
                    # failure policy consistent and name the target
                    raise NotImplementedError(
                        f"HDF5 soft-link chain at {path!r} crosses an "
                        f"external link to {target[1]!r}:{target[2]!r}; "
                        "open that file directly or link it without the "
                        "soft-link indirection"
                    )
                target = self._resolve_path(cur, target[1], depth + 1)
                if target is None:
                    return None
            cur = target
        return cur

    def _import_external(self, name: str, fname: str, objpath: str, prefix: str) -> None:
        """Resolve an external link (spec IV.A.2.g link type 64) by parsing
        the target file through ``external_opener`` and importing the
        object it names — a dataset, or a whole group subtree — under this
        link's path, each imported Dataset tagged with the OWNING file's
        reader so read paths fetch bytes from the right file. Chains of
        files are depth-capped; an opener returning None raises with the
        target named (silently dropping data a conforming reader would
        surface is worse than failing loudly)."""
        if self._ext_depth >= 4:
            raise NotImplementedError(
                f"HDF5 external-link chain deeper than 4 at {fname!r}:{objpath!r}"
            )
        src = self._ext_opener(fname) if self._ext_opener is not None else None
        if src is None:
            raise NotImplementedError(
                f"HDF5 external link {name!r} -> {fname!r}:{objpath!r} "
                "(target file not available to the opener)"
            )
        ext = H5File(src, external_opener=self._ext_opener,
                     _ext_depth=self._ext_depth + 1)
        key = "/".join(p for p in objpath.split("/") if p and p != ".")
        if key in ext.datasets:
            found = {prefix + name: ext.datasets[key]}
        else:  # a group: import every dataset below it
            found = {
                f"{prefix}{name}/{k[len(key) + 1 :]}" if key else f"{prefix}{name}/{k}": d
                for k, d in ext.datasets.items()
                if not key or k.startswith(key + "/")
            }
            if key and not found:
                # the target FILE opened but names no such object: loud, not
                # a silent skip — unlike a dangling soft link (same-file,
                # listable), this is cross-file and h5py raises on access
                raise ValueError(
                    f"HDF5 external link {name!r}: no object {objpath!r} "
                    f"in {fname!r} (has: {sorted(ext.datasets)})"
                )
        for k, d in found.items():
            if d.owner is None:
                d.owner = ext._buf
            self.datasets[k] = d

    def _group_children(self, msgs) -> "list[tuple[str, int]] | None":
        """(name, object header address) children if ``msgs`` describe a
        group — old-style (symbol table 0x0011) or new-style (link messages
        0x0006, the 1.8+ format that comes with superblock v2/v3) — else
        None (the object is a dataset or named type)."""
        stab = [d for t, d in msgs if t == 0x0011]
        if stab:
            btree_addr = int.from_bytes(stab[0][0:8], "little")
            heap_addr = int.from_bytes(stab[0][8:16], "little")
            heap_data = self._local_heap(heap_addr)
            out = []
            for off, child, ctype, scratch in self._group_btree_entries(btree_addr):
                name = self._heap_name(heap_data, off)
                if ctype == 2:  # symbolic link: value string in the local heap
                    out.append((name, ("soft", self._heap_name(heap_data, scratch))))
                else:
                    out.append((name, child))
            return out
        link_info = [d for t, d in msgs if t == 0x0002]
        links = [d for t, d in msgs if t == 0x0006]
        if link_info:
            dense = self._link_info_dense(link_info[0])
            if dense is not None:
                heap_addr, btree_addr = dense
                return self._dense_links(heap_addr, btree_addr)
        if links:
            return [self._parse_link(d) for d in links]
        if link_info:
            return []  # an empty new-style group
        return None

    @staticmethod
    def _link_info_dense(d: bytes) -> "tuple[int, int] | None":
        """Link Info message (0x0002): returns (fractal heap address, name
        index v2 B-tree address) when the group uses dense storage, else
        None (compact storage keeps links as header messages)."""
        if d[0] != 0:
            raise NotImplementedError(f"HDF5 link info version {d[0]}")
        pos = 2 + (8 if d[1] & 0x01 else 0)
        heap_addr = int.from_bytes(d[pos : pos + 8], "little")
        if heap_addr == _UNDEF:
            return None
        btree_addr = int.from_bytes(d[pos + 8 : pos + 16], "little")
        return heap_addr, btree_addr

    # -- dense link storage: fractal heap + v2 B-tree ---------------------
    def _dense_links(self, heap_addr: int, btree_addr: int) -> list[tuple[str, int]]:
        """Links of a dense-storage group (the 1.8+ format for groups with
        more than ~8 links — i.e. most real netCDF-4 root groups written in
        the newer format): the name-index v2 B-tree enumerates heap IDs,
        the fractal heap resolves each ID to a serialized link message.

        Supported subset, loud beyond it: name-index B-trees of any depth,
        managed heap objects in a root direct block or a root indirect
        block whose children are all direct blocks, no I/O filters on the
        heap."""
        heap = self._fractal_heap(heap_addr)
        ids = self._btree_v2_records(btree_addr)
        out = []
        for rec in ids:
            obj = self._heap_object(heap, rec)
            out.append(self._parse_link(obj))
        return out

    def _fractal_heap(self, addr: int) -> dict:
        b = self._buf
        if b[addr : addr + 4] != b"FRHP":
            raise ValueError("HDF5: bad fractal heap signature")
        if b[addr + 4] != 0:
            raise NotImplementedError(f"HDF5 fractal heap version {b[addr + 4]}")
        hid_len = self._u(addr + 5, 2)
        filt_len = self._u(addr + 7, 2)
        if filt_len:
            raise NotImplementedError("HDF5 fractal heap with I/O filters")
        flags = b[addr + 9]
        max_managed = self._u(addr + 10, 4)
        # skip: next-huge-id, huge-btree addr, free space, free-space mgr,
        # managed space, allocated space, block-iterator offset (7 x 8 bytes)
        pos = addr + 14 + 7 * 8
        n_managed = self._u(pos, 8)
        pos += 8 + 8 + 8 + 8 + 8  # managed count + huge/tiny sizes+counts
        width = self._u(pos, 2)
        start_size = self._u(pos + 2, 8)
        max_direct = self._u(pos + 10, 8)
        max_heap_bits = self._u(pos + 18, 2)
        pos += 20 + 2  # + starting rows
        root_addr = self._u(pos, 8)
        cur_rows = self._u(pos + 8, 2)
        off_size = (max_heap_bits + 7) // 8
        len_size = (max(1, max_managed).bit_length() + 7) // 8
        if hid_len != 1 + off_size + len_size:
            raise NotImplementedError(
                f"HDF5 fractal heap ID length {hid_len} != 1+{off_size}+{len_size}"
            )
        # direct blocks carry a checksum iff heap flags bit 1 is set
        hdr_size = 4 + 1 + 8 + off_size + (4 if flags & 0x02 else 0)
        heap = {
            "off_size": off_size, "len_size": len_size, "width": width,
            "start_size": start_size, "max_direct": max_direct,
            "block_hdr": hdr_size, "n_managed": n_managed,
        }
        if cur_rows == 0:
            # root IS a direct block covering [0, start_size)
            heap["blocks"] = [(0, start_size, root_addr)]
        else:
            heap["blocks"] = self._heap_indirect_blocks(
                root_addr, cur_rows, heap
            )
        return heap

    def _heap_indirect_blocks(self, addr: int, nrows: int, heap: dict):
        """Child direct blocks (offset, size, address) of a root indirect
        block. Rows whose block size would exceed the maximum direct block
        size would hold indirect children — raise loudly there."""
        b = self._buf
        if b[addr : addr + 4] != b"FHIB":
            raise ValueError("HDF5: bad fractal heap indirect block signature")
        width, s0 = heap["width"], heap["start_size"]
        pos = addr + 4 + 1 + 8 + heap["off_size"]
        blocks = []
        offset = 0
        for row in range(nrows):
            size = s0 if row <= 1 else s0 << (row - 1)
            if size > heap["max_direct"]:
                raise NotImplementedError(
                    "HDF5 fractal heap with indirect child blocks (heap "
                    "larger than the direct-block doubling table)"
                )
            for _ in range(width):
                child = self._u(pos, 8)
                pos += 8
                if child != _UNDEF:
                    blocks.append((offset, size, child))
                offset += size
        return blocks

    def _heap_object(self, heap: dict, heap_id: bytes) -> bytes:
        vt = heap_id[0]
        if (vt >> 6) != 0 or ((vt >> 4) & 0x03) != 0:
            raise NotImplementedError(
                f"HDF5 fractal heap ID type {vt:#x} (managed objects only)"
            )
        off = int.from_bytes(heap_id[1 : 1 + heap["off_size"]], "little")
        ln = int.from_bytes(
            heap_id[1 + heap["off_size"] : 1 + heap["off_size"] + heap["len_size"]],
            "little",
        )
        for blk_off, blk_size, blk_addr in heap["blocks"]:
            if blk_off <= off < blk_off + blk_size:
                b = self._buf
                if b[blk_addr : blk_addr + 4] != b"FHDB":
                    raise ValueError("HDF5: bad fractal heap direct block signature")
                return b[blk_addr + (off - blk_off) : blk_addr + (off - blk_off) + ln]
        raise ValueError(f"HDF5: heap object offset {off} outside all direct blocks")

    def _btree_v2_walk(
        self, addr: int, want: "set[int] | None" = None
    ) -> tuple[int, int, list[bytes]]:
        """All raw records of a version-2 B-tree in tree order, ANY depth
        (spec III.A.2): BTHD header -> BTIN internal nodes -> BTLF leaves.
        Child-pointer field widths follow the format's sizing exactly: the
        'number of records in child' field uses ONE width at every depth —
        the byte count of the LEAF-level maximum (libhdf5 H5B2hdr.c sizes
        it off the leaf 'because it's the largest') — while the 'total
        records in subtree' field (present only below internal nodes of
        depth >= 2) is sized per level from the subtree capacity."""
        b = self._buf
        if b[addr : addr + 4] != b"BTHD":
            raise ValueError("HDF5: bad v2 B-tree header signature")
        if b[addr + 4] != 0:
            raise NotImplementedError(f"HDF5 v2 B-tree version {b[addr + 4]}")
        btype = b[addr + 5]
        if want is not None and btype not in want:
            # reject unsupported record types BEFORE walking the tree, so
            # the diagnostic names the type instead of a downstream
            # record-size arithmetic error
            raise NotImplementedError(f"HDF5 v2 B-tree record type {btype}")
        node_size = self._u(addr + 6, 4)
        rec_size = self._u(addr + 10, 2)
        depth = self._u(addr + 12, 2)
        root = self._u(addr + 16, 8)
        nrec_root = self._u(addr + 24, 2)
        if nrec_root == 0 or root == _UNDEF:
            return btype, rec_size, []
        if rec_size == 0 or node_size <= 10:
            raise ValueError("HDF5: v2 B-tree with degenerate node/record size")

        def enc(v: int) -> int:  # bytes needed to store values up to v
            n = 1
            while v >= 1 << (8 * n):
                n += 1
            return n

        # level 0 = leaf; level d = internal whose children live at d-1
        max_nrec = [(node_size - 10) // rec_size]
        cum_max = [max_nrec[0]]
        enc_leaf = enc(max_nrec[0])  # the ONE child-nrec width, every depth
        for d in range(1, depth + 1):
            ptr = 8 + enc_leaf + (enc(cum_max[d - 1]) if d >= 2 else 0)
            m = (node_size - 10 - ptr) // (rec_size + ptr)
            if m <= 0:
                raise ValueError("HDF5: v2 B-tree internal node cannot hold records")
            max_nrec.append(m)
            cum_max.append(m + (m + 1) * cum_max[d - 1])

        out: list[bytes] = []

        def walk(naddr: int, nrec: int, level: int) -> None:
            sig = b[naddr : naddr + 4]
            if level == 0:
                if sig != b"BTLF":
                    raise ValueError("HDF5: bad v2 B-tree leaf signature")
                if b[naddr + 4] != 0 or b[naddr + 5] != btype:
                    raise ValueError("HDF5: v2 B-tree leaf mismatch")
                pos = naddr + 6
                for _ in range(nrec):
                    out.append(b[pos : pos + rec_size])
                    pos += rec_size
                return
            if sig != b"BTIN":
                raise ValueError("HDF5: bad v2 B-tree internal-node signature")
            if b[naddr + 4] != 0 or b[naddr + 5] != btype:
                raise ValueError("HDF5: v2 B-tree internal-node mismatch")
            pos = naddr + 6
            recs = [b[pos + i * rec_size : pos + (i + 1) * rec_size] for i in range(nrec)]
            pos += nrec * rec_size
            nsz = enc_leaf
            tsz = enc(cum_max[level - 1]) if level >= 2 else 0
            kids = []
            for _ in range(nrec + 1):
                caddr = self._u(pos, 8)
                cn = self._u(pos + 8, nsz)
                pos += 8 + nsz + tsz
                kids.append((caddr, cn))
            for i, (caddr, cn) in enumerate(kids):
                walk(caddr, cn, level - 1)
                if i < nrec:
                    out.append(recs[i])

        walk(root, nrec_root, depth)
        return btype, rec_size, out

    def _btree_v2_records(self, addr: int) -> list[bytes]:
        """Heap IDs from a version-2 B-tree of link-name records (type 5):
        each record is a 4-byte name hash + the heap ID. Any tree depth
        (internal nodes walked by _btree_v2_walk)."""
        btype, _rec_size, recs = self._btree_v2_walk(addr)
        if btype not in (5, 6):  # link name / creation order indexes
            raise NotImplementedError(f"HDF5 v2 B-tree record type {btype}")
        return [rec[4:] for rec in recs]  # drop the 4-byte name hash

    @staticmethod
    def _parse_link(d: bytes) -> "tuple[str, int | tuple[str, str]]":
        """Link message (0x0006, spec IV.A.2.g). Hard links yield the target
        object header address; soft links (type 1) yield ``('soft', path)``
        for the walk to resolve; external links (type 64) raise loudly with
        the target file+path named (resolving them needs a second file this
        reader has no opener for)."""
        if d[0] != 1:
            raise NotImplementedError(f"HDF5 link message version {d[0]}")
        flags = d[1]
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = d[pos]
            pos += 1
        if flags & 0x04:  # creation order
            pos += 8
        if flags & 0x10:  # charset
            pos += 1
        len_size = 1 << (flags & 0x03)
        name_len = int.from_bytes(d[pos : pos + len_size], "little")
        pos += len_size
        name = d[pos : pos + name_len].decode()
        pos += name_len
        if ltype == 0:
            return name, int.from_bytes(d[pos : pos + 8], "little")
        if ltype == 1:  # soft link: 2-byte length + slash-separated path
            tlen = int.from_bytes(d[pos : pos + 2], "little")
            return name, ("soft", d[pos + 2 : pos + 2 + tlen].decode())
        if ltype == 64:  # external link: version/flags byte + NUL-split pair
            tlen = int.from_bytes(d[pos : pos + 2], "little")
            body = d[pos + 2 : pos + 2 + tlen]
            file_name, _, obj_path = body[1:].partition(b"\x00")
            target_file = file_name.decode(errors="replace")
            target_path = obj_path.rstrip(b"\x00").decode(errors="replace")
            return name, ("ext", target_file, target_path)
        raise NotImplementedError(
            f"HDF5 link type {ltype} (hard and soft links supported)"
        )

    def _local_heap(self, addr: int) -> int:
        b = self._buf
        if b[addr : addr + 4] != b"HEAP":
            raise ValueError("HDF5: bad local heap signature")
        return self._u(addr + 8 + 8 + 8, 8)  # data segment address

    def _heap_name(self, data_addr: int, offset: int) -> str:
        start = data_addr + offset
        end = self._buf.find_nul(start)
        if end < 0:
            raise ValueError("HDF5: unterminated link name in local heap")
        return self._buf[start:end].decode()

    def _group_btree_entries(
        self, addr: int, _seen: "set[int] | None" = None
    ) -> list[tuple[int, int, int, int]]:
        """Leaf SNOD entries (see :meth:`_snod_entries`) of a v1 group
        B-tree, any depth."""
        _seen = set() if _seen is None else _seen
        if addr in _seen:
            raise ValueError("HDF5: cyclic group B-tree")
        _seen.add(addr)
        b = self._buf
        if b[addr : addr + 4] != b"TREE":
            raise ValueError("HDF5: bad B-tree signature")
        node_type, level = b[addr + 4], b[addr + 5]
        n = self._u(addr + 6, 2)
        if node_type != 0:
            raise ValueError("HDF5: expected group B-tree (type 0)")
        pos = addr + 8 + 16  # skip siblings
        out: list[tuple[int, int]] = []
        # keys (length-size) and children (offset-size) alternate: k0 c0 k1 …
        children = []
        for _ in range(n):
            pos += 8  # key
            children.append(self._u(pos, 8))
            pos += 8
        for child in children:
            if level > 0:
                out.extend(self._group_btree_entries(child, _seen))
            else:
                out.extend(self._snod_entries(child))
        return out

    def _snod_entries(self, addr: int) -> list[tuple[int, int, int, int]]:
        """(name heap offset, ohdr address, cache type, scratch word) symbol
        table entries; cache type 2 marks a symbolic link whose value lives
        at the scratch-word offset in the group's local heap (spec III.C)."""
        b = self._buf
        if b[addr : addr + 4] != b"SNOD":
            raise ValueError("HDF5: bad symbol node signature")
        n = self._u(addr + 6, 2)
        out = []
        pos = addr + 8
        for _ in range(n):
            name_off = self._u(pos, 8)
            ohdr = self._u(pos + 8, 8)
            cache_type = self._u(pos + 16, 4)
            scratch = self._u(pos + 24, 4)
            out.append((name_off, ohdr, cache_type, scratch))
            pos += 40
        return out

    # -- dataset metadata -------------------------------------------------
    def _dataset_from_messages(self, name, msgs) -> Dataset | None:
        shape = dtype = None
        layout = None
        ds = Dataset(name=name, dtype=np.dtype("f8"), shape=(), layout="contiguous")
        for mtype, data in msgs:
            if mtype == 0x0001:
                shape = self._parse_dataspace(data)
            elif mtype == 0x0003:
                dtype = self._parse_datatype(data)
            elif mtype == 0x0008:
                layout = self._parse_layout(data, ds)
            elif mtype == 0x000B:
                ds.filters = self._parse_filters(data)
            elif mtype == 0x000C:
                parsed = self._parse_attribute(data)
                if parsed is not None:
                    ds.attrs[parsed[0]] = parsed[1]
        if shape is None or dtype is None or layout is None:
            return None  # not a dataset (e.g. named datatype)
        ds.shape, ds.dtype, ds.layout = shape, dtype, layout
        if layout == "chunked":
            ndims = len(ds.chunk_shape)
            chunk_bytes = int(np.prod(ds.chunk_shape, dtype=np.int64)) * dtype.itemsize
            if ds.chunk_index == "single":
                ds.chunks = [
                    (offs, addr, chunk_bytes if nb == -1 else nb, mask)
                    for offs, addr, nb, mask in ds.chunks
                ]
            elif ds.chunk_index == "implicit":
                if ds.data_address != _UNDEF:
                    grids = [
                        range(0, s, c) for s, c in zip(shape, ds.chunk_shape)
                    ]
                    import itertools

                    ds.chunks = [
                        (offs, ds.data_address + i * chunk_bytes, chunk_bytes, 0)
                        for i, offs in enumerate(itertools.product(*grids))
                    ]
            elif ds.chunk_index == "fixed_array":
                if ds.data_address != _UNDEF:
                    ds.chunks = [
                        (offs, a, chunk_bytes if nb == -1 else nb, mask)
                        for offs, a, nb, mask in self._fixed_array_chunks(
                            ds.data_address, shape, ds.chunk_shape,
                            ds.filtered_index,
                        )
                    ]
            elif ds.chunk_index == "ext_array":
                if ds.data_address != _UNDEF:
                    ds.chunks = [
                        (offs, a, chunk_bytes if nb == -1 else nb, mask)
                        for offs, a, nb, mask in self._ext_array_chunks(
                            ds.data_address, shape, ds.chunk_shape,
                            ds.filtered_index,
                        )
                    ]
            elif ds.chunk_index == "btree2":
                if ds.data_address != _UNDEF:
                    ds.chunks = [
                        (offs, a, chunk_bytes if nb == -1 else nb, mask)
                        for offs, a, nb, mask in self._btree2_chunks(
                            ds.data_address, shape, ds.chunk_shape,
                            ds.filtered_index,
                        )
                    ]
            elif ds.data_address != _UNDEF:
                ds.chunks = self._chunk_btree_entries(ds.data_address, ndims)
        for fid, _ in ds.filters:
            if fid not in (_DEFLATE, _SHUFFLE, _FLETCHER32):
                raise NotImplementedError(
                    f"HDF5 filter id {fid} on {name!r} not supported "
                    "(supported: deflate, shuffle, fletcher32)"
                )
        return ds

    def _parse_attribute(self, d: bytes) -> tuple[str, float] | None:
        """Scalar numeric attribute (name, value) — the netCDF-4 _FillValue
        shape. Returns None (skip) for anything outside the subset: v3
        encodings, shared datatypes, non-scalar dataspaces, non-numeric
        types."""
        version = d[0]
        if version not in (1, 2, 3):
            return None
        name_size = int.from_bytes(d[2:4], "little")
        dt_size = int.from_bytes(d[4:6], "little")
        sp_size = int.from_bytes(d[6:8], "little")
        if version in (2, 3) and d[1] & 0x01:  # shared datatype
            return None
        pad = (lambda n: n + ((8 - n % 8) % 8)) if version == 1 else (lambda n: n)
        # v3 (the version v2 object headers carry) adds one name-charset byte
        pos = 9 if version == 3 else 8
        name = d[pos : pos + name_size].split(b"\x00")[0].decode(errors="replace")
        pos += pad(name_size)
        try:
            dtype = self._parse_datatype(d[pos : pos + dt_size])
        except NotImplementedError:
            return None
        if dtype.kind not in "iuf":  # numeric attributes only (strings skip)
            return None
        pos += pad(dt_size)
        space = d[pos : pos + sp_size]
        pos += pad(sp_size)
        rank = space[1] if len(space) > 1 else 255
        if rank != 0:  # only scalar attributes
            return None
        value = np.frombuffer(d[pos : pos + dtype.itemsize], dtype=dtype)
        if len(value) != 1:
            return None
        return name, float(value[0])

    def _parse_dataspace(self, d: bytes) -> tuple[int, ...]:
        version, rank, flags = d[0], d[1], d[2]
        if version == 1:
            pos = 8
        elif version == 2:
            pos = 4
        else:
            raise NotImplementedError(f"HDF5 dataspace version {version}")
        return tuple(
            int.from_bytes(d[pos + 8 * i : pos + 8 * i + 8], "little")
            for i in range(rank)
        )

    def _parse_datatype(self, d: bytes) -> np.dtype:
        cls = d[0] & 0x0F
        bits0 = d[1]
        size = int.from_bytes(d[4:8], "little")
        order = ">" if (bits0 & 1) else "<"
        if cls == 0:  # fixed-point
            signed = "i" if (bits0 & 0x08) else "u"
            return np.dtype(f"{order}{signed}{size}")
        if cls == 1:  # floating-point (IEEE sizes only)
            if size not in (4, 8):
                raise NotImplementedError(f"HDF5 float size {size}")
            return np.dtype(f"{order}f{size}")
        if cls == 3:  # fixed-length string (netCDF-4 NC_CHAR = 1-byte S1);
            # padding/charset bits accepted — trailing pad is stripped at
            # the scan face, and bad bytes replace rather than raise
            return np.dtype(f"S{size}")
        if cls == 9:  # variable-length: the string variant is netCDF-4's
            # NC_STRING. Stored element = uint32 byte count + global heap ID
            # (8-byte collection address, 4-byte object index) — spec
            # "Datatype Message, Class 9" + III.E Global Heap; resolved
            # executor-side by read_vlen_strings.
            if (bits0 & 0x0F) != 1:
                raise NotImplementedError(
                    "HDF5 variable-length SEQUENCE datatype (only vlen "
                    "strings supported)"
                )
            return VLEN_STR_DTYPE
        raise NotImplementedError(
            f"HDF5 datatype class {cls} (fixed-point, float, fixed-length "
            "strings, and vlen strings supported)"
        )

    def _parse_layout(self, d: bytes, ds: Dataset) -> str:
        version = d[0]
        if version == 4:
            return self._parse_layout_v4(d, ds)
        if version != 3:
            raise NotImplementedError(f"HDF5 data layout version {version}")
        lclass = d[1]
        if lclass == 1:  # contiguous
            ds.data_address = int.from_bytes(d[2:10], "little")
            ds.data_size = int.from_bytes(d[10:18], "little")
            return "contiguous"
        if lclass == 2:  # chunked
            dimensionality = d[2]
            ds.data_address = int.from_bytes(d[3:11], "little")
            dims = [
                int.from_bytes(d[11 + 4 * i : 15 + 4 * i], "little")
                for i in range(dimensionality)
            ]
            ds.chunk_shape = tuple(dims[:-1])  # last entry = element size
            return "chunked"
        if lclass == 0:  # compact
            size = int.from_bytes(d[2:4], "little")
            ds.compact = d[4 : 4 + size]
            return "compact"
        raise NotImplementedError(f"HDF5 layout class {lclass}")

    def _parse_layout_v4(self, d: bytes, ds: Dataset) -> str:
        """Version-4 data layout (1.10+ format): contiguous/compact match
        v3; chunked datasets carry one of five chunk index types, ALL of
        which resolve to the shared chunk-map shape — Single Chunk,
        Implicit, Fixed Array (fixed-shape chunking), Extensible Array
        (one unlimited dimension; inline index-block subset), and
        version-2 B-tree (multiple unlimited dimensions; single-leaf
        subset)."""
        lclass = d[1]
        if lclass == 1:  # contiguous — identical body to v3
            ds.data_address = int.from_bytes(d[2:10], "little")
            ds.data_size = int.from_bytes(d[10:18], "little")
            return "contiguous"
        if lclass == 0:  # compact — identical body to v3
            size = int.from_bytes(d[2:4], "little")
            ds.compact = d[4 : 4 + size]
            return "compact"
        if lclass != 2:
            raise NotImplementedError(f"HDF5 layout v4 class {lclass}")
        flags = d[2]
        ndims = d[3]
        enc = d[4]  # bytes per encoded dimension size
        pos = 5
        dims = []
        for _ in range(ndims):
            dims.append(int.from_bytes(d[pos : pos + enc], "little"))
            pos += enc
        ds.chunk_shape = tuple(dims)
        index_type = d[pos]
        pos += 1
        if index_type == 1:  # single chunk
            if flags & 0x02:  # filtered: size + filter mask precede address
                nbytes = int.from_bytes(d[pos : pos + 8], "little")
                mask = int.from_bytes(d[pos + 8 : pos + 12], "little")
                pos += 12
            else:
                nbytes, mask = 0, 0
            addr = int.from_bytes(d[pos : pos + 8], "little")
            ds.data_address = addr
            ds.chunk_index = "single"
            if addr != _UNDEF:
                # unfiltered single chunks store no size; -1 is resolved to
                # prod(chunk_shape)*itemsize once the datatype is known
                ds.chunks = [((0,) * ndims, addr, nbytes or -1, mask)]
            return "chunked"
        if index_type == 2:  # implicit: chunks contiguous, unfiltered
            addr = int.from_bytes(d[pos : pos + 8], "little")
            ds.data_address = addr
            ds.chunk_index = "implicit"
            return "chunked"
        if index_type == 3:  # fixed array — latest-format fixed-shape chunking
            # page bits byte, then the FAHD header address
            addr = int.from_bytes(d[pos + 1 : pos + 9], "little")
            ds.data_address = addr
            ds.chunk_index = "fixed_array"
            ds.filtered_index = bool(flags & 0x02)
            return "chunked"
        if index_type == 4:  # extensible array — ONE unlimited dimension
            # max bits, index elements, min pointers, min elements, page
            # bits (5 creation-parameter bytes), then the EAHD address
            addr = int.from_bytes(d[pos + 5 : pos + 13], "little")
            ds.data_address = addr
            ds.chunk_index = "ext_array"
            ds.filtered_index = bool(flags & 0x02)
            return "chunked"
        if index_type == 5:  # version-2 B-tree — >1 unlimited dimension
            # node size (4), split percent (1), merge percent (1), address
            addr = int.from_bytes(d[pos + 6 : pos + 14], "little")
            ds.data_address = addr
            ds.chunk_index = "btree2"
            ds.filtered_index = bool(flags & 0x02)
            return "chunked"
        raise NotImplementedError(
            f"HDF5 layout v4 chunk index {index_type!r} not supported — "
            "repack with h5repack -L (compact/earliest format) or ingest "
            "via convert-zarr"
        )

    def _fixed_array_chunks(
        self, addr: int, shape, chunk_shape, filtered: bool
    ) -> list[tuple[tuple[int, ...], int, int, int]]:
        """Chunk map from a v4 Fixed Array index (FAHD header + FADB data
        block): elements are chunk addresses (plus size + filter mask when
        the pipeline is filtered), one per grid position in C order. The
        paged FADB form (very large chunk counts) raises loudly."""
        b = self._buf
        if b[addr : addr + 4] != b"FAHD":
            raise ValueError("HDF5: bad fixed array header signature")
        if b[addr + 4] != 0:
            raise NotImplementedError(f"HDF5 fixed array version {b[addr + 4]}")
        client = b[addr + 5]
        entry_size = b[addr + 6]
        page_bits = b[addr + 7]
        nelmts = self._u(addr + 8, 8)
        dblk = self._u(addr + 16, 8)
        if client not in (0, 1):
            raise NotImplementedError(f"HDF5 fixed array client id {client}")
        if client != (1 if filtered else 0):
            raise ValueError(
                "HDF5: fixed-array client id disagrees with the layout's "
                "filtered flag"
            )
        if nelmts > (1 << page_bits):
            raise NotImplementedError(
                "HDF5 paged fixed-array chunk index not supported "
                f"({nelmts} chunks > one {1 << page_bits}-element page)"
            )
        if b[dblk : dblk + 4] != b"FADB":
            raise ValueError("HDF5: bad fixed array data block signature")
        pos = dblk + 4 + 1 + 1 + 8  # sig, version, client id, header addr
        grids = [range(0, s, c) for s, c in zip(shape, chunk_shape)]
        import itertools

        chunk_bytes = -1  # resolved by the caller for unfiltered chunks
        out = []
        for offs in itertools.product(*grids):
            a = self._u(pos, 8)
            if client == 1:
                # filtered element: address + chunk size + filter mask;
                # the size field width is entry_size - 8 - 4
                sz_w = entry_size - 12
                nb = self._u(pos + 8, sz_w)
                mask = self._u(pos + 8 + sz_w, 4)
            else:
                nb, mask = chunk_bytes, 0
            pos += entry_size
            if a != _UNDEF:
                out.append((offs, a, nb, mask))
        return out

    def _ext_array_chunks(
        self, addr: int, shape, chunk_shape, filtered: bool
    ) -> list[tuple[tuple[int, ...], int, int, int]]:
        """Chunk map from a v4 Extensible Array index (EAHD header + EAIB
        index block + EADB data blocks) — the latest-format index for
        datasets with ONE unlimited dimension, i.e. appendable time series.
        Elements live first INLINE in the index block (libhdf5 default: 4),
        then in data blocks addressed from the index block whose capacities
        follow the EA doubling schedule — super-block level u holds
        2^(u//2) blocks of data_blk_min_elmts * 2^((u+1)//2) elements, and
        the index block addresses the blocks of the first
        2*log2(sup_blk_min_data_ptrs) levels directly (H5EA's published
        layout math). Two loud self-checks make a placement-math error
        impossible to hit silently: every EADB carries its own element
        offset, which must equal the derived start (in either the
        with-or-without-index-block-elements convention, consistently), and
        the final chunk map must tile the chunk grid without duplicates.
        Super blocks (beyond the index block's direct span) and paged data
        blocks raise loudly with the usual conversion hint. Elements are in
        C order over the chunk grid of the CURRENT shape, matching the
        swizzled dim-0-unlimited layout netCDF time series use."""
        b = self._buf
        if b[addr : addr + 4] != b"EAHD":
            raise ValueError("HDF5: bad extensible array header signature")
        if b[addr + 4] != 0:
            raise NotImplementedError(f"HDF5 extensible array version {b[addr + 4]}")
        client = b[addr + 5]
        elmt_size = b[addr + 6]
        max_nelmts_bits = b[addr + 7]
        idx_blk_elmts = b[addr + 8]
        dblk_min_elmts = b[addr + 9]
        sup_min_ptrs = b[addr + 10]
        dblk_page_bits = b[addr + 11]
        if client not in (0, 1):
            raise NotImplementedError(f"HDF5 extensible array client id {client}")
        if client != (1 if filtered else 0):
            raise ValueError(
                "HDF5: extensible-array client id disagrees with the "
                "layout's filtered flag"
            )
        iblk_addr = self._u(addr + 60, 8)
        if iblk_addr == _UNDEF:
            return []
        if b[iblk_addr : iblk_addr + 4] != b"EAIB":
            raise ValueError("HDF5: bad extensible array index block signature")
        if b[iblk_addr + 4] != 0 or b[iblk_addr + 5] != client:
            raise ValueError("HDF5: extensible array index block mismatch")
        import itertools

        grids = [range(0, s, c) for s, c in zip(shape, chunk_shape)]
        n_chunks = 1
        for g in grids:
            n_chunks *= len(g)

        def parse_elmt(pos: int):
            a = self._u(pos, 8)
            if client == 1:
                sz_w = elmt_size - 12  # element: addr(8) + size + mask(4)
                return a, self._u(pos + 8, sz_w), self._u(pos + 8 + sz_w, 4)
            return a, -1, 0

        pos = iblk_addr + 4 + 1 + 1 + 8  # sig, version, client id, header addr
        elements: list[tuple[int, int, int]] = []
        for _ in range(min(idx_blk_elmts, n_chunks)):
            elements.append(parse_elmt(pos))
            pos += elmt_size
        if n_chunks > idx_blk_elmts:
            # data blocks: index block directly addresses the blocks of the
            # first 2*log2(sup_blk_min_data_ptrs) doubling levels
            iblock_nsblks = 2 * (sup_min_ptrs.bit_length() - 1)
            ndblk_addrs = 2 * (sup_min_ptrs - 1)
            schedule: list[tuple[int, int]] = []  # (start_elmt, nelmts) per block
            start = 0
            for u in range(iblock_nsblks):
                nelmts_u = dblk_min_elmts << ((u + 1) // 2)
                for _ in range(1 << (u // 2)):
                    schedule.append((start, nelmts_u))
                    start += nelmts_u
            assert len(schedule) == ndblk_addrs
            if n_chunks > idx_blk_elmts + start:
                raise NotImplementedError(
                    f"HDF5 extensible array: {n_chunks} chunks exceed the "
                    f"index block's direct span ({idx_blk_elmts + start}); "
                    "super blocks not supported — repack with h5repack -L "
                    "or ingest via convert-zarr"
                )
            off_w = (max_nelmts_bits + 7) // 8
            off_delta: "int | None" = None  # stored-offset convention, fixed by 1st block
            for blk_i, (start_e, nelmts_b) in enumerate(schedule):
                dblk_addr = self._u(pos, 8)
                pos += 8
                if dblk_addr == _UNDEF:
                    elements.extend([(_UNDEF, -1, 0)] * nelmts_b)
                    continue
                if nelmts_b > (1 << dblk_page_bits):
                    raise NotImplementedError(
                        "HDF5 extensible array: paged data block not supported"
                    )
                if b[dblk_addr : dblk_addr + 4] != b"EADB":
                    raise ValueError("HDF5: bad extensible array data block signature")
                if b[dblk_addr + 4] != 0 or b[dblk_addr + 5] != client:
                    raise ValueError("HDF5: extensible array data block mismatch")
                if self._u(dblk_addr + 6, 8) != addr:
                    raise ValueError("HDF5: EADB does not point back to its header")
                stored_off = self._u(dblk_addr + 14, off_w)
                if off_delta is None:
                    off_delta = stored_off - start_e
                    if off_delta not in (0, idx_blk_elmts):
                        raise ValueError(
                            f"HDF5: EADB element offset {stored_off} does not match "
                            f"the derived block start {start_e} under either offset "
                            "convention — layout math disagreement, refusing to guess"
                        )
                elif stored_off != start_e + off_delta:
                    raise ValueError(
                        f"HDF5: EADB element offset {stored_off} inconsistent with "
                        f"derived start {start_e + off_delta}"
                    )
                epos = dblk_addr + 14 + off_w
                for _ in range(nelmts_b):
                    elements.append(parse_elmt(epos))
                    epos += elmt_size
        if n_chunks > len(elements):
            raise ValueError(
                "HDF5: extensible array holds fewer elements than the "
                "chunk grid — layout math disagreement"
            )
        out = []
        for i, offs in enumerate(itertools.product(*grids)):
            a, nb, mask = elements[i]
            if a != _UNDEF:
                out.append((offs, a, nb, mask))
        return out

    def _btree2_chunks(
        self, addr: int, shape, chunk_shape, filtered: bool
    ) -> list[tuple[tuple[int, ...], int, int, int]]:
        """Chunk map from a v4 version-2 B-tree index — the latest-format
        index for datasets with MORE THAN ONE unlimited dimension. Record
        type 10 (non-filtered: chunk address + per-dimension SCALED
        offsets) and 11 (filtered: address + variable-width chunk size +
        4-byte filter mask + scaled offsets). Any tree depth (internal
        nodes walked by _btree_v2_walk)."""
        btype, rec_size, recs = self._btree_v2_walk(addr, want={10, 11})
        want = 11 if filtered else 10
        if btype != want:
            raise ValueError(
                f"HDF5: v2 B-tree record type {btype} disagrees with the "
                f"layout's filtered flag (expected {want})"
            )
        ndims = len(chunk_shape)
        rank = len(shape)  # offsets beyond the dataspace rank are padding
        out = []
        for rec in recs:
            a = int.from_bytes(rec[0:8], "little")
            p = 8
            if btype == 11:
                sz_w = rec_size - 8 - 4 - 8 * ndims
                if sz_w <= 0:
                    raise ValueError("HDF5: v2 B-tree record size too small")
                nb = int.from_bytes(rec[p : p + sz_w], "little")
                mask = int.from_bytes(rec[p + sz_w : p + sz_w + 4], "little")
                p += sz_w + 4
            else:
                nb, mask = -1, 0
            offs = tuple(
                int.from_bytes(rec[p + 8 * i : p + 8 * i + 8], "little")
                * chunk_shape[i]
                for i in range(rank)
            )
            if a != _UNDEF:
                out.append((offs, a, nb, mask))
        return out

    def _parse_filters(self, d: bytes) -> list[tuple[int, tuple[int, ...]]]:
        version, nfilters = d[0], d[1]
        if version not in (1, 2):
            raise NotImplementedError(f"HDF5 filter pipeline version {version}")
        pos = 8 if version == 1 else 2
        out: list[tuple[int, tuple[int, ...]]] = []
        for _ in range(nfilters):
            fid = int.from_bytes(d[pos : pos + 2], "little")
            pos += 2
            # v2 omits the Name Length field entirely for filter ids < 256
            # (spec: "Filters with IDs less than 256 ... do not store the
            # Name Length or Name fields"); v1 always stores it.
            if version == 1 or fid >= 256:
                name_len = int.from_bytes(d[pos : pos + 2], "little")
                pos += 2
            else:
                name_len = 0
            ncdv = int.from_bytes(d[pos + 2 : pos + 4], "little")
            pos += 4  # flags + ncdv
            if name_len:
                pos += name_len + ((8 - name_len % 8) % 8 if version == 1 else 0)
            cdv = tuple(
                int.from_bytes(d[pos + 4 * i : pos + 4 * i + 4], "little")
                for i in range(ncdv)
            )
            pos += 4 * ncdv
            if version == 1 and ncdv % 2 == 1:
                pos += 4  # odd client data padded to 8
            out.append((fid, cdv))
        return out

    def _chunk_btree_entries(
        self, addr: int, ndims: int, _seen: "set[int] | None" = None
    ) -> list[tuple[tuple[int, ...], int, int, int]]:
        _seen = set() if _seen is None else _seen
        if addr in _seen:
            raise ValueError("HDF5: cyclic chunk B-tree")
        _seen.add(addr)
        b = self._buf
        if b[addr : addr + 4] != b"TREE":
            raise ValueError("HDF5: bad chunk B-tree signature")
        node_type, level = b[addr + 4], b[addr + 5]
        n = self._u(addr + 6, 2)
        if node_type != 1:
            raise ValueError("HDF5: expected chunk B-tree (type 1)")
        key_size = 8 + 8 * (ndims + 1)  # size(4) + mask(4) + offsets
        pos = addr + 8 + 16
        out = []
        for _ in range(n):
            nbytes = self._u(pos, 4)
            mask = self._u(pos + 4, 4)
            offs = tuple(
                self._u(pos + 8 + 8 * i, 8) for i in range(ndims)
            )  # drop trailing elem-0 coordinate
            child = self._u(pos + key_size, 8)
            if level > 0:
                out.extend(self._chunk_btree_entries(child, ndims, _seen))
            else:
                out.append((offs, child, nbytes, mask))
            pos += key_size + 8
        return out


def fletcher32(data: bytes) -> int:
    """HDF5's Fletcher-32 variant (H5checksum.c H5_checksum_fletcher32,
    public): big-endian 16-bit words, an odd trailing byte padded low, both
    running sums folded to 16 bits. The C loop folds every 360 words purely
    to avoid uint32 overflow; with arbitrary-precision sums the result is
    the same congruence class mod 0xffff, with 0xffff (not 0) as the
    representative of a non-zero multiple — exactly the C fixpoint, since
    fold(0xffff) == 0xffff. Differentially tested against a literal
    transliteration of the C loop in tests/test_hdf5_v2.py."""
    arr = np.frombuffer(data[: len(data) // 2 * 2], dtype=">u2").astype(np.int64)
    s1 = int(arr.sum())
    # sum2 accumulates the running sum1 after every word: Σ (m - j) * w_j
    s2 = int((arr * np.arange(len(arr), 0, -1, dtype=np.int64)).sum())
    if len(data) % 2:
        w = data[-1] << 8
        s1 += w
        s2 += s1
    def fold(x: int) -> int:
        r = x % 0xFFFF
        return 0xFFFF if (r == 0 and x != 0) else r
    return (fold(s2) << 16) | fold(s1)


def decode_chunk(
    raw: bytes,
    dtype: np.dtype,
    chunk_shape: tuple[int, ...],
    filters: list[tuple[int, tuple[int, ...]]],
    filter_mask: int,
) -> np.ndarray:
    """Reverse the filter pipeline (last applied, first reversed) and view as
    the chunk array. Runs executor-side on raw chunk bytes."""
    data = raw
    for idx in range(len(filters) - 1, -1, -1):
        fid, cdv = filters[idx]
        if filter_mask & (1 << idx):
            continue  # filter skipped for this chunk at write time
        if fid == _DEFLATE:
            data = zlib.decompress(data)
        elif fid == _SHUFFLE:
            elem = cdv[0] if cdv else dtype.itemsize
            arr = np.frombuffer(data, dtype=np.uint8)
            n = len(arr) // elem
            data = arr.reshape(elem, n).T.tobytes()
        elif fid == _FLETCHER32:
            payload, stored = data[:-4], int.from_bytes(data[-4:], "little")
            if fletcher32(payload) != stored:
                raise ValueError(
                    f"HDF5 fletcher32 checksum mismatch on chunk "
                    f"(stored {stored:#010x})"
                )
            data = payload
        else:  # pragma: no cover - gated at metadata parse
            raise NotImplementedError(f"HDF5 filter id {fid}")
    return np.frombuffer(data, dtype=dtype).reshape(chunk_shape)


def _parse_gcol(raw: bytes) -> dict[int, bytes]:
    """One Global Heap Collection (spec III.E): 'GCOL' + version + size,
    then objects of (index u2, refcount u2, reserved, size u8, data padded
    to 8). Object index 0 marks the free space and ends the walk."""
    if raw[:4] != b"GCOL":
        raise ValueError("HDF5: bad global heap collection signature")
    if raw[4] != 1:
        raise NotImplementedError(f"HDF5 global heap version {raw[4]}")
    total = int.from_bytes(raw[8:16], "little")
    out: dict[int, bytes] = {}
    pos = 16
    while pos + 16 <= min(total, len(raw)):
        idx = int.from_bytes(raw[pos : pos + 2], "little")
        if idx == 0:
            break
        size = int.from_bytes(raw[pos + 8 : pos + 16], "little")
        out[idx] = raw[pos + 16 : pos + 16 + size]
        pos += 16 + size + ((8 - size % 8) % 8)
    return out


def read_vlen_strings(r, desc: np.ndarray, cache: "dict | None" = None) -> list:
    """Resolve a VLEN_STR_DTYPE descriptor array to Python strings via the
    file's global heap. One pread per DISTINCT collection (descriptors in a
    row range overwhelmingly share one collection), cached across calls
    when the caller threads ``cache`` through. A zero heap address — the
    never-written element — reads as ''."""
    if cache is None:
        cache = {}
    out = []
    for d in desc.reshape(-1):
        n, addr, idx = int(d["len"]), int(d["gcol"]), int(d["idx"])
        if addr in (0, _UNDEF) or n == 0:
            out.append("")
            continue
        col = cache.get(addr)
        if col is None:
            head = r.pread(addr, 16)
            total = int.from_bytes(head[8:16], "little")
            col = _parse_gcol(r.pread(addr, total))
            cache[addr] = col
        blob = col.get(idx)
        if blob is None:
            raise ValueError(
                f"HDF5: vlen string references missing global heap object "
                f"{idx} in collection at {addr:#x}"
            )
        out.append(blob[:n].decode("utf-8", errors="replace"))
    return out


def read_dataset(h5: "H5File", name: str) -> np.ndarray:
    """Whole-array read (driver-side helper for tests/small dims; the
    distributed path in sources/netcdf.py reads row ranges per task)."""
    ds = h5.datasets[name]
    buf = ds.owner if ds.owner is not None else h5._buf
    if ds.layout == "compact":
        return np.frombuffer(ds.compact, dtype=ds.dtype).reshape(ds.shape)
    if ds.layout == "contiguous":
        if ds.data_address == _UNDEF:
            return np.zeros(ds.shape, dtype=ds.dtype)  # never allocated
        raw = buf[ds.data_address : ds.data_address + ds.data_size]
        return np.frombuffer(raw, dtype=ds.dtype).reshape(ds.shape)
    out = np.zeros(ds.shape, dtype=ds.dtype)
    for offs, addr, nbytes, mask in ds.chunks:
        chunk = decode_chunk(
            buf[addr : addr + nbytes], ds.dtype, ds.chunk_shape, ds.filters, mask
        )
        sel = tuple(
            slice(o, min(o + c, s)) for o, c, s in zip(offs, ds.chunk_shape, ds.shape)
        )
        clip = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        out[sel] = chunk[clip]
    return out
