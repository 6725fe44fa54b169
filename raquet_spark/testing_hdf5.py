"""Minimal from-scratch HDF5 / NetCDF-4 *writer* — TEST FIXTURE ONLY.

sources/hdf5.py needs real NetCDF-4 bytes to read and this sandbox has
no h5py/netCDF4, so this module emits the same structures the netcdf-c
library produces, straight from the public HDF5 File Format
Specification v3.0:

- ``style="v0"``: superblock v0, v1 object headers, old-style root
  group (local heap + SNOD + B-tree v1) — the HDF5-1.6-compatible
  layout.
- ``style="latest"``: superblock v2, v2 object headers ("OHDR") with
  creation-order-tracked messages, compact link messages — what
  netcdf-c's creation-order tracking produces for small groups.
- ``dense_links=True`` / ``dense_attrs=True``: fractal heap ("FRHP")
  + v2 B-tree ("BTHD"/"BTLF") name index — what HDF5 switches to past
  8 links/attributes (netcdf-c files with many variables).

Checksums (Jenkins lookup3) are written as zeros; the reader does not
verify them (documented there). Data variables are chunked with the
shuffle+deflate pipeline, coordinates contiguous, DIMENSION_LIST +
CLASS/NAME dimension-scale attributes attached like netcdf-c does —
including VLEN object-reference attributes through a global heap
("GCOL")."""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


class _W:
    def __init__(self):
        self.b = bytearray()

    def tell(self) -> int:
        return len(self.b)

    def emit(self, data: bytes) -> int:
        addr = len(self.b)
        self.b += data
        return addr

    def patch_u64(self, pos: int, val: int):
        self.b[pos : pos + 8] = struct.pack("<Q", val)


# ---- datatype messages -------------------------------------------------

_FLOAT_PROPS = {
    4: (31, 23, 8, 23, 127),
    8: (63, 52, 11, 52, 1023),
}


def _dt_int(size: int, signed: bool = True) -> bytes:
    return struct.pack(
        "<BBBBIHH", 0x10, 0x08 if signed else 0x00, 0, 0, size, 0, size * 8
    )


def _dt_float(size: int) -> bytes:
    sign, exploc, expsz, mansz, bias = _FLOAT_PROPS[size]
    return struct.pack(
        "<BBBBIHHBBBBI",
        0x11, 0x20, sign, 0, size,
        0, size * 8, exploc, expsz, 0, mansz, bias,
    )


def _dt_str(n: int) -> bytes:
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, n)


def _dt_vlen_ref() -> bytes:
    # vlen sequence (class 9) of object references (class 7, 8 bytes)
    return struct.pack("<BBBBI", 0x19, 0x00, 0, 0, 16) + struct.pack(
        "<BBBBI", 0x17, 0, 0, 0, 8
    )


def _dt_ref() -> bytes:
    return struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)


def _dt_compound(members, size: int, v3: bool) -> bytes:
    """Compound datatype message (class 6), v1 (padded names + the
    28-byte dimensionality/permutation block) or v3 (bare names +
    minimal-width offsets) — the two layouts netcdf-c emits depending
    on libver. ``members``: [(name, byte_offset, member_dt_msg)]."""
    nm = len(members)
    cv = ((3 if v3 else 1) << 4) | 6
    out = struct.pack("<BBBBI", cv, nm & 0xFF, (nm >> 8) & 0xFF, 0, size)
    for name, off, dtb in members:
        if v3:
            out += name.encode() + b"\x00"
            out += off.to_bytes(max(1, (size.bit_length() + 7) // 8),
                                "little")
        else:
            out += _pad8(name.encode() + b"\x00")
            out += struct.pack("<I", off) + b"\x00" * 28
        out += dtb
    return out


class RawAttr:
    """Escape hatch: an attribute with caller-supplied datatype /
    dataspace / value bytes — used to plant datatype classes the
    reader intentionally does not decode (enum, bitfield, ...) and
    assert they degrade to name→None instead of failing the file."""

    def __init__(self, dt_msg: bytes, ds_msg: bytes, value: bytes):
        self.dt_msg, self.ds_msg, self.value = dt_msg, ds_msg, value


def _m_dataspace(dims, ver: int = 1, maxdims=None) -> bytes:
    """``maxdims``: per-dim max extent, -1 = UNLIMITED (what netcdf-c
    writes for the record/time dimension); stored per flags bit 0."""
    rank = len(dims)
    flags = 1 if maxdims is not None else 0
    if ver == 1:
        head = struct.pack("<BBB5x", 1, rank, flags)
    else:
        head = struct.pack("<BBBB", 2, rank, flags, 1 if rank else 0)
    out = head + b"".join(struct.pack("<Q", d) for d in dims)
    if maxdims is not None:
        out += b"".join(
            struct.pack("<Q", UNDEF if m == -1 else m) for m in maxdims
        )
    return out


def _np_dt_msg(dt: np.dtype) -> bytes:
    if dt.kind == "i":
        return _dt_int(dt.itemsize, True)
    if dt.kind == "u":
        return _dt_int(dt.itemsize, False)
    if dt.kind == "f":
        return _dt_float(dt.itemsize)
    raise ValueError(f"unsupported fixture dtype {dt}")


# ---- attributes --------------------------------------------------------

def _attr_body(name: str, dt_msg: bytes, ds_msg: bytes, value: bytes,
               v3: bool) -> bytes:
    nm = name.encode() + b"\x00"
    if v3:
        return (
            struct.pack("<BBHHHB", 3, 0, len(nm), len(dt_msg), len(ds_msg), 0)
            + nm + dt_msg + ds_msg + value
        )
    return (
        struct.pack("<BBHHH", 1, 0, len(nm), len(dt_msg), len(ds_msg))
        + _pad8(nm) + _pad8(dt_msg) + _pad8(ds_msg) + value
    )


def _attr_spec(name: str, value, v3: bool) -> bytes:
    """(name, python value) → attribute message body. Strings become
    fixed NUL-terminated strings (netcdf-c's NC_CHAR convention);
    floats f8 scalars; ints i4; numpy scalars keep their dtype."""
    if isinstance(value, RawAttr):
        return _attr_body(name, value.dt_msg, value.ds_msg, value.value, v3)
    if isinstance(value, str):
        raw = value.encode() + b"\x00"
        return _attr_body(name, _dt_str(len(raw)), _m_dataspace([]), raw, v3)
    if isinstance(value, np.generic):
        dt = value.dtype
        return _attr_body(
            name, _np_dt_msg(dt), _m_dataspace([]), value.tobytes(), v3
        )
    if isinstance(value, float):
        return _attr_body(
            name, _dt_float(8), _m_dataspace([]),
            struct.pack("<d", value), v3,
        )
    if isinstance(value, int):
        return _attr_body(
            name, _dt_int(4), _m_dataspace([]), struct.pack("<i", value), v3
        )
    raise ValueError(f"unsupported attribute value {value!r}")


# ---- object headers ----------------------------------------------------

def _header_v1(msgs: list[tuple[int, bytes]]) -> bytes:
    body = b""
    for mt, mb in msgs:
        mb = _pad8(mb)
        body += struct.pack("<HHB3x", mt, len(mb), 0) + mb
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(body)) + body


def _header_v2(msgs: list[tuple[int, bytes]]) -> bytes:
    body = b""
    for i, (mt, mb) in enumerate(msgs):
        body += struct.pack("<BHBH", mt, len(mb), 0, i) + mb
    # flags: 4-byte chunk0 size (0x2) + creation order tracked (0x4)
    return (
        b"OHDR" + struct.pack("<BBI", 2, 0x06, len(body)) + body
        + struct.pack("<I", 0)  # checksum (unverified)
    )


# ---- filters / layout / fill ------------------------------------------

def _apply_filters(raw: bytes, filters, itemsize: int):
    pipeline = []
    for f in filters:
        if f[0] == "shuffle":
            n = len(raw) // itemsize
            raw = (
                np.frombuffer(raw, dtype="u1")
                .reshape(n, itemsize)
                .T.tobytes()
            )
            pipeline.append((2, [itemsize]))
        elif f[0] == "deflate":
            lvl = f[1] if len(f) > 1 else 4
            raw = zlib.compress(raw, lvl)
            pipeline.append((1, [lvl]))
        elif f[0] == "fletcher32":
            raw = raw + struct.pack("<I", 0)  # checksum unverified by reader
            pipeline.append((3, []))
        else:
            raise ValueError(f"unknown fixture filter {f[0]}")
    return raw, pipeline


def _m_filters(pipeline) -> bytes:
    out = struct.pack("<BB6x", 1, len(pipeline))
    for fid, cvs in pipeline:
        out += struct.pack("<HHHH", fid, 0, 1, len(cvs))
        out += b"".join(struct.pack("<I", c) for c in cvs)
        if len(cvs) % 2:
            out += b"\x00" * 4
    return out


def _m_fill(raw: bytes | None) -> bytes:
    if raw is None:
        return struct.pack("<BBBB", 2, 2, 0, 0)
    return struct.pack("<BBBBI", 2, 2, 0, 1, len(raw)) + raw


# ---- v4 chunk indexes (HDF5 1.10+) --------------------------------------

def _m_layout_v4(cd, itemsize: int, itype: int, addr: int,
                 extra: bytes = b"") -> bytes:
    """Data layout message v4, class 2 (chunked): flags + dims (with
    the element size riding as the last dimension, like v3) + chunk
    indexing type + index-specific fields + index address."""
    dims = [*cd, itemsize]
    flags = 0x02 if (itype == 1 and extra) else 0
    out = struct.pack("<BBBBB", 4, 2, flags, len(dims), 4)
    out += b"".join(struct.pack("<I", d) for d in dims)
    out += bytes([itype]) + extra + struct.pack("<Q", addr)
    return out


def _fixed_array(w: _W, entries: list[bytes | None], entry_size: int,
                 page_bits: int, dead_pages=()) -> int:
    """FAHD + FADB for a chunk index. ``entries``: per linear chunk,
    the element bytes or None (unallocated → UNDEF address).
    ``dead_pages``: page ordinals left uninitialized (bitmap 0) when
    the block is paged."""
    nelmts = len(entries)
    page_nelmts = 1 << page_bits
    undef = UNDEF.to_bytes(8, "little").ljust(entry_size, b"\x00")
    elems = [(e if e is not None else undef) for e in entries]
    hdr_addr = w.tell()
    hdr_size = 4 + 1 + 1 + 1 + 1 + 8 + 8 + 4
    dblk_addr = hdr_addr + hdr_size
    w.emit(
        b"FAHD"
        + struct.pack("<BBBBQQI", 0, 1 if entry_size > 8 else 0,
                      entry_size, page_bits, nelmts, dblk_addr, 0)
    )
    blk = b"FADB" + struct.pack("<BBQ", 0, 1 if entry_size > 8 else 0,
                                hdr_addr)
    if nelmts > page_nelmts:  # paged
        npages = (nelmts + page_nelmts - 1) // page_nelmts
        bitmap = bytearray((npages + 7) // 8)
        for pg in range(npages):
            if pg not in dead_pages:
                bitmap[pg // 8] |= 1 << (pg % 8)
        blk += bytes(bitmap) + struct.pack("<I", 0)  # block checksum
        for pg in range(npages):
            page = elems[pg * page_nelmts : (pg + 1) * page_nelmts]
            body = b"".join(page)
            body += b"\x00" * (entry_size * (page_nelmts - len(page)))
            blk += body + struct.pack("<I", 0)  # page checksum
    else:
        blk += b"".join(elems) + struct.pack("<I", 0)
    assert w.tell() == dblk_addr
    w.emit(blk)
    return hdr_addr


def _extensible_array(
    w: _W,
    entries: list[bytes | None],
    entry_size: int,
    max_bits: int = 16,
    idx_elmts: int = 1,
    min_elmts: int = 2,
    min_ptrs: int = 2,
    page_bits: int = 10,
    dead_pages=(),
) -> int:
    """EAHD + EAIB + EASB/EADB chunk index (spec III.F) — what HDF5
    1.10+ writes for a dataset with one unlimited dimension. The
    geometry (super-block sizing, direct-address slots) comes from
    sources.hdf5.ea_geometry so reader and writer agree by
    construction; the byte layout here follows the spec section
    directly. ``entries``: per linear chunk, element bytes or None
    (unallocated). Blocks containing no allocated element are left
    UNDEF (never materialized). ``dead_pages``: set of (global data
    block ordinal, page ordinal) cleared in the owning super block's
    page bitmap — pages never written."""
    from raquet_spark.sources.hdf5 import ea_geometry

    info, first_real, ndblk_addrs, nsblk_addrs, off_size = ea_geometry(
        max_bits, idx_elmts, min_elmts, min_ptrs
    )
    page_nelmts = 1 << page_bits
    client = 1 if entry_size > 8 else 0
    undef_elt = UNDEF.to_bytes(8, "little").ljust(entry_size, b"\x00")
    n = len(entries)

    def elt(i: int) -> bytes:
        e = entries[i] if i < n else None
        return e if e is not None else undef_elt

    def any_alloc(lo: int, hi: int) -> bool:
        return any(
            entries[i] is not None for i in range(lo, min(hi, n))
        )

    hdr_patches: list[int] = []  # file offsets of header back-pointers

    def prefix(sig: bytes) -> bytes:
        return sig + struct.pack("<BB", 0, client)

    def emit_dblock(goff: int, nelmts: int) -> int:
        """goff: element offset of the block in the full index space
        (inline elements included, per the spec's Block Offset)."""
        if not any_alloc(goff, goff + nelmts):
            return UNDEF
        body = prefix(b"EADB")
        hdr_pos = len(body)
        body += b"\x00" * 8  # header address (patched)
        body += goff.to_bytes(off_size, "little")
        if nelmts > page_nelmts:  # paged: prefix checksum, then pages
            body += struct.pack("<I", 0)
            for pg in range(nelmts // page_nelmts):
                for i in range(goff + pg * page_nelmts,
                               goff + (pg + 1) * page_nelmts):
                    body += elt(i)
                body += struct.pack("<I", 0)  # page checksum
        else:
            for i in range(goff, goff + nelmts):
                body += elt(i)
            body += struct.pack("<I", 0)
        a = w.emit(body)
        hdr_patches.append(a + hdr_pos)
        return a

    def emit_dblock_forced(goff: int, nelmts: int) -> int:
        """A paged block materialized on disk whose every page is dead
        (bitmap 0) — space reserved, elements never written."""
        body = prefix(b"EADB")
        hdr_pos = len(body)
        body += b"\x00" * 8
        body += goff.to_bytes(off_size, "little") + struct.pack("<I", 0)
        for _pg in range(nelmts // page_nelmts):
            body += undef_elt * page_nelmts + struct.pack("<I", 0)
        a = w.emit(body)
        hdr_patches.append(a + hdr_pos)
        return a

    # data blocks + super blocks, only as far as the entries reach
    direct = [UNDEF] * ndblk_addrs
    sblks = [UNDEF] * max(0, nsblk_addrs)
    covered = idx_elmts
    for u, (ndblks, dblk_nelmts, start_idx, start_dblk) in enumerate(info):
        if covered >= n:
            break
        npages = (
            dblk_nelmts // page_nelmts if dblk_nelmts > page_nelmts else 0
        )
        daddrs = []
        for d in range(ndblks):
            goff = idx_elmts + start_idx + d * dblk_nelmts
            g = start_dblk + d
            if npages and any((g, pg) in dead_pages for pg in range(npages)):
                # block materialized but with dead pages: emit it even
                # if sparse, bitmap marks the dead pages
                a = emit_dblock(goff, dblk_nelmts)
                if a == UNDEF:  # nothing allocated at all — still dead
                    a = emit_dblock_forced(goff, dblk_nelmts)
            else:
                a = emit_dblock(goff, dblk_nelmts)
            daddrs.append(a)
        if u < first_real:
            if npages:
                raise ValueError(
                    "fixture geometry: direct data blocks must not page"
                )
            direct[start_dblk : start_dblk + ndblks] = daddrs
        elif any(a != UNDEF for a in daddrs):
            body = prefix(b"EASB")
            hdr_pos = len(body)
            body += b"\x00" * 8
            body += (idx_elmts + start_idx).to_bytes(off_size, "little")
            if npages:
                bitmap = bytearray((ndblks * npages + 7) // 8)
                for d in range(ndblks):
                    for pg in range(npages):
                        if (start_dblk + d, pg) not in dead_pages:
                            bit = d * npages + pg
                            bitmap[bit // 8] |= 1 << (bit % 8)
                body += bytes(bitmap)
            body += b"".join(struct.pack("<Q", a) for a in daddrs)
            body += struct.pack("<I", 0)
            sa = w.emit(body)
            hdr_patches.append(sa + hdr_pos)
            sblks[u - first_real] = sa
        covered = idx_elmts + start_idx + ndblks * dblk_nelmts

    # index block
    ib = prefix(b"EAIB")
    ib_hdr_pos = len(ib)
    ib += b"\x00" * 8
    for i in range(idx_elmts):
        ib += elt(i)
    ib += b"".join(struct.pack("<Q", a) for a in direct)
    ib += b"".join(struct.pack("<Q", a) for a in sblks)
    ib += struct.pack("<I", 0)
    iblk = w.emit(ib)
    hdr_patches.append(iblk + ib_hdr_pos)

    # header: cparams (elt size, max bits, idx elmts, MIN ELMTS,
    # MIN PTRS, page bits — note the order differs from the layout
    # message's), six length stats, index block address, checksum
    hdr = b"EAHD" + struct.pack(
        "<BBBBBBBB", 0, client, entry_size, max_bits, idx_elmts,
        min_elmts, min_ptrs, page_bits,
    )
    hdr += struct.pack("<6Q", 0, 0, 0, 0, max(0, n - 1), n)
    hdr += struct.pack("<QI", iblk, 0)
    hdr_addr = w.emit(hdr)
    for pos in hdr_patches:
        w.patch_u64(pos, hdr_addr)
    return hdr_addr


# ---- chunk B-tree v1 ---------------------------------------------------

def _chunk_btree(w: _W, chunks, ndims: int) -> int:
    """One leaf node holding every chunk (fixture scale)."""
    body = b"TREE" + struct.pack("<BBHQQ", 1, 0, len(chunks), UNDEF, UNDEF)
    for coords, addr, size in chunks:
        body += struct.pack("<II", size, 0)
        body += b"".join(struct.pack("<Q", c) for c in (*coords, 0))
        body += struct.pack("<Q", addr)
    body += struct.pack("<II", 0, 0) + b"\x00" * 8 * (ndims + 1)  # hi key
    return w.emit(body)


# ---- global heap -------------------------------------------------------

def _gcol(w: _W, objects: list[bytes]) -> tuple[int, list[int]]:
    total = 16 + sum(16 + len(_pad8(o)) for o in objects) + 16
    body = b"GCOL" + struct.pack("<B3xQ", 1, total)
    idxs = []
    for i, o in enumerate(objects, start=1):
        body += struct.pack("<HH4xQ", i, 1, len(o)) + _pad8(o)
        idxs.append(i)
    body += struct.pack("<HH4xQ", 0, 0, 16)
    addr = w.emit(body)
    return addr, idxs


# ---- fractal heap + v2 B-tree (dense storage) --------------------------

def _fractal_heap(
    w: _W,
    objects: list[bytes],
    id_len_extra: int = 0,
    huge_threshold: int | None = None,
    tiny: bool = False,
):
    """Single root direct block. Returns (header_addr, heap_ids,
    abs_positions) — abs_positions[i] is the file offset of object i's
    first byte (callers patch placeholder references in place).

    ``huge_threshold``: objects longer than this become HUGE (stored
    standalone; heap id = address+length inline when the id is wide
    enough for 16 payload bytes, else an 8-byte huge id resolved
    through a v2 B-tree of record-type-1 entries — both real HDF5
    shapes). ``tiny``: objects short enough to fit the id itself
    become TINY (data inside the id)."""
    max_managed = 4096
    off_size, len_size = 4, 2  # max_heap_bits=32, max_managed<65536
    id_len = 1 + off_size + len_size + id_len_extra
    blk_hdr = 4 + 1 + 8 + off_size  # sig, ver, heap addr, block offset
    huge_direct = id_len - 1 >= 16
    data = bytearray()
    ids: list[bytes | None] = []
    obj_offs: list[int | None] = []
    huge_slots: list[tuple[int, bytes]] = []  # (ids index, payload)
    n_tiny = n_managed = 0
    pos = blk_hdr
    tiny_pfx = 1 if id_len <= 18 else 2  # extended tiny past 18
    for o in objects:
        if tiny and len(o) <= id_len - tiny_pfx:
            enc = len(o) - 1
            if tiny_pfx == 1:
                head = bytes([0x20 | enc])
            else:
                head = bytes([0x20 | ((enc >> 8) & 0x0F), enc & 0xFF])
            ids.append(
                head + o + b"\x00" * (id_len - tiny_pfx - len(o))
            )
            obj_offs.append(None)  # data lives in the id, not the file
            n_tiny += 1
            continue
        if huge_threshold is not None and len(o) > huge_threshold:
            ids.append(None)  # filled after the payload is emitted
            huge_slots.append((len(ids) - 1, o))
            obj_offs.append(None)
            continue
        ids.append(
            b"\x00" + pos.to_bytes(off_size, "little")
            + len(o).to_bytes(len_size, "little")
            + b"\x00" * id_len_extra
        )
        obj_offs.append(pos)
        data += o
        pos += len(o)
        n_managed += 1
    blk_size = 512
    while blk_size < pos:
        blk_size *= 2
    if blk_size > 65536:
        raise ValueError("fixture fractal heap overflow")

    # huge payloads first: standalone objects, ids or B-tree records
    huge_btree = UNDEF
    huge_addrs: dict[int, int] = {}
    if huge_slots:
        recs = []
        for hid0, (idx, o) in enumerate(huge_slots):
            addr = w.emit(o)
            huge_addrs[idx] = addr
            if huge_direct:
                ids[idx] = (
                    bytes([0x10]) + struct.pack("<QQ", addr, len(o))
                    + b"\x00" * (id_len - 17)
                )
            else:
                hid = hid0 + 1
                recs.append(struct.pack("<QQQ", addr, len(o), hid))
                ids[idx] = (
                    bytes([0x10])
                    + hid.to_bytes(min(8, id_len - 1), "little")
                    + b"\x00" * max(0, id_len - 1 - min(8, id_len - 1))
                )
        if not huge_direct:
            huge_btree = _btree_v2(w, recs, 1)

    # header (block needs its address)
    hdr_addr = w.tell()
    blk_addr = hdr_addr + 4 + 1 + 2 + 2 + 1 + 4 + 8 * 12 + 2 + 8 + 8 + 2 + 2 + 8 + 2 + 4
    hdr = b"FRHP" + struct.pack(
        "<BHHBI", 0, id_len, 0, 0, max_managed
    )
    hdr += struct.pack("<QQ", len(huge_slots) + 1, huge_btree)
    hdr += struct.pack("<QQ", blk_size - pos, UNDEF)  # free space, fs mgr
    hdr += struct.pack("<QQ", blk_size, blk_size)  # managed, allocated
    hdr += struct.pack("<Q", pos)  # iterator offset
    hdr += struct.pack("<Q", n_managed)
    hdr += struct.pack(
        "<QQQQ",
        sum(len(o) for _, o in huge_slots), len(huge_slots),
        sum(len(i) for i in ids if i and i[0] & 0x20), n_tiny,
    )
    hdr += struct.pack("<HQQH", 4, blk_size, 65536, 32)  # width,start,maxd,bits
    hdr += struct.pack("<HQH", 0, blk_addr, 0)  # start rows, root, cur rows
    hdr += struct.pack("<I", 0)  # checksum
    w.emit(hdr)
    assert w.tell() == blk_addr, (w.tell(), blk_addr)
    blk = b"FHDB" + struct.pack("<BQ", 0, hdr_addr) + (0).to_bytes(
        off_size, "little"
    )
    assert len(blk) == blk_hdr
    blk += bytes(data)
    blk += b"\x00" * (blk_size - len(blk))
    w.emit(blk)
    abs_pos = [
        (blk_addr + o) if o is not None else huge_addrs.get(i)
        for i, o in enumerate(obj_offs)
    ]
    return hdr_addr, ids, abs_pos


def _fractal_heap_tree(
    w: _W,
    objects: list[bytes],
    width: int = 4,
    start_size: int = 512,
    max_direct: int = 1024,
):
    """Multi-level managed fractal heap: a root INDIRECT block whose
    rows past the direct-row span hold CHILD indirect blocks (the
    shape a big dense-attribute/link heap grows into). Objects are
    placed sequentially into the doubling-table direct blocks (rows
    r0/r1 = start_size, r_k = start_size·2^(k-1); rows with block
    size > max_direct recurse, each child covering its row size with
    rows sized from r0 again). Returns (header_addr, heap_ids)."""
    max_managed = 4096
    off_size, len_size = 4, 2
    id_len = 1 + off_size + len_size
    blk_hdr = 4 + 1 + 8 + off_size

    def row_size(r: int) -> int:
        return start_size if r < 2 else start_size << (r - 1)

    # enumerate DIRECT blocks in heap order, tagging each with the
    # root row it belongs to and (for indirect rows) its child index
    direct: list[dict] = []
    heap_off = 0
    root_rows = 0
    need = sum(len(o) for o in objects) * 2 + blk_hdr * 64
    while heap_off < need:
        size = row_size(root_rows)
        for e in range(width):
            if size <= max_direct:
                direct.append(dict(off=heap_off, size=size,
                                   row=root_rows, child=None, data=b""))
            else:
                span = size // (width * start_size)
                child_rows = span.bit_length()
                co = heap_off
                for cr in range(child_rows):
                    csz = row_size(cr)
                    assert csz <= max_direct, "fixture heap: need depth 3"
                    for _ in range(width):
                        direct.append(dict(off=co, size=csz,
                                           row=root_rows,
                                           child=(e, cr), data=b""))
                        co += csz
            heap_off += size
        root_rows += 1

    ids: list[bytes] = []
    bi = 0
    for o in objects:
        while len(direct[bi]["data"]) + len(o) > direct[bi]["size"] - blk_hdr:
            bi += 1
        pos = direct[bi]["off"] + blk_hdr + len(direct[bi]["data"])
        direct[bi]["data"] += o
        ids.append(
            b"\x00" + pos.to_bytes(off_size, "little")
            + len(o).to_bytes(len_size, "little")
        )
    used = [d for d in direct if d["data"]]
    last_used_row = max(d["row"] for d in used)
    cur_rows = last_used_row + 1

    # emit direct blocks (heap-header address patched afterwards)
    patches: list[int] = []

    def emit_block(body_after_ver: bytes, sig: bytes) -> int:
        a = w.tell()
        w.emit(sig + b"\x00")  # signature + version
        patches.append(w.tell())
        w.emit(b"\x00" * 8)  # heap header addr placeholder
        w.emit(body_after_ver)
        return a

    addr_of: dict[int, int] = {}
    for d in direct:
        if not d["data"]:
            continue
        body = d["off"].to_bytes(off_size, "little") + bytes(d["data"])
        body += b"\x00" * (d["size"] - blk_hdr - len(d["data"]))
        addr_of[d["off"]] = emit_block(body, b"FHDB")

    # child indirect blocks for rows past the direct span
    child_addr: dict[tuple[int, int], int] = {}
    for key in sorted({(d["row"], d["child"][0]) for d in direct
                       if d["child"] is not None and d["data"]}):
        row, e = key
        ents = b""
        for d in direct:
            if d["row"] == row and d["child"] and d["child"][0] == e:
                ents += (addr_of.get(d["off"], UNDEF)).to_bytes(8, "little")
        boff = min(d["off"] for d in direct
                   if d["row"] == row and d["child"]
                   and d["child"][0] == e)
        body = boff.to_bytes(off_size, "little") + ents
        body += struct.pack("<I", 0)
        child_addr[key] = emit_block(body, b"FHIB")

    # root indirect block
    ents = b""
    heap_off = 0
    for r in range(cur_rows):
        size = row_size(r)
        for e in range(width):
            if size <= max_direct:
                ents += addr_of.get(heap_off, UNDEF).to_bytes(8, "little")
            else:
                ents += child_addr.get((r, e), UNDEF).to_bytes(8, "little")
            heap_off += size
    root = emit_block(
        (0).to_bytes(off_size, "little") + ents + struct.pack("<I", 0),
        b"FHIB",
    )

    total_data = sum(len(o) for o in objects)
    hdr_addr = w.tell()
    hdr = b"FRHP" + struct.pack("<BHHBI", 0, id_len, 0, 0, max_managed)
    hdr += struct.pack("<QQ", 1, UNDEF)  # next huge id, huge btree
    hdr += struct.pack("<QQ", 0, UNDEF)  # free space, fs mgr
    hdr += struct.pack("<QQ", heap_off, heap_off)  # managed, allocated
    hdr += struct.pack("<Q", 0)  # iterator offset
    hdr += struct.pack("<Q", len(objects))
    hdr += struct.pack("<QQQQ", 0, 0, 0, 0)
    hdr += struct.pack(
        "<HQQH", width, start_size, max_direct, 32
    )
    hdr += struct.pack("<HQH", 0, root, cur_rows)
    hdr += struct.pack("<I", 0)
    w.emit(hdr)
    assert total_data <= max_managed * 16
    for p in patches:
        w.patch_u64(p, hdr_addr)
    return hdr_addr, ids


def _btree_v2(w: _W, records: list[bytes], rec_type: int) -> int:
    rec_size = len(records[0])
    node_size = 2048
    assert len(records) <= (node_size - 10) // rec_size, "fixture btree v2"
    leaf = b"BTLF" + struct.pack("<BB", 0, rec_type) + b"".join(records)
    leaf += struct.pack("<I", 0)
    leaf_addr = w.emit(leaf)
    hdr = b"BTHD" + struct.pack(
        "<BBIHHBBQHQI",
        0, rec_type, node_size, rec_size, 0, 100, 40,
        leaf_addr, len(records), len(records), 0,
    )
    return w.emit(hdr)


def _btree_v2_chunkidx(
    w: _W, records: list[bytes], rec_type: int, node_size: int = 2048
) -> int:
    """v2 B-tree chunk index (BTHD + BTLF leaves + BTIN internal
    nodes, ANY depth — r11 generalizes the r10 depth-0/1 emitter).
    Same node-capacity formula as the reader (spec III.A.2): leaf
    capacity = (node-10)/rec; internal child pointers = address +
    subtree-record-count of enc_size(cap[d-1]) bytes + (for d >= 2) a
    cumulative-total field of enc_size(cum[d-1]) bytes."""
    rec_size = len(records[0])
    n = len(records)

    def enc_size(v: int) -> int:
        return max(1, (v.bit_length() + 7) // 8)

    caps = [(node_size - 10) // rec_size]
    cum = [caps[0]]
    while cum[-1] < n:
        d = len(caps)
        ptr = 8 + enc_size(caps[d - 1])
        if d > 1:
            ptr += enc_size(cum[d - 1])
        caps.append((node_size - 10 - ptr) // (rec_size + ptr))
        cum.append(caps[d] + (caps[d] + 1) * cum[d - 1])
    depth = len(caps) - 1

    def emit_leaf(rs: list[bytes]) -> int:
        return w.emit(
            b"BTLF" + struct.pack("<BB", 0, rec_type)
            + b"".join(rs) + struct.pack("<I", 0)
        )

    def build(rs: list[bytes], d: int) -> tuple[int, int, int]:
        """→ (node addr, node record count, subtree total records)."""
        if d == 0:
            assert len(rs) <= caps[0]
            return emit_leaf(rs), len(rs), len(rs)
        k = -(-(len(rs) + 1) // (cum[d - 1] + 1))  # children needed
        k = max(2, k)
        assert k - 1 <= caps[d], "fixture btree2: root overflow"
        per = len(rs) - (k - 1)
        base, extra = divmod(per, k)
        sizes = [base + (1 if i < extra else 0) for i in range(k)]
        children, seps = [], []
        i = 0
        for ci, sz in enumerate(sizes):
            children.append(build(rs[i : i + sz], d - 1))
            i += sz
            if ci < k - 1:
                seps.append(rs[i])
                i += 1
        body = b"BTIN" + struct.pack("<BB", 0, rec_type) + b"".join(seps)
        nsz = enc_size(caps[d - 1])
        for ca, cn, ct in children:
            body += struct.pack("<Q", ca) + cn.to_bytes(nsz, "little")
            if d - 1 > 0:
                body += ct.to_bytes(enc_size(cum[d - 1]), "little")
        body += struct.pack("<I", 0)
        return w.emit(body), len(seps), len(rs)

    root, root_nrec, _tot = build(records, depth)
    return w.emit(
        b"BTHD" + struct.pack(
            "<BBIHHBBQHQI",
            0, rec_type, node_size, rec_size, depth, 100, 40,
            root, root_nrec, n, 0,
        )
    )


# ---- link messages -----------------------------------------------------

def _m_link(name: str, addr: int, order: int) -> bytes:
    nm = name.encode()
    return (
        struct.pack("<BBQB", 1, 0x04, order, len(nm)) + nm
        + struct.pack("<Q", addr)
    )


# ---- top-level writer --------------------------------------------------

def write_hdf5(
    path: str,
    datasets: dict,
    gatts: dict | None = None,
    style: str = "v0",
    dense_links: bool = False,
    dense_attrs: bool = False,
    heap_opts: dict | None = None,
) -> str:
    """``datasets``: ordered ``{name: spec}`` where spec keys are
    ``data`` (np.ndarray), optional ``attrs`` ({name: value}),
    ``chunks`` (tuple → chunked layout + B-tree v1; None → contiguous),
    ``filters`` ([("shuffle",), ("deflate", lvl), ("fletcher32",)]),
    ``fill`` (raw-space scalar), ``skip_chunks`` (set of chunk coords
    simulating never-written chunks), ``dimension_list`` (list of
    dataset names — becomes a VLEN-reference DIMENSION_LIST through a
    global heap), ``compact`` (True → compact layout)."""
    v3 = style == "latest"
    w = _W()
    sb_size = 48 if v3 else 96
    w.emit(b"\x00" * sb_size)

    header_addrs: dict[str, int] = {}
    # REFERENCE_LIST attributes on dimension scales point FORWARD to
    # data-variable headers not yet written (the same circularity the
    # HDF5 library resolves by updating attributes in place): emit a
    # unique placeholder u64 and patch it once the target's header
    # address is known.
    ph_counter = [0]
    pending_refs: list[tuple[int, str]] = []  # (file offset, target name)

    def _ref_list_attr(pairs, v3):
        """REFERENCE_LIST: array of compound {dataset: objref,
        dimension: int} — what H5DSattach_scale puts on every scale.
        Returns (attr body, [(placeholder bytes, target name)])."""
        vals = b""
        phs = []
        for tname, dim_idx in pairs:
            if tname in header_addrs:
                vals += struct.pack("<Qi4x", header_addrs[tname], dim_idx)
            else:
                ph = struct.pack("<Q", 0xF1D0F1D000000000 + ph_counter[0])
                ph_counter[0] += 1
                phs.append((ph, tname))
                vals += ph + struct.pack("<i4x", dim_idx)
        dtm = _dt_compound(
            [("dataset", 0, _dt_ref()), ("dimension", 8, _dt_int(4))],
            16, v3,
        )
        body = _attr_body(
            "REFERENCE_LIST", dtm,
            _m_dataspace([len(pairs)], 2 if v3 else 1), vals, v3,
        )
        return body, phs

    # two passes: datasets without dimension_list first (their header
    # addresses feed the global-heap references of the second pass)
    order1 = [n for n, s in datasets.items() if not s.get("dimension_list")]
    order2 = [n for n in datasets if n not in order1]

    def _group_header(links: list[tuple[str, int]],
                      attrs: dict | None = None) -> bytes:
        """Group object header: compact link messages ('latest') or an
        old-style symbol table (local heap + SNOD + B-tree v1)."""
        msgs: list[tuple[int, bytes]] = []
        if v3:
            msgs.extend(
                (0x06, _m_link(n, a, i)) for i, (n, a) in enumerate(links)
            )
        else:
            heap_data = bytearray(b"\x00")
            offs = {}
            for n, _a in sorted(links):
                offs[n] = len(heap_data)
                heap_data += n.encode() + b"\x00"
            heap_data = bytearray(_pad8(bytes(heap_data)))
            heap_hdr_addr = w.tell()
            data_addr = heap_hdr_addr + 32
            w.emit(b"HEAP" + struct.pack(
                "<B3xQQQ", 0, len(heap_data), 0, data_addr))
            w.emit(bytes(heap_data))
            snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(links))
            for n, a in sorted(links):
                snod += struct.pack("<QQII16x", offs[n], a, 0, 0)
            snod_addr = w.emit(snod)
            bt = b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
            bt += struct.pack(
                "<QQQ", 0, snod_addr, offs[sorted(links)[-1][0]]
            )
            bt_addr = w.emit(bt)
            msgs.append((0x11, struct.pack("<QQ", bt_addr, heap_hdr_addr)))
        for k, v in (attrs or {}).items():
            msgs.append((0x0C, _attr_spec(k, v, v3)))
        return _header_v2(msgs) if v3 else _header_v1(msgs)

    for name in order1 + order2:
        spec = datasets[name]
        data = np.ascontiguousarray(spec["data"])
        dt = data.dtype
        msgs: list[tuple[int, bytes]] = []
        msgs.append((0x01, _m_dataspace(
            data.shape, 2 if v3 else 1, maxdims=spec.get("maxdims")
        )))
        msgs.append((0x03, _np_dt_msg(dt)))
        fill = spec.get("fill")
        fill_raw = dt.type(fill).tobytes() if fill is not None else None
        msgs.append((0x05, _m_fill(fill_raw)))

        if spec.get("compact"):
            raw = data.tobytes()
            msgs.append((0x08, struct.pack("<BBH", 3, 0, len(raw)) + raw))
        elif spec.get("chunks"):
            cd = tuple(spec["chunks"])
            filters = spec.get("filters", ())
            v4 = spec.get("v4_index")  # None | single | implicit |
            #                            fixed_array | fixed_array_paged
            chunks = []
            entries: list[tuple | None] = []  # linear order incl. holes
            pipeline = None
            grid = [range(0, s, c) for s, c in zip(data.shape, cd)]
            import itertools

            for coords in itertools.product(*grid):
                ci = tuple(c // s for c, s in zip(coords, cd))
                if ci in spec.get("skip_chunks", ()) and v4 != "implicit":
                    entries.append(None)
                    continue
                block = np.full(cd, dt.type(fill if fill is not None else 0))
                sel = tuple(
                    slice(c, min(c + s, full))
                    for c, s, full in zip(coords, cd, data.shape)
                )
                block[
                    tuple(slice(0, s.stop - s.start) for s in sel)
                ] = data[sel]
                raw, pipeline = _apply_filters(
                    block.tobytes(), filters, dt.itemsize
                )
                addr = w.emit(raw)
                chunks.append((coords, addr, len(raw)))
                entries.append((addr, len(raw)))
            if v4 is None:
                bt = _chunk_btree(w, chunks, data.ndim)
                lay = struct.pack("<BBBQ", 3, 2, data.ndim + 1, bt)
                lay += b"".join(struct.pack("<I", c) for c in cd)
                lay += struct.pack("<I", dt.itemsize)
            elif v4 == "single":
                assert len(entries) == 1 and entries[0] is not None
                addr, size = entries[0]
                extra = (
                    struct.pack("<QI", size, 0) if pipeline else b""
                )
                lay = _m_layout_v4(cd, dt.itemsize, 1, addr, extra)
            elif v4 == "implicit":
                assert not pipeline, "implicit index forbids filters"
                lay = _m_layout_v4(cd, dt.itemsize, 2, chunks[0][1])
            elif v4 in ("fixed_array", "fixed_array_paged",
                        "extensible", "extensible_paged"):
                if pipeline:
                    ebytes = [
                        None if e is None
                        else struct.pack("<QII", e[0], e[1], 0)
                        for e in entries
                    ]
                    esize = 16
                else:
                    ebytes = [
                        None if e is None else struct.pack("<Q", e[0])
                        for e in entries
                    ]
                    esize = 8
                if v4.startswith("fixed_array"):
                    pb = 2 if v4 == "fixed_array_paged" else max(
                        2, (len(entries) - 1).bit_length()
                    )
                    fa = _fixed_array(
                        w, ebytes, esize, pb,
                        dead_pages=spec.get("dead_pages", ()),
                    )
                    lay = _m_layout_v4(
                        cd, dt.itemsize, 3, fa, extra=bytes([pb])
                    )
                else:
                    # EA element order is row-major over the SWIZZLED
                    # chunk grid when the unlimited dim is not slot 0
                    # (H5VM_swizzle_coords): permute the linear entries
                    md = spec.get("maxdims")
                    if md is not None and -1 in md and md.index(-1) != 0:
                        u = md.index(-1)
                        counts = [
                            max(1, (s + c - 1) // c)
                            for s, c in zip(data.shape, cd)
                        ]
                        strides = [1] * len(counts)
                        for i in range(len(counts) - 2, -1, -1):
                            strides[i] = strides[i + 1] * counts[i + 1]
                        sw_counts = (
                            [counts[u]] + counts[:u] + counts[u + 1:]
                        )
                        perm = []
                        for sw in itertools.product(
                            *[range(n) for n in sw_counts]
                        ):
                            orig = (
                                sw[1 : u + 1] + (sw[0],) + sw[u + 1 :]
                            )
                            perm.append(
                                sum(o * st for o, st in zip(orig, strides))
                            )
                        ebytes = [ebytes[i] for i in perm]
                    # tiny geometry so a handful of chunks exercises
                    # inline elements, direct blocks, real super
                    # blocks, and (paged variant) data-block pages
                    params = dict(
                        max_bits=16, idx_elmts=1, min_elmts=2,
                        min_ptrs=2,
                        page_bits=2 if v4 == "extensible_paged" else 10,
                    )
                    params.update(spec.get("ea_params", {}))
                    ea = _extensible_array(
                        w, ebytes, esize,
                        dead_pages=spec.get("dead_pages", ()),
                        **params,
                    )
                    # layout-message cparam order per spec: max bits,
                    # index elements, MIN POINTERS, MIN ELEMENTS,
                    # page bits (differs from the EAHD order)
                    extra = bytes([
                        params["max_bits"], params["idx_elmts"],
                        params["min_ptrs"], params["min_elmts"],
                        params["page_bits"],
                    ])
                    lay = _m_layout_v4(cd, dt.itemsize, 4, ea, extra=extra)
            elif v4 in ("btree2", "btree2_deep"):
                recs = []
                for coords, addr, size in chunks:
                    scaled = tuple(c // s for c, s in zip(coords, cd))
                    rec = struct.pack("<Q", addr)
                    if pipeline:  # type 11: + nbytes(4) + mask(4)
                        rec += struct.pack("<II", size, 0)
                    rec += b"".join(struct.pack("<Q", s) for s in scaled)
                    recs.append(rec)
                node_size = int(spec.get(
                    "btree2_node_size",
                    256 if v4 == "btree2_deep" else 2048,
                ))
                bt = _btree_v2_chunkidx(
                    w, recs, 11 if pipeline else 10, node_size
                )
                lay = _m_layout_v4(
                    cd, dt.itemsize, 5, bt,
                    extra=struct.pack("<IBB", node_size, 100, 40),
                )
            else:
                raise ValueError(f"unknown v4 index {v4!r}")
            msgs.append((0x08, lay))
            if pipeline:
                msgs.append((0x0B, _m_filters(pipeline)))
        else:
            raw = data.tobytes()
            addr = w.emit(raw)
            msgs.append((0x08, struct.pack("<BBQQ", 3, 1, addr, len(raw))))

        attr_bodies = [
            _attr_spec(k, v, v3) for k, v in spec.get("attrs", {}).items()
        ]
        local_phs: list[tuple[bytes, str]] = []
        if spec.get("reference_list"):
            body, phs = _ref_list_attr(spec["reference_list"], v3)
            attr_bodies.append(body)
            local_phs.extend(phs)
        if spec.get("dimension_list"):
            targets = [header_addrs[d] for d in spec["dimension_list"]]
            ga, idxs = _gcol(
                w, [struct.pack("<Q", t) for t in targets]
            )
            val = b"".join(
                struct.pack("<IQI", 1, ga, i) for i in idxs
            )
            attr_bodies.append(
                _attr_body(
                    "DIMENSION_LIST", _dt_vlen_ref(),
                    _m_dataspace([len(targets)], 2 if v3 else 1), val, v3,
                )
            )
        if dense_attrs and attr_bodies:
            _ho = dict(id_len_extra=1)
            _ho.update(heap_opts or {})
            fh, ids, obj_pos = _fractal_heap(w, attr_bodies, **_ho)
            # record type 8: heap id (8) + flags(1) + corder(4) + hash(4)
            recs = [
                hid + struct.pack("<BII", 0, i, 0)
                for i, hid in enumerate(ids)
            ]
            bt = _btree_v2(w, recs, 8)
            msgs.append(
                (0x15, struct.pack("<BBQQ", 0, 0, fh, bt))
            )
            for ph, tname in local_phs:  # placeholder lives in the heap
                for body, pos in zip(attr_bodies, obj_pos):
                    j = body.find(ph)
                    if j >= 0:
                        pending_refs.append((pos + j, tname))
                        break
                else:
                    raise AssertionError("placeholder not in heap bodies")
            local_phs = []
        else:
            msgs.extend((0x0C, b) for b in attr_bodies)

        hdr = _header_v2(msgs) if v3 else _header_v1(msgs)
        header_addrs[name] = w.emit(hdr)
        for ph, tname in local_phs:  # placeholder lives in this header
            j = bytes(w.b[header_addrs[name]:]).find(ph)
            assert j >= 0, "placeholder not found in emitted header"
            pending_refs.append((header_addrs[name] + j, tname))

    # subgroups: dataset names with one "/" segment land in a child
    # group (the NetCDF-4 hierarchical-group layout, e.g. PRODUCT/var)
    names = [n for n in datasets if "/" not in n]
    by_group: dict[str, list[str]] = {}
    for n in datasets:
        if "/" in n:
            grp, leaf = n.split("/", 1)
            assert "/" not in leaf, "fixture supports one group level"
            by_group.setdefault(grp, []).append(n)
    for grp, members in by_group.items():
        assert not dense_links, "fixture: groups + dense root unsupported"
        links = [(m.split("/", 1)[1], header_addrs[m]) for m in members]
        header_addrs[grp] = w.emit(_group_header(links))
        names.append(grp)

    # root group
    root_msgs: list[tuple[int, bytes]] = []
    if dense_links:
        link_bodies = [
            _m_link(n, header_addrs[n], i) for i, n in enumerate(names)
        ]
        fh, ids, _ = _fractal_heap(w, link_bodies)
        recs = [struct.pack("<I", 0) + hid for hid in ids]  # hash unverified
        bt = _btree_v2(w, recs, 5)
        root_msgs.append((0x02, struct.pack("<BBQQ", 0, 0, fh, bt)))
    elif v3:
        root_msgs.extend(
            (0x06, _m_link(n, header_addrs[n], i))
            for i, n in enumerate(names)
        )
    else:
        # old-style group: local heap + SNOD + B-tree v1
        heap_data = bytearray(b"\x00")  # offset 0 = empty string
        offs = {}
        for n in sorted(names):
            offs[n] = len(heap_data)
            heap_data += n.encode() + b"\x00"
        heap_data = bytearray(_pad8(bytes(heap_data)))
        heap_hdr_addr = w.tell()
        data_addr = heap_hdr_addr + 32
        w.emit(
            b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), 0, data_addr)
        )
        w.emit(bytes(heap_data))
        snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
        for n in sorted(names):
            snod += struct.pack("<QQII16x", offs[n], header_addrs[n], 0, 0)
        snod_addr = w.emit(snod)
        bt = b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
        bt += struct.pack("<QQQ", 0, snod_addr, offs[sorted(names)[-1]])
        bt_addr = w.emit(bt)
        root_msgs.append((0x11, struct.pack("<QQ", bt_addr, heap_hdr_addr)))

    for k, v in (gatts or {}).items():
        root_msgs.append((0x0C, _attr_spec(k, v, v3)))
    root_hdr = _header_v2(root_msgs) if v3 else _header_v1(root_msgs)
    root_addr = w.emit(root_hdr)
    for pos, tname in pending_refs:  # resolve forward references
        w.patch_u64(pos, header_addrs[tname])
    eof = w.tell()

    # superblock
    if v3:
        sb = b"\x89HDF\r\n\x1a\n" + struct.pack(
            "<BBBBQQQQI", 2, 8, 8, 0, 0, UNDEF, eof, root_addr, 0
        )
    else:
        sb = b"\x89HDF\r\n\x1a\n"
        sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
        sb += struct.pack("<HHI", 4, 16, 0)  # leaf k, internal k, flags
        sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        sb += struct.pack("<QQII16x", 0, root_addr, 1, 0)  # root entry
    assert len(sb) == sb_size, (len(sb), sb_size)
    w.b[:sb_size] = sb
    with open(path, "wb") as f:
        f.write(w.b)
    return path


def write_netcdf4(
    path: str,
    lats: np.ndarray,
    lons: np.ndarray,
    data: np.ndarray,
    *,
    times: np.ndarray | None = None,
    time_units: str = "days since 2020-01-01 00:00:00",
    calendar: str = "standard",
    var_name: str = "value",
    nc_type: int = 3,
    scale_factor: float | None = None,
    add_offset: float | None = None,
    fill_value=None,
    chunks: tuple | None = None,
    filters=(("shuffle",), ("deflate", 4)),
    style: str = "v0",
    dense_links: bool = False,
    dense_attrs: bool = False,
    dimension_list: bool = True,
    reference_list: bool = True,
    skip_chunks=(),
    v4_index: str | None = None,
    dead_pages=(),
) -> str:
    """NetCDF-4 fixture mirroring ``write_netcdf_classic``'s contract:
    ``data`` is (time, lat, lon) or (lat, lon) RAW values of ``nc_type``
    (3=short, 4=int, 5=float, 6=double); coordinates are contiguous
    dimension-scale datasets with CF units; the data variable is
    chunked with shuffle+deflate and carries scale/offset/_FillValue
    like netcdf-c writes them."""
    dt_map = {1: "i1", 3: "<i2", 4: "<i4", 5: "<f4", 6: "<f8"}
    dt = np.dtype(dt_map[nc_type])
    has_time = times is not None
    if has_time:
        assert data.ndim == 3 and data.shape[0] == len(times)
    else:
        assert data.ndim == 2
    data = np.asarray(data, dtype=dt)

    def scale_attrs():
        out = {}
        if scale_factor is not None:
            out["scale_factor"] = float(scale_factor)
        if add_offset is not None:
            out["add_offset"] = float(add_offset)
        if fill_value is not None:
            out["_FillValue"] = dt.type(fill_value)
        return out

    dsets: dict = {}
    dim_names = []
    if has_time:
        dsets["time"] = {
            "data": np.asarray(times, dtype="<f8"),
            "attrs": {
                "CLASS": "DIMENSION_SCALE", "NAME": "time",
                "units": time_units, "calendar": calendar,
            },
        }
        dim_names.append("time")
    dsets["lat"] = {
        "data": np.asarray(lats, dtype="<f8"),
        "attrs": {
            "CLASS": "DIMENSION_SCALE", "NAME": "lat",
            "units": "degrees_north",
        },
    }
    dsets["lon"] = {
        "data": np.asarray(lons, dtype="<f8"),
        "attrs": {
            "CLASS": "DIMENSION_SCALE", "NAME": "lon",
            "units": "degrees_east",
        },
    }
    dim_names += ["lat", "lon"]
    if reference_list:
        # what H5DSattach_scale / netcdf-c put on every dimension
        # scale: a compound REFERENCE_LIST back-reference to each
        # attached variable, plus the _Netcdf4Dimid ordinal
        for i, dn in enumerate(dim_names):
            dsets[dn]["attrs"]["_Netcdf4Dimid"] = np.int32(i)
            dsets[dn]["reference_list"] = [(var_name, i)]
    if chunks is None:
        if has_time:
            chunks = (1, max(1, len(lats) // 2), len(lons))
        else:
            chunks = (max(1, len(lats) // 2), len(lons))
    dsets[var_name] = {
        "data": data,
        "chunks": chunks,
        "filters": filters,
        "fill": fill_value,
        "skip_chunks": set(skip_chunks),
        "v4_index": v4_index,
        "dead_pages": dead_pages,
        "attrs": {"units": "K", **scale_attrs()},
        "dimension_list": dim_names if dimension_list else None,
    }
    if v4_index in ("extensible", "extensible_paged") and has_time:
        # an EA index exists BECAUSE a dim is unlimited: record it
        dsets[var_name]["maxdims"] = [-1, *data.shape[1:]]
        dsets["time"]["maxdims"] = [-1]
    return write_hdf5(
        path, dsets,
        gatts={
            "Conventions": "CF-1.6",
            "_NCProperties": "version=2,netcdf=4.9.2,hdf5=1.12.2",
        },
        style=style, dense_links=dense_links, dense_attrs=dense_attrs,
    )
