"""NetCDF-4 (HDF5 container) ingestion — no h5py/netCDF4/GDAL.

Reference parity: the reference converts any GDAL-readable raster,
including NetCDF-4 (/root/reference/raquet/cli.py:283 "GeoTIFF, COG,
NetCDF, and more"; cli.py:92 .nc convert path). This module parses the
HDF5 file format from the public specification (HDF5 File Format
Specification v3.0) for the subset the netcdf-c library actually
writes:

- superblock v0/v1 (old-style default) and v2/v3 (libver "latest")
- object headers v1 and v2 ("OHDR"), continuation blocks
- groups: old-style (symbol table + local heap + B-tree v1 "SNOD"
  walk), new-style compact (link messages in the header), and
  new-style DENSE (fractal heap "FRHP" + B-tree v2 "BTHD" name index
  — what netcdf-c produces past 8 links, since it tracks creation
  order)
- dense attribute storage (same fractal-heap machinery, record type 8)
- datatypes: fixed-point, IEEE float, fixed string, object reference,
  variable-length string/sequence (global heap "GCOL")
- data layout v3: compact, contiguous, chunked with the B-tree v1
  chunk index; filters: shuffle(2) + deflate(1) + fletcher32(3)
- data layout v4 (HDF5 1.10+ without 1.8 compatibility): compact,
  contiguous, and the fixed-shape chunk indexes — single chunk(1),
  implicit(2), fixed array(3, paged and unpaged, filtered and not)
- datatypes also cover compound (class 6, all three member layouts) —
  netcdf-c's REFERENCE_LIST attributes decode rather than fail, and
  any *other* undecodable attribute datatype degrades to name→None
- fill values for never-written chunks

All five data-layout-v4 chunk indexes decode (single/implicit/fixed-
array/extensible-array/v2-B-tree — r09/r10; EA SWIZZLED chunk order
and v2 B-trees of ANY depth since r11), as do fractal-heap HUGE
(direct + B-tree-indirect) and TINY (in-id, incl. extended) objects
and SUB-ROOT heap indirect blocks (r11). The remaining typed gates
(never silent wrong answers): szip filter — the DELIBERATE decision:
no szip/libaec/h5py anywhere in-sandbox to conformance-test a
from-scratch Rice coder against, and a self-consistent transcription
error would silently corrupt data — and offsets/lengths other than 8
bytes (no mainstream writer emits them).

Scale shape mirrors the classic-CDF path (netcdf.py) and the GeoTIFF
path (tiff_reader.py): the DRIVER parses structure only (mmap —
O(header + chunk index) bytes touched), small coordinate variables
are read driver-side, and the data variable decodes DISTRIBUTED: one
task per chunk (or row-range slab for contiguous layout), each task
seeking its byte range and running defilter + scale/offset + fill in
numpy. Checksums (Jenkins lookup3) are not verified — corrupted files
fail structurally, which matches the GDAL default.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF

# message type ids (spec IV.A.2)
_MSG_NIL = 0x00
_MSG_DATASPACE = 0x01
_MSG_LINK_INFO = 0x02
_MSG_DATATYPE = 0x03
_MSG_FILL_OLD = 0x04
_MSG_FILL = 0x05
_MSG_LINK = 0x06
_MSG_LAYOUT = 0x08
_MSG_GROUP_INFO = 0x0A
_MSG_FILTERS = 0x0B
_MSG_ATTRIBUTE = 0x0C
_MSG_CONTINUATION = 0x10
_MSG_SYMBOL_TABLE = 0x11
_MSG_ATTR_INFO = 0x15


class _R:
    """Little-endian cursor over the mmap'd file."""

    __slots__ = ("b", "p")

    def __init__(self, b, p=0):
        self.b = b
        self.p = p

    def u8(self):
        v = self.b[self.p]
        self.p += 1
        return v

    # slice-then-unpack (NOT unpack_from) so the buffer can be a
    # sources.io.RangeBuffer (lazy HTTP Range) as well as an mmap
    def u16(self):
        (v,) = struct.unpack("<H", bytes(self.b[self.p : self.p + 2]))
        self.p += 2
        return v

    def u32(self):
        (v,) = struct.unpack("<I", bytes(self.b[self.p : self.p + 4]))
        self.p += 4
        return v

    def u64(self):
        (v,) = struct.unpack("<Q", bytes(self.b[self.p : self.p + 8]))
        self.p += 8
        return v

    def take(self, n):
        v = bytes(self.b[self.p : self.p + n])
        self.p += n
        return v

    def uN(self, n):
        return int.from_bytes(self.take(n), "little")


def _superblock(b) -> dict:
    if bytes(b[:8]) != b"\x89HDF\r\n\x1a\n":
        raise ValueError("not an HDF5 file (bad superblock signature)")
    r = _R(b, 8)
    ver = r.u8()
    if ver in (0, 1):
        r.p += 4  # freespace/root-group/reserved/shared-header versions
        so, sl = r.u8(), r.u8()
        r.p += 1 + 2 + 2 + 4  # reserved, leaf k, internal k, flags
        if ver == 1:
            r.p += 4  # indexed-storage k + reserved
        if (so, sl) != (8, 8):
            raise NotImplementedError(
                f"HDF5 offset/length sizes {so}/{sl} (only 8/8 supported)"
            )
        r.p += 8 * 4  # base, free-space, EOF, driver-info
        r.p += 8  # root symbol entry: link name offset
        root = r.u64()
        return {"version": ver, "root": root}
    if ver in (2, 3):
        so, sl = r.u8(), r.u8()
        if (so, sl) != (8, 8):
            raise NotImplementedError(
                f"HDF5 offset/length sizes {so}/{sl} (only 8/8 supported)"
            )
        r.p += 1  # file consistency flags
        r.p += 8 * 3  # base, extension, EOF
        root = r.u64()
        return {"version": ver, "root": root}
    raise NotImplementedError(f"HDF5 superblock version {ver}")


def _object_header(b, addr) -> list[tuple[int, bytes]]:
    """Object header (v1 or v2) → [(msg_type, body_bytes)], following
    continuation blocks."""
    msgs: list[tuple[int, bytes]] = []
    if bytes(b[addr : addr + 4]) == b"OHDR":
        r = _R(b, addr + 4)
        if r.u8() != 2:
            raise NotImplementedError("OHDR version != 2")
        flags = r.u8()
        if flags & 0x20:
            r.p += 16  # access/mod/change/birth times
        if flags & 0x10:
            r.p += 4  # max compact / min dense attrs
        size0 = r.uN(1 << (flags & 0x3))
        tracked = bool(flags & 0x04)
        blocks = [(r.p, size0)]
        bi = 0
        while bi < len(blocks):
            start, size = blocks[bi]
            bi += 1
            r2 = _R(b, start)
            end = start + size
            # a block needs >= 4 (+2 corder) bytes for another header
            min_hdr = 4 + (2 if tracked else 0)
            while r2.p + min_hdr <= end:
                mt = r2.u8()
                ml = r2.u16()
                r2.u8()  # message flags
                if tracked:
                    r2.p += 2
                body = r2.take(ml)
                if mt == _MSG_CONTINUATION:
                    coff, clen = struct.unpack_from("<QQ", body, 0)
                    if bytes(b[coff : coff + 4]) != b"OCHK":
                        raise ValueError("bad OCHK continuation signature")
                    # OCHK: 4-byte sig + messages + 4-byte checksum
                    blocks.append((coff + 4, clen - 8))
                elif mt != _MSG_NIL:
                    msgs.append((mt, body))
        return msgs
    # version 1
    r = _R(b, addr)
    if r.u8() != 1:
        raise ValueError(f"unsupported object header version at {addr}")
    r.u8()
    nmsg = r.u16()
    r.u32()  # reference count
    hsize = r.u32()
    blocks = [(addr + 16, hsize)]
    bi = 0
    while bi < len(blocks) and len(msgs) < nmsg + 64:
        start, size = blocks[bi]
        bi += 1
        r2 = _R(b, start)
        end = start + size
        while r2.p + 8 <= end:
            mt = r2.u16()
            ml = r2.u16()
            r2.u8()
            r2.p += 3
            body = r2.take(ml)
            if mt == _MSG_CONTINUATION:
                coff, clen = struct.unpack_from("<QQ", body, 0)
                blocks.append((coff, clen))
            elif mt != _MSG_NIL:
                msgs.append((mt, body))
    return msgs


def _dataspace(body: bytes) -> list[int]:
    r = _R(body)
    ver = r.u8()
    rank = r.u8()
    flags = r.u8()
    if ver == 1:
        r.p += 5
    elif ver == 2:
        r.p += 1  # type
    else:
        raise NotImplementedError(f"dataspace version {ver}")
    dims = [r.u64() for _ in range(rank)]
    # maxdims present per flags&1 — not needed, body already consumed
    return dims


def _dataspace_maxdims(body: bytes) -> list[int] | None:
    """Max dimensions (UNDEF = unlimited) when stored, else None.
    Needed only to detect WHICH dim is unlimited for the v4
    extensible-array chunk order (the library swizzles the unlimited
    dim to slot 0 when it is not already the slowest-varying)."""
    r = _R(body)
    ver = r.u8()
    rank = r.u8()
    flags = r.u8()
    if ver == 1:
        r.p += 5
    elif ver == 2:
        r.p += 1
    else:
        raise NotImplementedError(f"dataspace version {ver}")
    if not (flags & 0x01):
        return None
    r.p += 8 * rank  # current dims
    return [r.u64() for _ in range(rank)]


def _datatype(body: bytes, pos: int = 0) -> dict:
    """Datatype message → {"kind", "size", "np" numpy-dtype-str or
    None, "base" for vlen}. Byte order from the class bit field."""
    r = _R(body, pos)
    cv = r.u8()
    cls, ver = cv & 0x0F, cv >> 4
    if ver not in (1, 2, 3):
        raise NotImplementedError(f"datatype version {ver}")
    b0, b8, b16 = r.u8(), r.u8(), r.u8()
    size = r.u32()
    order = ">" if (b0 & 1) else "<"
    if cls == 0:  # fixed-point
        signed = bool(b0 & 0x08)
        return {
            "kind": "int",
            "size": size,
            "np": f"{order}{'i' if signed else 'u'}{size}",
            "end": r.p + 4,
        }
    if cls == 1:  # floating-point
        if size not in (4, 8):
            raise NotImplementedError(f"{size}-byte float datatype")
        return {"kind": "float", "size": size, "np": f"{order}f{size}",
                "end": r.p + 12}
    if cls == 3:  # fixed string
        return {"kind": "string", "size": size, "np": None, "end": r.p}
    if cls == 6:  # compound — netcdf-c's REFERENCE_LIST (H5DSattach_scale
        # writes one on every dimension scale: {dataset: objref, index})
        nmem = b0 | (b8 << 8)
        members = []
        p = r.p
        for _ in range(nmem):
            e = body.index(b"\x00", p)
            name = body[p:e].decode("utf-8")
            if ver in (1, 2):
                p += ((e - p) // 8 + 1) * 8  # name NUL-padded to 8
                (off,) = struct.unpack_from("<I", body, p)
                p += 4
                if ver == 1:
                    # dimensionality(1) + reserved(3) + permutation(4)
                    # + reserved(4) + 4 dim sizes(16)
                    p += 28
            else:  # v3: bare NUL-terminated name, minimal-width offset
                p = e + 1
                osz = max(1, (size.bit_length() + 7) // 8)
                off = int.from_bytes(body[p : p + osz], "little")
                p += osz
            mdt = _datatype(body, p)
            p = mdt["end"]
            members.append({"name": name, "offset": off, "dt": mdt})
        return {"kind": "compound", "size": size, "np": None,
                "members": members, "end": p}
    if cls == 7:  # reference
        return {"kind": "reference", "size": size, "np": None, "end": r.p}
    if cls == 9:  # variable-length
        vtype = b0 & 0x0F  # 0 sequence, 1 string
        base = _datatype(body, r.p)
        return {
            "kind": "vlen_string" if vtype == 1 else "vlen",
            "size": size,
            "np": None,
            "base": base,
            "end": base["end"],
        }
    raise NotImplementedError(f"HDF5 datatype class {cls}")


def _layout(body: bytes) -> dict:
    r = _R(body)
    ver = r.u8()
    if ver == 3:
        cls = r.u8()
        if cls == 0:  # compact
            n = r.u16()
            return {"layout": "compact", "data": r.take(n)}
        if cls == 1:  # contiguous
            return {"layout": "contiguous", "addr": r.u64(), "size": r.u64()}
        if cls == 2:  # chunked, b-tree v1 index
            nd = r.u8()  # ndims + 1
            btree = r.u64()
            dims = [r.u32() for _ in range(nd)]
            return {
                "layout": "chunked",
                "btree": btree,
                "chunk": dims[:-1],
                "elem_size": dims[-1],
            }
        raise NotImplementedError(f"data layout class {cls}")
    if ver == 4:  # HDF5 1.10+ (spec IV.A.2.i, version 4)
        cls = r.u8()
        if cls == 0:
            n = r.u16()
            return {"layout": "compact", "data": r.take(n)}
        if cls == 1:
            return {"layout": "contiguous", "addr": r.u64(), "size": r.u64()}
        if cls == 2:
            flags = r.u8()
            nd = r.u8()  # ndims + 1 (element size rides as last dim)
            enc = r.u8()  # bytes per dimension-size field
            dims = [r.uN(enc) for _ in range(nd)]
            itype = r.u8()
            out = {
                "layout": "chunked_v4",
                "chunk": dims[:-1],
                "elem_size": dims[-1],
                "index": itype,
                "flags": flags,
            }
            if itype == 1:  # single chunk
                if flags & 0x02:  # ...WITH_FILTER
                    out["single_size"] = r.u64()
                    out["single_mask"] = r.u32()
                out["addr"] = r.u64()
                return out
            if itype == 2:  # implicit: dense contiguous chunk array
                out["addr"] = r.u64()
                return out
            if itype == 3:  # fixed array
                out["page_bits"] = r.u8()
                out["addr"] = r.u64()
                return out
            if itype == 4:  # extensible array (one unlimited dim)
                out["ea_max_bits"] = r.u8()
                out["ea_idx_elmts"] = r.u8()
                out["ea_min_ptrs"] = r.u8()
                out["ea_min_elmts"] = r.u8()
                out["ea_page_bits"] = r.u8()
                out["addr"] = r.u64()
                return out
            if itype == 5:  # v2 B-tree (multiple unlimited dims)
                out["bt2_node_size"] = r.u32()
                out["bt2_split"] = r.u8()
                out["bt2_merge"] = r.u8()
                out["addr"] = r.u64()
                return out
            raise NotImplementedError(f"v4 chunk indexing type {itype}")
        raise NotImplementedError(f"data layout class {cls}")
    raise NotImplementedError(f"data layout message version {ver}")


def _filters(body: bytes) -> list[tuple[int, list[int]]]:
    r = _R(body)
    ver = r.u8()
    n = r.u8()
    if ver == 1:
        r.p += 6
    out = []
    for _ in range(n):
        fid = r.u16()
        if ver == 1 or fid >= 256:
            nlen = r.u16()
        else:
            nlen = 0
        r.u16()  # flags
        ncv = r.u16()
        if nlen:
            r.take(nlen if ver == 2 else (nlen + 7) // 8 * 8)
        cvs = [r.u32() for _ in range(ncv)]
        if ver == 1 and ncv % 2:
            r.p += 4
        out.append((fid, cvs))
    return out


def _fill_value(mt: int, body: bytes) -> bytes | None:
    if mt == _MSG_FILL_OLD:
        (n,) = struct.unpack_from("<I", body, 0)
        return body[4 : 4 + n] or None
    r = _R(body)
    ver = r.u8()
    if ver in (1, 2):
        r.p += 2  # alloc time, write time
        defined = r.u8()
        if ver == 1 or defined:
            n = r.u32()
            return r.take(n) or None
        return None
    if ver == 3:
        flags = r.u8()
        if flags & 0x20:
            n = r.u32()
            return r.take(n) or None
        return None
    raise NotImplementedError(f"fill value message version {ver}")


def _gheap_object(b, addr: int, index: int) -> bytes:
    """Global heap collection (GCOL) object lookup."""
    if bytes(b[addr : addr + 4]) != b"GCOL":
        raise ValueError(f"bad global heap signature at {addr}")
    r = _R(b, addr + 4)
    if r.u8() != 1:
        raise NotImplementedError("global heap version != 1")
    r.p += 3
    size = r.u64()
    end = addr + size
    while r.p + 16 <= end:
        idx = r.u16()
        r.u16()  # refcount
        r.p += 4
        osz = r.u64()
        if idx == index:
            return r.take(osz)
        if idx == 0:
            break
        r.p += (osz + 7) // 8 * 8
    raise KeyError(f"global heap object {index} not found at {addr}")


def _read_values(b, dt: dict, raw: bytes, n: int):
    """Decode n elements of datatype dt from attribute/vlen raw bytes."""
    if dt["kind"] in ("int", "float"):
        vals = np.frombuffer(raw[: n * dt["size"]], dtype=np.dtype(dt["np"]))
        return vals.tolist() if n > 1 else vals[0].item()
    if dt["kind"] == "string":
        if n > 1:
            out = [
                raw[i * dt["size"] : (i + 1) * dt["size"]]
                .split(b"\x00")[0]
                .decode("utf-8", "replace")
                for i in range(n)
            ]
            return out
        return raw[: dt["size"]].split(b"\x00")[0].decode("utf-8", "replace")
    if dt["kind"] == "vlen_string":
        out = []
        for i in range(n):
            ln, ga, gi = struct.unpack_from("<IQI", raw, i * 16)
            out.append(
                _gheap_object(b, ga, gi)[:ln].decode("utf-8", "replace")
            )
        return out if n > 1 else out[0]
    if dt["kind"] == "vlen" and dt["base"]["kind"] == "reference":
        # DIMENSION_LIST: per element, a vlen sequence of object refs
        out = []
        for i in range(n):
            ln, ga, gi = struct.unpack_from("<IQI", raw, i * 16)
            ob = _gheap_object(b, ga, gi)
            out.append(list(np.frombuffer(ob[: ln * 8], dtype="<u8")))
        return out
    if dt["kind"] == "reference":
        vals = np.frombuffer(raw[: n * 8], dtype="<u8")
        return [int(v) for v in vals] if n > 1 else int(vals[0])
    if dt["kind"] == "compound":
        out = []
        for i in range(n):
            base = i * dt["size"]
            out.append({
                m["name"]: _read_values(
                    b, m["dt"], raw[base + m["offset"] :], 1
                )
                for m in dt["members"]
            })
        return out if n > 1 else out[0]
    raise NotImplementedError(f"attribute datatype kind {dt['kind']}")


def _attribute(b, body: bytes) -> tuple[str, object]:
    """Attribute message → (name, value). The NAME is parsed first and
    survives unconditionally; a value whose datatype class this reader
    does not decode (time/bitfield/opaque/enum/array, or an exotic
    vlen base) comes back as None rather than failing the whole file —
    real netcdf-c files carry library-internal attributes (e.g.
    REFERENCE_LIST, decoded; or tool-added extras) that must never
    block ingesting the data itself."""
    r = _R(body)
    ver = r.u8()
    if ver == 1:
        r.u8()
        nsz, dtsz, dssz = r.u16(), r.u16(), r.u16()
        name = r.take((nsz + 7) // 8 * 8).split(b"\x00")[0].decode()
    elif ver in (2, 3):
        flags = r.u8()
        nsz, dtsz, dssz = r.u16(), r.u16(), r.u16()
        if ver == 3:
            r.u8()  # name character-set encoding
        name = r.take(nsz).split(b"\x00")[0].decode()
        if flags & 0x03:
            return name, None  # shared attribute datatype/dataspace
    else:
        raise NotImplementedError(f"attribute message version {ver}")
    try:
        dt = _datatype(body, r.p)
        if ver == 1:
            r.p += (dtsz + 7) // 8 * 8
            dims = _dataspace(body[r.p : r.p + dssz])
            r.p += (dssz + 7) // 8 * 8
        else:
            r.p += dtsz
            dims = _dataspace(body[r.p : r.p + dssz])
            r.p += dssz
        n = int(np.prod(dims)) if dims else 1
        return name, _read_values(b, dt, body[r.p :], n)
    except NotImplementedError:
        return name, None


def _local_heap(b, addr: int) -> int:
    if bytes(b[addr : addr + 4]) != b"HEAP":
        raise ValueError(f"bad local heap signature at {addr}")
    r = _R(b, addr + 4)
    r.u8()
    r.p += 3
    r.p += 16  # data segment size, free-list head
    return r.u64()  # data segment address


def _heap_name(b, data_addr: int, off: int) -> str:
    end = b.find(b"\x00", data_addr + off)
    return bytes(b[data_addr + off : end]).decode("utf-8")


def _v1_group_links(b, btree_addr: int, heap_addr: int) -> list[tuple[str, int]]:
    """Old-style group: walk the name B-tree v1 to SNOD leaves."""
    data_addr = _local_heap(b, heap_addr)
    out: list[tuple[str, int]] = []

    def walk(addr: int):
        if bytes(b[addr : addr + 4]) != b"TREE":
            raise ValueError(f"bad v1 B-tree signature at {addr}")
        r = _R(b, addr + 4)
        ntype, level = r.u8(), r.u8()
        nent = r.u16()
        r.p += 16  # siblings
        if ntype != 0:
            raise ValueError("non-group B-tree in symbol table")
        for i in range(nent):
            r.u64()  # key i (heap offset)
            child = r.u64()
            if level > 0:
                walk(child)
            else:
                if bytes(b[child : child + 4]) != b"SNOD":
                    raise ValueError(f"bad SNOD signature at {child}")
                r2 = _R(b, child + 4)
                r2.u8()
                r2.u8()
                nsym = r2.u16()
                for _ in range(nsym):
                    noff = r2.u64()
                    haddr = r2.u64()
                    r2.p += 24  # cache type, reserved, scratch
                    out.append((_heap_name(b, data_addr, noff), haddr))

    walk(btree_addr)
    return out


def _link_msg(body: bytes) -> tuple[str, int] | None:
    """Link message → (name, object header addr) for hard links."""
    r = _R(body)
    if r.u8() != 1:
        raise NotImplementedError("link message version != 1")
    flags = r.u8()
    ltype = r.u8() if flags & 0x08 else 0
    if flags & 0x04:
        r.p += 8  # creation order
    if flags & 0x10:
        r.p += 1  # charset
    nlen = r.uN(1 << (flags & 0x3))
    name = r.take(nlen).decode("utf-8")
    if ltype == 0:
        return name, r.u64()
    return None  # soft/external links: skipped


class _FractalHeap:
    """Managed-object fractal heap (FRHP): doubling table with a root
    direct block or one level of root-indirect direct blocks."""

    def __init__(self, b, addr: int):
        if bytes(b[addr : addr + 4]) != b"FRHP":
            raise ValueError(f"bad fractal heap signature at {addr}")
        self.b = b
        r = _R(b, addr + 4)
        if r.u8() != 0:
            raise NotImplementedError("fractal heap version != 0")
        self.id_len = r.u16()
        io_filt_len = r.u16()
        self.flags = r.u8()
        self.max_managed = r.u32()
        r.p += 8  # next huge id
        self.huge_btree = r.u64()
        r.p += 8 + 8  # free space, free-space mgr addr
        r.p += 8 + 8  # managed space, allocated managed space
        r.p += 8  # direct-block iterator offset
        r.p += 8  # number of managed objects
        r.p += 4 * 8  # huge/tiny sizes + counts (objects self-describe)
        self.width = r.u16()
        self.start_size = r.u64()
        self.max_direct = r.u64()
        self.max_heap_bits = r.u16()
        r.u16()  # starting rows in root indirect
        self.root = r.u64()
        self.cur_rows = r.u16()
        if io_filt_len:
            raise NotImplementedError("filtered fractal heap")
        self.off_size = (self.max_heap_bits + 7) // 8
        self.len_size = max(1, (self.max_managed.bit_length() + 7) // 8)
        self.blk_hdr = 4 + 1 + 8 + self.off_size + (
            4 if self.flags & 0x02 else 0
        )
        self._children: list[tuple[int, int, int]] | None = None

    def _row_size(self, row: int) -> int:
        return self.start_size if row < 2 else self.start_size << (row - 1)

    def _load_children(self):
        """Indirect-block tree → flat [(heap_off, size, file_addr)] of
        DIRECT blocks. Rows whose block size exceeds max_direct hold
        CHILD INDIRECT blocks (the doubling table is self-similar: a
        child covering S bytes has log2(S / (width·start)) + 1 rows
        sized from row 0 again — H5HF's dtable_size_to_rows), walked
        recursively; unallocated children are skipped (their heap
        range is simply unmapped)."""
        out: list[tuple[int, int, int]] = []
        self._walk_indirect(self.root, 0, self.cur_rows, out)
        self._children = out

    def _walk_indirect(self, addr: int, block_off: int, nrows: int, out):
        if bytes(self.b[addr : addr + 4]) != b"FHIB":
            raise ValueError("bad fractal heap indirect block signature")
        r = _R(self.b, addr + 4)
        r.u8()
        r.u64()  # heap header addr
        r.p += self.off_size  # this block's heap offset
        heap_off = block_off
        for row in range(nrows):
            size = self._row_size(row)
            for _ in range(self.width):
                child = r.u64()
                if size <= self.max_direct:
                    out.append((heap_off, size, child))
                elif child != UNDEF:
                    # child nrows = log2(size/(width·start)) + 1
                    span = size // (self.width * self.start_size)
                    self._walk_indirect(
                        child, heap_off, span.bit_length(), out
                    )
                heap_off += size

    def _huge_map(self) -> dict[int, tuple[int, int]]:
        """Indirectly-accessed huge objects: the header's v2 B-tree
        (record type 1: address(8) + length(8) + huge id(8)) mapped
        once, lazily."""
        if getattr(self, "_huge", None) is None:
            if self.huge_btree == UNDEF:
                raise ValueError("huge heap id but no huge-object B-tree")
            m: dict[int, tuple[int, int]] = {}
            for rec in _btree_v2_records(self.b, self.huge_btree):
                addr = int.from_bytes(rec[0:8], "little")
                ln = int.from_bytes(rec[8:16], "little")
                hid = int.from_bytes(rec[16:24], "little")
                m[hid] = (addr, ln)
            self._huge = m
        return self._huge

    def get(self, heap_id: bytes) -> bytes:
        r = _R(heap_id)
        ver = r.u8()
        idtype = (ver >> 4) & 0x3
        if idtype == 2:  # TINY: data lives inside the heap id itself
            if self.id_len <= 18:
                ln = (ver & 0x0F) + 1
                return bytes(heap_id[1 : 1 + ln])
            ln = (((ver & 0x0F) << 8) | heap_id[1]) + 1  # extended tiny
            return bytes(heap_id[2 : 2 + ln])
        if idtype == 1:  # HUGE: standalone object outside the blocks
            if self.id_len - 1 >= 16:  # direct: address + length inline
                addr = r.u64()
                ln = r.u64()
            else:  # indirect: id resolved through the huge B-tree
                hid = r.uN(min(8, self.id_len - 1))
                addr, ln = self._huge_map()[hid]
            return bytes(self.b[addr : addr + ln])
        if idtype != 0:
            raise NotImplementedError(
                f"fractal heap object id type {idtype}"
            )
        off = r.uN(self.off_size)
        ln = r.uN(self.len_size)
        if self.cur_rows == 0:  # root IS a direct block
            blk_off, addr = 0, self.root
        else:
            if self._children is None:
                self._load_children()
            blk_off = addr = None
            for ho, size, fa in self._children:
                if ho <= off < ho + size:
                    blk_off, addr = ho, fa
                    break
            if addr is None or addr == UNDEF:
                raise KeyError(f"fractal heap offset {off} unmapped")
        if bytes(self.b[addr : addr + 4]) != b"FHDB":
            raise ValueError(f"bad fractal heap direct block at {addr}")
        p = addr + (off - blk_off)
        return bytes(self.b[p : p + ln])


def _enc_size(n: int) -> int:
    return max(1, (n.bit_length() + 7) // 8)


def _btv2_caps(node_size: int, rec_size: int, depth: int):
    """(caps, cum): max records per single node and max cumulative
    records per subtree, for each depth 0..depth (spec III.A.2 —
    determines the width of internal-node child-pointer count fields)."""
    caps = [(node_size - 10) // rec_size]
    cum = [caps[0]]
    for d in range(1, depth + 1):
        ptr = 8 + _enc_size(caps[d - 1])
        if d > 1:
            ptr += _enc_size(cum[d - 1])
        caps.append((node_size - 10 - ptr) // (rec_size + ptr))
        cum.append(caps[d] + (caps[d] + 1) * cum[d - 1])
    return caps, cum


def _btree_v2_records(b, addr: int) -> list[bytes]:
    """All records of a v2 B-tree (BTHD), left-to-right."""
    if bytes(b[addr : addr + 4]) != b"BTHD":
        raise ValueError(f"bad v2 B-tree signature at {addr}")
    r = _R(b, addr + 4)
    if r.u8() != 0:
        raise NotImplementedError("v2 B-tree version != 0")
    r.u8()  # record type (caller knows)
    node_size = r.u32()
    rec_size = r.u16()
    depth = r.u16()
    r.u8()
    r.u8()  # split/merge percent
    root = r.u64()
    root_nrec = r.u16()
    r.u64()  # total
    if root == UNDEF or root_nrec == 0:
        return []
    if depth > 16:  # corrupt header guard; real trees are shallow
        raise ValueError(f"implausible v2 B-tree depth {depth}")
    caps, cum = _btv2_caps(node_size, rec_size, depth)
    out: list[bytes] = []

    def leaf(a: int, nrec: int):
        if bytes(b[a : a + 4]) != b"BTLF":
            raise ValueError(f"bad BTLF signature at {a}")
        p = a + 6
        for i in range(nrec):
            out.append(bytes(b[p + i * rec_size : p + (i + 1) * rec_size]))

    def internal(a: int, nrec: int, d: int):
        if bytes(b[a : a + 4]) != b"BTIN":
            raise ValueError(f"bad BTIN signature at {a}")
        p = a + 6
        recs = [
            bytes(b[p + i * rec_size : p + (i + 1) * rec_size])
            for i in range(nrec)
        ]
        p += nrec * rec_size
        nsz = _enc_size(caps[d - 1])
        children = []
        for _ in range(nrec + 1):
            ca = int.from_bytes(b[p : p + 8], "little")
            p += 8
            cn = int.from_bytes(b[p : p + nsz], "little")
            p += nsz
            if d - 1 > 0:
                p += _enc_size(cum[d - 1])
            children.append((ca, cn))
        for i, (ca, cn) in enumerate(children):
            if d - 1 == 0:
                leaf(ca, cn)
            else:
                internal(ca, cn, d - 1)
            if i < nrec:
                out.append(recs[i])

    if depth == 0:
        leaf(root, root_nrec)
    else:
        internal(root, root_nrec, depth)
    return out


def _dense_links(b, fheap_addr: int, btree_addr: int) -> list[tuple[str, int]]:
    heap = _FractalHeap(b, fheap_addr)
    out = []
    for rec in _btree_v2_records(b, btree_addr):
        # record type 5: hash(4) + heap id
        link = _link_msg(heap.get(rec[4 : 4 + heap.id_len]))
        if link:
            out.append(link)
    return out


def _dense_attrs(b, fheap_addr: int, btree_addr: int) -> dict:
    heap = _FractalHeap(b, fheap_addr)
    out = {}
    for rec in _btree_v2_records(b, btree_addr):
        # record type 8: heap id (heap.id_len) + flags(1) + corder(4) + hash(4)
        name, val = _attribute(b, heap.get(rec[: heap.id_len]))
        out[name] = val
    return out


def _chunk_btree(b, addr: int, ndims: int) -> list[tuple[tuple, int, int, int]]:
    """B-tree v1 (node type 1) → [(chunk_coords, file_addr, nbytes,
    filter_mask)]."""
    out: list[tuple[tuple, int, int, int]] = []
    key_n = ndims + 1  # spec stores ndims+1 offsets (last always 0)

    def walk(a: int):
        if a == UNDEF:
            return
        if bytes(b[a : a + 4]) != b"TREE":
            raise ValueError(f"bad chunk B-tree signature at {a}")
        r = _R(b, a + 4)
        ntype, level = r.u8(), r.u8()
        if ntype != 1:
            raise ValueError("chunk B-tree node type != 1")
        nent = r.u16()
        r.p += 16
        for _ in range(nent):
            size = r.u32()
            mask = r.u32()
            coords = tuple(r.u64() for _ in range(key_n))
            child = r.u64()
            if level > 0:
                walk(child)
            else:
                out.append((coords[:-1], child, size, mask))
        # trailing key ignored

    walk(addr)
    return out


def _fixed_array_elements(b, addr: int) -> list[bytes]:
    """Fixed Array chunk index (FAHD header + FADB data block, paged
    past 2^page_bits elements; spec III.G). Returns the raw element
    bytes in linear order; uninitialized pages yield b"" placeholders
    (chunks never written — fill semantics)."""
    if bytes(b[addr : addr + 4]) != b"FAHD":
        raise ValueError(f"bad fixed-array header signature at {addr}")
    r = _R(b, addr + 4)
    if r.u8() != 0:
        raise NotImplementedError("fixed array version != 0")
    client = r.u8()
    if client not in (0, 1):
        raise NotImplementedError(f"fixed array client id {client}")
    entry_size = r.u8()
    page_bits = r.u8()
    nelmts = r.u64()
    dblk = r.u64()
    if dblk == UNDEF or nelmts == 0:
        return []
    if bytes(b[dblk : dblk + 4]) != b"FADB":
        raise ValueError(f"bad fixed-array data block signature at {dblk}")
    r2 = _R(b, dblk + 4)
    if r2.u8() != 0:
        raise NotImplementedError("fixed array data block version != 0")
    r2.u8()  # client id (matches header)
    r2.u64()  # header address (back-pointer)
    page_nelmts = 1 << page_bits
    out: list[bytes] = []
    if nelmts > page_nelmts:  # paged data block
        npages = (nelmts + page_nelmts - 1) // page_nelmts
        bitmap = r2.take((npages + 7) // 8)
        r2.p += 4  # data-block checksum
        for pg in range(npages):
            n_here = min(page_nelmts, nelmts - pg * page_nelmts)
            live = bool(bitmap[pg // 8] & (1 << (pg % 8)))
            if live:
                for _ in range(n_here):
                    out.append(r2.take(entry_size))
            else:
                out.extend(b"" for _ in range(n_here))
                r2.p += entry_size * n_here  # unread dead elements
            r2.p += entry_size * (page_nelmts - n_here)  # page padding
            r2.p += 4  # page checksum
    else:
        for _ in range(nelmts):
            out.append(r2.take(entry_size))
    return out


def ea_geometry(max_nelmts_bits: int, idx_blk_elmts: int,
                data_blk_min_elmts: int, sup_blk_min_data_ptrs: int):
    """Extensible-array super-block geometry (spec III.F / the H5EA
    header's derived quantities). Shared with the test fixture writer
    so both sides agree by construction; the on-disk byte layout is
    written/parsed independently against the spec.

    Element index space: the first ``idx_blk_elmts`` elements live
    inline in the index block; the rest are grouped into data blocks,
    which are grouped into super blocks. Super block ``u`` (0-based)
    has ``2^(u//2)`` data blocks of ``2^((u+1)//2) * data_blk_min_elmts``
    elements each. Super blocks whose data-block count is below
    ``sup_blk_min_data_ptrs`` are never materialized — their data
    blocks are addressed DIRECTLY from the index block; the first
    "real" super block is ``2*log2(sup_blk_min_data_ptrs)``, and the
    direct data-block address slots total ``2*(sup_blk_min_data_ptrs
    - 1)`` (= sum of ndblks below it).

    Returns (sblk_info, first_real, ndblk_addrs, nsblk_addrs,
    arr_off_size) where sblk_info[u] = (ndblks, dblk_nelmts,
    start_idx, start_dblk); start_idx counts elements past the inline
    ones."""
    log2_min_elmts = (data_blk_min_elmts - 1).bit_length()
    if (1 << log2_min_elmts) != data_blk_min_elmts:
        raise ValueError("data_blk_min_elmts must be a power of two")
    log2_min_ptrs = (sup_blk_min_data_ptrs - 1).bit_length()
    if (1 << log2_min_ptrs) != sup_blk_min_data_ptrs:
        raise ValueError("sup_blk_min_data_ptrs must be a power of two")
    nsblks = 1 + (max_nelmts_bits - log2_min_elmts)
    info = []
    start_idx = 0
    start_dblk = 0
    for u in range(nsblks):
        ndblks = 1 << (u // 2)
        dblk_nelmts = (1 << ((u + 1) // 2)) * data_blk_min_elmts
        info.append((ndblks, dblk_nelmts, start_idx, start_dblk))
        start_idx += ndblks * dblk_nelmts
        start_dblk += ndblks
    first_real = 2 * log2_min_ptrs
    ndblk_addrs = 2 * (sup_blk_min_data_ptrs - 1)
    nsblk_addrs = nsblks - first_real
    arr_off_size = (max_nelmts_bits + 7) // 8
    return info, first_real, ndblk_addrs, nsblk_addrs, arr_off_size


def _extensible_array_elements(b, addr: int, n_needed: int) -> list[bytes]:
    """Extensible Array chunk index (EAHD header → EAIB index block →
    EASB super blocks → EADB data blocks, paged past
    2^max_dblk_page_nelmts_bits elements per data block; spec III.F).
    The index netcdf-c/HDF5 1.10+ writes for a dataset with ONE
    unlimited dimension (appended time series). Returns the first
    ``n_needed`` raw element bytes in linear order; unallocated
    elements (never-written chunks: UNDEF data-block address or a
    dead data-block page) yield b"" placeholders — fill semantics,
    same contract as :func:`_fixed_array_elements`."""
    if bytes(b[addr : addr + 4]) != b"EAHD":
        raise ValueError(f"bad extensible-array header signature at {addr}")
    r = _R(b, addr + 4)
    if r.u8() != 0:
        raise NotImplementedError("extensible array version != 0")
    client = r.u8()
    if client not in (0, 1):
        raise NotImplementedError(f"extensible array client id {client}")
    elt_size = r.u8()
    max_bits = r.u8()
    idx_elmts = r.u8()
    min_elmts = r.u8()
    min_ptrs = r.u8()
    page_bits = r.u8()
    r.p += 6 * 8  # stats: nsblks, sblk size, ndblks, dblk size,
    #               max index set, nelmts
    iblk = r.u64()
    if iblk == UNDEF or n_needed == 0:
        return [b""] * n_needed
    info, first_real, ndblk_addrs, nsblk_addrs, off_size = ea_geometry(
        max_bits, idx_elmts, min_elmts, min_ptrs
    )
    page_nelmts = 1 << page_bits

    if bytes(b[iblk : iblk + 4]) != b"EAIB":
        raise ValueError(f"bad extensible-array index block at {iblk}")
    ri = _R(b, iblk + 4)
    if ri.u8() != 0:
        raise NotImplementedError("extensible array index block version != 0")
    ri.u8()  # client id
    ri.u64()  # header back-pointer
    inline = [ri.take(elt_size) for _ in range(idx_elmts)]
    direct_dblks = [ri.u64() for _ in range(ndblk_addrs)]
    sblk_addrs = [ri.u64() for _ in range(max(0, nsblk_addrs))]

    undef_elt = UNDEF.to_bytes(8, "little")
    out: list[bytes] = []
    for e in inline[:n_needed]:
        out.append(b"" if e[:8] == undef_elt else e)

    def read_dblock(daddr: int, nelmts: int, live_pages) -> list[bytes]:
        """One EADB → its element bytes ('' per dead-page element)."""
        if daddr == UNDEF:
            return [b""] * nelmts
        if bytes(b[daddr : daddr + 4]) != b"EADB":
            raise ValueError(f"bad extensible-array data block at {daddr}")
        rd = _R(b, daddr + 4)
        if rd.u8() != 0:
            raise NotImplementedError("extensible array data block version")
        rd.u8()  # client id
        rd.u64()  # header back-pointer
        rd.p += off_size  # block offset
        elems: list[bytes] = []
        if nelmts > page_nelmts:  # paged: prefix checksum, then pages
            rd.p += 4
            npages = nelmts // page_nelmts
            for pg in range(npages):
                live = live_pages is None or live_pages(pg)
                for _ in range(page_nelmts):
                    e = rd.take(elt_size)
                    elems.append(
                        e if live and e[:8] != undef_elt else b""
                    )
                rd.p += 4  # page checksum
        else:
            for _ in range(nelmts):
                e = rd.take(elt_size)
                elems.append(b"" if e[:8] == undef_elt else e)
        return elems

    u = 0
    while len(out) < n_needed:
        if u >= len(info):
            raise ValueError(
                "extensible array exhausted before requested element count"
            )
        ndblks, dblk_nelmts, _si, start_dblk = info[u]
        npages = dblk_nelmts // page_nelmts if dblk_nelmts > page_nelmts else 0
        if u < first_real:
            if npages:
                raise NotImplementedError(
                    "paged extensible-array data block addressed from "
                    "the index block (no page bitmap owner)"
                )
            for d in range(ndblks):
                if len(out) >= n_needed:
                    break
                out.extend(read_dblock(direct_dblks[start_dblk + d],
                                       dblk_nelmts, None))
        else:
            sa = sblk_addrs[u - first_real]
            if sa == UNDEF:
                out.extend([b""] * (ndblks * dblk_nelmts))
            else:
                if bytes(b[sa : sa + 4]) != b"EASB":
                    raise ValueError(
                        f"bad extensible-array super block at {sa}"
                    )
                rs = _R(b, sa + 4)
                if rs.u8() != 0:
                    raise NotImplementedError(
                        "extensible array super block version != 0"
                    )
                rs.u8()  # client id
                rs.u64()  # header back-pointer
                rs.p += off_size  # block offset
                bitmap = (
                    rs.take((ndblks * npages + 7) // 8) if npages else b""
                )
                daddrs = [rs.u64() for _ in range(ndblks)]
                for d in range(ndblks):
                    if len(out) >= n_needed:
                        break
                    live = (
                        None if not npages else
                        (lambda pg, d=d: bool(
                            bitmap[(d * npages + pg) // 8]
                            & (1 << ((d * npages + pg) % 8))
                        ))
                    )
                    out.extend(read_dblock(daddrs[d], dblk_nelmts, live))
        u += 1
    return out[:n_needed]


def _v4_chunk_entries(
    b, lay: dict, shape, unlim: int | None = None
) -> list[tuple[tuple, int, int, int]]:
    """Resolve a v4 chunk index to the same [(element_coords,
    file_addr, nbytes, filter_mask)] list the v1 B-tree walker
    produces, so every downstream consumer (driver-side decode,
    distributed pixel table) is index-agnostic. Only ALLOCATED chunks
    are returned — missing ones fall to fill semantics.

    ``unlim``: the unlimited dimension for an EXTENSIBLE-ARRAY index.
    When it is not dim 0, the library SWIZZLES chunk coordinates (the
    unlimited dim moves to slot 0, H5VM_swizzle_coords) before
    linearizing, so the EA element order is row-major over the
    swizzled grid — the coords list is permuted to match."""
    import itertools as it

    cd = lay["chunk"]
    counts = [max(1, (s + c - 1) // c) for s, c in zip(shape, cd)]
    if lay["index"] == 4 and unlim not in (None, 0):
        sw_counts = (
            [counts[unlim]] + counts[:unlim] + counts[unlim + 1 :]
        )
        grid = []
        for sw in it.product(*[range(n) for n in sw_counts]):
            orig = sw[1 : unlim + 1] + (sw[0],) + sw[unlim + 1 :]
            grid.append(tuple(ci * c for ci, c in zip(orig, cd)))
    else:
        grid = [
            tuple(ci * c for ci, c in zip(idx, cd))
            for idx in it.product(*[range(n) for n in counts])
        ]  # row-major linear order, element offsets
    chunk_bytes = int(np.prod(cd)) * lay["elem_size"]
    itype = lay["index"]
    if itype == 1:  # single chunk
        if lay["addr"] == UNDEF:
            return []
        size = lay.get("single_size", chunk_bytes)
        mask = lay.get("single_mask", 0)
        return [(grid[0], lay["addr"], int(size), int(mask))]
    if itype == 2:  # implicit: dense, unfiltered, all allocated
        if lay["addr"] == UNDEF:
            return []
        return [
            (coords, lay["addr"] + i * chunk_bytes, chunk_bytes, 0)
            for i, coords in enumerate(grid)
        ]
    if itype in (3, 4):  # fixed array / extensible array
        if lay["addr"] == UNDEF:
            return []
        if itype == 3:
            elems = _fixed_array_elements(b, lay["addr"])
            if len(elems) != len(grid):
                raise ValueError(
                    f"fixed array has {len(elems)} entries for a "
                    f"{len(grid)}-chunk grid"
                )
        else:
            elems = _extensible_array_elements(b, lay["addr"], len(grid))
        out = []
        for coords, e in zip(grid, elems):
            if not e:
                continue  # uninitialized page / unallocated element
            addr = int.from_bytes(e[:8], "little")
            if addr == UNDEF or addr == 0:
                continue
            if len(e) > 8:  # filtered client: addr + size + mask(4)
                size = int.from_bytes(e[8:-4], "little")
                mask = int.from_bytes(e[-4:], "little")
            else:
                size, mask = chunk_bytes, 0
            out.append((coords, addr, size, mask))
        return out
    if itype == 5:  # v2 B-tree of chunk records (types 10/11)
        if lay["addr"] == UNDEF:
            return []
        nd = len(cd)
        out = []
        for rec in _btree_v2_records(b, lay["addr"]):
            # type 10 (non-filtered): addr(8) + scaled offsets (8*nd);
            # type 11 (filtered): addr(8) + nbytes(variable width) +
            # mask(4) + scaled offsets — width inferred from rec size
            addr = int.from_bytes(rec[:8], "little")
            if addr == UNDEF:
                continue
            if len(rec) == 8 + 8 * nd:
                size, mask = chunk_bytes, 0
                p = 8
            else:
                size_w = len(rec) - 12 - 8 * nd
                if not (1 <= size_w <= 8):
                    raise ValueError(
                        f"v2 B-tree chunk record size {len(rec)} does "
                        f"not fit {nd} dims"
                    )
                size = int.from_bytes(rec[8 : 8 + size_w], "little")
                mask = int.from_bytes(
                    rec[8 + size_w : 12 + size_w], "little"
                )
                p = 12 + size_w
            scaled = [
                int.from_bytes(rec[p + 8 * i : p + 8 * (i + 1)], "little")
                for i in range(nd)
            ]
            coords = tuple(s * c for s, c in zip(scaled, cd))
            out.append((coords, addr, int(size), int(mask)))
        return out
    raise NotImplementedError(f"v4 chunk indexing type {itype}")


def defilter(raw: bytes, filters, itemsize: int, filter_mask: int = 0) -> bytes:
    """Reverse the filter pipeline for one chunk. ``filter_mask`` bit i
    set = filter i was skipped at write time."""
    for i in range(len(filters) - 1, -1, -1):
        if filter_mask & (1 << i):
            continue
        fid, cvs = filters[i]
        if fid == 1:
            raw = zlib.decompress(raw)
        elif fid == 2:
            sz = cvs[0] if cvs else itemsize
            n = len(raw) // sz
            raw = (
                np.frombuffer(raw[: n * sz], dtype="u1")
                .reshape(sz, n)
                .T.tobytes()
            )
        elif fid == 3:
            raw = raw[:-4]  # fletcher32: checksum trails, not verified
        else:
            raise NotImplementedError(
                f"HDF5 filter id {fid} (shuffle/deflate/fletcher32 only)"
            )
    return raw


def _open(path: str):
    """mmap locally; lazy HTTP-Range buffer for http(s) URLs — header
    and chunk-index pages only, like GDAL's /vsicurl/."""
    from raquet_spark.sources.io import open_bytes

    return open_bytes(path)


def read_hdf5_structure(path: str) -> dict:
    """Driver-side structure parse: groups walked recursively (names
    '/'-joined), one dict per dataset with shape/dtype/attrs/layout/
    chunk index. Only header and index pages are touched (mmap); the
    returned dict holds plain values only (picklable — executor
    closures can carry slices of it)."""
    b = _open(path)
    sb = _superblock(b)
    datasets: dict[str, dict] = {}
    gatts: dict = {}

    def visit(addr: int, prefix: str):
        msgs = _object_header(b, addr)
        by_type: dict[int, list[bytes]] = {}
        for mt, body in msgs:
            by_type.setdefault(mt, []).append(body)
        attrs = {}
        for body in by_type.get(_MSG_ATTRIBUTE, ()):
            k, v = _attribute(b, body)
            attrs[k] = v
        for body in by_type.get(_MSG_ATTR_INFO, ()):
            r = _R(body)
            r.u8()
            aflags = r.u8()
            if aflags & 0x01:
                r.p += 2
            fh, bt = r.u64(), r.u64()
            if fh != UNDEF:
                attrs.update(_dense_attrs(b, fh, bt))
        is_dataset = _MSG_DATASPACE in by_type and _MSG_LAYOUT in by_type
        if is_dataset:
            dt = _datatype(by_type[_MSG_DATATYPE][0])
            lay = _layout(by_type[_MSG_LAYOUT][0])
            filters = []
            for body in by_type.get(_MSG_FILTERS, ()):
                filters.extend(_filters(body))
            fill = None
            for mt in (_MSG_FILL, _MSG_FILL_OLD):
                for body in by_type.get(mt, ()):
                    fill = fill or _fill_value(mt, body)
            ds = {
                "header_addr": addr,
                "shape": _dataspace(by_type[_MSG_DATASPACE][0]),
                "dtype": dt,
                "attrs": attrs,
                "filters": filters,
                "fill_raw": fill,
                **lay,
            }
            if lay["layout"] == "chunked":
                ds["chunks"] = _chunk_btree(
                    b, lay["btree"], len(ds["shape"])
                )
            elif lay["layout"] == "chunked_v4":
                if lay["flags"] & 0x01 and filters:
                    # edge chunks stored RAW while interior chunks are
                    # filtered — decoding both through the pipeline
                    # would silently corrupt the boundary
                    raise NotImplementedError(
                        "v4 chunked layout with "
                        "DONT_FILTER_PARTIAL_BOUND_CHUNKS set alongside "
                        "a filter pipeline"
                    )
                unlim = None
                if lay["index"] == 4:
                    # the EA linear chunk order is row-major over the
                    # SWIZZLED grid when the unlimited dim is not dim
                    # 0 (H5VM_swizzle_coords) — _v4_chunk_entries
                    # permutes coords to match; >1 unlimited dim never
                    # gets an EA index (the library picks a v2 B-tree)
                    md = _dataspace_maxdims(by_type[_MSG_DATASPACE][0])
                    if md is not None and UNDEF in md:
                        if md.count(UNDEF) > 1:
                            raise ValueError(
                                "extensible-array chunk index with "
                                "multiple unlimited dimensions"
                            )
                        unlim = md.index(UNDEF)
                ds["chunks"] = _v4_chunk_entries(
                    b, lay, ds["shape"], unlim
                )
                ds["layout"] = "chunked"  # index-agnostic downstream
            datasets[prefix.lstrip("/")] = ds
            return
        # group
        if prefix == "":
            gatts.update(attrs)
        links: list[tuple[str, int]] = []
        for body in by_type.get(_MSG_SYMBOL_TABLE, ()):
            bt, hp = struct.unpack_from("<QQ", body, 0)
            links.extend(_v1_group_links(b, bt, hp))
        for body in by_type.get(_MSG_LINK, ()):
            link = _link_msg(body)
            if link:
                links.append(link)
        for body in by_type.get(_MSG_LINK_INFO, ()):
            r = _R(body)
            r.u8()
            lflags = r.u8()
            if lflags & 0x01:
                r.p += 8
            fh, bt = r.u64(), r.u64()
            if fh != UNDEF:
                links.extend(_dense_links(b, fh, bt))
        for name, child in links:
            visit(child, f"{prefix}/{name}")

    visit(sb["root"], "")
    b.close()
    return {"path": path, "format": "hdf5", "gatts": gatts,
            "datasets": datasets}


def read_h5_dataset(h5: dict, name: str) -> np.ndarray:
    """Driver-side full decode of one (small) dataset — coordinate
    variables; the data variable goes through the distributed path."""
    ds = h5["datasets"][name]
    dt = np.dtype(ds["dtype"]["np"])
    shape = ds["shape"]
    n = int(np.prod(shape)) if shape else 1
    if ds["layout"] == "compact":
        return np.frombuffer(ds["data"][: n * dt.itemsize], dtype=dt).reshape(
            shape
        )
    b = _open(h5["path"])
    try:
        if ds["layout"] == "contiguous":
            if ds["addr"] == UNDEF:
                return _full_fill(ds, shape, dt)
            raw = bytes(b[ds["addr"] : ds["addr"] + n * dt.itemsize])
            return np.frombuffer(raw, dtype=dt).reshape(shape)
        # chunked
        out = _full_fill(ds, shape, dt)
        cd = ds["chunk"]
        for coords, addr, size, mask in ds["chunks"]:
            raw = defilter(bytes(b[addr : addr + size]), ds["filters"],
                           dt.itemsize, mask)
            arr = np.frombuffer(raw[: int(np.prod(cd)) * dt.itemsize],
                                dtype=dt).reshape(cd)
            sel = tuple(
                slice(c, min(c + s, full))
                for c, s, full in zip(coords, cd, shape)
            )
            out[sel] = arr[tuple(slice(0, s.stop - s.start) for s in sel)]
        return out
    finally:
        b.close()


def _full_fill(ds: dict, shape, dt: np.dtype) -> np.ndarray:
    fill = ds.get("fill_raw")
    if fill:
        v = np.frombuffer(fill[: dt.itemsize], dtype=dt)[0]
    else:
        v = dt.type(0)
    return np.full(shape, v, dtype=dt)


# ---- NetCDF-4 layer ----------------------------------------------------

_NC4_HIDDEN = (
    "CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
    "_Netcdf4Dimid", "_Netcdf4Coordinates", "_NCProperties",
)


def nc4_structure(path: str) -> dict:
    """NetCDF-4 file → the same structure dict shape the classic-CDF
    parser returns (netcdf.py), so netcdf_to_raquet and the CLI work
    unchanged: {"dims", "gatts", "variables": {name: {dims, shape,
    attrs, dtype, record, h5}}}. Dimension names come from
    DIMENSION_LIST object references (resolved through the global
    heap); files without it fall back to unique size matching, with a
    typed error on ambiguity."""
    h5 = read_hdf5_structure(path)
    addr_to_name = {
        ds["header_addr"]: n for n, ds in h5["datasets"].items()
    }
    dims: dict[str, int] = {}
    for name, ds in h5["datasets"].items():
        short = name.split("/")[-1]
        if (
            len(ds["shape"]) == 1
            and ds["attrs"].get("CLASS") == "DIMENSION_SCALE"
        ):
            dims.setdefault(short, ds["shape"][0])
    if not dims:
        # plain-HDF5 file with no dimension scales at all: every 1-D
        # dataset is a candidate (best-effort naming, same as before).
        # When scales DO exist, a 1-D data variable without CLASS must
        # NOT become a dimension — it would let the size-match fallback
        # bind a wrong dimension name to a data-variable axis.
        for name, ds in h5["datasets"].items():
            if len(ds["shape"]) == 1 and "CLASS" not in ds["attrs"]:
                dims.setdefault(name.split("/")[-1], ds["shape"][0])
    variables: dict[str, dict] = {}
    for name, ds in h5["datasets"].items():
        nm = ds["attrs"].get("NAME", "")
        if isinstance(nm, str) and nm.startswith(
            "This is a netCDF dimension"
        ):
            continue  # dim without a variable: a fill-only placeholder
        short = name.split("/")[-1]
        dl = ds["attrs"].get("DIMENSION_LIST")
        if dl:
            dimnames = [
                addr_to_name[refs[0]].split("/")[-1] if refs else
                f"phony_dim_{i}"
                for i, refs in enumerate(dl)
            ]
        elif len(ds["shape"]) == 1 and short in dims:
            dimnames = [short]
        else:
            dimnames = []
            for ax, n in enumerate(ds["shape"]):
                cands = [d for d, sz in dims.items() if sz == n]
                if len(cands) == 1:
                    dimnames.append(cands[0])
                elif not cands:
                    pd_name = f"phony_dim_{ax}"
                    dims[pd_name] = n
                    dimnames.append(pd_name)
                else:
                    raise ValueError(
                        f"ambiguous dimension mapping for {name!r} axis "
                        f"{ax} (size {n} matches {sorted(cands)}) and the "
                        "file has no DIMENSION_LIST"
                    )
        attrs = {
            k: v for k, v in ds["attrs"].items() if k not in _NC4_HIDDEN
        }
        variables[name] = {
            "dims": dimnames,
            "shape": [int(s) for s in ds["shape"]],
            "attrs": attrs,
            "dtype": ds["dtype"]["np"],
            "record": False,
            "h5": ds,
        }
    return {
        "path": path,
        "format": "hdf5",
        "version": 4,
        "numrecs": 0,
        "recsize": 0,
        "dims": dims,
        "gatts": {
            k: v for k, v in h5["gatts"].items() if k not in _NC4_HIDDEN
        },
        "variables": variables,
    }


def h5_read_var(nc: dict, name: str) -> "np.ndarray":
    """Driver-side full decode of one variable from an nc4 structure
    dict (coordinate variables — small by construction)."""
    return read_h5_dataset(
        {"path": nc["path"], "datasets": {name: nc["variables"][name]["h5"]}},
        name,
    )


def h5_pixel_table(spark, nc: dict, var: str, rows_per_chunk: int = 128):
    """Distributed decode of a NetCDF-4 variable to ``(time_cf, sx,
    sy, band_1)`` source-grid rows — the HDF5 counterpart of
    netcdf.netcdf_pixel_table. One task per stored CHUNK (each task
    seeks its byte range and runs defilter + scale/offset + raw-space
    fill masking in numpy); never-written chunks become fill tasks
    (addr -1) so the output grid is dense, matching HDF5 fill
    semantics. Contiguous layouts fan out as row-range slabs."""
    import pandas as pd

    from raquet_spark.session import ensure_package_shipped
    from raquet_spark.sources.netcdf import _find_coords

    ensure_package_shipped(spark)
    v = nc["variables"][var]
    ds = v["h5"]
    path = nc["path"]
    time_name, lat, lon = _find_coords(nc)
    shape = list(ds["shape"])
    has_time = (
        len(shape) == 3 and time_name is not None
        and v["dims"][0] == time_name.split("/")[-1]
    )
    if len(shape) == 3 and not has_time:
        raise ValueError(
            f"3-D variable {var!r} whose leading dim is not the time "
            f"coordinate ({v['dims']})"
        )
    nlat, nlon = shape[-2], shape[-1]
    ntime = shape[0] if has_time else 1
    dts = ds["dtype"]["np"]
    itemsize = np.dtype(dts).itemsize
    scale = float(v["attrs"].get("scale_factor", 1.0))
    offset = float(v["attrs"].get("add_offset", 0.0))
    fill = v["attrs"].get("_FillValue", v["attrs"].get("missing_value"))
    if fill is None and ds.get("fill_raw"):
        fill = np.frombuffer(
            ds["fill_raw"][:itemsize], dtype=np.dtype(dts)
        )[0].item()
    filters = list(ds["filters"])
    tvals = (
        [float(t) for t in h5_read_var(nc, time_name)] if has_time else [0.0]
    )

    if ds["layout"] == "chunked":
        cd = list(ds["chunk"])
        if len(cd) != len(shape):
            raise ValueError(f"chunk rank {cd} vs shape {shape}")
        grid = set()
        import itertools as it

        for coords in it.product(
            *[range(0, s, c) for s, c in zip(shape, cd)]
        ):
            grid.add(coords)
        tasks = []
        for coords, addr, size, mask in ds["chunks"]:
            grid.discard(tuple(coords))
            c3 = coords if len(coords) == 3 else (0, *coords)
            tasks.append((int(addr), int(size), int(mask), *map(int, c3)))
        for coords in sorted(grid):  # never-written chunks -> fill
            c3 = coords if len(coords) == 3 else (0, *coords)
            tasks.append((-1, 0, 0, *map(int, c3)))
        cd3 = cd if len(cd) == 3 else [1, *cd]
        task_df = spark.createDataFrame(
            pd.DataFrame(
                tasks, columns=["addr", "size", "mask", "c0", "c1", "c2"]
            )
        )
        n_part = max(
            1, min(len(tasks), spark.sparkContext.defaultParallelism)
        )
        task_df = task_df.repartition(n_part)

        def decode(batches):
            from raquet_spark.sources.io import range_reader

            dt = np.dtype(dts)
            nel = int(np.prod(cd3))
            rd = range_reader(path)
            for pdf in batches:
                for row in pdf.to_dict("records"):
                    addr = int(row["addr"])
                    t0, y0, x0 = (
                        int(row["c0"]), int(row["c1"]), int(row["c2"])
                    )
                    if addr < 0:
                        if fill is None:
                            raw_arr = np.zeros(cd3, dtype=dt)
                        else:
                            raw_arr = np.full(cd3, dt.type(fill))
                    else:
                        raw = defilter(
                            rd(addr, int(row["size"])), filters,
                            dt.itemsize, int(row["mask"]),
                        )
                        raw_arr = np.frombuffer(
                            raw[: nel * dt.itemsize], dtype=dt
                        ).reshape(cd3)
                    th = min(cd3[0], ntime - t0)
                    hh = min(cd3[1], nlat - y0)
                    ww = min(cd3[2], nlon - x0)
                    for dt_i in range(th):
                        raw2 = raw_arr[dt_i, :hh, :ww]
                        vals = raw2.astype("f8") * scale + offset
                        if fill is not None:
                            vals[raw2 == raw2.dtype.type(fill)] = (
                                float(fill) * scale + offset
                            )
                        sy, sx = np.mgrid[0:hh, 0:ww]
                        yield pd.DataFrame({
                            "time_cf": np.full(
                                hh * ww, tvals[t0 + dt_i]
                            ),
                            "sx": (sx + x0).ravel().astype("int64"),
                            "sy": (sy + y0).ravel().astype("int64"),
                            "band_1": vals.ravel(),
                        })

        return task_df.mapInPandas(
            decode,
            schema="time_cf double, sx bigint, sy bigint, band_1 double",
        )

    if ds["layout"] == "compact":
        data_bytes = ds["data"]

        def decode_compact(batches):
            dt = np.dtype(dts)
            arr = np.frombuffer(
                data_bytes[: ntime * nlat * nlon * dt.itemsize], dtype=dt
            ).reshape(ntime, nlat, nlon)
            for pdf in batches:
                for row in pdf.to_dict("records"):
                    t = int(row["t"])
                    raw2 = arr[t]
                    vals = raw2.astype("f8") * scale + offset
                    if fill is not None:
                        vals[raw2 == raw2.dtype.type(fill)] = (
                            float(fill) * scale + offset
                        )
                    sy, sx = np.mgrid[0:nlat, 0:nlon]
                    yield pd.DataFrame({
                        "time_cf": np.full(nlat * nlon, tvals[t]),
                        "sx": sx.ravel().astype("int64"),
                        "sy": sy.ravel().astype("int64"),
                        "band_1": vals.ravel(),
                    })

        task_df = spark.createDataFrame(
            pd.DataFrame({"t": list(range(ntime))})
        )
        return task_df.mapInPandas(
            decode_compact,
            schema="time_cf double, sx bigint, sy bigint, band_1 double",
        )

    # contiguous: row-range slabs, like the classic-CDF path
    if filters:
        raise ValueError("filters on a contiguous HDF5 layout")
    begin = ds["addr"]
    if begin == UNDEF:
        raise ValueError(f"variable {var!r} has no allocated storage")
    tasks = []
    for t in range(ntime):
        base = begin + t * nlat * nlon * itemsize
        for row0 in range(0, nlat, rows_per_chunk):
            nrows = min(rows_per_chunk, nlat - row0)
            tasks.append(
                (tvals[t], base + row0 * nlon * itemsize, row0, nrows)
            )
    n_part = max(1, min(len(tasks), spark.sparkContext.defaultParallelism))
    task_df = spark.createDataFrame(
        pd.DataFrame(tasks, columns=["time_cf", "off", "row0", "nrows"])
    ).repartition(n_part)

    def decode_contig(batches):
        from raquet_spark.sources.io import range_reader

        dt = np.dtype(dts)
        rd = range_reader(path)
        for pdf in batches:
            for row in pdf.to_dict("records"):
                nrows = int(row["nrows"])
                raw = np.frombuffer(
                    rd(int(row["off"]), nrows * nlon * dt.itemsize), dtype=dt
                )
                vals = raw.astype("f8") * scale + offset
                if fill is not None:
                    vals[raw == raw.dtype.type(fill)] = (
                        float(fill) * scale + offset
                    )
                sy, sx = np.mgrid[0:nrows, 0:nlon]
                yield pd.DataFrame({
                    "time_cf": np.full(
                        nrows * nlon, float(row["time_cf"])
                    ),
                    "sx": sx.ravel().astype("int64"),
                    "sy": (sy + int(row["row0"])).ravel().astype("int64"),
                    "band_1": vals,
                })

    return task_df.mapInPandas(
        decode_contig,
        schema="time_cf double, sx bigint, sy bigint, band_1 double",
    )
