"""Minimal from-scratch GRIB2 *writer* — TEST FIXTURE ONLY.

sources/grib2.py needs real GRIB2 bytes to read and this sandbox has no
eccodes/GDAL, so this module emits spec-conformant edition-2 messages
(WMO FM 92): sections 0-8, grid definition template 3.0 (regular
lat/lon), product definition 4.0, data representation 5.0 (simple
packing), optional bitmap (section 6 indicator 0). Signed fields use
GRIB sign-magnitude encoding. One message per (parameter, forecast
time) field, concatenated — the multi-message shape real archives
have."""

from __future__ import annotations

import struct

import numpy as np


def _sm_enc(v: int, bits: int) -> int:
    return (1 << (bits - 1)) | (-v) if v < 0 else v


def simple_pack(data: np.ndarray, E: int = 0, D: int = 0):
    """GRIB2 simple packing: X = round(data * 10^D / 2^E) - R-scaled.
    Returns (R, nbits, X) with R chosen as the scaled minimum (the
    standard encoder choice). ``data`` may contain NaN (masked by the
    caller's bitmap) — only finite values pack."""
    vals = data[np.isfinite(data)]
    scaled = vals * (10.0 ** D)
    r = float(scaled.min()) if len(vals) else 0.0
    x = np.round((scaled - r) / (2.0 ** E)).astype("i8")
    nbits = max(1, int(x.max()).bit_length()) if len(x) and x.max() > 0 else 1
    return r, nbits, x


def _pack_bits(x: np.ndarray, nbits: int) -> bytes:
    bits = (
        (x[:, None] >> np.arange(nbits - 1, -1, -1, dtype="i8")) & 1
    ).astype("u1").ravel()
    return np.packbits(bits).tobytes()


def _section(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def _pack_block(x: np.ndarray, nbits: int) -> bytes:
    """One byte-aligned block of ``nbits``-wide big-endian ints."""
    if nbits == 0 or not len(x):
        return b""
    return _pack_bits(np.asarray(x, dtype="i8"), nbits)


def _complex_pack(
    xs: np.ndarray,
    drt: int,
    order: int,
    group_len: int,
    miss: np.ndarray | None = None,
    mvm: int = 0,
):
    """Group-split (5.2) / spatially-differenced (5.3) encode of the
    non-negative scaled ints ``xs``. With ``mvm`` 1/2, ``xs`` is FULL
    grid length with placeholders at missing positions and ``miss`` is
    an int array (0 present / 1 primary / 2 secondary): missing points
    are embedded as all-ones group increments (2^w - 1; 2^w - 2 for
    secondary), all-missing groups as width-0 with an all-ones group
    reference — the wgrib2/eccodes convention. Returns
    (nbits, sec5 extra bytes past the 5.0 fields, section-7 payload)."""
    n = len(xs)
    if miss is None:
        miss = np.zeros(n, dtype="i8")
    miss = np.asarray(miss, dtype="i8")
    pres = miss == 0
    if drt == 3:
        v = np.asarray(xs, dtype="i8")[pres]
        firsts = v[:order].tolist()
        d = np.diff(v, n=order).astype("i8")  # over NON-missing points
        gmin = int(d.min()) if len(d) else 0
        sv = np.zeros(len(v), dtype="i8")
        sv[order:] = d - gmin
        # the first `order` non-missing stored values are placeholders
        # (the decoder overwrites them with the descriptor firsts)
        stored = np.zeros(n, dtype="i8")
        stored[pres] = sv
    else:
        firsts, gmin = [], 0
        stored = np.asarray(xs, dtype="i8").copy()
        stored[~pres] = 0

    g_vals = [stored[i : i + group_len] for i in range(0, n, group_len)]
    g_miss = [miss[i : i + group_len] for i in range(0, n, group_len)]
    ng = len(g_vals)
    refs: list[int | None] = []
    widths: list[int] = []
    all_kinds: list[int] = []  # marker kind for all-missing groups
    for gv, gm in zip(g_vals, g_miss):
        p = gm == 0
        if not p.any():
            kinds = set(int(k) for k in gm)
            if len(kinds) == 1:
                refs.append(None)  # width-0 ref marker, kind below
                widths.append(0)
                all_kinds.append(kinds.pop())
                continue
            ref, mx = 0, 0  # mixed kinds: need per-point markers
        else:
            ref = int(gv[p].min())
            mx = int(gv[p].max()) - ref
        if mvm == 0:
            wd = max(0, mx.bit_length())
        else:
            # reserve the top `mvm` codes for the missing markers;
            # any group containing missing points needs >= 1 bit
            need_marker = bool((gm != 0).any())
            if mx == 0 and not need_marker:
                wd = 0
            else:
                wd = 1
                while mx > (1 << wd) - 1 - mvm:
                    wd += 1
        refs.append(ref)
        widths.append(wd)
        all_kinds.append(0)
    norm_refs = [r for r in refs if r is not None]
    mx_ref = max(norm_refs) if norm_refs else 0
    nbits = 1
    # normal references must stay clear of the top `mvm` ref-markers
    while mx_ref > (1 << nbits) - 1 - mvm:
        nbits += 1
    refs_final = np.array(
        [
            ((1 << nbits) - 1 if k != 2 else (1 << nbits) - 2)
            if r is None else r
            for r, k in zip(refs, all_kinds)
        ],
        dtype="i8",
    )
    widths_a = np.array(widths, dtype="i8")
    lens = np.array([len(g) for g in g_vals], dtype="i8")
    wbits = 8
    lbits = max(1, int(lens.max()).bit_length())

    body = b""
    if drt == 3:
        mags = [abs(v) for v in (*firsts, gmin)] or [0]
        sd_octets = max(1, (max(mags).bit_length() + 1 + 7) // 8)
        for v in (*firsts, gmin):
            body += _sm_enc(int(v), 8 * sd_octets).to_bytes(
                sd_octets, "big"
            )
    body += _pack_block(refs_final, nbits)
    body += _pack_block(widths_a, wbits)
    body += _pack_block(lens, lbits)
    # group values: ONE continuous bit stream, width-0 groups omitted
    all_bits = []
    for gv, gm, ref, wd in zip(g_vals, g_miss, refs, widths_a):
        if wd:
            vals = (gv - (ref or 0)).astype("i8")
            if mvm:
                vals = np.where(gm == 1, (1 << wd) - 1, vals)
                vals = np.where(gm == 2, (1 << wd) - 2, vals)
            all_bits.append(
                ((vals[:, None] >> np.arange(wd - 1, -1, -1, dtype="i8"))
                 & 1).astype("u1").ravel()
            )
    if all_bits:
        body += np.packbits(np.concatenate(all_bits)).tobytes()

    extra5 = struct.pack(">BB", 1, mvm)  # split method, mvm
    # substitutes (octets 24-31): IEEE floats (original field type 0)
    extra5 += struct.pack(">f", np.float32(9.999e20) if mvm else 0.0)
    extra5 += struct.pack(">f", np.float32(9.998e20) if mvm == 2 else 0.0)
    extra5 += struct.pack(">IBB", ng, 0, wbits)
    extra5 += struct.pack(">IBIB", 0, 1, int(lens[-1]) if ng else 0, lbits)
    if drt == 3:
        extra5 += struct.pack(">BB", order, sd_octets)
    return nbits, extra5, body


def write_grib2(
    path: str,
    fields: list[dict],
    lat1: float = 49.0,
    lon1: float = 0.0,
    di: float = 0.5,
    dj: float = 0.5,
    discipline: int = 0,
    j_positive: bool = False,
    i_negative: bool = False,
    col_major: bool = False,
    boustro: bool = False,
    grid: dict | None = None,
    stagger: int = 0,
    incr_given: bool = True,
) -> str:
    """``fields``: list of ``{data (2-d np array, row 0 = north; NaN =
    missing → bitmap), forecast_time (int hours), param (category,
    number), E, D}``. Default grid: regular lat/lon (template 3.0)
    anchored at the (lat1, lon1) CELL CENTER. Pass ``grid={"type":
    "lambert", la1, lo1, dx, dy, lad, lov, latin1, latin2, shape}``
    for a Lambert-conformal grid (template 3.30; la1/lo1 = FIRST grid
    point, dx/dy in meters)."""
    out = b""
    for f in fields:
        data = np.asarray(f["data"], dtype="f8")
        nj, ni = data.shape
        E, D = int(f.get("E", 0)), int(f.get("D", 0))
        cat, num = f.get("param", (0, 0))
        r, nbits, x = simple_pack(data, E, D)

        lat_last = lat1 - dj * (nj - 1)
        lon_e = lon1 + di * (ni - 1)
        reduced = bool(
            grid and grid.get("type") in ("gauss_reduced", "latlon_reduced")
        )
        if reduced:
            # ragged rows: data is a NaN-padded (nj, max_ni) rect,
            # row j meaningful through pl[j]; serialization = rows
            # concatenated in scan order
            pl = [int(v) for v in grid["pl"]]
            assert len(pl) == nj and max(pl) == ni
            rows = [data[j, : pl[j]] for j in range(nj)]
            if j_positive:
                rows = rows[::-1]
            flat = np.concatenate(rows)
            la1, la2 = (lat_last, lat1) if j_positive else (lat1, lat_last)
            lo_first, lo_last = lon1, lon_e
            scan = (0x40 if j_positive else 0) | (stagger & 0x0F)
            nj_decl = nj
        elif stagger & 0x01 and stagger & 0x0E:
            # flag-table 3.4 bit 8 (alternating-Ni): `data` is the
            # NaN-padded (nj_data, ni) NORMALIZED rectangle (row 0
            # north, col 0 west) of the STAGGERED grid — offset rows
            # (per bits 5/6 scan parity) meaningful through Ni-1, and
            # with bit 7 the declared parent Nj is nj_data + 1 (the
            # staggered rows interleave strictly inside). lat1/lon1/
            # di/dj describe the PARENT (unstaggered) anchor, the same
            # corner convention the bits 5-7 fixtures pin.
            assert grid is None and not (i_negative or col_major or boustro)
            nj_decl = nj + 1 if stagger & 0x02 else nj
            arr = data[::-1] if j_positive else data
            rows = [
                arr[r, : ni - 1 if (
                    (r % 2 == 0 and stagger & 0x08)
                    or (r % 2 == 1 and stagger & 0x04)
                ) else ni]
                for r in range(nj)
            ]
            flat = np.concatenate(rows)
            lat_last = lat1 - dj * (nj_decl - 1)
            la1, la2 = (lat_last, lat1) if j_positive else (lat1, lat_last)
            lo_first, lo_last = lon1, lon_e
            scan = (0x40 if j_positive else 0) | (stagger & 0x0F)
        else:
            nj_decl = nj
            arr = data
            if j_positive:  # stored south→north
                arr = arr[::-1]
                la1, la2 = lat_last, lat1
            else:
                la1, la2 = lat1, lat_last
            if i_negative:  # stored east→west: first point is east
                arr = arr[:, ::-1]
                lo_first, lo_last = lon_e, lon1
            else:
                lo_first, lo_last = lon1, lon_e
            # scan lines: i-lines (row-major) or j-lines (bit 3); odd
            # lines reversed under boustrophedon
            lines = arr.T.copy() if col_major else arr.copy()
            if boustro:
                lines[1::2] = lines[1::2, ::-1]
            scan = (
                (0x80 if i_negative else 0) | (0x40 if j_positive else 0)
                | (0x20 if col_major else 0) | (0x10 if boustro else 0)
                | (stagger & 0x0F)  # flag-table 3.4 bits 5-8, raw
            )
            flat = lines.ravel()
        has_missing = bool(np.isnan(flat).any())
        mask = np.isfinite(flat)
        scaled = flat[mask] * (10.0 ** D)
        xs = np.round((scaled - r) / (2.0 ** E)).astype("i8")
        packing = f.get("packing", "simple")
        mvm = int(f.get("mvm", 0))
        if mvm and packing not in ("complex", "complex_diff"):
            raise ValueError("mvm requires complex/complex_diff packing")
        if mvm:
            # embedded missing instead of a bitmap: NaN = primary;
            # an optional boolean `secondary` grid marks NaNs that
            # encode as SECONDARY missing (requires mvm=2)
            misskind = np.where(mask, 0, 1).astype("i8")
            sec = f.get("secondary")
            if sec is not None:
                # the mask must ride the SAME scan rearrangement as
                # the data (j/i flips, line orientation, boustrophedon)
                sec = np.asarray(sec, dtype=bool)
                if j_positive:
                    sec = sec[::-1]
                if i_negative:
                    sec = sec[:, ::-1]
                sec_l = sec.T.copy() if col_major else sec.copy()
                if boustro:
                    sec_l[1::2] = sec_l[1::2, ::-1]
                misskind[sec_l.ravel() & ~mask] = 2
            bmm = f.get("bitmap_miss")
            if bmm is not None:
                # mvm COMBINED with a bitmap (legal per the spec): the
                # bitmap_miss grid's points are absent from the packed
                # stream entirely (section-6 bitmap), remaining NaNs
                # are embedded markers within the kept points
                bmm = np.asarray(bmm, dtype=bool)
                if j_positive:
                    bmm = bmm[::-1]
                if i_negative:
                    bmm = bmm[:, ::-1]
                bl = bmm.T.copy() if col_major else bmm.copy()
                if boustro:
                    bl[1::2] = bl[1::2, ::-1]
                keep = ~bl.ravel()
                flat_k = flat[keep]
                mask_k = np.isfinite(flat_k)
                xs_full = np.zeros(len(flat_k), dtype="i8")
                xs_full[mask_k] = np.round(
                    (flat_k[mask_k] * (10.0 ** D) - r) / (2.0 ** E)
                ).astype("i8")
                misskind = misskind[keep]
                mask = keep  # section-6 bitmap = bitmap presence
                has_missing = True
            else:
                xs_full = np.zeros(len(flat), dtype="i8")
                xs_full[mask] = xs
                has_missing = False  # no section-6 bitmap
            drt = 3 if packing == "complex_diff" else 2
            nbits, extra5, packed = _complex_pack(
                xs_full, drt, int(f.get("sd_order", 2)),
                int(f.get("group_len", 16)), misskind, mvm,
            )
        elif packing == "simple":
            drt = 0
            packed = _pack_bits(xs, nbits)
            extra5 = b""
        elif packing == "png":
            from raquet_spark.functions.png import png_encode

            drt = 41
            shape = (1, len(xs)) if has_missing else (nj, ni)
            v = np.asarray(xs, dtype="i8").reshape(shape)
            if nbits <= 8:
                img = v.astype("u1")[:, :, None]
            elif nbits <= 16:
                img = v.astype("u2")[:, :, None]
            elif nbits <= 24:
                img = np.stack(
                    [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], axis=2
                ).astype("u1")
            else:
                img = np.stack(
                    [(v >> 24) & 0xFF, (v >> 16) & 0xFF,
                     (v >> 8) & 0xFF, v & 0xFF], axis=2
                ).astype("u1")
            packed = png_encode(img)
            extra5 = b""
        else:
            drt = 3 if packing == "complex_diff" else 2
            nbits, extra5, packed = _complex_pack(
                xs, drt, int(f.get("sd_order", 2)),
                int(f.get("group_len", 16)),
            )

        s1 = struct.pack(
            ">HHBBBHBBBBBBB",
            7, 0,      # centre, subcentre
            2, 1, 1,   # master table, local table, sig of ref time
            2026, 1, 1, 0, 0, 0,  # ref time
            0, 1,      # production status, type of data
        )
        if grid and grid.get("type") == "ps":  # template 3.20
            gl = grid
            t30 = struct.pack(
                ">BBIBIBI", int(gl.get("shape", 6)), 0, 0, 0, 0, 0, 0
            )
            t30 += struct.pack(">II", ni, nj)
            t30 += struct.pack(
                ">II", _sm_enc(int(round(gl["la1"] * 1e6)), 32),
                _sm_enc(int(round(gl["lo1"] % 360.0 * 1e6)), 32),
            )
            t30 += bytes([0x30])
            t30 += struct.pack(
                ">II", _sm_enc(int(round(abs(gl["lad"]) * 1e6)), 32),
                _sm_enc(int(round(gl["lov"] % 360.0 * 1e6)), 32),
            )
            t30 += struct.pack(
                ">II", int(round(gl["dx"] * 1e3)), int(round(gl["dy"] * 1e3))
            )
            t30 += struct.pack(
                ">BB", 0x80 if gl["lad"] < 0 else 0, scan
            )
            s3 = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 20) + t30
        elif grid and grid.get("type") == "lambert":  # template 3.30
            gl = grid
            t30 = struct.pack(
                ">BBIBIBI", int(gl.get("shape", 6)), 0, 0, 0, 0, 0, 0
            )
            t30 += struct.pack(">II", ni, nj)
            t30 += struct.pack(
                ">II", _sm_enc(int(round(gl["la1"] * 1e6)), 32),
                _sm_enc(int(round(gl["lo1"] % 360.0 * 1e6)), 32),
            )
            t30 += bytes([0x30])  # resolution/component flags
            t30 += struct.pack(
                ">II", _sm_enc(int(round(gl["lad"] * 1e6)), 32),
                _sm_enc(int(round(gl["lov"] % 360.0 * 1e6)), 32),
            )
            t30 += struct.pack(
                ">II", int(round(gl["dx"] * 1e3)), int(round(gl["dy"] * 1e3))
            )
            t30 += struct.pack(  # projection centre flag, scanning
                ">BB",
                0x80 if gl.get("south", gl["latin1"] < 0) else 0,
                scan,
            )
            t30 += struct.pack(
                ">II", _sm_enc(int(round(gl["latin1"] * 1e6)), 32),
                _sm_enc(int(round(gl["latin2"] * 1e6)), 32),
            )
            t30 += struct.pack(">II", _sm_enc(int(-90 * 1e6), 32), 0)
            s3 = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 30) + t30
        elif grid and grid.get("type") == "mercator":  # template 3.10
            gl = grid
            t30 = struct.pack(
                ">BBIBIBI", int(gl.get("shape", 6)), 0, 0, 0, 0, 0, 0
            )
            t30 += struct.pack(">II", ni, nj)
            t30 += struct.pack(
                ">II", _sm_enc(int(round(gl["la1"] * 1e6)), 32),
                _sm_enc(int(round(gl["lo1"] % 360.0 * 1e6)), 32),
            )
            t30 += bytes([0x30])
            t30 += struct.pack(
                ">I", _sm_enc(int(round(gl["lad"] * 1e6)), 32)
            )
            t30 += struct.pack(">II", 0, 0)  # la2/lo2 (informational)
            t30 += bytes([scan])
            t30 += struct.pack(">I", 0)  # orientation
            t30 += struct.pack(
                ">II", int(round(gl["dx"] * 1e3)), int(round(gl["dy"] * 1e3))
            )
            s3 = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 10) + t30
        elif grid and grid.get("type") in ("gauss", "gauss_reduced"):
            # template 3.40 — regular Gaussian: la1/la2 name the
            # selected slice of the 2N Gaussian latitudes; the Dj slot
            # carries N. Reduced: Ni/Di missing (all ones) + the
            # points-per-row list appended after the template.
            from raquet_spark.sources.grib2 import gaussian_latitudes

            n_par = int(grid["n"])
            row0 = int(grid.get("row0", 0))
            sub = gaussian_latitudes(n_par)[row0 : row0 + nj]
            assert len(sub) == nj
            la1g, la2g = (sub[-1], sub[0]) if j_positive else (sub[0], sub[-1])
            t30 = struct.pack(">BBIBIBI", 6, 0, 0, 0, 0, 0, 0)
            t30 += struct.pack(
                ">II", 0xFFFFFFFF if reduced else ni, nj
            )
            t30 += struct.pack(">II", 0, 0)
            t30 += struct.pack(
                ">II", _sm_enc(int(round(la1g * 1e6)), 32),
                _sm_enc(int(round(lo_first * 1e6)), 32),
            )
            t30 += struct.pack(
                ">BII", 0x30,
                _sm_enc(int(round(la2g * 1e6)), 32),
                _sm_enc(int(round(lo_last * 1e6)), 32),
            )
            t30 += struct.pack(
                ">IIB",
                0xFFFFFFFF if reduced else int(round(di * 1e6)),
                n_par, scan,
            )
            if reduced:
                pl_scan = pl[::-1] if j_positive else pl
                t30 += b"".join(
                    int(v).to_bytes(2, "big") for v in pl_scan
                )
                s3 = struct.pack(
                    ">BIBBH", 0, int(sum(pl)), 2, 1, 40
                ) + t30
            else:
                s3 = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 40) + t30
        else:
            rot = grid if grid and grid.get("type") == "rotated" else None
            t30 = struct.pack(
                ">BBIBIBI", 6, 0, 0, 0, 0, 0, 0  # sphere, radii unused
            )
            # alternating-Ni grids declare the PARENT Nj (bit 7 makes
            # the data carry Nj-1 rows); everywhere else nj_decl == nj
            t30 += struct.pack(">II", ni, nj_decl)
            t30 += struct.pack(">II", 0, 0)  # basic angle, subdivisions
            t30 += struct.pack(
                ">II", _sm_enc(int(round(la1 * 1e6)), 32),
                _sm_enc(int(round(lo_first * 1e6)), 32),
            )
            t30 += struct.pack(
                ">BII", 0x30 if incr_given else 0x00,
                _sm_enc(int(round(la2 * 1e6)), 32),
                _sm_enc(int(round(lo_last * 1e6)), 32),
            )
            t30 += struct.pack(
                ">IIB",
                int(round(di * 1e6)) if incr_given else 0xFFFFFFFF,
                int(round(dj * 1e6)) if incr_given else 0xFFFFFFFF,
                scan,
            )
            if rot:  # template 3.1: + south pole of rotation (the
                # lat1/lon1/di/dj args are in ROTATED coordinates)
                t30 += struct.pack(
                    ">II",
                    _sm_enc(int(round(rot["lat_sp"] * 1e6)), 32),
                    _sm_enc(int(round(rot["lon_sp"] % 360.0 * 1e6)), 32),
                )
                t30 += struct.pack(">f", float(rot.get("angle", 0.0)))
            if reduced:  # quasi-regular lat/lon: PL after the template
                pl_scan = pl[::-1] if j_positive else pl
                t30 += b"".join(
                    int(v).to_bytes(2, "big") for v in pl_scan
                )
                s3 = struct.pack(
                    ">BIBBH", 0, int(sum(pl)), 2, 1, 1 if rot else 0
                ) + t30
            else:
                # len(flat) = ni*nj for full rectangles, the ragged sum
                # for alternating-Ni grids (NaN pads are NOT points)
                s3 = struct.pack(
                    ">BIBBH", 0, len(flat), 0, 0, 1 if rot else 0
                ) + t30
        lv_type, lv_scale, lv_val = f.get("level", (1, 0, 0))
        t40 = struct.pack(
            ">BBBBBHBBI", cat, num, 2, 0, 0, 0, 0,
            int(f.get("time_unit", 1)),  # code table 4.4
            # signed (sign-magnitude): reanalysis offsets can be < 0
            _sm_enc(int(f.get("forecast_time", 0)), 32),
        )
        t40 += struct.pack(
            ">BBIBBI",
            lv_type, _sm_enc(int(lv_scale), 8),
            _sm_enc(int(lv_val), 32), 255, 0, 0,
        )
        pdt = int(f.get("pdt", 0))
        if pdt in (1, 11):  # + ensemble type / member / count (35-37)
            t40 += struct.pack(
                ">BBB", int(f.get("ens_type", 3)),
                int(f.get("ens_member", 0)), int(f.get("ens_count", 1)),
            )
        elif pdt in (2, 12):  # + derived-forecast type / count
            t40 += struct.pack(
                ">BB", int(f.get("ens_derived", 0)),
                int(f.get("ens_count", 1)),
            )
        elif pdt in (5, 9):  # + probability octets 35-47
            t40 += struct.pack(
                ">BBB", int(f.get("prob_number", 0)),
                int(f.get("prob_total", 1)), int(f.get("prob_type", 1)),
            )
            # prob limit None -> encoded missing (0xFF scale +
            # 0xFFFFFFFF value): probability type 4 "below upper
            # limit" archives carry only prob_upper
            for sk, vk in (("prob_lower_scale", "prob_lower"),
                           ("prob_upper_scale", "prob_upper")):
                if f.get(vk, 0) is None:
                    t40 += b"\xff\xff\xff\xff\xff"
                else:
                    t40 += struct.pack(
                        ">BI", _sm_enc(int(f.get(sk, 0)), 8),
                        _sm_enc(int(f.get(vk, 0)), 32),
                    )
        elif pdt in (6, 10):  # + percentile value (octet 35; 4.10's
            # 4.8-style statistical tail is not needed for keying)
            t40 += struct.pack(">B", int(f.get("percentile", 50)))
        elif pdt == 15:  # + spatial-processing octets 35-37
            t40 += struct.pack(
                ">BBB", int(f.get("spatial_stat", 0)),
                int(f.get("spatial_type", 0)),
                int(f.get("spatial_npoints", 1)),
            )
        s4 = struct.pack(">HH", 0, pdt) + t40
        # with mvm the data section packs ALL points (missing embedded
        # as markers), so octets 6-9 count the full grid
        s5 = struct.pack(
            ">IH", len(flat) if mvm else int(mask.sum()), drt
        )
        s5 += struct.pack(">f", np.float32(r))
        s5 += struct.pack(
            ">HHBB", _sm_enc(E, 16), _sm_enc(D, 16), nbits, 0
        )
        s5 += extra5
        if f.get("bitmap_reuse"):
            # indicator 254: the PREVIOUS field's bitmap applies (the
            # caller must plant the same NaN set)
            s6 = bytes([254])
        elif has_missing:
            s6 = bytes([0]) + np.packbits(mask.astype("u1")).tobytes()
        else:
            s6 = bytes([255])
        s7 = packed

        body = (
            _section(1, s1) + _section(3, s3) + _section(4, s4)
            + _section(5, s5) + _section(6, s6) + _section(7, s7)
        )
        total = 16 + len(body) + 4
        msg = (
            b"GRIB" + struct.pack(">HBB", 0, discipline, 2)
            + struct.pack(">Q", total) + body + b"7777"
        )
        out += msg
    with open(path, "wb") as fh:
        fh.write(out)
    return path


def write_grib1(
    path: str,
    fields: list[dict],
    lat1: float = 49.0,
    lon1: float = 0.0,
    di: float = 0.5,
    dj: float = 0.5,
    j_positive: bool = False,
    grid: dict | None = None,
    nv_params: list[float] | None = None,
    incr_given: bool = True,
) -> str:
    """GRIB edition-1 fixture writer (IS + PDS + GDS [+BMS] + BDS +
    '7777'): simple packing, IBM370 reference value, 3-byte
    sign-magnitude MILLIdegree coordinates. ``fields``: {data (2-d,
    row 0 north; NaN = missing → BMS), forecast_time (int, unit 1 =
    hours), param (int octet-9 indicator), level (type, value), E, D}.
    ``grid``: None = lat/lon (type 0); {"type": "gauss", "n": N,
    "row0": r} or {"type": "gauss_reduced", "n": N, "pl": [...]} for
    data representation type 4."""
    from raquet_spark.sources.grib2 import (
        float_to_ibm32,
        gaussian_latitudes,
    )

    def sm3(v: float) -> bytes:
        iv = int(round(abs(v) * 1e3))
        if v < 0:
            iv |= 1 << 23
        return iv.to_bytes(3, "big")

    out = b""
    for f in fields:
        data = np.asarray(f["data"], dtype="f8")
        nj, ni = data.shape
        E, D = int(f.get("E", 0)), int(f.get("D", 0))
        reduced = bool(
            grid and grid.get("type") in ("gauss_reduced", "latlon_reduced")
        )
        if reduced:
            pl = [int(v) for v in grid["pl"]]
            rows = [data[j, : pl[j]] for j in range(nj)]
            if j_positive:
                rows = rows[::-1]
            flat = np.concatenate(rows)
        else:
            arr = data[::-1] if j_positive else data
            flat = arr.ravel()
        mask = np.isfinite(flat)
        has_missing = bool((~mask).any())
        scaled = flat[mask] * (10.0 ** D)
        r_exact = float(scaled.min()) if mask.any() else 0.0
        # R must survive the IBM float round trip EXACTLY for integer
        # fixtures: re-decode the encoded value
        from raquet_spark.sources.grib2 import ibm32_to_float

        r_ibm = float_to_ibm32(r_exact)
        r_back = ibm32_to_float(r_ibm)
        xs = np.round((scaled - r_back) / (2.0 ** E)).astype("i8")
        nbits = max(1, int(xs.max()).bit_length()) if len(xs) and xs.max() > 0 else 1

        lv_type, lv_val = f.get("level", (1, 0))
        flags = 0x80 | (0x40 if has_missing else 0)
        pds = bytes([1, 7, 1, 255, flags])  # table, centre, proc, grid
        pds += bytes([int(f.get("param", 2)), lv_type])
        pds += int(lv_val).to_bytes(2, "big")
        pds += bytes([26, 1, 1, 0, 0])  # YY MM DD HH Min (century 21)
        pds += bytes([1, int(f.get("forecast_time", 0)), 0, 0])
        pds += bytes([0, 0, 0])  # number in avg etc.
        pds += bytes([21, 0])  # century, sub-centre
        pds += _sm_enc(D, 16).to_bytes(2, "big")
        pds = (len(pds) + 3).to_bytes(3, "big") + pds
        assert len(pds) == 28

        if grid and grid.get("type") in ("gauss", "gauss_reduced"):
            n_par = int(grid["n"])
            row0 = int(grid.get("row0", 0))
            sub = gaussian_latitudes(n_par)[row0 : row0 + nj]
            la1g, la2g = (
                (sub[-1], sub[0]) if j_positive else (sub[0], sub[-1])
            )
            drt1, dj_slot = 4, n_par
            la1v, la2v = la1g, la2g
        else:
            drt1 = 0
            dj_slot = int(round(dj * 1e3))
            lat_last = lat1 - dj * (nj - 1)
            la1v, la2v = (
                (lat_last, lat1) if j_positive else (lat1, lat_last)
            )
        lon_last = lon1 + di * (ni - 1)
        nv = len(nv_params) if nv_params else 0
        pv = 33 if (reduced or nv) else 255
        gds = bytes([nv, pv, drt1])
        gds += (0xFFFF if reduced else ni).to_bytes(2, "big")
        gds += nj.to_bytes(2, "big")
        gds += sm3(la1v) + sm3(lon1)
        # resolution/component flags: bit 1 = direction increments given
        gds += bytes([0x80 if incr_given else 0x00])
        gds += sm3(la2v) + sm3(lon_last)
        di_slot = (0xFFFF if (reduced or not incr_given)
                   else int(round(di * 1e3)))
        gds += di_slot.to_bytes(2, "big")
        if drt1 == 0 and not incr_given:
            gds += (0xFFFF).to_bytes(2, "big")
        else:
            gds += dj_slot.to_bytes(2, "big")
        gds += bytes([0x40 if j_positive else 0])
        gds += b"\x00" * 4  # reserved octets 29-32
        if nv:  # vertical-coordinate parameter list precedes PL
            gds += b"".join(
                float_to_ibm32(float(v)).to_bytes(4, "big")
                for v in nv_params
            )
        if reduced:
            pl_scan = pl[::-1] if j_positive else pl
            gds += b"".join(int(v).to_bytes(2, "big") for v in pl_scan)
        gds = (len(gds) + 3).to_bytes(3, "big") + gds

        bms = b""
        if has_missing:
            bm = np.packbits(mask.astype("u1")).tobytes()
            unused = len(bm) * 8 - len(flat)
            bms = (6 + len(bm)).to_bytes(3, "big") + bytes([unused, 0, 0]) + bm

        packed = _pack_bits(xs, nbits)
        unused_bits = len(packed) * 8 - len(xs) * nbits
        bds = bytes([unused_bits & 0x0F])
        bds += _sm_enc(E, 16).to_bytes(2, "big")
        bds += r_ibm.to_bytes(4, "big")
        bds += bytes([nbits]) + packed
        bds = (len(bds) + 3).to_bytes(3, "big") + bds

        body = pds + gds + bms + bds
        total = 8 + len(body) + 4
        out += b"GRIB" + total.to_bytes(3, "big") + bytes([1]) + body + b"7777"
    with open(path, "wb") as fh:
        fh.write(out)
    return path
