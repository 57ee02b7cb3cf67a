"""Baseline TIFF codec — pure stdlib/numpy, no image library (r13).

The 13th real decode family: TIFF is the scans/faxes/print-pipeline
format a web crawl still meets (and the container LZW variant differs
from GIF's in exactly the ways a self-rolled decoder gets wrong, which
is why tools/tiff_ab.py pins every path byte-exact against system
libtiff — the external-reference discipline of the r12 zigzag find).

DECODER scope (``decode_tiff``): classic (non-Big) TIFF, both byte
orders (II/MM), strip-organized baseline images at 8 bits per sample:
grayscale (PhotometricInterpretation 0/1, MinIsWhite inverted per
spec), RGB / RGBA (extra sample = alpha), and PALETTE color (16-bit
ColorMap scaled to 8 by >> 8, libtiff's convention), under four
compressions — none (1), TIFF-LZW (5) with horizontal-differencing
predictor (2), Adobe DEFLATE (8, zlib) with predictor, and PackBits
(32773).  Output is (h, w, 3) or (h, w, 4) exactly when alpha is
present — the decode_png/decode_webp/decode_gif contract.  Tiled
layout, planar configuration 2, BigTIFF, and non-8-bit depths are
refused BY NAME.

TIFF-LZW is NOT GIF-LZW, and each difference is pinned by the A/B:
codes pack MSB-first (GIF: LSB-first), and the width schedule is the
spec's "early change" — calibrated against libtiff as encoder-bump at
next_code == 1 << width with the decoder bumping one entry earlier
(the read side lags the write side by exactly one table entry).

ENCODER scope (``encode_tiff``): fixture emitter for every decoder
path (gray/RGB/RGBA/palette × all four compressions × predictor ×
byte order × multi-strip).  tools/tiff_ab.py pins that system libtiff
decodes these emissions back to the source pixels, so the emitter
cannot share a convention bug with the decoder unnoticed.
"""

from __future__ import annotations

import struct
import zlib

# tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_EXTRASAMPLES = 338
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


# --- TIFF-flavor LZW (spec §13: MSB-first, early change) ---------------------


def _tiff_lzw_decompress(data: bytes, n_out: int) -> bytes:
    """LZW with 256-entry byte alphabet, Clear=256, EOI=257, MSB-first
    code packing, and the EARLY width change (bump when the next free
    slot reaches (1 << width) - 1).  Stops at ``n_out`` bytes — the
    same pixel-count discipline the GIF decoder learned from the r13
    giflib A/B."""
    CLEAR, EOI = 256, 257
    pos = 0  # bit position
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    def get() -> int:
        nonlocal pos
        if (pos + width) > len(data) * 8:
            raise ValueError("TIFF LZW stream truncated")
        v = 0
        for i in range(width):
            p = pos + i
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
        pos += width
        return v

    reset()
    while True:
        code = get()
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if code < len(table) and code not in (CLEAR, EOI):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"invalid TIFF LZW code {code}")
        out.extend(entry)
        if len(out) >= n_out:
            return bytes(out[:n_out])
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY change (the TIFF-LZW quirk, calibrated against
            # libtiff in tools/tiff_ab.py): the read side bumps when
            # the table reaches (1 << width) - 1 — one code earlier
            # than GIF's schedule; together with the encoder's
            # next_code == (1 << width) rule this matches libtiff's
            # write AND read schedules exactly (one-entry lag).
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_out])


def _tiff_lzw_compress(data: bytes) -> bytes:
    """Encode-side twin (MSB-first, libtiff-calibrated width schedule,
    Clear when the next free code reaches 4095 — libtiff's table-full
    rule)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    put(CLEAR, width)
    w = b""
    for k in data:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        table[wk] = next_code
        next_code += 1
        # libtiff-calibrated write schedule (tools/tiff_ab.py): bump
        # when the next free code reaches 1 << width
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4095:
            put(CLEAR, width)
            table = fresh()
            next_code = 258
            width = 9
        w = bytes([k])
    if w:
        put(table[w], width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- PackBits (spec §9) -------------------------------------------------------


def _packbits_decompress(data: bytes, n_out: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < n_out:
        n = data[pos]
        pos += 1
        if n < 128:
            out.extend(data[pos : pos + n + 1])
            pos += n + 1
        elif n > 128:
            out.extend(bytes([data[pos]]) * (257 - n))
            pos += 1
        # n == 128: no-op per spec
    if len(out) < n_out:
        raise ValueError("TIFF PackBits strip truncated")
    return bytes(out[:n_out])


def _packbits_compress(data: bytes) -> bytes:
    """Greedy run emitter: runs of >= 3 as replicate packets, the rest
    as literal packets (<= 128 each)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (len(out) == 0 or True):
            run2 = 1
            while i + run2 < n and run2 < 3 and data[i + run2] == data[i]:
                run2 += 1
            if run2 >= 3 or (i - lit_start) >= 128:
                break
            i += 1
        lit = data[lit_start : min(i, lit_start + 128)]
        i = lit_start + len(lit)
        out.append(len(lit) - 1)
        out.extend(lit)
    return bytes(out)


# --- container ------------------------------------------------------------------


def _read_ifd(payload: bytes, bo: str):
    (off,) = struct.unpack_from(bo + "I", payload, 4)
    (n,) = struct.unpack_from(bo + "H", payload, off)
    tags = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        # a corrupt count can claim gigabytes; everything must fit the
        # payload (guards the unpack format-string build too)
        if size > len(payload):
            raise ValueError("TIFF tag value larger than file")
        if size <= 4:
            raw = payload[base + 8 : base + 8 + size]
        else:
            (voff,) = struct.unpack_from(bo + "I", payload, base + 8)
            raw = payload[voff : voff + size]
        if len(raw) < size:
            raise ValueError("TIFF tag value out of range")
        if typ == 3:
            vals = struct.unpack(bo + "H" * count, raw)
        elif typ == 4:
            vals = struct.unpack(bo + "I" * count, raw)
        elif typ == 1:
            vals = tuple(raw)
        else:
            vals = (raw,)
        tags[tag] = vals
    (next_ifd,) = struct.unpack_from(bo + "I", payload, off + 2 + 12 * n)
    return tags, next_ifd


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF into ndarray[h, w, 3|4] uint8 (see module
    docstring for scope and refusals)."""
    import numpy as np

    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic == 43:
        raise ValueError("unsupported TIFF: BigTIFF")
    if magic != 42:
        raise ValueError("not a TIFF payload (bad magic)")
    tags, _ = _read_ifd(payload, bo)
    if _T_TILE_WIDTH in tags or _T_TILE_LENGTH in tags:
        raise ValueError("unsupported TIFF: tiled layout")

    def _int_tag(tag, default=None):
        vals = tags.get(tag)
        if vals is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        v = vals[0]
        # a corrupt field TYPE parses as raw bytes — refuse, don't crash
        if not isinstance(v, int):
            raise ValueError(f"TIFF tag {tag} has a non-integer type")
        return v

    w = _int_tag(_T_WIDTH)
    h = _int_tag(_T_HEIGHT)
    spp = _int_tag(_T_SPP, 1)
    bits = tags.get(_T_BITS, (8,) * spp)
    if not all(isinstance(b, int) for b in bits):
        raise ValueError("TIFF BitsPerSample has a non-integer type")
    comp = _int_tag(_T_COMPRESSION, 1)
    photo = _int_tag(_T_PHOTOMETRIC, 1)
    planar = _int_tag(_T_PLANAR, 1)
    predictor = _int_tag(_T_PREDICTOR, 1)
    if planar != 1:
        raise ValueError("unsupported TIFF: planar configuration 2")
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF: bits per sample {bits}")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF: photometric {photo}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF: predictor {predictor}")
    rows_per_strip = _int_tag(_T_ROWS_PER_STRIP, h)
    if rows_per_strip <= 0:
        raise ValueError("TIFF RowsPerStrip must be positive")
    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/counts")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offset/count mismatch")
    if not all(isinstance(v, int) for v in offsets + counts):
        raise ValueError("TIFF strip tags have a non-integer type")

    row_bytes = w * spp
    raw = bytearray()
    for i, (o, c) in enumerate(zip(offsets, counts)):
        strip = payload[o : o + c]
        if len(strip) < c:
            raise ValueError("TIFF strip out of range")
        n_rows = min(rows_per_strip, h - i * rows_per_strip)
        n_bytes = n_rows * row_bytes
        if comp == 1:
            if len(strip) < n_bytes:
                raise ValueError("TIFF strip truncated")
            data = strip[:n_bytes]
        elif comp == 5:
            data = _tiff_lzw_decompress(strip, n_bytes)
        elif comp == 8:
            data = zlib.decompress(strip)[:n_bytes]
            if len(data) < n_bytes:
                raise ValueError("TIFF deflate strip truncated")
        elif comp == 32773:
            data = _packbits_decompress(strip, n_bytes)
        else:
            raise ValueError(f"unsupported TIFF: compression {comp}")
        raw.extend(data)
    arr = np.frombuffer(bytes(raw), np.uint8, count=h * row_bytes).reshape(
        h, w, spp
    )
    if predictor == 2:
        # horizontal differencing: cumulative sum along the row per
        # sample channel, mod 256 (applies to LZW and Deflate strips)
        arr = (np.cumsum(arr.astype(np.int64), axis=1) & 0xFF).astype(
            np.uint8
        )

    if photo == 3:
        if _T_COLORMAP not in tags:
            raise ValueError("palette TIFF missing ColorMap")
        cm = tags[_T_COLORMAP]
        n = len(cm) // 3
        # 16-bit colormap scaled to 8 bits by >> 8 (libtiff convention)
        pal = (
            np.array(cm, np.uint16).reshape(3, n).T >> 8
        ).astype(np.uint8)
        idx = arr[:, :, 0]
        if int(idx.max()) >= n:
            raise ValueError("TIFF palette index out of range")
        return pal[idx]
    if photo in (0, 1):
        g = arr[:, :, 0]
        if photo == 0:  # MinIsWhite
            g = 255 - g
        out = np.repeat(g[:, :, None], 3, axis=2)
        return out
    # photo == 2: RGB / RGBA
    if spp == 3:
        return arr.copy()
    if spp == 4:
        return arr.copy()
    raise ValueError(f"unsupported TIFF: {spp} samples for RGB")


def encode_tiff(
    pixels,
    photometric: int = 2,
    compression: int = 1,
    predictor: int = 1,
    palette=None,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Baseline TIFF emitter for fixture generation (see module
    docstring).  ``pixels``: [h, w] gray levels or palette indices, or
    [h, w, 3|4] RGB(A)."""
    import numpy as np

    bo = ">" if big_endian else "<"
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    rps = rows_per_strip or h
    row_bytes = w * spp

    strips = []
    for y0 in range(0, h, rps):
        rows = px[y0 : y0 + rps]
        if predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            data = (d & 0xFF).astype(np.uint8).tobytes()
        else:
            data = rows.tobytes()
        if compression == 1:
            strips.append(data)
        elif compression == 5:
            strips.append(_tiff_lzw_compress(data))
        elif compression == 8:
            strips.append(zlib.compress(data, 6))
        elif compression == 32773:
            # PackBits operates per ROW per spec
            out = bytearray()
            for r in range(rows.shape[0]):
                out += _packbits_compress(
                    data[r * row_bytes : (r + 1) * row_bytes]
                )
            strips.append(bytes(out))
        else:
            raise ValueError(f"unsupported compression {compression}")

    entries = []  # (tag, type, count, values)
    entries.append((_T_WIDTH, 4, 1, (w,)))
    entries.append((_T_HEIGHT, 4, 1, (h,)))
    entries.append((_T_BITS, 3, spp, (8,) * spp))
    entries.append((_T_COMPRESSION, 3, 1, (compression,)))
    entries.append((_T_PHOTOMETRIC, 3, 1, (photometric,)))
    entries.append((_T_SPP, 3, 1, (spp,)))
    entries.append((_T_ROWS_PER_STRIP, 4, 1, (rps,)))
    entries.append((_T_PLANAR, 3, 1, (1,)))
    if predictor != 1:
        entries.append((_T_PREDICTOR, 3, 1, (predictor,)))
    if photometric == 3:
        pal = np.asarray(palette, np.uint8).reshape(-1, 3)
        n = 256  # full-size colormap (2**bits entries per spec)
        full = np.zeros((n, 3), np.uint16)
        full[: len(pal)] = pal.astype(np.uint16) * 257  # 8->16 bit
        entries.append(
            (_T_COLORMAP, 3, 3 * n, tuple(full.T.reshape(-1).tolist()))
        )
    if spp == 4:
        # associated alpha (ExtraSamples=1): stored values pass through
        # libtiff's RGBA interface unchanged (unassociated alpha gets
        # premultiplied there — tools/tiff_ab.py finding)
        entries.append((_T_EXTRASAMPLES, 3, 1, (1,)))

    n_strips = len(strips)
    entries.append((_T_STRIP_OFFSETS, 4, n_strips, None))  # patched below
    entries.append((_T_STRIP_COUNTS, 4, n_strips, tuple(len(s) for s in strips)))
    entries.sort(key=lambda e: e[0])

    # layout: header(8) | IFD | overflow values | strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_bytes(typ, count, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(bo + fmt * count, *vals)

    # first pass to size the overflow area (strip offsets patched later)
    placed = []
    for tag, typ, count, vals in entries:
        size = _TYPE_SIZES[typ] * count
        placed.append(size > 4)
    total_overflow = sum(
        _TYPE_SIZES[t] * c for (tag, t, c, v), big in zip(entries, placed) if big
    )
    data_off = overflow_off + total_overflow
    strip_offsets = []
    acc = data_off
    for s in strips:
        strip_offsets.append(acc)
        acc += len(s)

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, ifd_off)
    ifd = bytearray(struct.pack(bo + "H", len(entries)))
    ov_cursor = overflow_off
    for (tag, typ, count, vals), big in zip(entries, placed):
        if tag == _T_STRIP_OFFSETS:
            vals = tuple(strip_offsets)
        vb = value_bytes(typ, count, vals)
        if big:
            ifd += struct.pack(bo + "HHI", tag, typ, count) + struct.pack(
                bo + "I", ov_cursor
            )
            overflow += vb
            ov_cursor += len(vb)
        else:
            ifd += struct.pack(bo + "HHI", tag, typ, count) + vb.ljust(4, b"\x00")
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    out += ifd + overflow
    for s in strips:
        out += s
    return bytes(out)
