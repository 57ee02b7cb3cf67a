"""A/B harness: encode deterministic RGBA images with the system
libwebp (producing VP8X + ALPH + VP8 containers, and VP8L-with-alpha
for the lossless path), decode with BOTH libwebp and
functions/webp_codec.py, and diff:

  * the ALPHA plane byte-exactly (alpha decode is deterministic on
    both sides — raw or VP8L-compressed, all row filters), and
  * the Y/U/V planes byte-exactly via WebPDecodeYUV (proves the VP8X
    routing preserves the r12 RFC 6386 bit-exact surface), and
  * for lossless RGBA, the full RGBA byte-exactly via WebPDecodeRGBA.

Development/debug tool for the r13 VP8X/ALPH work; the permanent pin
lives in tests/test_llm_functions.py.  Follows the external-reference
discipline from the r12 zigzag find: self-roundtrips cannot catch
convention bugs an encoder/decoder pair share.
"""

from __future__ import annotations

import ctypes
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.vp8_ab import (  # noqa: E402
    LW,
    _MemoryWriter,
    _WebPConfig,
    _WebPPicture,
    decode_yuv_ref,
    test_image,
)

LW.WebPEncodeRGBA.restype = ctypes.c_size_t
LW.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
]
LW.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LW.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
]
LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
LW.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
]


def encode_rgba(arr: np.ndarray, quality: float) -> bytes:
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LW.WebPEncodeRGBA(arr.tobytes(), w, h, w * 4, quality, ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    LW.WebPFree(out)
    return data


def encode_rgba_lossless(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LW.WebPEncodeLosslessRGBA(arr.tobytes(), w, h, w * 4, ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    LW.WebPFree(out)
    return data


def encode_rgba_adv(arr: np.ndarray, quality: float = 75.0, **cfg_over) -> bytes:
    """Advanced RGBA encode: explicit WebPConfig so alpha_compression
    (0 raw / 1 VP8L), alpha_filtering (0 none / 1 fast / 2 best) and
    alpha_quality reach the ALPH header paths the simple call may not."""
    h, w, _ = arr.shape
    cfg = _WebPConfig()
    assert LW.WebPConfigInitInternal(
        ctypes.byref(cfg), 0, ctypes.c_float(quality), 0x020F
    )
    for k, v in cfg_over.items():
        setattr(cfg, k, v)
    assert LW.WebPValidateConfig(ctypes.byref(cfg))
    pic = _WebPPicture()
    assert LW.WebPPictureInitInternal(ctypes.byref(pic), 0x020F)
    pic.width, pic.height = w, h
    pic.use_argb = 1
    assert LW.WebPPictureImportRGBA(ctypes.byref(pic), arr.tobytes(), w * 4)
    wr = _MemoryWriter()
    LW.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(LW.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = LW.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    assert ok, pic.error_code
    data = ctypes.string_at(wr.mem, wr.size)
    LW.WebPMemoryWriterClear(ctypes.byref(wr))
    LW.WebPPictureFree(ctypes.byref(pic))
    return data


def decode_rgba_ref(data: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LW.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    arr = (
        np.frombuffer(ctypes.string_at(p, w.value * h.value * 4), np.uint8)
        .reshape(h.value, w.value, 4)
        .copy()
    )
    LW.WebPFree(p)
    return arr


def alpha_image(kind: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGBA test images with structured alpha."""
    rgb = test_image(kind, w, h)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "noise":
        rng = np.random.default_rng(777)
        a = rng.integers(0, 256, (h, w), np.uint8)
    elif kind == "gradient":
        a = ((xx * 255) // max(1, w - 1)).astype(np.uint8)
    else:  # smooth shapes: disc + bands
        cx, cy = w / 2, h / 2
        d = np.hypot(xx - cx, yy - cy)
        a = np.where(d < min(w, h) / 3, 255, (yy * 7 % 200) + 30).astype(np.uint8)
    return np.dstack([rgb, a])


def run_case(data: bytes, label: str, ref_rgba: np.ndarray | None = None) -> list:
    from setup_harvest_action_spark.functions.webp_codec import decode_webp

    problems = []
    ours = decode_webp(data)
    ref = decode_rgba_ref(data)
    if ours.shape[:2] != ref.shape[:2]:
        return [f"{label}: shape {ours.shape} vs ref {ref.shape}"]
    if data[12:16] == b"VP8L" or (
        data[12:16] == b"VP8X" and b"VP8L" in data[:64]
    ):
        # lossless: full RGBA must match the reference exactly
        want = ref if ours.shape[2] == 4 else ref[:, :, :3]
        if not np.array_equal(ours, want):
            problems.append(f"{label}: lossless RGBA mismatch")
        return problems
    # lossy: alpha byte-exact; Y/U/V byte-exact via the YUV reference
    if ours.shape[2] == 4:
        if not np.array_equal(ours[:, :, 3], ref[:, :, 3]):
            nbad = int((ours[:, :, 3] != ref[:, :, 3]).sum())
            problems.append(f"{label}: alpha plane differs in {nbad} px")
    elif (ref[:, :, 3] != 255).any():
        problems.append(f"{label}: reference has alpha, ours returned RGB")
    from setup_harvest_action_spark.functions.vp8_codec import decode_webp_lossy

    y0, u0, v0 = decode_webp_lossy(data)
    y1, u1, v1 = decode_yuv_ref(data)
    for name, a, b in (("Y", y0, y1), ("U", u0, u1), ("V", v0, v1)):
        if not np.array_equal(a, b):
            problems.append(f"{label}: {name} plane mismatch")
    return problems


def _filter_plane(plane: np.ndarray, method: int) -> bytes:
    """Forward ALPH row filter (libwebp dsp/filters.c *Filter_C): the
    encode-side twin of webp_codec._unfilter_alpha, used to build
    synthetic ALPH chunks for filter methods the encoder rarely picks
    (gradient in particular)."""
    h, w = plane.shape
    src = plane.astype(np.int32)
    out = np.zeros_like(src)
    for r in range(h):
        for i in range(w):
            if method == 1:  # horizontal
                pred = src[r, i - 1] if i else (src[r - 1, 0] if r else 0)
            elif method == 2:  # vertical
                if r == 0:
                    pred = src[0, i - 1] if i else 0
                else:
                    pred = src[r - 1, i]
            else:  # gradient
                if r == 0:
                    pred = src[0, i - 1] if i else 0
                elif i == 0:
                    pred = src[r - 1, 0]
                else:
                    g = src[r, i - 1] + src[r - 1, i] - src[r - 1, i - 1]
                    pred = 0 if g < 0 else (255 if g > 255 else g)
            out[r, i] = (src[r, i] - pred) & 0xFF
    return out.astype(np.uint8).tobytes()


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + len(data).to_bytes(4, "little") + data + pad


def synth_vp8x_alpha(rgb: np.ndarray, alpha: np.ndarray, filt: int) -> bytes:
    """Real libwebp VP8 chunk + hand-built raw-compression ALPH chunk
    with an explicit row filter, wrapped in a VP8X container."""
    from tools.vp8_ab import encode_rgb

    h, w = alpha.shape
    lossy = encode_rgb(rgb, 80.0)
    vp8 = None
    for cc, d in _riff_chunks_local(lossy):
        if cc == b"VP8 ":
            vp8 = d
    assert vp8 is not None
    alph = bytes([filt << 2]) + _filter_plane(alpha, filt)
    vp8x = (
        bytes([0x10, 0, 0, 0])
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )
    body = _chunk(b"VP8X", vp8x) + _chunk(b"ALPH", alph) + _chunk(b"VP8 ", vp8)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body


def _riff_chunks_local(payload: bytes):
    from setup_harvest_action_spark.functions.webp_codec import _riff_chunks

    return _riff_chunks(payload)


def main() -> None:
    fails = []
    n = 0
    for kind in ("noise", "gradient", "shapes"):
        for (w, h) in ((32, 32), (48, 40), (37, 29)):
            img = alpha_image(kind, w, h)
            for q in (30.0, 75.0, 95.0):
                fails += run_case(encode_rgba(img, q), f"{kind}{w}x{h}q{q}")
                n += 1
            for ac in (0, 1):
                for af in (0, 1, 2):
                    for aq in (50, 100):
                        data = encode_rgba_adv(
                            img, 75.0,
                            alpha_compression=ac,
                            alpha_filtering=af,
                            alpha_quality=aq,
                        )
                        fails += run_case(
                            data, f"{kind}{w}x{h}ac{ac}af{af}aq{aq}"
                        )
                        n += 1
            fails += run_case(encode_rgba_lossless(img), f"{kind}{w}x{h}lossless")
            n += 1
            # synthetic ALPH chunks force every row filter (incl. the
            # gradient filter the encoder rarely picks); libwebp itself
            # unfilters them, so this is still an external A/B
            for filt in (0, 1, 2, 3):
                data = synth_vp8x_alpha(img[:, :, :3], img[:, :, 3], filt)
                fails += run_case(data, f"{kind}{w}x{h}synthf{filt}")
                n += 1
    print(f"{n} cases, {len(fails)} failures")
    for f in fails[:40]:
        print("  " + f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
