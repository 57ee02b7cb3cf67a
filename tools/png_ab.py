"""A/B harness: PNG decode conformance against system libpng16
(simplified API via ctypes), covering the r13 surface widening —
palette (PLTE, depths 1/2/4/8), sub-byte grayscale, gray+alpha, tRNS
transparency on palette/gray/truecolor, and Adam7 interlacing.

Two directions, both externally anchored (the r12 zigzag lesson:
self-roundtrips cannot catch convention bugs an encoder/decoder pair
share):

  * libpng-AUTHORED files (png_image_write_to_memory: RGB, RGBA, and
    real colormap PNGs) — our decoder must reproduce libpng's own
    decode byte-exactly;
  * OUR-emitter-authored files (encode_png_adv across every supported
    ctype x depth x interlace x tRNS combination) — libpng must decode
    them back to the SOURCE pixels (so the emitter can't share a bug
    with our decoder), and our decoder must match libpng.

Development/debug tool; the permanent pin lives in tests/.
"""

from __future__ import annotations

import ctypes
import sys

import numpy as np

sys.path.insert(0, ".")

LP = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libpng16.so.16")

PNG_IMAGE_VERSION = 1
FMT_RGB = 2
FMT_RGBA = 3
FMT_RGB_COLORMAP = 2 | 8
FMT_RGBA_COLORMAP = 3 | 8


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


LP.png_image_begin_read_from_memory.restype = ctypes.c_int
LP.png_image_begin_read_from_memory.argtypes = [
    ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t,
]
LP.png_image_finish_read.restype = ctypes.c_int
LP.png_image_finish_read.argtypes = [
    ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_int32, ctypes.c_void_p,
]
LP.png_image_write_to_memory.restype = ctypes.c_int
LP.png_image_write_to_memory.argtypes = [
    ctypes.POINTER(_PngImage), ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
    ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
]


def decode_rgba_ref(data: bytes) -> np.ndarray:
    """Reference decode to RGBA via libpng's simplified API."""
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    ok = LP.png_image_begin_read_from_memory(
        ctypes.byref(img), data, len(data)
    )
    assert ok, img.message
    img.format = FMT_RGBA
    buf = ctypes.create_string_buffer(img.width * img.height * 4)
    ok = LP.png_image_finish_read(ctypes.byref(img), None, buf, 0, None)
    assert ok, img.message
    return (
        np.frombuffer(buf, np.uint8).reshape(img.height, img.width, 4).copy()
    )


def encode_ref(arr: np.ndarray) -> bytes:
    """libpng-authored truecolor PNG (RGB or RGBA by array shape)."""
    h, w, c = arr.shape
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    img.width, img.height = w, h
    img.format = FMT_RGBA if c == 4 else FMT_RGB
    size = ctypes.c_size_t(0)
    ok = LP.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, arr.tobytes(), 0, None
    )
    assert ok, img.message
    buf = ctypes.create_string_buffer(size.value)
    ok = LP.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0, arr.tobytes(), 0, None
    )
    assert ok, img.message
    return buf.raw[: size.value]


def encode_ref_colormap(idx: np.ndarray, cmap: np.ndarray) -> bytes:
    """libpng-authored REAL palette PNG from index grid + colormap
    (RGB or RGBA entries)."""
    h, w = idx.shape
    n, c = cmap.shape
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    img.width, img.height = w, h
    img.format = FMT_RGBA_COLORMAP if c == 4 else FMT_RGB_COLORMAP
    img.colormap_entries = n
    size = ctypes.c_size_t(0)
    ok = LP.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0,
        idx.tobytes(), 0, cmap.tobytes(),
    )
    assert ok, img.message
    buf = ctypes.create_string_buffer(size.value)
    ok = LP.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0,
        idx.tobytes(), 0, cmap.tobytes(),
    )
    assert ok, img.message
    return buf.raw[: size.value]


def _to_rgba(arr: np.ndarray) -> np.ndarray:
    if arr.shape[2] == 4:
        return arr
    return np.dstack(
        [arr, np.full(arr.shape[:2], 255, np.uint8)]
    )


def run_case(data: bytes, label: str, want_rgba: np.ndarray | None) -> list:
    """our decode == libpng decode (RGBA-normalized); optionally both
    == the known source pixels."""
    from setup_harvest_action_spark.functions.multimodal import decode_png

    problems = []
    ref = decode_rgba_ref(data)
    ours = _to_rgba(decode_png(data))
    if ours.shape != ref.shape:
        return [f"{label}: shape {ours.shape} vs ref {ref.shape}"]
    if not np.array_equal(ours, ref):
        nbad = int((ours != ref).any(axis=2).sum())
        problems.append(f"{label}: {nbad} px differ vs libpng")
    if want_rgba is not None and not np.array_equal(ref, want_rgba):
        nbad = int((ref != want_rgba).any(axis=2).sum())
        problems.append(f"{label}: libpng vs source differ in {nbad} px")
    return problems


def main() -> None:
    from setup_harvest_action_spark.functions.multimodal import (
        encode_png_adv,
    )

    rng = np.random.default_rng(99)
    fails = []
    n = 0

    for (w, h) in ((13, 9), (32, 17), (7, 23)):
        rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
        rgba = rng.integers(0, 256, (h, w, 4), np.uint8)
        # libpng-authored truecolor
        fails += run_case(encode_ref(rgb), f"ref-rgb{w}x{h}", _to_rgba(rgb))
        fails += run_case(encode_ref(rgba), f"ref-rgba{w}x{h}", rgba)
        n += 2
        # libpng-authored colormap (RGB and RGBA palettes)
        for nc, c in ((16, 3), (5, 3), (16, 4)):
            cmap = rng.integers(0, 256, (nc, c), np.uint8)
            idx = rng.integers(0, nc, (h, w)).astype(np.uint8)
            want = _to_rgba(
                cmap[idx] if c == 3 else None
            ) if c == 3 else cmap[idx]
            fails += run_case(
                encode_ref_colormap(idx, cmap), f"ref-cmap{nc}x{c}-{w}x{h}",
                want,
            )
            n += 1
        # our-emitter-authored, across the full surface
        for interlace in (0, 1):
            tag = f"{w}x{h}i{interlace}"
            # truecolor / RGBA / gray+alpha at depth 8
            fails += run_case(
                encode_png_adv(w, h, rgb, ctype=2, interlace=interlace),
                f"own-rgb-{tag}", _to_rgba(rgb),
            )
            fails += run_case(
                encode_png_adv(w, h, rgba, ctype=6, interlace=interlace),
                f"own-rgba-{tag}", rgba,
            )
            ga = rng.integers(0, 256, (h, w, 2), np.uint8)
            want = np.dstack([ga[:, :, 0]] * 3 + [ga[:, :, 1]])
            fails += run_case(
                encode_png_adv(w, h, ga, ctype=4, interlace=interlace),
                f"own-ga-{tag}", want,
            )
            n += 3
            # RGB with tRNS color key
            key = rgb[0, 0]
            trns = b"".join(int(v).to_bytes(2, "big") for v in key)
            hit = (rgb == key[None, None, :]).all(axis=2)
            want = np.dstack(
                [rgb, np.where(hit, 0, 255).astype(np.uint8)]
            )
            fails += run_case(
                encode_png_adv(
                    w, h, rgb, ctype=2, interlace=interlace, trns=trns
                ),
                f"own-rgbtrns-{tag}", want,
            )
            n += 1
            # palette at every depth, with and without tRNS
            for depth in (1, 2, 4, 8):
                nc = min(1 << depth, 11)
                cmap = rng.integers(0, 256, (nc, 3), np.uint8)
                idx = rng.integers(0, nc, (h, w)).astype(np.uint8)
                fails += run_case(
                    encode_png_adv(
                        w, h, idx, ctype=3, depth=depth,
                        interlace=interlace, palette=cmap,
                    ),
                    f"own-pal{depth}-{tag}", _to_rgba(cmap[idx]),
                )
                a_tab = np.full(nc, 255, np.uint8)
                a_tab[: min(3, nc)] = [0, 128, 200][: min(3, nc)]
                want = np.dstack([cmap[idx], a_tab[idx]])
                fails += run_case(
                    encode_png_adv(
                        w, h, idx, ctype=3, depth=depth,
                        interlace=interlace, palette=cmap,
                        trns=a_tab[: min(3, nc)].tobytes(),
                    ),
                    f"own-paltrns{depth}-{tag}", want,
                )
                n += 2
            # sub-byte grayscale (+ tRNS on the depth-4 case)
            for depth in (1, 2, 4):
                g = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
                g8 = g * (255 // ((1 << depth) - 1))
                fails += run_case(
                    encode_png_adv(
                        w, h, g, ctype=0, depth=depth, interlace=interlace
                    ),
                    f"own-gray{depth}-{tag}", _to_rgba(np.dstack([g8] * 3)),
                )
                n += 1
            g = rng.integers(0, 16, (h, w)).astype(np.uint8)
            g8 = g * 17
            a = np.where(g == 5, 0, 255).astype(np.uint8)
            fails += run_case(
                encode_png_adv(
                    w, h, g, ctype=0, depth=4, interlace=interlace,
                    trns=(5).to_bytes(2, "big"),
                ),
                f"own-graytrns-{tag}", np.dstack([g8, g8, g8, a]),
            )
            n += 1

    print(f"{n} cases, {len(fails)} failures")
    for f in fails[:40]:
        print("  " + f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
