"""A/B harness: baseline-TIFF conformance against system libtiff
(ctypes), both directions:

  * libtiff-AUTHORED files — TIFFSetField/TIFFWriteScanline emit
    gray/RGB/RGBA/palette strips under none/LZW/Deflate/PackBits (±
    horizontal-differencing predictor, both byte orders via libtiff's
    native order): our decoder must reproduce
    TIFFReadRGBAImageOriented's output byte-exactly.  This is the
    anchor for the TIFF-LZW conventions (MSB-first packing, EARLY
    width change) that differ from GIF-LZW.
  * OUR-emitter-authored files (encode_tiff across the same matrix,
    both byte orders, multi-strip): libtiff must decode them back to
    the source pixels, so the emitter cannot share a convention bug
    with our decoder.

Development/debug tool; the permanent pin lives in tests/.
"""

from __future__ import annotations

import ctypes
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

LT = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libtiff.so.6")
LT.TIFFOpen.restype = ctypes.c_void_p
LT.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
LT.TIFFClose.argtypes = [ctypes.c_void_p]
LT.TIFFGetField.restype = ctypes.c_int
# varargs: declare the fixed leading params so the 64-bit TIFF* is
# never promoted to a (truncated) c_int
LT.TIFFGetField.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
LT.TIFFSetField.restype = ctypes.c_int
LT.TIFFSetField.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
LT.TIFFReadRGBAImageOriented.restype = ctypes.c_int
LT.TIFFReadRGBAImageOriented.argtypes = [
    ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
    ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
]
LT.TIFFWriteScanline.restype = ctypes.c_int
LT.TIFFWriteScanline.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16,
]

TAG = dict(
    WIDTH=256, LENGTH=257, BITS=258, COMPRESSION=259, PHOTOMETRIC=262,
    SPP=277, ROWSPERSTRIP=278, PLANAR=284, PREDICTOR=317, COLORMAP=320,
    EXTRASAMPLES=338,
)
ORIENTATION_TOPLEFT = 1


def decode_rgba_ref(data: bytes) -> np.ndarray:
    """libtiff reference decode to RGBA (top-left origin)."""
    fd, path = tempfile.mkstemp(suffix=".tif")
    try:
        os.write(fd, data)
        os.close(fd)
        tif = LT.TIFFOpen(path.encode(), b"r")
        assert tif, "TIFFOpen failed"
        w = ctypes.c_uint32(0)
        h = ctypes.c_uint32(0)
        LT.TIFFGetField(tif, TAG["WIDTH"], ctypes.byref(w))
        LT.TIFFGetField(tif, TAG["LENGTH"], ctypes.byref(h))
        raster = (ctypes.c_uint32 * (w.value * h.value))()
        ok = LT.TIFFReadRGBAImageOriented(
            tif, w.value, h.value, raster, ORIENTATION_TOPLEFT, 1
        )
        assert ok == 1, "TIFFReadRGBAImage failed"
        LT.TIFFClose(tif)
        # packed ABGR words; little-endian memory order is R,G,B,A
        arr = (
            np.frombuffer(bytes(raster), np.uint8)
            .reshape(h.value, w.value, 4)
            .copy()
        )
        return arr
    finally:
        os.unlink(path)


def encode_ref(
    pixels: np.ndarray,
    photometric: int,
    compression: int,
    predictor: int = 1,
    palette: np.ndarray | None = None,
    rows_per_strip: int | None = None,
) -> bytes:
    """libtiff-authored TIFF via the scanline API."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    fd, path = tempfile.mkstemp(suffix=".tif")
    os.close(fd)
    try:
        tif = LT.TIFFOpen(path.encode(), b"w")
        assert tif, "TIFFOpen(w) failed"
        sf = LT.TIFFSetField
        sf(tif, TAG["WIDTH"], ctypes.c_uint32(w))
        sf(tif, TAG["LENGTH"], ctypes.c_uint32(h))
        sf(tif, TAG["BITS"], 8)
        sf(tif, TAG["SPP"], spp)
        sf(tif, TAG["PHOTOMETRIC"], photometric)
        sf(tif, TAG["COMPRESSION"], compression)
        sf(tif, TAG["PLANAR"], 1)
        sf(tif, TAG["ROWSPERSTRIP"], ctypes.c_uint32(rows_per_strip or h))
        if predictor != 1:
            sf(tif, TAG["PREDICTOR"], predictor)
        if spp == 4:
            es = (ctypes.c_uint16 * 1)(1)  # associated alpha (see tiff_codec)
            sf(tif, TAG["EXTRASAMPLES"], 1, es)
        if photometric == 3:
            pal = np.asarray(palette, np.uint8)
            full = np.zeros((256, 3), np.uint16)
            full[: len(pal)] = pal.astype(np.uint16) * 257
            r = (ctypes.c_uint16 * 256)(*full[:, 0].tolist())
            g = (ctypes.c_uint16 * 256)(*full[:, 1].tolist())
            b = (ctypes.c_uint16 * 256)(*full[:, 2].tolist())
            sf(tif, TAG["COLORMAP"], r, g, b)
        for y in range(h):
            row = px[y].tobytes()
            buf = ctypes.create_string_buffer(row, len(row))
            ok = LT.TIFFWriteScanline(tif, buf, y, 0)
            assert ok == 1, f"TIFFWriteScanline failed at row {y}"
        LT.TIFFClose(tif)
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)


def _want_rgba(pixels, photometric, palette) -> np.ndarray:
    px = np.asarray(pixels, np.uint8)
    if photometric == 3:
        rgb = np.asarray(palette, np.uint8)[px]
        a = np.full(px.shape, 255, np.uint8)
        return np.dstack([rgb, a])
    if px.ndim == 2:
        g = 255 - px if photometric == 0 else px
        return np.dstack([g, g, g, np.full(px.shape, 255, np.uint8)])
    if px.shape[2] == 3:
        return np.dstack(
            [px, np.full(px.shape[:2], 255, np.uint8)]
        )
    return px


def _ours_rgba(arr: np.ndarray) -> np.ndarray:
    if arr.shape[2] == 4:
        return arr
    return np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])


def run_case(data: bytes, label: str, want_rgba: np.ndarray) -> list:
    from setup_harvest_action_spark.functions.tiff_codec import decode_tiff

    problems = []
    ref = decode_rgba_ref(data)
    ours = _ours_rgba(decode_tiff(data))
    if ours.shape != ref.shape:
        return [f"{label}: shape {ours.shape} vs ref {ref.shape}"]
    if not np.array_equal(ours, ref):
        nbad = int((ours != ref).any(axis=2).sum())
        problems.append(f"{label}: {nbad} px differ vs libtiff")
    if not np.array_equal(ref, want_rgba):
        nbad = int((ref != want_rgba).any(axis=2).sum())
        problems.append(f"{label}: libtiff vs source differ in {nbad} px")
    return problems


def main() -> None:
    from setup_harvest_action_spark.functions.tiff_codec import encode_tiff

    rng = np.random.default_rng(66)
    fails = []
    n = 0
    COMPS = (1, 5, 8, 32773)
    for (w, h) in ((21, 13), (64, 48)):
        gray = rng.integers(0, 256, (h, w), np.uint8)
        rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
        rgba = rng.integers(0, 256, (h, w, 4), np.uint8)
        pal = rng.integers(0, 256, (16, 3), np.uint8)
        idx = rng.integers(0, 16, (h, w)).astype(np.uint8)
        # a smooth ramp exercises LZW run/dictionary paths differently
        ramp = np.tile(np.arange(w, dtype=np.uint8) % 251, (h, 1))
        cases = [
            ("gray1", gray, 1, None),
            ("gray0", gray, 0, None),  # MinIsWhite inversion
            ("rgb", rgb, 2, None),
            ("rgba", rgba, 2, None),
            ("pal", idx, 3, pal),
            ("ramp", ramp, 1, None),
        ]
        for name, px, photo, p in cases:
            for comp in COMPS:
                for pred in (1, 2):
                    if pred == 2 and comp not in (5, 8):
                        continue
                    label = f"{name}-{w}x{h}-c{comp}p{pred}"
                    want = _want_rgba(px, photo, p)
                    # libtiff-authored -> our decoder
                    data = encode_ref(
                        px, photo, comp, pred, p, rows_per_strip=7
                    )
                    fails += run_case(data, "ref-" + label, want)
                    n += 1
                    # our emitter -> libtiff
                    for be in (False, True):
                        data = encode_tiff(
                            px, photo, comp, pred, palette=p,
                            big_endian=be, rows_per_strip=7,
                        )
                        fails += run_case(
                            data, f"own{'MM' if be else 'II'}-" + label, want
                        )
                        n += 1
    # large noise image drives the LZW table past 4095 entries, so the
    # mid-stream Clear is exercised in BOTH directions
    big = rng.integers(0, 256, (120, 200, 3), np.uint8)
    want = _want_rgba(big, 2, None)
    fails += run_case(encode_ref(big, 2, 5, 1, None), "ref-big-lzw", want)
    fails += run_case(
        encode_tiff(big, 2, 5, 1, rows_per_strip=120), "own-big-lzw", want
    )
    n += 2
    print(f"{n} cases, {len(fails)} failures")
    for f in fails[:40]:
        print("  " + f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
